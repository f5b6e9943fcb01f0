package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Pins louvainSync's integer-overflow boundary instead of narrating it:
  * the narrow LongType gain form really does fail past m2·maxDeg ≈ 2⁶³
  * (ANSI arithmetic-overflow), the DecimalType(38,0) widened form is exact
  * there, the two forms agree wherever the narrow one is defined, and the
  * switch triggers at exactly the int64 bound.
  */
class LouvainOverflowSpec extends SparkTestBase {

  private def scoreRows(rows: Seq[(Long, Long, Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("kic", "k", "tot", "c", "cc")
  }

  test("louvainWidens switches at exactly the int64 product bound") {
    val maxDeg = 1000000L
    val bound = Long.MaxValue / maxDeg
    assert(!Graph.louvainWidens(bound, maxDeg))
    assert(Graph.louvainWidens(bound + 1, maxDeg))
    assert(!Graph.louvainWidens(0L, 0L)) // empty graph: never widens
  }

  test("the narrow form hits the predicted ANSI overflow at near-2^63 products") {
    // m2=4, maxDeg=1 keeps louvainScore on the narrow LongType path; the
    // row's kic is adversarial (a real graph this hot would have reported
    // maxDeg ≫ 1 and widened — this pins what WOULD happen without the
    // guard)
    val df = scoreRows(Seq((Long.MaxValue / 2, 1L, 1L, 1L, 2L)))
      .select(Graph.louvainScore(m2 = 4L, maxDeg = 1L).as("s"))
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val e = intercept[Exception] { df.collect() }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.toLowerCase.contains("overflow")),
        s"expected an arithmetic overflow, got: $e")
    } finally spark.conf.unset("spark.sql.ansi.enabled")
  }

  test("the widened form is exact past the boundary") {
    val m2 = Long.MaxValue / 2 // > Long.MaxValue / maxDeg → widens
    val df = scoreRows(Seq((4L, 3L, 5L, 1L, 2L), (7L, 2L, 9L, 1L, 1L)))
      .select(col("kic"), col("k"), col("tot"), col("c"), col("cc"),
        Graph.louvainScore(m2, maxDeg = 4L).as("s"))
    val got = df.orderBy(col("kic")).collect()
      .map(r => BigInt(r.getDecimal(5).toBigInteger))
    def model(kic: Long, k: Long, tot: Long, self: Boolean): BigInt =
      BigInt(m2) * kic - BigInt(k) * (BigInt(tot) - (if (self) k else 0L))
    assert(got.toSeq == Seq(
      model(4L, 3L, 5L, self = false), model(7L, 2L, 9L, self = true)))
    // sanity: the result genuinely exceeds int64
    assert(got.forall(_ > BigInt(Long.MaxValue)))
  }

  test("narrow and widened forms agree wherever the narrow form is defined") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(64) { _ =>
      val c = rnd.nextInt(4).toLong; val cc = rnd.nextInt(4).toLong
      (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong,
        rnd.nextInt(100000).toLong, c, cc)
    }
    val m2 = 100000L
    val df = scoreRows(rows).select(
      Graph.louvainScore(m2, maxDeg = 1L).as("narrow"), // stays LongType
      Graph.louvainScore(m2, maxDeg = Long.MaxValue).cast("long").as("wide"))
    assert(df.filter(col("narrow") =!= col("wide")).count() == 0)
  }
}
