package graft

import graft.operators.PrefixIndex
import org.apache.spark.sql.functions._

/** The mutation-proportional prefix delta must be indistinguishable from
  * the full before/after diff — on the d10 scenario and on randomized
  * mutation batches.
  */
class PrefixIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def normalize(df: org.apache.spark.sql.DataFrame) =
    df.select("op", "bucket_id", "prefix", "level")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("prefixDeltaIncremental equals the full diff on the d10 scenario") {
    val before = Tables.objects(spark, sfDir).filter(col("bucket_id") === "F")
      .select(col("bucket_id"), col("name"))
    val doomed = before.filter(
      size(split(col("name"), "/")) === 3 &&
        element_at(split(col("name"), "/"), 2).cast("long") % 10 === 3)
    val inserted = Seq(("F", "Z/new/deep/file.dat"), ("F", "Z/new/other.dat"))
      .toDF("bucket_id", "name")
    val after = before.join(doomed, Seq("bucket_id", "name"), "left_anti")
      .unionByName(inserted)
    val full = PrefixIndex.prefixDelta(before, after)
    val inc = PrefixIndex.prefixDeltaIncremental(before, after, doomed, inserted)
    assert(normalize(inc) === normalize(full))
  }

  test("prefixDeltaIncremental equals the full diff on randomized mutations") {
    val rnd = new scala.util.Random(7)
    val names = (0 until 400).map { i =>
      val depth = 1 + rnd.nextInt(4)
      (0 until depth).map(d => s"s${rnd.nextInt(5)}d$d").mkString("/") + s"/f$i.dat"
    }
    val before = names.map(("B", _)).toDF("bucket_id", "name")
    val doomed = before.filter(abs(hash(col("name"))) % 3 === 0)
    val inserted = Seq(
      ("B", "s0d0/extra/new1.dat"), ("B", "brand/new/tree/x.dat"),
      ("B", "s1d0/f999.dat")).toDF("bucket_id", "name")
    val after = before.join(doomed, Seq("bucket_id", "name"), "left_anti")
      .unionByName(inserted)
    val full = PrefixIndex.prefixDelta(before, after)
    val inc = PrefixIndex.prefixDeltaIncremental(before, after, doomed, inserted)
    assert(normalize(inc) === normalize(full))
    assert(normalize(inc).nonEmpty, "fixture must actually mutate prefixes")
  }
}
