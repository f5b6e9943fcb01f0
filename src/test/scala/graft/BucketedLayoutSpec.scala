package graft

import graft.operators.Dedup
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** The bucketed signature-table layout for incremental MinHash-LSH
  * (Dedup.writeSignatureTables): the corpus side of the daily incremental
  * join must be co-located by the STORED layout — no corpus-side shuffle in
  * the plan — and the layout change must be result-invariant.
  */
class BucketedLayoutSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  private def newDocs = Tables.documents(spark, sfDir)
    .filter(col("doc_id") % 5 === 0)
    .select((col("doc_id") + 1000000).as("doc_id"),
      concat(col("text"), lit(" tail marker")).as("text"))

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def hasExchange(p: SparkPlan): Boolean =
    p.collect { case e: ShuffleExchangeExec => e }.nonEmpty

  private def hasBandedScan(p: SparkPlan): Boolean =
    p.collect { case f: FileSourceScanExec => f }.exists(f =>
      f.relation.bucketSpec.isDefined &&
        f.relation.location.rootPaths.exists(_.toString.contains("mh_spec_banded")))

  test("banded candidate join reads the bucketed corpus with NO corpus-side exchange") {
    Dedup.writeSignatureTables(
      Dedup.minhashSignatures(docs, "doc_id", "text"), "mh_spec", numBuckets = 4)
    // force the sort-merge path so co-location (not a broadcast) is what the
    // plan proves; AQE off so the compiled plan is directly inspectable
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
             "spark.sql.adaptive.enabled" -> "false") {
      val corpus = spark.table("mh_spec_banded").as("b")
      val batch = Dedup.bandSignatures(
        Dedup.minhashSignatures(newDocs, "doc_id", "text"), 16, 4).as("a")
      val joined = batch.join(corpus,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      val smj = joined.queryExecution.executedPlan
        .collect { case s: SortMergeJoinExec => s }
      assert(smj.nonEmpty, "expected a sort-merge join with broadcast disabled")
      val (corpusSide, batchSide) =
        if (hasBandedScan(smj.head.right)) (smj.head.right, smj.head.left)
        else (smj.head.left, smj.head.right)
      assert(hasBandedScan(corpusSide), "bucketed banded scan not found in plan")
      assert(!hasExchange(corpusSide),
        "corpus side must be exchange-free — the stored bucketing IS its partitioning")
      assert(hasExchange(batchSide),
        "batch side shuffles into the corpus's bucket layout")
      // sanity: the join really happens (shared buckets exist)
      assert(joined.count() > 0)
    }
  }

  test("bucketed incremental pass is result-identical to the inline-banded pass") {
    Dedup.writeSignatureTables(
      Dedup.minhashSignatures(docs, "doc_id", "text"), "mh_spec", numBuckets = 4)
    val viaBucketed =
      Dedup.minhashLshIncrementalBucketed(newDocs, "doc_id", "text", "mh_spec")
        .orderBy(col("id_a"), col("id_b")).collect().toSeq
    val viaInline =
      Dedup.minhashLshIncremental(newDocs, "doc_id", "text",
        Dedup.minhashSignatures(docs, "doc_id", "text"))
        .orderBy(col("id_a"), col("id_b")).collect().toSeq
    assert(viaBucketed.nonEmpty && viaBucketed == viaInline)
  }

  test("stored (bands, rows) are validated against caller parameters; ensure skips rebuild") {
    Dedup.ensureSignatureTables(spark,
      Dedup.minhashSignatures(docs, "doc_id", "text"), "mh_spec2", numBuckets = 4)
    // a parameter mismatch fails loudly instead of silently mis-banding
    intercept[IllegalArgumentException] {
      Dedup.minhashLshIncrementalBucketed(newDocs, "doc_id", "text", "mh_spec2",
        bands = 8, rows = 4)
    }
    intercept[IllegalArgumentException] {
      Dedup.minhashLshIncrementalBucketed(newDocs, "doc_id", "text", "mh_spec2",
        bands = 16, rows = 8)
    }
    // second ensure is a no-op (tables exist) and the probe still works
    Dedup.ensureSignatureTables(spark,
      sys.error("sig must not be computed on the skip path"), "mh_spec2", numBuckets = 4)
    assert(Dedup.minhashLshIncrementalBucketed(
      newDocs, "doc_id", "text", "mh_spec2").count() > 0)
  }
}
