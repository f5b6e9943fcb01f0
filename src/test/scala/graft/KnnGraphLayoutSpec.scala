package graft

import graft.operators.Vectors
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The stored kNN-graph layout (SCALE.md's bucketed-adjacency claim, made
  * real in r12): `ensureKnnGraph` writes the adjacency partitioned by the
  * id-mod bucket `a_bkt_<B>` (B self-described in the column name), and
  * `beamSearch`'s per-round probe join against a
  * COLD stored graph must prune to the probed buckets via dynamic partition
  * pruning off the broadcast beam side — not scan the full adjacency.
  */
class KnnGraphLayoutSpec extends SparkTestBase {

  test("stored kNN graph is bucket-partitioned, matches the inline build, and the cold beam probe prunes") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val path =
      java.nio.file.Files.createTempDirectory("knn_store").toString + "/graph"
    Vectors.ensureKnnGraph(spark, emb, "vec_id", "v", path, k = 3)

    // layout: one directory per materialized id-mod bucket, the bucket
    // count self-described in the partition column name
    val bktCol = Vectors.knnBucketCol(Vectors.KnnGraphBuckets)
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith(bktCol + "=")).toSeq
    assert(dirs.size > 2, s"expected several $bktCol= dirs, got ${dirs.size}")

    // content parity: the bucket is a pure derivation, the (a, b) edge set
    // must equal the inline (unbucketed) build's
    val stored = spark.read.parquet(path)
    assert(stored.filter(col(bktCol) =!=
      pmod(col("a"), lit(Vectors.KnnGraphBuckets))).count() == 0)
    val storedEdges = stored.select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inlineEdges = Vectors.nnDescentKnnGraph(emb, "vec_id", "v", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(storedEdges == inlineEdges)

    // pruning: a probe whose ids all live in bucket 0 — the stored-graph
    // hop scan must read only that bucket's files, via a dynamic pruning
    // filter planted off the broadcast probe side. AQE off so the executed
    // plan's scan node and its numFiles metric are reachable.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val b = Vectors.KnnGraphBuckets.toLong
      val probe = emb.filter(col("vec_id").isin(0L, b, 2 * b))
        .select(lit(0L).as("q"), col("vec_id").as("a"))
        .localCheckpoint() // same shape beamSearch hands graphHops
      assert(probe.count() >= 1)
      val hops = Vectors.graphHops(stored, probe)
      hops.collect()
      val scan = hops.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec if f.output.exists(_.name == "b") => f
      }.head
      assert(scan.partitionFilters.exists(_.toString.contains("dynamicpruning")),
        s"probe scan carries no dynamic pruning filter: ${scan.partitionFilters}")
      def parquetFiles(d: java.io.File): Int =
        Option(d.listFiles()).toSeq.flatten.count(_.getName.endsWith(".parquet"))
      val bucket0Files = dirs.filter(_.getName == bktCol + "=0").map(parquetFiles).sum
      val totalFiles = dirs.map(parquetFiles).sum
      val filesRead = scan.metrics("numFiles").value
      assert(filesRead == bucket0Files && filesRead < totalFiles,
        s"scan read $filesRead files; bucket 0 holds $bucket0Files of $totalFiles")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")

    // end-to-end: beamSearch over the stored (bucketed) graph returns the
    // exact rows of the same search over the inline (bucketless) edges
    val qs = emb.filter(col("vec_id") % 101 === 1)
      .select(col("vec_id").as("q"), col("v").as("qv"))
    val entry = stored.agg(min(col("a")).as("id"))
    val seeds = qs.select(col("q")).crossJoin(broadcast(entry))
      .filter(col("id") =!= col("q"))
    def run(g: org.apache.spark.sql.DataFrame) =
      Vectors.beamSearch(g, emb, qs, seeds, ef = 4, rounds = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(stored) == run(stored.select(col("a"), col("b"))))
  }
}
