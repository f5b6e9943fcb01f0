package graft

import graft.operators.Vectors
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The stored IVF layout: vectors written partitioned by their assigned
  * list, probes resolved by directory-level partition pruning — the scan
  * must read only the probed lists' files, and results must equal the
  * assign-on-the-fly path.
  */
class IvfLayoutSpec extends SparkTestBase {

  test("stored IVF layout prunes to the probed lists and matches the inline path") {
    val emb = Tables.embeddings(spark, sfDir)
    val centroids = emb.filter(col("vec_id") % 97 === 3)
      .orderBy(col("vec_id")).limit(8)
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head.getSeq[Double](0).toSeq
    val path = java.nio.file.Files.createTempDirectory("ivf_store").toString + "/vectors"
    Vectors.writeIvfPartitioned(emb, "embedding", centroids, path)

    val nProbe = 3
    // AQE off so the executed plan is a plain tree whose scan node (and its
    // numFiles metric) is directly reachable after execution
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (stored, got) =
      try {
        val df = Vectors.ivfKnnStored(spark, path, "vec_id", "embedding",
          centroids, q, topK = 10, nProbe = nProbe)
        (df, df.collect().map(_.getAs[Long]("vec_id")).toSeq)
      } finally spark.conf.unset("spark.sql.adaptive.enabled")

    // partition pruning: the executed scan's numFiles metric must equal the
    // file count under the nProbe probed list directories alone —
    // directory-level skipping, zero I/O for the other lists
    val probes = Vectors.probeList(centroids, q, nProbe).toSet
    def parquetFiles(dir: java.io.File): Int =
      Option(dir.listFiles()).toSeq.flatten.count(_.getName.endsWith(".parquet"))
    val allDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("ivf_cid=")).toSeq
    // empty clusters materialize no directory; pruning is only meaningful
    // when more lists exist than we probe
    assert(allDirs.length > nProbe,
      s"fixture materialized ${allDirs.length} list directories")
    val expectedFiles = allDirs
      .filter(d => probes.contains(d.getName.stripPrefix("ivf_cid=").toLong))
      .map(parquetFiles).sum
    val totalFiles = allDirs.map(parquetFiles).sum
    val scan = stored.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }.head
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead == expectedFiles && filesRead < totalFiles,
      s"scan read $filesRead files; probed lists hold $expectedFiles of $totalFiles")

    // result parity with the assign-on-the-fly path
    val inline = Vectors.ivfKnn(emb, "vec_id", "embedding", centroids, q,
      topK = 10, nProbe = nProbe)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
    assert(got.nonEmpty && got == inline)
  }
}
