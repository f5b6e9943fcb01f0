package graft

import graft.operators.{InvertedIndex, TextAnalysis}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The stored inverted index: a BM25 probe must read only the query terms'
  * term-hash partitions (directory pruning) and return exactly what the
  * scan-side TextAnalysis.bm25 returns. */
class InvertedIndexSpec extends SparkTestBase {
  import spark.implicits._

  test("indexed BM25 prunes to the terms' partitions and matches the scan path") {
    val docs = (1 to 400).map { i =>
      val topic = if (i % 3 == 0) "vector search index" else "plain filler words"
      (i.toLong, s"doc $i about $topic with extra tokens t${i % 17} t${i % 5}")
    }.toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("inv_idx").toString + "/idx"
    InvertedIndex.writeInvertedIndex(docs, "doc_id", "text", path)

    val query = Seq("vector", "index", "filler")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (df, got) =
      try {
        val d = InvertedIndex.bm25Indexed(spark, path, query, topK = 15)
        (d, d.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
      } finally spark.conf.unset("spark.sql.adaptive.enabled")

    // pruning: the postings scan reads only the files under the query
    // terms' pt= directories
    val hs = query.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(InvertedIndex.Partitions.toLong)))
      .collect().map(_.getLong(0)).toSet
    def parquetFiles(dir: java.io.File): Int =
      Option(dir.listFiles()).toSeq.flatten.count(_.getName.endsWith(".parquet"))
    val allDirs = new java.io.File(s"$path/postings").listFiles()
      .filter(_.getName.startsWith("pt=")).toSeq
    assert(allDirs.length > hs.size, "fixture must fan out past the probe set")
    val expected = allDirs
      .filter(d => hs.contains(d.getName.stripPrefix("pt=").toLong))
      .map(parquetFiles).sum
    val scan = df.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }
      .find(_.output.exists(_.name == "tf")).get
    assert(scan.metrics("numFiles").value == expected,
      s"scan read ${scan.metrics("numFiles").value}, pruned dirs hold $expected")
    assert(expected < allDirs.map(parquetFiles).sum)

    // parity: identical (id, score) sequence as the corpus-scan BM25
    val scanSide = TextAnalysis.bm25(docs, "doc_id", "text", query, topK = 15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == scanSide)
  }

  test("terms absent from the corpus contribute nothing and break nothing") {
    val docs = Seq((1L, "alpha beta"), (2L, "alpha gamma")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("inv_idx2").toString + "/idx"
    InvertedIndex.writeInvertedIndex(docs, "doc_id", "text", path)
    val got = InvertedIndex.bm25Indexed(spark, path, Seq("beta", "zzz_missing"), 5)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }
}
