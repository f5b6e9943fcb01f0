package graft

import graft.operators.{Layout, TextAnalysis}
import org.apache.spark.sql.functions._

/** CCNet pipeline tiers and zone-map pruning census invariants. */
class CcnetZonemapSpec extends SparkTestBase {
  import spark.implicits._

  test("ccnetTiers: tier counts partition each language's deduped docs") {
    // 9 distinct-text docs + 1 doc that is a pure copy of doc 1's line set
    val docs = ((1 to 9).map(i =>
      (i.toLong, s"the quick brown fox number$i jumps over dog$i today fine", "en")) :+
      (10L, "the quick brown fox number1 jumps over dog1 today fine", "dup"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.ccnetTiers(docs, "doc_id", "text", 4).collect()
    // doc 10's lines are all first-claimed by doc 1 → it leaves the corpus
    assert(out.map(_.getAs[Long]("n_docs")).sum == 9L)
    // terciles partition: each (lang, tier) cell is nonempty only for
    // head/middle/tail and every doc lands in exactly one cell
    assert(out.forall(r => Set("head", "middle", "tail")(r.getAs[String]("tier"))))
    // cross-doc line dedup: the shared first/last lines ("the quick brown
    // fox", "today fine") survive only in doc 1, so doc 1 keeps all 10
    // tokens and docs 2–9 keep only their distinctive middle line (4) —
    // 10 + 8·4 = 42 surviving tokens
    assert(out.map(_.getAs[Long]("n_tokens")).sum == 42L)
  }

  test("ccnetTiers is partitioning-independent") {
    val docs = (1 to 30).map(i =>
      (i.toLong, s"word$i the and of stuff thing$i item$i value$i blob$i end$i", "x"))
      .toDF("doc_id", "text", "lang")
    val a = TextAnalysis.ccnetTiers(docs, "doc_id", "text", 4)
      .orderBy("lang", "tier").collect().toSeq
    val b = TextAnalysis.ccnetTiers(docs.repartition(7, col("text")), "doc_id", "text", 4)
      .orderBy("lang", "tier").collect().toSeq
    assert(a == b)
  }

  test("zoneMapPruningCensus: sorted layout prunes, natural layout reads everything") {
    // 40 folders × 25 objects, names cluster by folder when sorted
    val objs = (for (f <- 1 to 40; i <- 1 to 25)
      yield (f"dir/f$f%03d/obj-$i%03d", 1L)).toDF("name", "size")
    val out = Layout.zoneMapPruningCensus(objs, chunkRows = 25, topPrefixes = 5)
      .collect()
    assert(out.length == 5)
    out.foreach { r =>
      val sorted = r.getAs[Long]("chunks_sorted")
      val natural = r.getAs[Long]("chunks_natural")
      val total = r.getAs[Long]("total_chunks")
      assert(total == 40L)
      // chunk size == folder size and names sort by folder → ≤ 2 chunks
      assert(sorted <= 2L, s"sorted layout read $sorted chunks")
      // hash placement scatters the 25 objects across ~19 of 40 chunks
      // (E = 40·(1−(1−1/40)^25) ≈ 18.6) — an order more I/O than sorted
      assert(natural > sorted)
      assert(natural >= 10L, s"natural layout should read many chunks, read $natural")
    }
  }
}
