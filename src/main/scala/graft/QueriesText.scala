package graft

import graft.operators.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** North-star text-pipeline queries over `documents`: dedup (exact, n-gram
  * Jaccard, MinHash-LSH, SimHash, embedding-cosine) and text analysis
  * (tokens, quality, lang-id, fingerprint). The corpus has no natural
  * duplicates, so dedup queries splice in synthetic variants (doc_id +
  * 1,000,000) — the same construction in the oracle SQL.
  */
object QueriesText {

  /** Shared corpus-with-duplicates: every 3rd doc re-appears verbatim. */
  private val corpusCte =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
      |)""".stripMargin

  /** Near-dup corpus: every 5th doc re-appears with a 5-word tail appended. */
  private val nearDupCte =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |         concat(text, ' quality data pipeline tail marker') AS text
      |  FROM documents WHERE doc_id % 5 = 0
      |)""".stripMargin

  private val wordsSql = "string_split_regex(lower(trim(text)), '\\s+')"

  /** DuckDB twin of TextAnalysis.subwordVocab (topK=64, piece len 1..4,
    * word cap 16): capped distinct-word histogram `wf(w, wc)` + subword
    * vocabulary `vocab(piece, c, l)`. Shared by the WordPiece and Viterbi
    * segmentation oracles. */
  private val subwordVocabCtes =
    s"""wf AS (SELECT w, count(*) AS wc
       |  FROM (SELECT unnest($wordsSql) AS w FROM documents)
       |  WHERE len(w) BETWEEN 1 AND 16 GROUP BY w),
       |p1 AS (SELECT piece, CAST(sum(wc) AS BIGINT) AS c, 1 AS l FROM (
       |    SELECT wc, unnest(list_transform(generate_series(1, len(w)),
       |      i -> substr(w, i, 1))) AS piece FROM wf)
       |  GROUP BY piece),
       |pk AS (SELECT piece, c, l FROM (
       |    SELECT piece, CAST(sum(wc) AS BIGINT) AS c, ll AS l FROM (
       |      SELECT wc, ll, unnest(list_transform(
       |          generate_series(1, len(w) - (ll - 1)),
       |          i -> substr(w, i, ll))) AS piece
       |      FROM wf CROSS JOIN (SELECT unnest([2, 3, 4]) AS ll) lens
       |      WHERE len(w) >= ll)
       |    GROUP BY piece, ll)
       |  ORDER BY c DESC, piece LIMIT 64),
       |vocab AS (SELECT * FROM p1 UNION ALL SELECT * FROM pk)""".stripMargin

  /** DuckDB twin of [[graft.operators.Dedup.cdcChunks]] (m=8) with
    * CTE-name prefix `p` over source CTE `src` (must expose doc_id, text):
    * boundary after word i when md5(w[i-1] ' ' w[i]) ≡ 0 (mod 8), doc end
    * closes the last chunk. list_distinct SCRAMBLES order in DuckDB, so
    * both twins sort explicitly. Exposes `${p}ch(doc_id, chunk)`. */
  private def cdcChunkCtes(p: String, src: String): String =
    s"""${p}w AS (SELECT doc_id, $wordsSql AS ws FROM $src),
       |${p}bl AS (SELECT doc_id, ws, list_sort(list_distinct(list_concat(
       |    list_filter(generate_series(2, greatest(len(ws), 2)),
       |      i -> i <= len(ws)
       |        AND CAST('0x' || substr(md5(ws[i-1] || ' ' || ws[i]), 1, 15) AS BIGINT) % 8 = 0),
       |    [len(ws)]))) AS bnds FROM ${p}w),
       |${p}ch AS (SELECT doc_id,
       |    array_to_string(ws[(CASE WHEN k = 1 THEN 0 ELSE bnds[k-1] END) + 1 : bnds[k]], ' ') AS chunk
       |  FROM (SELECT doc_id, ws, bnds,
       |          unnest(generate_series(1, len(bnds))) AS k FROM ${p}bl))""".stripMargin

  /** Shared cluster-resolution CTE chain (over a `corpus` CTE): df-capped
    * shared-shingle Jaccard pairs → undirected edges → recursive
    * reachability. Twin of `Dedup.jaccardPairs(n=3, 0.5, maxDf=8)` +
    * `Dedup.resolveClusters`. Compose after a `WITH RECURSIVE corpus...`. */
  private val clusterCtes =
    s"""sh AS (SELECT doc_id AS id, list_distinct(list_transform(
       |    generate_series(1, greatest(len($wordsSql) - 2, 1)),
       |    i -> array_to_string(($wordsSql)[i:i+2], ' '))) AS shl FROM corpus),
       |e0 AS (SELECT id, unnest(shl) AS s FROM sh),
       |hot AS (SELECT s FROM e0 GROUP BY s HAVING count(*) > 8),
       |f AS (SELECT * FROM e0 WHERE s NOT IN (SELECT s FROM hot)),
       |e AS (SELECT f.id, s, n_sh FROM f
       |      JOIN (SELECT id, count(*) AS n_sh FROM f GROUP BY id) n USING (id)),
       |p AS (SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS na, b.n_sh AS nb,
       |             count(*) AS inter
       |      FROM e a JOIN e b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2, 3, 4),
       |pairs AS (SELECT id_a, id_b FROM p
       |          WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |          UNION ALL SELECT id_b, id_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach AS (SELECT id, id AS label FROM nodes
       |          UNION
       |          SELECT e.src, r.label FROM edges e JOIN reach r ON r.id = e.dst)""".stripMargin

  /** DuckDB twin of [[graft.operators.Dedup.minhashLshPairs]] (16 bands × 4
    * rows): portable md5-derived double hashing h_i = (h1 + i·h2) mod 2^60, band join on
    * slice equality (Spark joins on xxhash64 of the same slice — equality-
    * equivalent), signature-agreement estimate. The 64 min-aggregates are
    * generated here rather than hand-written. `tail` replaces the default
    * final SELECT (it may open with `, extraCte AS (...)` to extend the
    * chain — used by the split-leakage queries to consume `pairs`). */
  private def minhashOracle(corpus: String, pairFilter: String = "",
                            tail: String = ""): String = {
    // sig_i = (h1 + i·h2) mod 2^60 with FULL-width h2 (the Spark kernel's
    // wrap-and-mask, see MinHashMd5Sig). int64-safe replay: split h2 into
    // lo (54 bits) + hi (6 bits); i·h2 ≡ i·lo + ((i·hi) mod 2^6)·2^54
    // (mod 2^60), every term < 2^61 — no BIGINT overflow.
    val minExprs = (0 until 64).map(i =>
      s"min((h1 + $i*h2lo + (($i*h2hi) % 64) * 18014398509481984) " +
        s"% 1152921504606846976) AS s$i").mkString(", ")
    val sigArr = (0 until 64).map(i => s"s$i").mkString("[", ", ", "]")
    val bandArr = (0 until 16).map(b =>
      s"struct_pack(band := $b, bucket := array_to_string(sig[${b * 4 + 1}:${b * 4 + 4}], ','))")
      .mkString("[", ", ", "]")
    s"""WITH $corpus,
       |sh AS (SELECT doc_id AS id, list_distinct(list_transform(
       |    generate_series(1, greatest(len($wordsSql) - 2, 1)),
       |    i -> array_to_string(($wordsSql)[i:i+2], ' '))) AS shl FROM corpus),
       |e AS (SELECT id, unnest(shl) AS s FROM sh),
       |h AS (SELECT id, h1, h2 % 18014398509481984 AS h2lo, h2 // 18014398509481984 AS h2hi
       |      FROM (SELECT id, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h1,
       |              CAST('0x' || substr(md5(s), 17, 15) AS BIGINT) AS h2 FROM e)),
       |sig AS (SELECT id, $sigArr AS sig FROM (SELECT id, $minExprs FROM h GROUP BY id)),
       |bands AS (SELECT id, bb.band AS band, bb.bucket AS bucket
       |          FROM (SELECT id, unnest($bandArr) AS bb FROM sig)),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM bands a
       |         JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id$pairFilter),
       |est AS (SELECT c.id_a, c.id_b,
       |        round(len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) / 64.0, 6) AS est_jaccard
       |        FROM cand c JOIN sig sa ON c.id_a = sa.id JOIN sig sb ON c.id_b = sb.id),
       |pairs AS (SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5)
       |${if (tail.nonEmpty) tail
           else "SELECT id_a, id_b, est_jaccard FROM pairs ORDER BY id_a, id_b"}""".stripMargin
  }


  /** DuckDB twin of [[graft.operators.Dedup.minhashParamSweep]]: one shared
    * 64-slot signature chain, one banded candidate CTE per (bands, rows)
    * arm, each reduced to the S-curve census row. */
  private def minhashSweepOracle(corpus: String, arms: Seq[(Int, Int)]): String = {
    val minExprs = (0 until 64).map(i =>
      s"min((h1 + $i*h2lo + (($i*h2hi) % 64) * 18014398509481984) " +
        s"% 1152921504606846976) AS s$i").mkString(", ")
    val sigArr = (0 until 64).map(i => s"s$i").mkString("[", ", ", "]")
    def bandArr(b: Int, r: Int) = (0 until b).map(i =>
      s"struct_pack(band := $i, bucket := array_to_string(sig[${i * r + 1}:${i * r + r}], ','))")
      .mkString("[", ", ", "]")
    val armCtes = arms.map { case (b, r) =>
      s"""bands_${b}_$r AS (SELECT id, bb.band AS band, bb.bucket AS bucket
         |  FROM (SELECT id, unnest(${bandArr(b, r)}) AS bb FROM sig)),
         |cand_${b}_$r AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM bands_${b}_$r a
         |  JOIN bands_${b}_$r b ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
         |arm_${b}_$r AS (SELECT $b AS bands, $r AS rows_per_band,
         |    count(*) AS n_candidates,
         |    coalesce(CAST(sum(agree) AS BIGINT), 0) AS sum_agreement,
         |    coalesce(CAST(sum(CASE WHEN agree * 2 >= 64 THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_dup_pairs
         |  FROM (SELECT CAST(len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) AS BIGINT) AS agree
         |        FROM cand_${b}_$r c JOIN sig sa ON c.id_a = sa.id JOIN sig sb ON c.id_b = sb.id))""".stripMargin
    }.mkString(",\n")
    val unions = arms.map { case (b, r) => s"SELECT * FROM arm_${b}_$r" }
      .mkString("\nUNION ALL ")
    s"""WITH $corpus,
       |sh AS (SELECT doc_id AS id, list_distinct(list_transform(
       |    generate_series(1, greatest(len($wordsSql) - 2, 1)),
       |    i -> array_to_string(($wordsSql)[i:i+2], ' '))) AS shl FROM corpus),
       |e AS (SELECT id, unnest(shl) AS s FROM sh),
       |h AS (SELECT id, h1, h2 % 18014398509481984 AS h2lo, h2 // 18014398509481984 AS h2hi
       |      FROM (SELECT id, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) AS h1,
       |              CAST('0x' || substr(md5(s), 17, 15) AS BIGINT) AS h2 FROM e)),
       |sig AS (SELECT id, $sigArr AS sig FROM (SELECT id, $minExprs FROM h GROUP BY id)),
       |$armCtes
       |$unions
       |ORDER BY bands""".stripMargin
  }

  /** Deterministic train/val/test assignment, 8/1/1 by portable hash shard
    * — a narrow per-row expression (no shuffle, no RNG state), so split
    * membership survives reruns, repartitioning, and engine changes. */
  private def splitOf(id: Column): Column = {
    val b = Sampling.hashShard(id, 10, "split1")
    when(b < 8, lit("train")).when(b === 8, lit("val")).otherwise(lit("test"))
  }

  /** Train/val/test assignment over a `corpus` CTE — DuckDB twin of
    * `Sampling.hashShard(doc_id, 10, "split1")` bucketed 8/1/1. */
  private val splitCte =
    """sp AS (SELECT doc_id AS id,
      |  CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val' ELSE 'test' END AS split
      |  FROM (SELECT doc_id, CAST('0x' || substr(md5(concat('split1',
      |          CAST(doc_id AS VARCHAR))), 1, 15) AS BIGINT) % 10 AS b
      |        FROM corpus))""".stripMargin

  /** Shared fingerprint CTE chain (over a `corpus` CTE): 60-bit portable
    * SimHash fingerprints — md5-derived word hashes, signed bit sums. */
  private val simhashFpCtes: String = {
    val bitSums = (0 until 60).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j").mkString(", ")
    val fp = (0 until 60).map(j =>
      s"(CASE WHEN b$j > 0 THEN (1::BIGINT << $j) ELSE 0 END)").mkString(" + ")
    s"""w AS (SELECT doc_id AS id, unnest($wordsSql) AS w FROM corpus),
       |h AS (SELECT id, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM w),
       |bits AS (SELECT id, $bitSums FROM h GROUP BY id),
       |fp AS (SELECT id, $fp AS sim FROM bits)""".stripMargin
  }

  /** DuckDB twin of [[graft.operators.Dedup.simhashPairs]]: 4×15-bit
    * multi-block candidates (any block equal), hamming ≤ maxDist. */
  private def simhashOracle(corpus: String, maxDist: Int): String =
    s"""WITH $corpus,
       |$simhashFpCtes,
       |blk AS (SELECT id, sim, b, (sim >> (15 * b)) & 32767 AS bv
       |        FROM fp CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b)),
       |p AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b,
       |      CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
       |      FROM blk a JOIN blk b ON a.b = b.b AND a.bv = b.bv AND a.id < b.id)
       |SELECT id_a, id_b, hamming FROM p WHERE hamming <= $maxDist
       |ORDER BY id_a, id_b""".stripMargin

  /** Oracle for [[graft.operators.Dedup.simhashPairsExhaustive]]: brute-force
    * ALL-pairs hamming — no candidate structure at all. The Spark side only
    * hash-matches this if its blocked tables are exhaustive at `maxDist`,
    * which is exactly what the graded row proves. */
  private def simhashExhaustiveOracle(corpus: String, maxDist: Int): String =
    s"""WITH $corpus,
       |$simhashFpCtes
       |SELECT a.id AS id_a, b.id AS id_b,
       |       CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
       |FROM fp a JOIN fp b ON a.id < b.id
       |WHERE bit_count(xor(a.sim, b.sim)) <= $maxDist
       |ORDER BY id_a, id_b""".stripMargin

  /** Shared by `text_perplexity` (single LM join) and
    * `text_perplexity_tiered` (head-broadcast + tail join) — one oracle,
    * two topologies, identical results. */
  private val perplexityOracle: String =
    s"""WITH tok AS (SELECT doc_id AS id, unnest($wordsSql) AS w FROM documents),
       |lm AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
       |n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM lm),
       |s AS (SELECT w, CAST(round(ln(n / c), 6) AS DECIMAL(18,6)) AS surp FROM lm, n),
       |d AS (SELECT id, count(*) AS n_tokens, sum(surp) AS ssum
       |      FROM tok JOIN s USING (w) GROUP BY id)
       |SELECT id AS doc_id, n_tokens,
       |       round(CAST(ssum AS DOUBLE) / n_tokens, 6) AS mean_surprisal
       |FROM d ORDER BY doc_id""".stripMargin

  /** Generated CTE chain replaying [[TextAnalysis.bpeTrain]]'s loop: per
    * iteration k, pair counts over w{k-1}, argmax t{k} (count desc, pair
    * tiebreak), and the GREEDY left-to-right pairwise merge producing
    * w{k} — the same positional formulation as
    * [[TextAnalysis.mergePairGreedy]] (a match merges iff its offset in
    * its run of consecutive matches is even, derived from the last
    * non-match position below it). The chain carries (w, syms, wc) so
    * [[bpeTokenizeOracle]] can join the final segmenter back to the
    * corpus. */
  private def bpeChainCtes(nMerges: Int): String = {
    // positional-merge SQL over a symbol LIST column named `syms`, with
    // p1/p2/m in scope from the joined argmax row
    def matchAt(k: String) =
      s"($k >= 1 AND $k <= len(syms) - 1 AND syms[$k] = p1 AND syms[$k + 1] = p2)"
    def mergeAt(k: String) =
      s"""(${matchAt(k)} AND ($k - list_max(list_filter(generate_series(0, greatest($k, 0)),
         |      j -> j <= $k - 1 AND NOT ${matchAt("j")}))) % 2 = 1)""".stripMargin
    val mergeExpr =
      s"""CASE WHEN len(syms) < 2 THEN syms ELSE
         |  flatten(list_transform(generate_series(1, len(syms)), i ->
         |    CASE WHEN ${mergeAt("i")} THEN [m]
         |         WHEN ${mergeAt("(i - 1)")} THEN []
         |         ELSE [syms[i]] END))
         |END""".stripMargin
    val init =
      s"""tok AS (SELECT unnest($wordsSql) AS w FROM documents),
         |w0 AS (SELECT w, string_split_regex(w, '') AS syms,
         |       count(*) AS wc FROM tok GROUP BY w)""".stripMargin
    val iters = (1 to nMerges).map { k =>
      s"""p$k AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM (
         |  SELECT wc, unnest(list_transform(generate_series(1, len(syms) - 1),
         |    i -> syms[i] || ' ' || syms[i+1])) AS pair
         |  FROM w${k - 1} WHERE len(syms) >= 2) GROUP BY pair),
         |t$k AS (SELECT pair, n, string_split(pair, ' ')[1] AS p1,
         |        string_split(pair, ' ')[2] AS p2, replace(pair, ' ', '') AS m
         |        FROM p$k ORDER BY n DESC, pair LIMIT 1),
         |w$k AS (SELECT w, $mergeExpr AS syms, wc FROM w${k - 1}, t$k)""".stripMargin
    }.mkString(",\n")
    s"$init,\n$iters"
  }

  private def bpeTrainOracle(nMerges: Int): String = {
    val out = (1 to nMerges).map(k =>
      s"SELECT $k AS iter, pair, replace(pair, ' ', '') AS merged, n FROM t$k")
      .mkString("\nUNION ALL\n")
    s"WITH ${bpeChainCtes(nMerges)}\n$out\nORDER BY iter"
  }

  /** Per-doc token counts after applying the trained merges: the final
    * histogram is the segmenter, joined back to the corpus by word. */
  private def bpeTokenizeOracle(nMerges: Int): String =
    s"""WITH ${bpeChainCtes(nMerges)},
       |seg AS (SELECT w, len(syms) AS nt FROM w$nMerges),
       |td AS (SELECT doc_id AS id, unnest($wordsSql) AS w FROM documents)
       |SELECT id AS doc_id, count(*) AS n_words,
       |       CAST(sum(nt) AS BIGINT) AS n_bpe_tokens
       |FROM td JOIN seg USING (w)
       |GROUP BY id ORDER BY doc_id""".stripMargin

  def queries: Map[String, Q] = Map(

    // Exact dedup: content-hash groupBy, min-id winner.
    "dedup_exact" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 3 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
        Dedup.exactDedup(corpus, "doc_id", "text").orderBy(col("content_hash"))
      },
      oracle = Some(
        s"""WITH $corpusCte
           |SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
           |       count(*) AS n_copies
           |FROM corpus GROUP BY 1 ORDER BY content_hash""".stripMargin),
      doc = "exact dedup via content hash"),

    // Exact n-gram Jaccard near-dup pairs (shared-shingle candidate join),
    // df-capped at 8: corpus-common shingles would pair df² docs (the sf0.01
    // fixture's hottest shingle has df=100 → 4950 pairs from one key); the cap
    // drops them from the Jaccard universe before the self-join. The pair set
    // at threshold 0.5 is unchanged for this corpus (asserted in PropertySpec).
    "dedup_jaccard_pairs" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(col("text"), lit(" quality data pipeline tail marker")).as("text")))
        Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.5, maxDf = 8)
          .orderBy(col("id_a"), col("id_b"))
      },
      oracle = Some(
        s"""WITH $nearDupCte,
           |sh AS (SELECT doc_id AS id, list_distinct(list_transform(
           |    generate_series(1, greatest(len($wordsSql) - 2, 1)),
           |    i -> array_to_string(($wordsSql)[i:i+2], ' '))) AS shl FROM corpus),
           |e0 AS (SELECT id, unnest(shl) AS s FROM sh),
           |hot AS (SELECT s FROM e0 GROUP BY s HAVING count(*) > 8),
           |f AS (SELECT * FROM e0 WHERE s NOT IN (SELECT s FROM hot)),
           |e AS (SELECT f.id, s, n_sh FROM f
           |      JOIN (SELECT id, count(*) AS n_sh FROM f GROUP BY id) n USING (id)),
           |p AS (SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS na, b.n_sh AS nb,
           |             count(*) AS inter
           |      FROM e a JOIN e b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2, 3, 4),
           |j AS (SELECT id_a, id_b,
           |             round(CAST(inter AS DOUBLE) / (na + nb - inter), 6) AS jaccard
           |      FROM p)
           |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5
           |ORDER BY id_a, id_b""".stripMargin),
      doc = "n-gram Jaccard near-dup (exact, shingle-join candidates, df-capped)"),

    // MinHash-LSH near-dup pairs — approximate scale path, hash-checked:
    // signatures use portable md5-derived double hashing (Dedup.hash60).
    "dedup_minhash_lsh" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(col("text"), lit(" quality data pipeline tail marker")).as("text")))
        Dedup.minhashLshPairs(corpus, "doc_id", "text", 16, 4, 0.5)
          .orderBy(col("id_a"), col("id_b"))
      },
      oracle = Some(minhashOracle(nearDupCte)),
      doc = "MinHash+LSH near-dup (banded, sub-quadratic)"),

    // Incremental MinHash-LSH: the daily-batch shape — new docs (the %5
    // near-dup variants) dedup against the BASE corpus's persisted signature
    // table + within the batch; existing×existing pairs are never touched.
    // Oracle: the full-corpus pass restricted to pairs involving a new id —
    // provably the same set, which is exactly the incremental contract.
    "dedup_minhash_incremental" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val newDocs = d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(col("text"), lit(" quality data pipeline tail marker")).as("text"))
        val baseSigs = Dedup.minhashSignatures(
          d.select(col("doc_id"), col("text")), "doc_id", "text", 16, 4)
        Dedup.minhashLshIncremental(newDocs, "doc_id", "text", baseSigs, 16, 4, 0.5)
          .orderBy(col("id_a"), col("id_b"))
      },
      oracle = Some(minhashOracle(nearDupCte,
        " AND (a.id >= 1000000 OR b.id >= 1000000)")),
      doc = "incremental MinHash-LSH (new batch vs persisted signature table)"),

    // Bucketed-layout incremental MinHash-LSH: the corpus's banded relation
    // and signature table are WRITTEN as bucketed+sorted tables (the 100 TB
    // storage layout) and the incremental join runs against them with no
    // corpus-side shuffle. Same oracle as dedup_minhash_incremental — the
    // hash-match proves the layout change is result-invariant.
    "dedup_minhash_lsh_bucketed" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val newDocs = d.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(col("text"), lit(" quality data pipeline tail marker")).as("text"))
        // build-if-absent: the layout CTAS is the one-time storage cost;
        // Bench pre-builds it in the untimed fixture phase so the timed
        // line measures the incremental PROBE (the recurring daily cost)
        Dedup.ensureSignatureTables(s, Dedup.minhashSignatures(
          d.select(col("doc_id"), col("text")), "doc_id", "text", 16, 4),
          "mh_corpus", numBuckets = 16)
        Dedup.minhashLshIncrementalBucketed(newDocs, "doc_id", "text",
          "mh_corpus", 16, 4, 0.5)
          .orderBy(col("id_a"), col("id_b"))
      },
      oracle = Some(minhashOracle(nearDupCte,
        " AND (a.id >= 1000000 OR b.id >= 1000000)")),
      doc = "incremental MinHash-LSH over bucketed signature tables (corpus-shuffle-free)"),

    // Sketch-calibration audit: for EVERY LSH candidate pair (threshold 0),
    // the MinHash agreement count (of 64) against the EXACT shingle-set
    // overlap, censused per agreement level — the production check that the
    // banded estimator tracks ground truth before a threshold is trusted at
    // corpus scale. Entirely integer outputs (agreement, Σ|∩|, Σ|∪|); the
    // exact side rides the candidate pairs (Dedup.exactJaccardFor), never a
    // corpus-scale pairwise pass.
    "dedup_minhash_calibration" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        // three overlap regimes so the census has levels to calibrate:
        // near-identical (+tail marker, J≈0.95), half-documents (J≈0.5 —
        // ~64% band-collide at b=16,r=4), and the untouched corpus
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(col("text"), lit(" quality data pipeline tail marker")).as("text")))
          .unionByName(d.filter(col("doc_id") % 7 === 1)
            .withColumn("w", split(lower(trim(col("text"))), "\\s+"))
            .select((col("doc_id") + 2000000).as("doc_id"),
              expr("array_join(slice(w, 1, greatest(size(w) div 2, 3)), ' ')").as("text")))
        val cand = Dedup.minhashLshPairs(corpus, "doc_id", "text", 16, 4, 0.0)
          .select(col("id_a"), col("id_b"),
            round(col("est_jaccard") * 64).cast("long").as("s_agree"))
        Dedup.exactJaccardFor(cand, corpus, "doc_id", "text", 3)
          .groupBy(col("s_agree"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("n_inter")).as("total_inter"),
            sum(col("n_union")).as("total_union"))
          .orderBy(col("s_agree"))
      },
      oracle = Some(minhashOracle(
        s"""corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id,
           |         concat(text, ' quality data pipeline tail marker') AS text
           |  FROM documents WHERE doc_id % 5 = 0
           |  UNION ALL
           |  SELECT doc_id + 2000000 AS doc_id,
           |         array_to_string(($wordsSql)[1:greatest(len($wordsSql)//2, 3)], ' ') AS text
           |  FROM documents WHERE doc_id % 7 = 1
           |)""".stripMargin, tail =
        """, x AS (SELECT e.id_a, e.id_b,
          |    CAST(round(e.est_jaccard * 64) AS BIGINT) AS s_agree,
          |    len(list_intersect(a.shl, b.shl)) AS n_inter,
          |    len(a.shl) + len(b.shl) - len(list_intersect(a.shl, b.shl)) AS n_union
          |  FROM est e JOIN sh a ON e.id_a = a.id JOIN sh b ON e.id_b = b.id)
          |SELECT s_agree, count(*) AS n_pairs,
          |  CAST(sum(n_inter) AS BIGINT) AS total_inter,
          |  CAST(sum(n_union) AS BIGINT) AS total_union
          |FROM x GROUP BY s_agree ORDER BY s_agree""".stripMargin)),
      doc = "MinHash-vs-exact calibration census over all LSH candidates (integer ground-truth audit)"),

    // b-bit minwise hashing (Li & König, CACM'11): store only the LOWEST b
    // bits of each minhash slot — at b=2 the 64-slot signature drops from
    // 512 bytes to 16, a 32× cut in the signature table every 100 TB dedup
    // pass scans and shuffles. Matching on truncated slots inflates
    // agreement by chance collisions (C = 2^-b), so the unbiased estimator
    // rescales: Ĵ_b = (P_b − C)/(1 − C). Graded per LSH candidate pair:
    // integer full-width and b-bit agreement counts side by side, plus both
    // estimators — the audit a pipeline runs before trusting the 32×
    // cheaper signatures at corpus scale. The b-bit compare is a zip-fold
    // over the already-joined signatures (no extra shuffle over the
    // full-width pass).
    "dedup_minhash_bbit" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(col("text"), lit(" quality data pipeline tail marker")).as("text")))
        val sigs = Dedup.minhashSignatures(corpus, "doc_id", "text", 16, 4)
        Dedup.minhashLshPairs(corpus, "doc_id", "text", 16, 4, 0.0)
          .select(col("id_a"), col("id_b"))
          .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
          .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            graft.functions.VectorExprs.sigAgreement(col("sig_a"), col("sig_b"))
              .cast("long").as("agree_full"),
            aggregate(zip_with(col("sig_a"), col("sig_b"),
                (x, y) => when(x % 4 === y % 4, 1L).otherwise(0L)),
              lit(0L), (acc, v) => acc + v).as("agree_b2"))
          .withColumn("est_full", round(col("agree_full").cast("double") / 64.0, 6) + 0.0)
          .withColumn("est_b2",
            round((col("agree_b2").cast("double") / 64.0 - 0.25) / 0.75, 6) + 0.0)
          .orderBy(col("id_a"), col("id_b"))
      },
      oracle = Some(minhashOracle(nearDupCte, tail =
        """, x AS (SELECT c.id_a, c.id_b,
          |    CAST(len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] = z[2])) AS BIGINT) AS agree_full,
          |    CAST(len(list_filter(list_zip(sa.sig, sb.sig), z -> z[1] % 4 = z[2] % 4)) AS BIGINT) AS agree_b2
          |  FROM cand c JOIN sig sa ON c.id_a = sa.id JOIN sig sb ON c.id_b = sb.id)
          |SELECT id_a, id_b, agree_full, agree_b2,
          |  round(CAST(agree_full AS DOUBLE) / 64.0, 6) + 0.0 AS est_full,
          |  round((CAST(agree_b2 AS DOUBLE) / 64.0 - 0.25) / 0.75, 6) + 0.0 AS est_b2
          |FROM x ORDER BY id_a, id_b""".stripMargin)),
      doc = "b-bit minwise hashing (Li-Konig): 2-bit signature agreement + unbiased estimator vs full-width, per LSH candidate pair"),

    // SimHash near-dup pairs — hash-checked (portable 60-bit fingerprints).
    "dedup_simhash" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(col("text"), lit(" quality data pipeline tail marker")).as("text")))
        Dedup.simhashPairs(corpus, "doc_id", "text", 16)
          .orderBy(col("id_a"), col("id_b"))
      },
      oracle = Some(simhashOracle(nearDupCte, 16)),
      doc = "SimHash near-dup (blocked hamming)"),

    // Manku exhaustive SimHash: 6 blocks (maxDist+1), provably complete at
    // hamming <= 5 by pigeonhole. The oracle is BRUTE-FORCE all-pairs with no
    // candidate structure — the hash-match is the exhaustiveness proof.
    "dedup_simhash_manku" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(col("text"), lit(" quality data pipeline tail marker")).as("text")))
        Dedup.simhashPairsExhaustive(corpus, "doc_id", "text", 5)
          .orderBy(col("id_a"), col("id_b"))
      },
      oracle = Some(simhashExhaustiveOracle(nearDupCte, 5)),
      doc = "SimHash exhaustive blocked candidates (Manku WWW'07 §3) vs brute-force oracle"),

    // Corpus data-card statistics: the one-query summary every dataset
    // release ships — doc/token counts, language mix, quality-gate pass
    // rate, exact-dup rate, length quantiles. One scan + tiny aggregates;
    // decimal casts keep the sums order-free.
    "pipeline_corpus_stats" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val enriched = d.select(col("doc_id"), col("lang"), col("n_chars"),
          size(Dedup.words(col("text"))).cast("long").as("n_words"),
          TextAnalysis.c4Keep(col("text")).as("keep"),
          md5(col("text")).as("h"))
        // combining two SINGLE-ROW aggregates: the nested-loop join this
        // compiles to is 1x1 by construction — the one shape where a
        // cartesian is the correct plan (constant keys fold away anyway)
        val dups = enriched.groupBy(col("h")).agg(count(lit(1)).as("c"))
          .agg(sum(when(col("c") > 1, col("c"))).as("_dup"))
          .select(coalesce(col("_dup"), lit(0L)).as("n_dup_docs"))
        enriched.agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars"),
          countDistinct(col("lang")).as("n_langs"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
          min(col("n_words")).cast("long").as("min_words"),
          max(col("n_words")).cast("long").as("max_words"))
          .crossJoin(dups)
      },
      oracle = Some(
        s"""WITH e AS (SELECT doc_id, lang, n_chars,
           |    CAST(len($wordsSql) AS BIGINT) AS n_words,
           |    (len($wordsSql) BETWEEN 10 AND 100000)
           |      AND (CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len($wordsSql)
           |        BETWEEN 3.0 AND 10.0)
           |      AND NOT contains(lower(text), 'lorem ipsum')
           |      AND NOT contains(text, '{')
           |      AND NOT list_contains($wordsSql, 'javascript')
           |      AND (length(text) - length(replace(text, '#', ''))) * 20 <= len($wordsSql)
           |      AND len(list_filter($wordsSql, x -> regexp_matches(x, '[a-z]'))) * 5 >= len($wordsSql) * 4
           |      AND len(list_filter($wordsSql, x -> x IN ('the','a','and','of','to','in','is','for','on','with'))) >= 2
           |      AS keep,
           |    md5(text) AS h
           |  FROM documents),
           |dups AS (SELECT COALESCE(CAST(sum(CASE WHEN c > 1 THEN c END) AS BIGINT), 0) AS n_dup_docs
           |  FROM (SELECT h, count(*) AS c FROM e GROUP BY h))
           |SELECT count(*) AS n_docs,
           |       CAST(sum(n_words) AS BIGINT) AS n_tokens,
           |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
           |       count(DISTINCT lang) AS n_langs,
           |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           |       min(n_words) AS min_words, max(n_words) AS max_words,
           |       (SELECT n_dup_docs FROM dups) AS n_dup_docs
           |FROM e""".stripMargin),
      doc = "corpus data-card statistics (docs/tokens/langs/quality/dup rate, one scan)"),

    // Benchmark decontamination (GPT-3 appendix C): training docs sharing
    // any 13-gram with the eval benchmark. Benchmark = 20-word middle slices
    // of every 17th doc, so overlap is partial and synthesized from the
    // corpus itself. Spark joins 64-bit shingle hashes (codegen, broadcast
    // benchmark); the oracle joins the strings — counts agree because both
    // sides count DISTINCT shared grams.
    "text_contamination" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val bench = d.filter(col("doc_id") % 17 === 0)
          .select(col("doc_id").as("bench_id"),
            array_join(slice(Dedup.words(col("text")), 3, 20), " ").as("text"))
        Dedup.contamination(d, "doc_id", "text", bench, "bench_id", "text", 13)
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        s"""WITH bench AS (SELECT doc_id AS bench_id,
           |    array_to_string(($wordsSql)[3:22], ' ') AS btext
           |  FROM documents WHERE doc_id % 17 = 0),
           |tsh AS (SELECT doc_id, unnest(list_distinct(list_transform(
           |    generate_series(1, greatest(len($wordsSql) - 12, 1)),
           |    i -> array_to_string(($wordsSql)[i:i+12], ' ')))) AS s FROM documents),
           |bw AS (SELECT bench_id,
           |    string_split_regex(lower(trim(btext)), '\\s+') AS w2 FROM bench),
           |bsh AS (SELECT bench_id, unnest(list_distinct(list_transform(
           |    generate_series(1, greatest(len(w2) - 12, 1)),
           |    i -> array_to_string(w2[i:i+12], ' ')))) AS s FROM bw)
           |SELECT doc_id, count(DISTINCT t.s) AS n_shared_ngrams,
           |       count(DISTINCT bench_id) AS n_bench_docs
           |FROM tsh t JOIN bsh b ON t.s = b.s
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "benchmark decontamination: 13-gram overlap vs eval set (broadcast probe)"),

    // C4-style cross-document line dedup: duplicated lines keep only their
    // first occurrence; per-doc census of total/kept/duplicated lines. The
    // arg-min keeper is a single int64 aggregate — skew-proof for
    // boilerplate lines repeated millions of times.
    "text_line_dedup" -> Q(
      fn = (s, dir) =>
        TextAnalysis.lineDedupStats(Tables.documents(s, dir), "doc_id", "text", 4)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id")),
      oracle = Some(
        s"""WITH d AS (SELECT doc_id AS id, $wordsSql AS ws FROM documents),
           |l0 AS (SELECT id, unnest(list_transform(
           |    generate_series(0, CAST(floor((len(ws) + 3) / 4) AS INT) - 1),
           |    i -> struct_pack(line_no := i, line := array_to_string(ws[i*4+1 : i*4+4], ' ')))) AS u
           |  FROM d),
           |l AS (SELECT id, CAST(u.line_no AS BIGINT) AS line_no, u.line AS line FROM l0),
           |w AS (SELECT line, min(id * 4294967296 + line_no) AS keep_key, count(*) AS occ
           |      FROM l GROUP BY line)
           |SELECT id AS doc_id, count(*) AS n_lines,
           |       CAST(sum(CASE WHEN id * 4294967296 + line_no = keep_key THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           |       CAST(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_dup_group
           |FROM l JOIN w USING (line)
           |GROUP BY id ORDER BY doc_id""".stripMargin),
      doc = "C4-style cross-doc line dedup census (first occurrence wins)"),

    // Exact heavy-hitter tokens (share >= 1/1000): Misra-Gries candidate
    // pass + exact verification — the oracle is the full groupBy+HAVING,
    // so the hash-match proves the two-pass pruning loses nothing and
    // invents nothing (the MG superset guarantee, exercised for real).
    "text_heavy_hitters" -> Q(
      fn = (s, dir) => {
        val tok = Tables.documents(s, dir)
          .select(explode(TextAnalysis.words(col("text"))).as("item"))
        TextAnalysis.heavyHitters(tok, "item", 1000)
          .orderBy(col("cnt").desc, col("item"))
      },
      oracle = Some(
        s"""WITH tok AS (SELECT unnest($wordsSql) AS item FROM documents),
           |n AS (SELECT count(*) AS n FROM tok)
           |SELECT item, count(*) AS cnt FROM tok, n
           |GROUP BY item, n.n HAVING count(*) * 1000 >= n.n
           |ORDER BY cnt DESC, item""".stripMargin),
      doc = "exact heavy hitters via Misra-Gries candidates + exact verify (no full-vocab shuffle)"),

    // Train/val/test hygiene: deterministic hash-split assignment (8/1/1
    // via the portable md5 shard — rerun- and engine-stable) + a near-dup
    // LEAKAGE census across split boundaries, the eval-contamination check
    // every corpus release runs before shipping. Reuses the MinHash-LSH
    // pair engine; a census cell is an UNORDERED split pair (least/greatest
    // normalization) so the count is independent of pair id-ordering.
    "split_leakage_audit" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(col("text"), lit(" quality data pipeline tail marker")).as("text")))
        val sp = corpus.select(col("doc_id").as("id"), splitOf(col("doc_id")).as("split"))
        Dedup.minhashLshPairs(corpus, "doc_id", "text", 16, 4, 0.5)
          .join(sp.select(col("id").as("id_a"), col("split").as("sa")), Seq("id_a"))
          .join(sp.select(col("id").as("id_b"), col("split").as("sb")), Seq("id_b"))
          .select(least(col("sa"), col("sb")).as("split_x"),
            greatest(col("sa"), col("sb")).as("split_y"))
          .groupBy(col("split_x"), col("split_y"))
          .agg(count(lit(1)).as("n_pairs"))
          .withColumn("is_cross", when(col("split_x") =!= col("split_y"), 1).otherwise(0))
          .orderBy(col("split_x"), col("split_y"))
      },
      oracle = Some(minhashOracle(nearDupCte, tail = s""",
$splitCte
SELECT split_x, split_y, count(*) AS n_pairs,
       CASE WHEN split_x <> split_y THEN 1 ELSE 0 END AS is_cross
FROM (SELECT least(sa.split, sb.split) AS split_x,
             greatest(sa.split, sb.split) AS split_y
      FROM pairs p JOIN sp sa ON p.id_a = sa.id JOIN sp sb ON p.id_b = sb.id)
GROUP BY split_x, split_y ORDER BY split_x, split_y""")),
      doc = "near-dup leakage census across train/val/test hash-split boundaries"),

    // The actionable artifact behind the census: WHICH eval-side documents
    // are contaminated — every val/test doc with a near-dup in train, with
    // its train-dup count. Pairs are undirected, so each pair explodes to
    // both orientations in ONE pass (no union-rescan of the pair engine).
    "split_leaked_eval_docs" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(col("text"), lit(" quality data pipeline tail marker")).as("text")))
        val sp = corpus.select(col("doc_id").as("id"), splitOf(col("doc_id")).as("split"))
        Dedup.minhashLshPairs(corpus, "doc_id", "text", 16, 4, 0.5)
          .select(explode(array(
            struct(col("id_a").as("eid"), col("id_b").as("tid")),
            struct(col("id_b").as("eid"), col("id_a").as("tid")))).as("u"))
          .select(col("u.eid").as("eid"), col("u.tid").as("tid"))
          .join(sp.select(col("id").as("eid"), col("split").as("esplit")), Seq("eid"))
          .join(sp.select(col("id").as("tid"), col("split").as("tsplit")), Seq("tid"))
          .filter(col("esplit").isin("val", "test") && col("tsplit") === "train")
          .groupBy(col("eid").as("id"), col("esplit").as("split"))
          .agg(count(lit(1)).as("n_train_dups"))
          .orderBy(col("id"))
      },
      oracle = Some(minhashOracle(nearDupCte, tail = s""",
$splitCte
SELECT e.id AS id, e.split AS split, count(*) AS n_train_dups
FROM (SELECT id_a AS eid, id_b AS tid FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs) u
JOIN sp e ON u.eid = e.id JOIN sp t ON u.tid = t.id
WHERE e.split IN ('val', 'test') AND t.split = 'train'
GROUP BY e.id, e.split ORDER BY e.id""")),
      doc = "contaminated eval docs: val/test rows with a train-side near-dup"),

    // The web-corpus capstone: the three cleanup stages a crawl pipeline
    // runs BEFORE content dedup, composed end-to-end — URL-canonical dedup
    // (first occurrence per resource wins), within-host boilerplate
    // removal on the survivors, then a token-count quality gate on the
    // CLEANED text. Per-host census of the funnel. Each stage is graded
    // green in isolation (url_canonical_dedup, text_boilerplate_removal);
    // this row certifies their composition.
    "pipeline_web_corpus" -> Q(
      fn = (s, dir) => {
        val id = col("doc_id")
        val hostS = (id % 25).cast("string")
        val raw = concat(
          when(id % 3 === 0, "http://").otherwise("https://"),
          when(id % 2 === 0, "WWW.").otherwise(""),
          lit("h"), hostS, lit(".com"),
          when(id % 4 === 0, ":443").otherwise(""),
          lit("/a/"), (id % 100).cast("string"),
          when(id % 5 === 0, "/").otherwise(""),
          when(id % 2 === 0, "?b=2&a=1&utm_source=feed").otherwise("?a=1&b=2"))
        val base = Tables.documents(s, dir).select(id,
            concat(lit("h"), hostS).as("host"), raw.as("raw_url"),
            concat(lit("cookie notice for h"), hostS,
              lit(" click accept to continue "), col("text")).as("text"))
          .withColumn("canonical_url",
            graft.functions.PathFns.canonicalizeUrl(col("raw_url")))
        graft.operators.CacheOnce.pin(base)
        base.count() // both the winner relation and the probe read it
        val winners = base.groupBy(col("canonical_url"))
          .agg(min(col("doc_id")).as("doc_id"))
        val surv = base.join(winners.select(col("doc_id")), Seq("doc_id"), "left_semi")
        graft.operators.CacheOnce.pin(surv)
        val cleaned = TextAnalysis.boilerplateRemoval(surv, "doc_id", "host", "text", 4, 3)
          .withColumnRenamed("id", "doc_id")
        val gated = cleaned
          .withColumn("toks", when(col("kept_text") === "", lit(0L))
            .otherwise(size(TextAnalysis.words(col("kept_text"))).cast("long")))
          .filter(col("toks") >= 80)
          .join(surv.select(col("doc_id"), col("host")), Seq("doc_id"))
        val c1 = base.groupBy(col("host")).agg(count(lit(1)).as("n_candidates"))
        val c2 = surv.groupBy(col("host")).agg(count(lit(1)).as("n_after_url"))
        val c3 = gated.groupBy(col("host"))
          .agg(count(lit(1)).as("n_kept"), sum(col("toks")).as("tokens_kept"))
        c1.join(c2, Seq("host"), "left").join(c3, Seq("host"), "left")
          .select(col("host"), col("n_candidates"),
            coalesce(col("n_after_url"), lit(0L)).as("n_after_url"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("tokens_kept"), lit(0L)).as("tokens_kept"))
          .orderBy(col("host"))
      },
      oracle = Some(
        s"""WITH r AS (SELECT doc_id, 'h' || (doc_id % 25) AS host,
           |    (CASE WHEN doc_id % 3 = 0 THEN 'http://' ELSE 'https://' END)
           |    || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)
           |    || 'h' || (doc_id % 25) || '.com'
           |    || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
           |    || '/a/' || (doc_id % 100)
           |    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
           |    || (CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1&utm_source=feed' ELSE '?a=1&b=2' END) AS raw_url,
           |    concat('cookie notice for h', (doc_id % 25),
           |           ' click accept to continue ', text) AS text
           |  FROM documents),
           |s2 AS (SELECT *, regexp_extract(raw_url, '^([^?]*)', 1) AS base,
           |         regexp_extract(raw_url, '\\?(.*)$$', 1) AS q FROM r),
           |s3 AS (SELECT *, lower(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1))
           |         || regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(.*)$$', 1) AS la FROM s2),
           |s4 AS (SELECT *, regexp_replace(regexp_replace(la, '^(https?://)www\\.', '\\1'),
           |                                ':(80|443)(/|$$)', '\\2') AS np FROM s3),
           |s5 AS (SELECT *, CASE WHEN regexp_matches(np, '^https?://[^/]*$$') THEN np
           |              ELSE regexp_replace(np, '/+$$', '') END AS ns FROM s4),
           |s6 AS (SELECT *, array_to_string(list_sort(list_filter(string_split(q, '&'),
           |         p -> NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)=') AND p != '')), '&') AS qc
           |       FROM s5),
           |c AS (SELECT doc_id, host, text,
           |        CASE WHEN qc = '' THEN ns ELSE ns || '?' || qc END AS canonical_url FROM s6),
           |wnr AS (SELECT min(doc_id) AS doc_id FROM c GROUP BY canonical_url),
           |surv AS (SELECT c.* FROM c JOIN wnr USING (doc_id)),
           |wl AS (SELECT doc_id, host, $wordsSql AS ws FROM surv),
           |l0 AS (SELECT doc_id, host, unnest(list_transform(
           |    generate_series(0, CAST(floor((len(ws) + 3) / 4) AS INT) - 1),
           |    i -> struct_pack(line_no := i, line := array_to_string(ws[i*4+1 : i*4+4], ' ')))) AS u
           |  FROM wl),
           |l AS (SELECT doc_id, host, CAST(u.line_no AS BIGINT) AS line_no, u.line AS line FROM l0),
           |b AS (SELECT host, line FROM (SELECT host, line, count(DISTINCT doc_id) AS docs
           |                              FROM l GROUP BY host, line) WHERE docs >= 3),
           |m AS (SELECT l.doc_id, l.line_no, l.line, b.line IS NOT NULL AS is_boiler
           |      FROM l LEFT JOIN b ON l.host = b.host AND l.line = b.line),
           |k AS (SELECT doc_id, coalesce(array_to_string(
           |        list(line ORDER BY line_no) FILTER (WHERE NOT is_boiler), ' '), '') AS kept_text
           |      FROM m GROUP BY doc_id),
           |g AS (SELECT doc_id, CASE WHEN kept_text = '' THEN 0
           |        ELSE len(string_split_regex(lower(trim(kept_text)), '\\s+')) END AS toks FROM k),
           |g2 AS (SELECT surv.host, g.toks FROM g JOIN surv USING (doc_id) WHERE g.toks >= 80),
           |cen1 AS (SELECT host, count(*) AS n_candidates FROM r GROUP BY host),
           |cen2 AS (SELECT host, count(*) AS n_after_url FROM surv GROUP BY host),
           |cen3 AS (SELECT host, count(*) AS n_kept, CAST(sum(toks) AS BIGINT) AS tokens_kept
           |         FROM g2 GROUP BY host)
           |SELECT cen1.host, cen1.n_candidates,
           |       coalesce(cen2.n_after_url, 0) AS n_after_url,
           |       coalesce(cen3.n_kept, 0) AS n_kept,
           |       coalesce(cen3.tokens_kept, 0) AS tokens_kept
           |FROM cen1 LEFT JOIN cen2 USING (host) LEFT JOIN cen3 USING (host)
           |ORDER BY host""".stripMargin),
      doc = "web-corpus funnel: URL dedup -> boilerplate removal -> quality gate, per-host census"),

    // URL-level dedup (C4's first dedup pass happens on URLs, before any
    // content work): deterministic messy URLs — case-shuffled schemes,
    // www., default ports, trailing slashes, shuffled + tracking query
    // params, fragments — must collapse to one canonical identity per
    // resource. Hash-checking the canonical strings certifies every
    // normalization step byte-for-byte.
    "url_canonical_dedup" -> Q(
      fn = (s, dir) => {
        val id = col("doc_id")
        val raw = concat(
          when(id % 3 === 0, "http://").when(id % 3 === 1, "HTTPS://").otherwise("https://"),
          when(id % 2 === 0, "WWW.").otherwise(""),
          lit("ex"), (id % 50).cast("string"), lit(".com"),
          when(id % 4 === 0, ":443").otherwise(""),
          lit("/a/"), (id % 100).cast("string"),
          when(id % 5 === 0, "/").otherwise(""),
          when(id % 2 === 0, "?b=2&a=1&utm_source=feed").otherwise("?a=1&b=2"),
          when(id % 7 === 0, "#frag").otherwise(""))
        Tables.documents(s, dir)
          .select(id, raw.as("raw_url"),
            graft.functions.PathFns.canonicalizeUrl(raw).as("canonical_url"))
          .groupBy(col("canonical_url"))
          .agg(count(lit(1)).as("n_requests"),
            countDistinct(col("raw_url")).as("n_variants"),
            min(id).as("first_doc"))
          .orderBy(col("canonical_url"))
      },
      oracle = Some(
        """WITH r AS (SELECT doc_id,
          |    (CASE WHEN doc_id % 3 = 0 THEN 'http://' WHEN doc_id % 3 = 1 THEN 'HTTPS://' ELSE 'https://' END)
          |    || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)
          |    || 'ex' || (doc_id % 50) || '.com'
          |    || (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END)
          |    || '/a/' || (doc_id % 100)
          |    || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
          |    || (CASE WHEN doc_id % 2 = 0 THEN '?b=2&a=1&utm_source=feed' ELSE '?a=1&b=2' END)
          |    || (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS raw_url
          |  FROM documents),
          |s1 AS (SELECT doc_id, raw_url, regexp_replace(raw_url, '#.*$', '') AS nf FROM r),
          |s2 AS (SELECT doc_id, raw_url,
          |         regexp_extract(nf, '^([^?]*)', 1) AS base,
          |         regexp_extract(nf, '\?(.*)$', 1) AS q FROM s1),
          |s3 AS (SELECT doc_id, raw_url, q,
          |         lower(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)', 1))
          |           || regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(.*)$', 1) AS la
          |       FROM s2),
          |s4 AS (SELECT doc_id, raw_url, q,
          |         regexp_replace(regexp_replace(la, '^(https?://)www\.', '\1'),
          |                        ':(80|443)(/|$)', '\2') AS np FROM s3),
          |s5 AS (SELECT doc_id, raw_url, q,
          |         CASE WHEN regexp_matches(np, '^https?://[^/]*$') THEN np
          |              ELSE regexp_replace(np, '/+$', '') END AS ns FROM s4),
          |s6 AS (SELECT doc_id, raw_url, ns,
          |         array_to_string(list_sort(list_filter(string_split(q, '&'),
          |           p -> NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)=') AND p != '')), '&') AS qc
          |       FROM s5),
          |c AS (SELECT doc_id, raw_url,
          |        CASE WHEN qc = '' THEN ns ELSE ns || '?' || qc END AS canonical_url FROM s6)
          |SELECT canonical_url, count(*) AS n_requests,
          |       count(DISTINCT raw_url) AS n_variants, min(doc_id) AS first_doc
          |FROM c GROUP BY canonical_url ORDER BY canonical_url""".stripMargin),
      doc = "URL canonicalization + URL-level dedup (scheme/www/port/slash/param-order/tracking/fragment)"),

    // Winnowing fingerprints (MOSS): per-doc selected-min gram hashes with
    // the w+k-1 shared-run guarantee. The oracle recomputes the SAME
    // md5-60-bit hashes and the same window minima in DuckDB list ops —
    // hash-matching the full fingerprint arrays certifies the selection
    // (order by hash VALUE, the part a non-portable hash would break).
    "text_winnowing" -> Q(
      // graded surface carries the fingerprint set as a CSV string, not a
      // LIST column — the driver's checker sorts graded columns through
      // pandas, which cannot hash numpy arrays (r6 err); the string form
      // hash-certifies the same selected set byte-for-byte
      fn = (s, dir) =>
        TextAnalysis.winnowingFingerprints(Tables.documents(s, dir), "doc_id", "text", 4, 5)
          .withColumn("fingerprints", array_join(col("fingerprints"), ","))
          .orderBy(col("doc_id")),
      oracle = Some(
        s"""WITH d AS (SELECT doc_id, $wordsSql AS ws FROM documents),
           |g AS (SELECT doc_id, list_transform(
           |    generate_series(1, greatest(len(ws) - 3, 1)),
           |    i -> CAST('0x' || substr(md5(array_to_string(ws[i:i+3], ' ')), 1, 15) AS BIGINT)) AS gh
           |  FROM d)
           |SELECT doc_id, CAST(len(gh) AS BIGINT) AS n_grams,
           |  CAST(len(list_sort(list_distinct(list_transform(
           |    generate_series(1, greatest(len(gh) - 4, 1)),
           |    j -> list_min(gh[j:j+4]))))) AS BIGINT) AS n_fingerprints,
           |  array_to_string(list_sort(list_distinct(list_transform(
           |    generate_series(1, greatest(len(gh) - 4, 1)),
           |    j -> list_min(gh[j:j+4])))), ',') AS fingerprints
           |FROM g ORDER BY doc_id""".stripMargin),
      doc = "winnowing fingerprints (MOSS): min-hash-per-window selection, density 2/(w+1)"),

    // Within-host boilerplate removal (WET/CCNet chrome cleanup — distinct
    // from text_line_dedup's global first-occurrence rule: boilerplate has
    // NO survivor). Each host's spliced cookie-banner header (2 aligned
    // 4-word lines, host token inside so it never crosses hosts) must
    // vanish from every one of its docs; content lines survive untouched.
    // Hash-checking the rebuilt text certifies the df threshold, the
    // within-host scoping, and line-order reconstruction.
    "text_boilerplate_removal" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"),
          concat(lit("h"), (col("doc_id") % 25).cast("string")).as("host"),
          concat(lit("cookie notice for h"), (col("doc_id") % 25).cast("string"),
            lit(" click accept to continue "), col("text")).as("text"))
        TextAnalysis.boilerplateRemoval(d, "doc_id", "host", "text", 4, minDocs = 3)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        s"""WITH d AS (SELECT doc_id, 'h' || (doc_id % 25) AS host,
           |             concat('cookie notice for h', (doc_id % 25),
           |                    ' click accept to continue ', text) AS text
           |           FROM documents),
           |w AS (SELECT doc_id, host, $wordsSql AS ws FROM d),
           |l0 AS (SELECT doc_id, host, unnest(list_transform(
           |    generate_series(0, CAST(floor((len(ws) + 3) / 4) AS INT) - 1),
           |    i -> struct_pack(line_no := i, line := array_to_string(ws[i*4+1 : i*4+4], ' ')))) AS u
           |  FROM w),
           |l AS (SELECT doc_id, host, CAST(u.line_no AS BIGINT) AS line_no, u.line AS line FROM l0),
           |b AS (SELECT host, line FROM (SELECT host, line, count(DISTINCT doc_id) AS docs
           |                              FROM l GROUP BY host, line) WHERE docs >= 3),
           |m AS (SELECT l.doc_id, l.line_no, l.line, b.line IS NOT NULL AS is_boiler
           |      FROM l LEFT JOIN b ON l.host = b.host AND l.line = b.line)
           |SELECT doc_id, count(*) AS n_lines,
           |  CAST(sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler_lines,
           |  coalesce(array_to_string(list(line ORDER BY line_no) FILTER (WHERE NOT is_boiler), ' '), '')
           |    AS kept_text
           |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "within-host boilerplate removal (chrome lines on >= minDocs docs of a host)"),

    // Embedding-cosine near-dup: exact duplicates spliced in at vec_id+100000.
    // LSH-bucketed (4 seeded hyperplanes → 16 sign buckets): the self-join key
    // is the bucket, so no all-pairs/constant-key join exists in the plan —
    // the 100 TB shape. The oracle recomputes identical buckets from the same
    // seeded planes as SQL literals (the v3_ann_lsh technique); exact-vs-
    // bucketed recall is asserted in DedupVectorsSpec.
    "dedup_embedding_cosine" -> Q(
      fn = (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val corpus = e.select(col("vec_id"), col("embedding"))
          .unionByName(e.filter(col("vec_id") % 10 === 0)
            .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
        Dedup.embeddingNearDupPairs(corpus, "vec_id", "embedding", 0.9,
          lshPlanes = 4, dim = 64)
          .orderBy(col("id_a"), col("id_b"))
      },
      oracle = Some(
        s"""WITH corpus AS (
           |  SELECT vec_id, embedding FROM embeddings
           |  UNION ALL
           |  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
           |v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS emb FROM corpus),
           |bk AS (SELECT id, emb,
           |  ${QueriesVector.lshBucketSql("emb", 4, 64)} AS bucket FROM v),
           |p AS (SELECT a.id AS id_a, b.id AS id_b,
           |  round(list_sum(list_transform(list_zip(a.emb, b.emb), z -> z[1]*z[2]))
           |   / (sqrt(list_sum(list_transform(a.emb, x -> x*x)))
           |    * sqrt(list_sum(list_transform(b.emb, x -> x*x)))), 6) AS cos_sim
           |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.id < b.id)
           |SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.9
           |ORDER BY id_a, id_b""".stripMargin),
      doc = "embedding-cosine near-dup pairs (LSH-bucketed scale path)"),

    // Duplicated n-gram spans (Lee et al. exact-substring-dedup signal):
    // per-doc fraction of distinct 20-grams that also appear elsewhere in
    // the corpus. The %5-spliced near-dups are caught with dup_ratio near
    // 1.0 even though no whole-doc hash matches.
    "dedup_ngram_spans" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(col("text"), lit(" quality data pipeline tail marker")).as("text")))
        Dedup.duplicatedNgramSpans(corpus, "doc_id", "text", 20)
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        s"""WITH $nearDupCte,
           |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
           |    generate_series(1, greatest(len($wordsSql) - 19, 1)),
           |    i -> array_to_string(($wordsSql)[i:i+19], ' ')))) AS s FROM corpus),
           |df AS (SELECT s, count(*) AS df FROM g GROUP BY s)
           |SELECT doc_id, count(*) AS n_grams,
           |       CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
           |       round(CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
           |         / count(*), 6) AS dup_ratio
           |FROM g JOIN df USING (s)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "duplicated n-gram span fractions (Lee et al. exact-substring-dedup signal)"),

    // Lee-et-al exact-substring REMOVAL (the census's action step): every
    // duplicated 20-gram keeps its first (doc, pos) occurrence; all other
    // occurrences cut their word range, and the doc text is reconstructed
    // without them. The %5-spliced near-dups collapse to their shared
    // prefix's first copy; hash-checking the reconstructed text certifies
    // keeper choice, span clipping, and position arithmetic all at once.
    "dedup_span_removal" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(col("text"), lit(" quality data pipeline tail marker")).as("text")))
        Dedup.removeDuplicateSpans(corpus, "doc_id", "text", 20)
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        s"""WITH $nearDupCte,
           |d AS (SELECT doc_id, $wordsSql AS ws FROM corpus),
           |g0 AS (SELECT doc_id, unnest(list_transform(
           |    generate_series(1, greatest(len(ws) - 19, 1)),
           |    i -> struct_pack(pos := i - 1, s := array_to_string(ws[i:i+19], ' ')))) AS u
           |  FROM d),
           |g AS (SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.s AS s FROM g0),
           |w AS (SELECT s, min(doc_id * 4294967296 + pos) AS keep_key FROM g GROUP BY s HAVING count(*) > 1),
           |cuts AS (SELECT doc_id, list_sort(list(pos)) AS cut_starts
           |         FROM g JOIN w USING (s)
           |         WHERE doc_id * 4294967296 + pos != keep_key
           |         GROUP BY doc_id),
           |k AS (SELECT d.doc_id, d.ws,
           |        list_filter(d.ws, (x, i) -> len(list_filter(
           |          coalesce(c.cut_starts, []), p -> p <= i - 1 AND i - 1 <= p + 19)) = 0) AS kept
           |      FROM d LEFT JOIN cuts c USING (doc_id))
           |SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
           |       CAST(len(ws) - len(kept) AS BIGINT) AS n_removed,
           |       coalesce(array_to_string(kept, ' '), '') AS kept_text
           |FROM k ORDER BY doc_id""".stripMargin),
      doc = "Lee et al. exact-substring removal: first occurrence kept, spans cut, text rebuilt"),

    // Semantic dedup (SemDeDup): candidate buckets are LEARNED k-means
    // clusters (the IVF assignment) rather than random hyperplanes —
    // paraphrase-level duplicates co-locate by meaning. Oracle recomputes
    // the argmin assignment per corpus row (LATERAL) + within-cluster
    // cosine; the spliced exact dups must all surface.
    "dedup_semantic" -> Q(
      fn = (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val corpus = e.select(col("vec_id"), col("embedding"))
          .unionByName(e.filter(col("vec_id") % 10 === 0)
            .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
        val centroids = e.filter(col("vec_id") % 97 === 3)
          .orderBy(col("vec_id")).limit(16)
          .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
        Dedup.semanticNearDupPairs(corpus, "vec_id", "embedding", centroids, 0.9)
          .orderBy(col("id_a"), col("id_b"))
      },
      oracle = Some(
        """WITH corpus AS (
          |  SELECT vec_id, embedding FROM embeddings
          |  UNION ALL
          |  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0),
          |cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
          |  FROM embeddings WHERE vec_id % 97 = 3 ORDER BY vec_id LIMIT 16),
          |v AS (SELECT c.vec_id AS id, CAST(c.embedding AS DOUBLE[]) AS emb,
          |    (SELECT ct.cid FROM cents ct
          |     ORDER BY list_sum(list_transform(list_zip(CAST(c.embedding AS DOUBLE[]), ct.cv),
          |       z -> (z[1]-z[2])*(z[1]-z[2]))), ct.cid LIMIT 1) AS cid,
          |    sqrt(list_sum(list_transform(CAST(c.embedding AS DOUBLE[]), x -> x*x))) AS nrm
          |  FROM corpus c),
          |f AS (SELECT * FROM v WHERE nrm > 0),
          |p AS (SELECT a.id AS id_a, b.id AS id_b,
          |  round(list_sum(list_transform(list_zip(a.emb, b.emb), z -> z[1]*z[2]))
          |   / (a.nrm * b.nrm), 6) AS cos_sim
          |  FROM f a JOIN f b ON a.cid = b.cid AND a.id < b.id)
          |SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.9
          |ORDER BY id_a, id_b""".stripMargin),
      doc = "semantic dedup: k-means-clustered cosine pairs (SemDeDup shape)"),

    // Token counting (whitespace + subword-regex proxy).
    "text_token_counts" -> Q(
      fn = (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.subwordCount(col("text")).as("n_subwords"))
        .orderBy(col("doc_id")),
      oracle = Some(
        s"""SELECT doc_id,
           |  CAST(len($wordsSql) AS INT) AS n_tokens,
           |  CAST(len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'), w -> len(w) > 0))
           |    + length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS INT) AS n_subwords
           |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "token counting (whitespace + BPE-ish regex)"),

    // Tokenizer fertility by language (subwords per word, micro-units) —
    // the multilingual tokenizer-eval metric: high fertility = the
    // tokenizer fragments that language, inflating its effective cost.
    "text_tokenizer_fertility" -> Q(
      fn = (s, dir) => Tables.documents(s, dir)
        .select(col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("nw"),
          TextAnalysis.subwordCount(col("text")).cast("long").as("ns"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nw")).as("n_words"),
          sum(col("ns")).as("n_subwords"))
        .withColumn("fertility_micro",
          expr("(n_subwords * 1000000) div n_words"))
        .orderBy(col("lang")),
      oracle = Some(
        s"""WITH c AS (SELECT lang,
           |    CAST(len($wordsSql) AS BIGINT) AS nw,
           |    CAST(len(list_filter(string_split_regex(text, '[^A-Za-z0-9]+'), w -> len(w) > 0))
           |      + length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS ns
           |  FROM documents)
           |SELECT lang, count(*) AS n_docs, CAST(sum(nw) AS BIGINT) AS n_words,
           |  CAST(sum(ns) AS BIGINT) AS n_subwords,
           |  (CAST(sum(ns) AS BIGINT) * 1000000) // CAST(sum(nw) AS BIGINT) AS fertility_micro
           |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "tokenizer fertility per language: subwords/word in exact micro-units"),

    // LSH (bands x rows) S-curve sweep over ONE shared signature table:
    // re-banding is a projection, so three operating points cost one
    // signature pass. Candidate volume vs admitted-pair strictness is THE
    // dedup tuning decision at 100 TB.
    "dedup_minhash_param_sweep" -> Q(
      fn = (s, dir) =>
        Dedup.minhashParamSweep(Tables.documents(s, dir), "doc_id", "text",
          Seq((8, 8), (16, 4), (32, 2)))
          .orderBy(col("bands")),
      oracle = Some(minhashSweepOracle(
        "corpus AS (SELECT doc_id, text FROM documents)",
        Seq((8, 8), (16, 4), (32, 2)))),
      doc = "MinHash-LSH parameter sweep: per-(bands,rows) candidate/agreement/dup census off one signature table"),

    // Quality metrics.
    "text_quality" -> Q(
      fn = (s, dir) =>
        TextAnalysis.qualityMetrics(Tables.documents(s, dir), "doc_id", "text")
          .orderBy(col("doc_id")),
      oracle = Some(
        s"""SELECT doc_id,
           |  CAST(len($wordsSql) AS INT) AS n_words,
           |  round(CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
           |        / len($wordsSql), 6) AS mean_word_len,
           |  round(CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
           |        / length(text), 6) AS punct_ratio,
           |  round(CAST(len(list_filter($wordsSql,
           |        w -> w IN ('the','a','and','of','to','in','is','for','on','with'))) AS DOUBLE)
           |        / len($wordsSql), 6) AS stopword_ratio
           |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "quality scoring (length/punct/stopword ratios)"),

    // Language-ID heuristic, aggregated.
    "text_lang_id" -> Q(
      fn = (s, dir) => Tables.documents(s, dir)
        .select(TextAnalysis.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred")),
      oracle = Some(
        s"""WITH scored AS (SELECT
           |  len(list_filter($wordsSql, w -> w IN ('the','a','and','of','to','in','is'))) AS s_en,
           |  len(list_filter($wordsSql, w -> w IN ('el','la','de','que','y','en','los'))) AS s_es,
           |  len(list_filter($wordsSql, w -> w IN ('der','die','und','das','von','ist','ein'))) AS s_de,
           |  len(list_filter($wordsSql, w -> w IN ('le','la','et','les','des','est','une'))) AS s_fr
           |  FROM documents),
           |pred AS (SELECT CASE
           |  WHEN s_fr > greatest(s_de, s_es, s_en, 0) THEN 'fr'
           |  WHEN s_de > greatest(s_es, s_en, 0) THEN 'de'
           |  WHEN s_es > greatest(s_en, 0) THEN 'es'
           |  WHEN s_en > 0 THEN 'en'
           |  ELSE 'und' END AS lang_pred FROM scored)
           |SELECT lang_pred, count(*) AS n FROM pred
           |GROUP BY lang_pred ORDER BY lang_pred""".stripMargin),
      doc = "language-ID stopword heuristic"),

    // Language-ID EVAL against the corpus's ground-truth `lang` column: the
    // full confusion matrix plus per-cell hit flag — the audit that turns
    // "we have a lang-ID heuristic" into a measured precision/recall story
    // (and exposes that the stopword heuristic cannot see zh/ja at all —
    // those rows land in 'und'). One row-local prediction + one combinable
    // census; evals must not cost more than the op they grade.
    "text_langid_confusion" -> Q(
      fn = (s, dir) => Tables.documents(s, dir)
        .select(col("lang").as("lang_true"),
          TextAnalysis.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_true"), col("lang_pred"))
        .agg(count(lit(1)).as("n"),
          max(when(col("lang_true") === col("lang_pred"), 1L).otherwise(0L)).as("is_hit"))
        .orderBy(col("lang_true"), col("lang_pred")),
      oracle = Some(
        s"""WITH scored AS (SELECT lang,
           |  len(list_filter($wordsSql, w -> w IN ('the','a','and','of','to','in','is'))) AS s_en,
           |  len(list_filter($wordsSql, w -> w IN ('el','la','de','que','y','en','los'))) AS s_es,
           |  len(list_filter($wordsSql, w -> w IN ('der','die','und','das','von','ist','ein'))) AS s_de,
           |  len(list_filter($wordsSql, w -> w IN ('le','la','et','les','des','est','une'))) AS s_fr
           |  FROM documents),
           |pred AS (SELECT lang AS lang_true, CASE
           |  WHEN s_fr > greatest(s_de, s_es, s_en, 0) THEN 'fr'
           |  WHEN s_de > greatest(s_es, s_en, 0) THEN 'de'
           |  WHEN s_es > greatest(s_en, 0) THEN 'es'
           |  WHEN s_en > 0 THEN 'en'
           |  ELSE 'und' END AS lang_pred FROM scored)
           |SELECT lang_true, lang_pred, count(*) AS n,
           |  CAST(max(CASE WHEN lang_true = lang_pred THEN 1 ELSE 0 END) AS BIGINT) AS is_hit
           |FROM pred GROUP BY lang_true, lang_pred
           |ORDER BY lang_true, lang_pred""".stripMargin),
      doc = "language-ID confusion matrix vs ground truth (eval census)"),

    // Gopher-style repetition signals: row-local sorted-run multiplicities,
    // oracle via explode+group (the oracle may shuffle; the operator may not).
    // Fractions are single int/int IEEE divisions — bit-identical engines.
    "text_repetition" -> Q(
      fn = (s, dir) =>
        TextAnalysis.repetitionSignals(Tables.documents(s, dir), "doc_id", "text")
          .orderBy(col("doc_id")),
      oracle = Some(
        s"""WITH d AS (SELECT doc_id, $wordsSql AS w FROM documents),
           |wr AS (SELECT doc_id, unnest(w) AS word FROM d),
           |wc AS (SELECT doc_id, word, count(*) AS c FROM wr GROUP BY 1, 2),
           |ws AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
           |              count(*) AS n_distinct_words, max(c) AS top_word_count
           |       FROM wc GROUP BY 1),
           |br AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
           |              i -> array_to_string(w[i:i+1], ' '))) AS gram
           |       FROM d WHERE len(w) >= 2),
           |bc AS (SELECT doc_id, gram, count(*) AS c FROM br GROUP BY 1, 2),
           |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
           |              count(*) AS n_distinct_bigrams, max(c) AS top_bigram_count
           |       FROM bc GROUP BY 1)
           |SELECT ws.doc_id, n_words, n_distinct_words, top_word_count,
           |       coalesce(n_bigrams, 0) AS n_bigrams,
           |       coalesce(n_distinct_bigrams, 0) AS n_distinct_bigrams,
           |       coalesce(top_bigram_count, 0) AS top_bigram_count,
           |       CASE WHEN n_words = 0 THEN CAST(0.0 AS DOUBLE)
           |            ELSE (n_words - n_distinct_words) / n_words END AS dup_word_frac,
           |       CASE WHEN coalesce(n_bigrams, 0) = 0 THEN CAST(0.0 AS DOUBLE)
           |            ELSE top_bigram_count / n_bigrams END AS top_bigram_frac
           |FROM ws LEFT JOIN bs USING (doc_id) ORDER BY doc_id""".stripMargin),
      doc = "Gopher repetition quality signals (dup/top word & 2-gram)"),

    // PII redaction: the corpus carries no natural PII, so deterministic
    // synthetic contacts are spliced in (same CASE in the oracle — the dedup
    // queries' construction). Patterns are Java-regex/RE2-identical.
    "text_pii_redaction" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val spiked = d.select(col("doc_id"),
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
              lit("@example.com now")))
          .when(col("doc_id") % 11 === 0,
            concat(col("text"), lit(" call 555-867-5309 or ping 10.0."),
              (col("doc_id") % 256).cast("string"), lit(".1")))
          .otherwise(col("text")).as("text"))
        TextAnalysis.redactPii(spiked, "doc_id", "text")
          .filter(col("n_emails") + col("n_phones") + col("n_ips") > 0)
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        """WITH spiked AS (SELECT doc_id, CASE
          |    WHEN doc_id % 7 = 0 THEN concat(text, ' contact user', doc_id, '@example.com now')
          |    WHEN doc_id % 11 = 0 THEN concat(text, ' call 555-867-5309 or ping 10.0.', doc_id % 256, '.1')
          |    ELSE text END AS text FROM documents),
          |r AS (SELECT doc_id,
          |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
          |  CAST(len(regexp_extract_all(text, '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS INT) AS n_phones,
          |  CAST(len(regexp_extract_all(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS INT) AS n_ips,
          |  regexp_replace(regexp_replace(regexp_replace(text,
          |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |      '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),
          |      '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS text_redacted
          |  FROM spiked)
          |SELECT doc_id, n_emails, n_phones, n_ips, text_redacted FROM r
          |WHERE n_emails + n_phones + n_ips > 0 ORDER BY doc_id""".stripMargin),
      doc = "PII redaction (email/phone/IP counts + placeholder rewrite)"),

    // BM25 keyword retrieval over the corpus (quality-filter / search
    // primitive). The tf relation holds only (doc, query-term) rows; df/idf
    // are a ≤3-row broadcast; DECIMAL-cast sum keeps the score order-stable.
    "text_bm25" -> Q(
      fn = (s, dir) => TextAnalysis.bm25(Tables.documents(s, dir),
        "doc_id", "text", Seq("vector", "hash", "merge"), 20)
        .withColumnRenamed("id", "doc_id"),
      oracle = Some(
        s"""WITH docs AS (SELECT doc_id AS id, $wordsSql AS w FROM documents),
           |d2 AS (SELECT id, w, len(w) AS dl FROM docs),
           |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM d2),
           |tf AS (SELECT id, dl, t, len(list_filter(w, x -> x = t)) AS tf
           |       FROM d2, (SELECT unnest(['vector', 'hash', 'merge']) AS t)
           |       WHERE list_contains(w, t)),
           |dft AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
           |idf AS (SELECT t, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf FROM dft, stats),
           |scored AS (SELECT id, sum(CAST(
           |    idf * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           |    AS DECIMAL(28,10))) AS s
           |  FROM tf JOIN idf USING (t), stats GROUP BY id)
           |SELECT id AS doc_id, round(CAST(s AS DOUBLE), 6) AS score
           |FROM scored ORDER BY score DESC, id LIMIT 20""".stripMargin),
      doc = "BM25 keyword scoring, top-k (Robertson-Spärck Jones)"),

    // BM25 over a STORED inverted index — the text-search twin of the
    // stored-IVF layout: postings written once under 64 term-hash partition
    // directories (+ a one-row exact-integer stats table); the probe reads
    // only the query terms' partitions, so cost tracks the terms' postings,
    // never the corpus. Graded against the IDENTICAL oracle as text_bm25 —
    // the hash match proves index path == scan path (the result-invariance
    // pattern). InvertedIndexSpec asserts the pruned scan's partition count.
    "text_bm25_indexed" -> Q(
      fn = (s, dir) => {
        import graft.operators.InvertedIndex
        val path = Warehouse.dir + "/inverted_idx_" +
          dir.replaceAll("[^A-Za-z0-9]", "_")
        InvertedIndex.ensureInvertedIndex(
          Tables.documents(s, dir), "doc_id", "text", path)
        InvertedIndex.bm25Indexed(s, path, Seq("vector", "hash", "merge"), 20)
          .withColumnRenamed("id", "doc_id")
      },
      oracle = Some(
        s"""WITH docs AS (SELECT doc_id AS id, $wordsSql AS w FROM documents),
           |d2 AS (SELECT id, w, len(w) AS dl FROM docs),
           |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM d2),
           |tf AS (SELECT id, dl, t, len(list_filter(w, x -> x = t)) AS tf
           |       FROM d2, (SELECT unnest(['vector', 'hash', 'merge']) AS t)
           |       WHERE list_contains(w, t)),
           |dft AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
           |idf AS (SELECT t, ln((n - df + 0.5) / (df + 0.5) + 1.0) AS idf FROM dft, stats),
           |scored AS (SELECT id, sum(CAST(
           |    idf * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           |    AS DECIMAL(28,10))) AS s
           |  FROM tf JOIN idf USING (t), stats GROUP BY id)
           |SELECT id AS doc_id, round(CAST(s AS DOUBLE), 6) AS score
           |FROM scored ORDER BY score DESC, id LIMIT 20""".stripMargin),
      doc = "BM25 over a stored term-hash-partitioned inverted index (probe == scan proof)"),

    // Near-dup pairs → connected components → canonical keeper per cluster.
    // Spark side: min-label propagation to fixpoint (Pregel shape); oracle:
    // recursive-CTE reachability closure + min label — same fixpoint.
    "dedup_resolve_clusters" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(col("text"), lit(" quality data pipeline tail marker")).as("text")))
        val pairs = Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.5, maxDf = 8)
        Dedup.resolveClusters(pairs).orderBy(col("id"))
      },
      oracle = Some(
        s"""WITH RECURSIVE $nearDupCte,
           |$clusterCtes
           |SELECT id, min(label) AS cluster FROM reach GROUP BY id
           |ORDER BY id""".stripMargin),
      doc = "near-dup cluster resolution: connected components, min-id canonical"),

    // INCREMENTAL cluster maintenance: the same near-dup graph split into a
    // base corpus (resolved once, as a store would hold it) and an arriving
    // batch; the batch is folded in via contraction — CC runs only on the
    // batch-sized contracted graph, historical pairs are never re-read.
    // Graded against the IDENTICAL full-recompute oracle as
    // dedup_resolve_clusters: the hash match IS the equivalence proof
    // (same pattern as t_asof_join_native / text_perplexity_tiered).
    "dedup_cc_incremental" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(col("text"), lit(" quality data pipeline tail marker")).as("text")))
        val pairs = Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.5, maxDf = 8)
        graft.operators.CacheOnce.pin(pairs)
        pairs.count() // pin: the pair kernel feeds both splits
        // "arrival order": docs whose base id ≡ 3 (mod 7) land in the batch
        // (variants travel with their source doc)
        def inBatch(c: org.apache.spark.sql.Column) = (c % 1000000) % 7 === 3
        val basePairs = pairs.filter(!inBatch(col("id_a")) && !inBatch(col("id_b")))
        val batchPairs = pairs.filter(inBatch(col("id_a")) || inBatch(col("id_b")))
        val prev = Dedup.resolveClusters(basePairs)
        Dedup.resolveClustersIncremental(prev, batchPairs).orderBy(col("id"))
      },
      oracle = Some(
        s"""WITH RECURSIVE $nearDupCte,
           |$clusterCtes
           |SELECT id, min(label) AS cluster FROM reach GROUP BY id
           |ORDER BY id""".stripMargin),
      doc = "incremental CC: batch-sized contracted graph, zero historical re-pairing"),

    // End-to-end dedup: same pair generation + clustering, then the corpus
    // with losers anti-joined away and per-keeper absorption counts — the
    // call a pipeline user actually makes.
    "dedup_survivors" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(col("text"), lit(" quality data pipeline tail marker")).as("text")))
        val pairs = Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.5, maxDf = 8)
        Dedup.dedupCorpus(corpus, "doc_id", pairs)
          .select(col("doc_id"), col("n_absorbed"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        s"""WITH RECURSIVE $nearDupCte,
           |$clusterCtes,
           |clusters AS (SELECT id, min(label) AS cluster FROM reach GROUP BY id),
           |absorbed AS (SELECT cluster, count(*) - 1 AS n_absorbed
           |             FROM clusters GROUP BY cluster)
           |SELECT c.doc_id, coalesce(a.n_absorbed, 0) AS n_absorbed
           |FROM corpus c
           |LEFT JOIN clusters l ON l.id = c.doc_id AND l.id != l.cluster
           |LEFT JOIN absorbed a ON a.cluster = c.doc_id
           |WHERE l.id IS NULL
           |ORDER BY c.doc_id""".stripMargin),
      doc = "end-to-end near-dup dedup: survivors + absorption counts"),

    // Deterministic stratified sampling — the training-mix step. Hash-based
    // (md5 bucket), so the kept set is identical in any engine/partitioning.
    // Exact corpus percentiles (data-card statistics): order statistics over
    // the value histogram with the distributed prefix-sum — the principled
    // replacement for approx_percentile, whose sketch-merge order makes it
    // engine- and run-dependent (ungradeable, and un-reproducible in a data
    // card). ⌈n·p/100⌉ rank arithmetic stays in exact longs.
    "text_length_quantiles" -> Q(
      fn = (s, dir) =>
        TextAnalysis.exactQuantiles(Tables.documents(s, dir), "n_chars", Seq(50, 90, 99))
          .orderBy(col("pct")),
      oracle = Some(
        """WITH h AS (SELECT CAST(n_chars AS BIGINT) AS v, count(*) AS c
          |           FROM documents GROUP BY 1),
          |t AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM h),
          |cc AS (SELECT v, sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum FROM h)
          |SELECT p.pct, min(cc.v) AS value, min(t.n) AS n_rows
          |FROM (VALUES (50), (90), (99)) p(pct), cc, t
          |WHERE cc.cum >= (t.n * p.pct + 99) // 100
          |GROUP BY p.pct ORDER BY pct""".stripMargin),
      doc = "exact doc-length percentiles via histogram prefix sum (no sketch, engine-exact)"),

    // Per-GROUP exact percentiles (per-language length bands): the keyed
    // form — cumulative counts via a window over each group's value
    // HISTOGRAM (frames bounded by distinct values, no global window, no
    // driver total), rank threshold in exact long arithmetic.
    "text_grouped_quantiles" -> Q(
      fn = (s, dir) =>
        TextAnalysis.groupedQuantiles(Tables.documents(s, dir),
          "lang", "n_chars", Seq(50, 90, 99)),
      oracle = Some(
        """WITH h AS (SELECT lang AS g, CAST(n_chars AS BIGINT) AS v,
          |    count(*) AS c FROM documents GROUP BY 1, 2),
          |t AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
          |cc AS (SELECT g, v,
          |    sum(c) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING)
          |      AS cum FROM h)
          |SELECT cc.g AS lang, p.pct, min(cc.v) AS value, min(t.n) AS n_rows
          |FROM (VALUES (50), (90), (99)) p(pct), cc
          |JOIN t ON cc.g = t.g
          |WHERE cc.cum >= (t.n * p.pct + 99) // 100
          |GROUP BY cc.g, p.pct ORDER BY lang, pct""".stripMargin),
      doc = "per-group exact percentiles: keyed histogram window, bounded frames"),

    // Fixed-budget per-stratum sample (eval sets, human-review batches):
    // exactly k rows per language, selected by smallest (md5-bucket, id) —
    // rerun-stable where rate sampling drifts in size. Skew-proof two-phase
    // top-k (bounded partials per row-salt); the oracle is the global
    // window formulation — the hash-match proves the hierarchy exact.
    "sample_fixed_k" -> Q(
      fn = (s, dir) =>
        graft.operators.Sampling.fixedKPerStratum(
          Tables.documents(s, dir), "lang", "doc_id", 20, salt = "evalset")
          .orderBy(col("lang"), col("doc_id")),
      oracle = Some(
        """WITH b AS (SELECT lang, doc_id,
          |    CAST('0x' || substr(md5(concat('evalset', CAST(doc_id AS VARCHAR))), 1, 15) AS BIGINT)
          |      % 10000 AS bkt
          |  FROM documents),
          |r AS (SELECT lang, doc_id,
          |        row_number() OVER (PARTITION BY lang ORDER BY bkt, doc_id) AS rn
          |      FROM b)
          |SELECT lang, doc_id FROM r WHERE rn <= 20
          |ORDER BY lang, doc_id""".stripMargin),
      doc = "fixed-k deterministic sample per stratum (reservoir replacement, exact budget)"),

    "sample_stratified" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir).withColumn("stratum",
          when(col("doc_id") % 3 === 0, "web")
            .when(col("doc_id") % 3 === 1, "code").otherwise("reference"))
        graft.operators.Sampling.stratifiedHashSample(d, "stratum", "doc_id",
          Map("web" -> 0.1, "code" -> 0.8), defaultFraction = 0.0, salt = "mix1")
          .groupBy(col("stratum"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
          .orderBy(col("stratum"))
      },
      oracle = Some(
        """WITH d AS (SELECT doc_id,
          |  CASE WHEN doc_id % 3 = 0 THEN 'web'
          |       WHEN doc_id % 3 = 1 THEN 'code' ELSE 'reference' END AS stratum
          |  FROM documents),
          |kept AS (SELECT * FROM d WHERE
          |  CAST('0x' || substr(md5(concat('mix1', CAST(doc_id AS VARCHAR))), 1, 15) AS BIGINT)
          |    % 10000 <
          |  CASE stratum WHEN 'web' THEN 1000 WHEN 'code' THEN 8000 ELSE 0 END)
          |SELECT stratum, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
          |FROM kept GROUP BY stratum ORDER BY stratum""".stripMargin),
      doc = "deterministic stratified hash sampling (training-mix weights)"),

    // Poisson(1) bootstrap (Chamandy et al. 2012 — the MapReduce-native
    // bootstrap: resampling-with-replacement is impossible in one pass,
    // but per-(row, rep) independent Poisson(1) weights reproduce the
    // multinomial in expectation). The draw is DETERMINISTIC: u =
    // md5₆₀(rep:doc)/2⁶⁰ (exact power-of-two scaling — both engines round
    // h→double identically, the division is exact), inverted through the
    // λ=1 CDF as SHARED literal thresholds. Per rep: docs hit, Σw, the
    // weighted n_chars total and the bootstrap mean — the 10-rep spread IS
    // the uncertainty estimate a 100 TB single-pass pipeline ships.
    "sample_poisson_bootstrap" -> Q(
      fn = (s, dir) => {
        val reps = (0 until 10).map(lit(_))
        val u = expr("cast(conv(substring(md5(concat(cast(rep as string), " +
          "':', cast(doc_id as string))), 1, 15), 16, 10) as bigint)")
          .cast("double") / lit(1.152921504606846976e18)
        val w = when(col("u") < 0.36787944117144233, 0L)
          .when(col("u") < 0.7357588823428847, 1L)
          .when(col("u") < 0.9196986029286058, 2L)
          .when(col("u") < 0.9810118431238462, 3L)
          .when(col("u") < 0.9963401531726563, 4L)
          .when(col("u") < 0.9994058151824183, 5L).otherwise(6L)
        Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
          .select(col("doc_id"), col("n_chars"),
            explode(array(reps: _*)).as("rep"))
          .withColumn("u", u).withColumn("w", w)
          .groupBy(col("rep"))
          .agg(sum(when(col("w") > 0, 1L).otherwise(0L)).as("n_docs_hit"),
            sum(col("w")).as("sum_w"),
            sum(col("w") * col("n_chars")).as("sum_w_chars"))
          .withColumn("boot_mean_chars",
            round(col("sum_w_chars").cast("double") / col("sum_w").cast("double"), 9) + 0.0)
          .orderBy(col("rep"))
      },
      oracle = Some(
        """WITH x AS (SELECT d.doc_id, d.n_chars, r.rep,
          |    CAST(CAST('0x' || substr(md5(CAST(r.rep AS VARCHAR) || ':'
          |      || CAST(d.doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS DOUBLE)
          |      / 1152921504606846976.0 AS u
          |  FROM documents d CROSS JOIN (
          |    SELECT unnest(generate_series(0, 9)) AS rep) r),
          |wt AS (SELECT rep, n_chars,
          |    CASE WHEN u < 0.36787944117144233 THEN 0
          |         WHEN u < 0.7357588823428847 THEN 1
          |         WHEN u < 0.9196986029286058 THEN 2
          |         WHEN u < 0.9810118431238462 THEN 3
          |         WHEN u < 0.9963401531726563 THEN 4
          |         WHEN u < 0.9994058151824183 THEN 5 ELSE 6 END AS w
          |  FROM x)
          |SELECT rep,
          |  CAST(sum(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_hit,
          |  CAST(sum(w) AS BIGINT) AS sum_w,
          |  CAST(sum(w * n_chars) AS BIGINT) AS sum_w_chars,
          |  round(CAST(sum(w * n_chars) AS DOUBLE) / CAST(sum(w) AS DOUBLE), 9)
          |    + 0.0 AS boot_mean_chars
          |FROM wt GROUP BY rep ORDER BY rep""".stripMargin),
      doc = "deterministic Poisson(1) bootstrap: 10 single-pass replicas via hash-inverted CDF, per-rep weighted census"),

    // Leakage-safe GROUP k-fold: folds are a FUNCTION of the group key
    // (fold = md5₆₀(source) mod 5), so no source ever spans folds — the
    // property that matters when near-duplicates cluster within a source
    // and a random row-level split would leak train into eval. Census per
    // fold: distinct sources, docs, chars; PipelineOpsSpec asserts the
    // no-spanning invariant (Σ per-fold distinct sources = global
    // distinct). One scan + one groupBy; the fold column is a pure
    // projection, so at 100 TB the split is free at write time.
    "sample_group_kfold" -> Q(
      fn = (s, dir) =>
        Tables.documents(s, dir).select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("fold",
            expr("cast(conv(substring(md5(source), 1, 15), 16, 10) as bigint) % 5"))
          .groupBy(col("fold"))
          .agg(countDistinct(col("source")).as("n_sources"),
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("fold")),
      oracle = Some(
        """WITH f AS (SELECT doc_id, source, n_chars,
          |    CAST('0x' || substr(md5(source), 1, 15) AS BIGINT) % 5 AS fold
          |  FROM documents)
          |SELECT fold, CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
          |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
          |FROM f GROUP BY fold ORDER BY fold""".stripMargin),
      doc = "leakage-safe group k-fold: fold is a function of the source key, per-fold census"),

    // Data-constrained epoch planning: split a 3×-the-corpus token budget
    // across languages with temperature-α=0.5 weights (√tokens — the
    // standard head-domain down-weighting), then the implied per-domain
    // repeat factors, capped. One map-side token-count pass; the plan math
    // is domain-sized. Numerics per house invariants: √ is IEEE-exact in
    // both engines, round+DECIMAL makes the weight sum associative, the
    // share/alloc chain is a fixed IEEE sequence over identical operands.
    "mix_epoch_plan" -> Q(
      fn = (s, dir) =>
        graft.operators.Sampling.epochMixPlan(Tables.documents(s, dir),
          "lang", "text", budgetMultiplier = 3, maxRepeat = 4)
          .withColumnRenamed("domain", "lang"),
      oracle = Some(
        s"""WITH d AS (SELECT lang, CAST(len($wordsSql) AS BIGINT) AS t
           |  FROM documents WHERE lang IS NOT NULL),
           |g AS (SELECT lang, count(*) AS n_docs,
           |    CAST(sum(t) AS BIGINT) AS n_tokens FROM d GROUP BY 1),
           |w AS (SELECT *, round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS weight
           |  FROM g),
           |tot AS (SELECT sum(CAST(weight AS DECIMAL(28,6))) AS sum_w,
           |    CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM w),
           |plan AS (SELECT lang, n_docs, n_tokens, weight,
           |    weight / CAST(sum_w AS DOUBLE) AS share,
           |    CAST(floor(CAST(tot_tokens * 3 AS DOUBLE) * weight
           |      / CAST(sum_w AS DOUBLE)) AS BIGINT) AS alloc_tokens
           |  FROM w, tot)
           |SELECT lang, n_docs, n_tokens, weight, share, alloc_tokens,
           |  CAST(alloc_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS epochs,
           |  least(CAST(ceil(CAST(alloc_tokens AS DOUBLE)
           |    / CAST(n_tokens AS DOUBLE)) AS BIGINT), 4) AS n_repeats
           |FROM plan ORDER BY lang""".stripMargin),
      doc = "data-constrained epoch plan: α=0.5 domain weights, budget shares, capped repeats"),

    // C4/Gopher heuristic filter battery. The synthetic corpus is clean
    // (no punctuation/braces/placeholders), so deterministic contamination
    // is spliced in — the PII query's construction: first-matching CASE
    // appends a lorem-ipsum placeholder / code fragment / symbol run, or
    // truncates to 5 words. Every flag is integer-compared row-local logic.
    "text_c4_filters" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val spiked = d.select(col("doc_id"),
          when(col("doc_id") % 13 === 0,
            concat(col("text"), lit(" lorem ipsum dolor sit")))
          .when(col("doc_id") % 17 === 0,
            concat(col("text"), lit(" function() { javascript }")))
          .when(col("doc_id") % 19 === 0,
            array_join(slice(split(trim(col("text")), "\\s+"), 1, 5), " "))
          .when(col("doc_id") % 23 === 0,
            concat(col("text"), lit(" # # # # # # # #")))
          .otherwise(col("text")).as("text"))
        TextAnalysis.c4GopherFilters(spiked, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        s"""WITH spiked AS (SELECT doc_id, CASE
           |    WHEN doc_id % 13 = 0 THEN concat(text, ' lorem ipsum dolor sit')
           |    WHEN doc_id % 17 = 0 THEN concat(text, ' function() { javascript }')
           |    WHEN doc_id % 19 = 0 THEN array_to_string((string_split_regex(trim(text), '\\s+'))[1:5], ' ')
           |    WHEN doc_id % 23 = 0 THEN concat(text, ' # # # # # # # #')
           |    ELSE text END AS text FROM documents),
           |d AS (SELECT doc_id, text, $wordsSql AS w FROM spiked),
           |f AS (SELECT doc_id,
           |  CAST(len(w) AS INT) AS n_words,
           |  len(w) BETWEEN 10 AND 100000 AS f_words,
           |  CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len(w)
           |    BETWEEN 3.0 AND 10.0 AS f_word_len,
           |  NOT contains(lower(text), 'lorem ipsum') AS f_lorem,
           |  NOT contains(text, '{') AS f_brace,
           |  NOT list_contains(w, 'javascript') AS f_policy,
           |  (length(text) - length(replace(text, '#', ''))) * 20 <= len(w) AS f_symbol,
           |  len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 5 >= len(w) * 4 AS f_alpha,
           |  len(list_filter(w, x -> x IN ('the','a','and','of','to','in','is','for','on','with'))) >= 2 AS f_stopword
           |  FROM d)
           |SELECT doc_id, n_words, f_words, f_word_len, f_lorem, f_brace,
           |       f_policy, f_symbol, f_alpha, f_stopword,
           |       f_words AND f_word_len AND f_lorem AND f_brace AND f_policy
           |         AND f_symbol AND f_alpha AND f_stopword AS keep
           |FROM f ORDER BY doc_id""".stripMargin),
      doc = "C4/Gopher heuristic quality filters (8 rules + keep conjunction)"),

    // Unigram-LM self-surprisal (perplexity proxy): LM trained on the corpus
    // itself; per-word surprisal rounds to 6 dp BEFORE the decimal per-doc
    // sum, so scores are order-independent and ulp-safe across engines.
    "text_perplexity" -> Q(
      fn = (s, dir) =>
        TextAnalysis.unigramSurprisal(Tables.documents(s, dir), "doc_id", "text")
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id")),
      oracle = Some(perplexityOracle),
      doc = "unigram-LM surprisal scoring (perplexity-proxy quality signal)"),

    // Two-tier LM lookup: Zipf head broadcast + skew-free tail join — the
    // production topology for a vocabulary that outgrows one broadcast.
    // headSize=16 vs the fixture's ~30-word vocabulary forces BOTH tiers to
    // carry tokens; graded against the SAME oracle as text_perplexity, so
    // the hash-match proves the topology change is result-invariant.
    "text_perplexity_tiered" -> Q(
      fn = (s, dir) =>
        TextAnalysis.unigramSurprisalTiered(Tables.documents(s, dir),
          "doc_id", "text", headSize = 16)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id")),
      oracle = Some(perplexityOracle),
      doc = "two-tier (head-broadcast) unigram-LM surprisal — result-invariant refinement"),

    // Bigram LM training: pair counts, context counts, conditional
    // probabilities — top 20 bigrams by count (unique tiebreak w1, w2).
    "text_bigram_lm" -> Q(
      fn = (s, dir) =>
        TextAnalysis.bigramLm(Tables.documents(s, dir), "text")
          .orderBy(col("c").desc, col("w1"), col("w2")).limit(20),
      oracle = Some(
        s"""WITH d AS (SELECT $wordsSql AS ws FROM documents),
           |bg0 AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
           |    i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS u
           |  FROM d WHERE len(ws) >= 2),
           |bg AS (SELECT u.w1 AS w1, u.w2 AS w2, count(*) AS c FROM bg0 GROUP BY 1, 2),
           |ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c_ctx FROM bg GROUP BY w1)
           |SELECT w1, w2, c, c_ctx, round(CAST(c AS DOUBLE) / c_ctx, 6) AS cond_p
           |FROM bg JOIN ctx USING (w1)
           |ORDER BY c DESC, w1, w2 LIMIT 20""".stripMargin),
      doc = "bigram LM training: p(w2|w1) from one explode pass (KenLM building block)"),

    // Interpolated Kneser-Ney smoothing over the same bigram relation —
    // the production n-gram LM estimate (continuation-count back-off).
    // All inputs exact int64, d = 0.75 an exact double, the probability
    // one fixed IEEE chain → ships unrounded. Top-20 by raw count with
    // (w1, w2) tiebreak, same frame as text_bigram_lm.
    "text_kneser_ney" -> Q(
      fn = (s, dir) =>
        TextAnalysis.kneserNeyBigram(Tables.documents(s, dir), "text")
          .orderBy(col("c").desc, col("w1"), col("w2")).limit(20),
      oracle = Some(
        s"""WITH d AS (SELECT $wordsSql AS ws FROM documents),
           |bg0 AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
           |    i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS u
           |  FROM d WHERE len(ws) >= 2),
           |bg AS (SELECT u.w1 AS w1, u.w2 AS w2, count(*) AS c FROM bg0 GROUP BY 1, 2),
           |ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c_ctx,
           |    count(*) AS n_fwd FROM bg GROUP BY w1),
           |cont AS (SELECT w2, count(*) AS n_bwd FROM bg GROUP BY w2),
           |tot AS (SELECT count(*) AS n_bg FROM bg)
           |SELECT w1, w2, c, c_ctx, n_fwd, n_bwd,
           |  greatest(CAST(c AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0.0 AS DOUBLE))
           |      / CAST(c_ctx AS DOUBLE)
           |    + (CAST(0.75 AS DOUBLE) * CAST(n_fwd AS DOUBLE) / CAST(c_ctx AS DOUBLE))
           |      * (CAST(n_bwd AS DOUBLE) / CAST(n_bg AS DOUBLE)) AS p_kn
           |FROM bg JOIN ctx USING (w1) JOIN cont USING (w2), tot
           |ORDER BY c DESC, w1, w2 LIMIT 20""".stripMargin),
      doc = "Kneser-Ney bigram smoothing: continuation-count back-off, exact chain"),

    // Collocation mining: PMI-lift ranking of adjacent pairs (phrase
    // detection). minCount prunes at the bigram partial-agg; the single
    // int/int division is IEEE-exact, so lift ships unrounded.
    "text_collocations" -> Q(
      fn = (s, dir) =>
        TextAnalysis.collocations(Tables.documents(s, dir), "text", 10)
          .orderBy(col("lift").desc, col("w1"), col("w2")).limit(50),
      oracle = Some(
        s"""WITH d AS (SELECT $wordsSql AS ws FROM documents),
           |uni AS (SELECT w, count(*) AS c
           |        FROM (SELECT unnest(ws) AS w FROM d) GROUP BY w),
           |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
           |bg0 AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
           |    i -> struct_pack(w1 := ws[i], w2 := ws[i+1]))) AS u
           |  FROM d WHERE len(ws) >= 2),
           |bg AS (SELECT u.w1 AS w1, u.w2 AS w2, count(*) AS c_ab
           |       FROM bg0 GROUP BY 1, 2 HAVING count(*) >= 10)
           |SELECT w1, w2, c_ab, ua.c AS c_a, ub.c AS c_b,
           |       (c_ab * n.n) / (ua.c * ub.c) AS lift
           |FROM bg JOIN uni ua ON bg.w1 = ua.w
           |        JOIN uni ub ON bg.w2 = ub.w CROSS JOIN n
           |ORDER BY lift DESC, w1, w2 LIMIT 50""".stripMargin),
      doc = "PMI-lift collocations: count-pruned bigrams vs unigram margins"),

    // BPE training step: adjacent symbol-pair counts over the word
    // histogram — the top pair is the next merge. Word-frequency reduction
    // first, so per-character work happens on a vocabulary-sized relation.
    "text_bpe_step" -> Q(
      fn = (s, dir) =>
        TextAnalysis.bpePairCounts(Tables.documents(s, dir), "text")
          .orderBy(col("n").desc, col("pair")).limit(20),
      oracle = Some(
        s"""WITH tok AS (SELECT unnest($wordsSql) AS w FROM documents),
           |wf AS (SELECT w, count(*) AS wc FROM tok GROUP BY w),
           |p AS (SELECT wc, unnest(list_transform(generate_series(1, len(w) - 1),
           |        i -> substr(w, i, 2))) AS pair
           |      FROM wf WHERE len(w) >= 2)
           |SELECT pair, CAST(sum(wc) AS BIGINT) AS n
           |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin),
      doc = "BPE merge-candidate statistics (one training iteration over the word histogram)"),

    // Model-based quality filter: linear bag-of-hashed-words classifier
    // inference (the fasttext stage). Seeded weights as literals on both
    // sides; portable md5-60-bit feature hash; per-word 6 dp rounding
    // before the decimal sum, and the keep gate compares sum + bias·n ≥ 0
    // in EXACT decimals — no divide-then-round boundary (the sf0.1 run
    // caught one row drifting 1e-6 under the mean-score formulation).
    "text_quality_classifier" -> Q(
      fn = (s, dir) => {
        val rnd = new scala.util.Random(7L)
        val weights = Seq.fill(64)(rnd.nextGaussian())
        TextAnalysis.qualityClassifierScore(Tables.documents(s, dir),
          "doc_id", "text", weights, bias = 0.05)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"))
      },
      oracle = Some {
        val rnd = new scala.util.Random(7L)
        val weights = Seq.fill(64)(rnd.nextGaussian())
        val wlit = "[" + weights.map(_.toString).mkString(", ") + "]::DOUBLE[]"
        s"""WITH tok AS (SELECT doc_id AS id, unnest($wordsSql) AS w FROM documents),
           |wh AS (SELECT id, CAST(round(($wlit)[
           |    CAST(CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 64 AS INT) + 1], 6)
           |    AS DECIMAL(18,6)) AS wt FROM tok),
           |d AS (SELECT id, count(*) AS n_tokens, sum(wt) AS s FROM wh GROUP BY id)
           |SELECT id AS doc_id, n_tokens,
           |       CAST(s AS DOUBLE) AS weight_sum,
           |       s + CAST(0.05 AS DECIMAL(18,6)) * n_tokens >= 0 AS keep
           |FROM d ORDER BY doc_id""".stripMargin
      },
      doc = "fasttext-style quality classifier inference (hashed linear model, exact decimal gate)"),

    // Full BPE training, 3 merges: the oracle REPLAYS the whole loop as a
    // generated CTE chain (pair counts → argmax → replace, per iteration),
    // so the hash-match certifies the merge SEQUENCE — argmax ties, replace
    // scan order and all — not just one iteration's counts.
    "text_bpe_train" -> Q(
      fn = (s, dir) =>
        TextAnalysis.bpeTrain(Tables.documents(s, dir), "text", 3)
          .orderBy(col("iter")),
      oracle = Some(bpeTrainOracle(3)),
      doc = "BPE training loop (3 merges), oracle replays the full merge sequence"),

    // BPE applied: per-doc token counts under the 3 trained merges — the
    // train→tokenize round trip. Segmenter = the merged word histogram,
    // joined back to the corpus by word (broadcast-sized vocabulary).
    "text_bpe_tokenize" -> Q(
      fn = (s, dir) =>
        TextAnalysis.bpeTokenCounts(Tables.documents(s, dir), "doc_id", "text", 3)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id")),
      oracle = Some(bpeTokenizeOracle(3)),
      doc = "BPE tokenization: per-doc token counts under the trained merges"),

    // Vocabulary coverage cutoffs: smallest head-vocab reaching 50/90/99%
    // cumulative token share — the tokenizer/vocab sizing query. The window
    // runs over the corpus-reduced LM relation, not the corpus.
    "text_vocab_coverage" -> Q(
      fn = (s, dir) =>
        TextAnalysis.vocabCoverage(Tables.documents(s, dir), "text", Seq(50, 90, 99))
          .orderBy(col("threshold_pct")),
      oracle = Some(
        s"""WITH tok AS (SELECT unnest($wordsSql) AS w FROM documents),
           |lm AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
           |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM lm),
           |r AS (SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS rnk,
           |        CAST(sum(c) OVER (ORDER BY c DESC, w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           |      FROM lm)
           |SELECT t.threshold_pct,
           |       CAST(min(r.rnk) AS BIGINT) AS vocab_size,
           |       CAST(min_by(r.cum, r.rnk) AS BIGINT) AS covered_tokens,
           |       min(n.n) AS total_tokens
           |FROM r CROSS JOIN (VALUES (50), (90), (99)) t(threshold_pct) CROSS JOIN n
           |WHERE r.cum * 100 >= n.n * t.threshold_pct
           |GROUP BY t.threshold_pct ORDER BY t.threshold_pct""".stripMargin),
      doc = "vocab coverage cutoffs (head-vocabulary sizing for tokenizers/tiered LM)"),

    // Importance-weighted deterministic sampling: keep probability scales
    // with doc length (min(1, n_chars/500)) — the per-row generalization of
    // the stratified mix. Integer-derived weights never land on .5 bp.
    "sample_importance" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.Sampling.weightedHashSample(d, "doc_id",
          least(lit(1.0), col("n_chars").cast("double") / 500.0), salt = "imp1")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"),
            sum(col("n_chars")).as("chars_sum"))
          .orderBy(col("lang"))
      },
      oracle = Some(
        """WITH kept AS (SELECT * FROM documents WHERE
          |  CAST('0x' || substr(md5(concat('imp1', CAST(doc_id AS VARCHAR))), 1, 15) AS BIGINT)
          |    % 10000 < round(least(1.0, CAST(n_chars AS DOUBLE) / 500.0) * 10000))
          |SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum,
          |       CAST(sum(n_chars) AS BIGINT) AS chars_sum
          |FROM kept GROUP BY lang ORDER BY lang""".stripMargin),
      doc = "importance-weighted deterministic sampling (length-prior keep prob)"),

    // Quality-weighted sampling: keep probability from a TEXT-derived
    // signal (4× the stopword ratio, clamped) — the quality-curation
    // composition of text_quality + weightedHashSample. Weight arithmetic
    // is identical double math on both engines (single divisions + rounds).
    "sample_quality_weighted" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val w = TextAnalysis.words(col("text"))
        val stopFrac = round(
          graft.functions.VectorExprs.stopwordCounts(w,
            Seq(Seq("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")))
            .getItem(0).cast("double") / size(w), 6)
        graft.operators.Sampling.weightedHashSample(d, "doc_id",
          least(lit(1.0), stopFrac * 4), salt = "qw1")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
          .orderBy(col("lang"))
      },
      oracle = Some(
        s"""WITH scored AS (SELECT doc_id, lang,
           |  round(CAST(len(list_filter($wordsSql,
           |    x -> x IN ('the','a','and','of','to','in','is','for','on','with'))) AS DOUBLE)
           |    / len($wordsSql), 6) AS stop_frac FROM documents),
           |kept AS (SELECT * FROM scored WHERE
           |  CAST('0x' || substr(md5(concat('qw1', CAST(doc_id AS VARCHAR))), 1, 15) AS BIGINT)
           |    % 10000 < round(least(1.0, stop_frac * 4) * 10000))
           |SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
           |FROM kept GROUP BY lang ORDER BY lang""".stripMargin),
      doc = "quality-weighted sampling (stopword-signal keep probability)"),

    // Token-budget sequence packing: shard by portable id-hash, fill
    // 512-token bins per shard in id order. All integer arithmetic (the one
    // division is exact); the window parallelizes across shards — no global
    // sort at any scale.
    "pack_sequences" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("toks"))
        val assigned = graft.operators.Packing.assignBins(
          d, "doc_id", "toks", budget = 512, shards = 8, salt = "pack1")
        graft.operators.Packing.packStats(assigned, "doc_id", "toks", 512)
          .orderBy(col("shard"), col("seq_id"))
      },
      oracle = Some(
        s"""WITH d AS (SELECT doc_id, CAST(len($wordsSql) AS INT) AS toks,
           |  CAST('0x' || substr(md5(concat('pack1', CAST(doc_id AS VARCHAR))), 1, 15) AS BIGINT)
           |    % 8 AS shard FROM documents),
           |c AS (SELECT doc_id, shard, toks,
           |  sum(toks) OVER (PARTITION BY shard ORDER BY doc_id) AS cum FROM d),
           |b AS (SELECT shard, CAST(floor((cum - 1) / 512) AS BIGINT) AS seq_id,
           |             doc_id, toks FROM c)
           |SELECT shard, seq_id, count(*) AS n_docs,
           |       CAST(sum(toks) AS BIGINT) AS n_tokens,
           |       min(doc_id) AS first_doc, max(doc_id) AS last_doc,
           |       CAST(sum(toks) AS DOUBLE) / 512 AS fill_ratio
           |FROM b GROUP BY 1, 2 ORDER BY shard, seq_id""".stripMargin),
      doc = "token-budget sequence packing (sharded cumulative-fill bins)"),

    // Padding-waste census: WHY length-sorted batching matters, quantified.
    // Fixed-size inference batches pad every sequence to the batch max;
    // naive (ingest-order) batches mix lengths and waste is large,
    // length-sorted batches are near-homogeneous and waste collapses. Both
    // global orderings rank via the distributed two-pass prefix-sum
    // (Prefix.withRankAndCumSum) — no empty-partition window at any scale —
    // and every graded number is an exact integer until the final ratio of
    // two exact longs.
    "pack_padding_waste" -> Q(
      fn = (s, dir) => {
        // both packing arms consume the same (doc_id, toks) relation and
        // differ only in sort order — localCheckpoint it once so the
        // corpus scan + token count runs once, not per arm (r14)
        val d = Tables.documents(s, dir).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("toks"))
          .localCheckpoint()
        def arm(sortCols: Seq[org.apache.spark.sql.Column], strategy: String) =
          graft.operators.Prefix.withRankAndCumSum(d, sortCols, col("toks"), 8)
            .withColumn("batch", expr("(rnk - 1) div 32"))
            .groupBy(col("batch"))
            .agg(count(lit(1)).as("n_docs"), max(col("toks")).as("mx"),
              sum(col("toks")).as("tok"))
            .agg(count(lit(1)).as("n_batches"),
              sum(col("tok")).as("total_tokens"),
              sum(col("mx") * col("n_docs")).as("total_padded"))
            .select(lit(strategy).as("strategy"), col("n_batches"),
              col("total_tokens"), col("total_padded"),
              ((col("total_padded") - col("total_tokens")).cast("double") /
                col("total_padded").cast("double")).as("waste_pct"))
        arm(Seq(col("doc_id")), "naive")
          .unionByName(arm(Seq(col("toks"), col("doc_id")), "length_sorted"))
          .orderBy(col("strategy"))
      },
      oracle = Some(
        s"""WITH d AS (SELECT doc_id, CAST(len($wordsSql) AS BIGINT) AS toks FROM documents),
           |rn AS (SELECT toks, row_number() OVER (ORDER BY doc_id) AS rnk FROM d),
           |rs AS (SELECT toks, row_number() OVER (ORDER BY toks, doc_id) AS rnk FROM d),
           |bn AS (SELECT (rnk - 1) // 32 AS batch, count(*) AS n_docs,
           |    max(toks) AS mx, CAST(sum(toks) AS BIGINT) AS tok FROM rn GROUP BY 1),
           |bs AS (SELECT (rnk - 1) // 32 AS batch, count(*) AS n_docs,
           |    max(toks) AS mx, CAST(sum(toks) AS BIGINT) AS tok FROM rs GROUP BY 1),
           |an AS (SELECT 'naive' AS strategy, count(*) AS n_batches,
           |    CAST(sum(tok) AS BIGINT) AS total_tokens,
           |    CAST(sum(mx * n_docs) AS BIGINT) AS total_padded FROM bn),
           |asrt AS (SELECT 'length_sorted' AS strategy, count(*) AS n_batches,
           |    CAST(sum(tok) AS BIGINT) AS total_tokens,
           |    CAST(sum(mx * n_docs) AS BIGINT) AS total_padded FROM bs)
           |SELECT strategy, n_batches, total_tokens, total_padded,
           |  CAST(total_padded - total_tokens AS DOUBLE)
           |    / CAST(total_padded AS DOUBLE) AS waste_pct
           |FROM (SELECT * FROM an UNION ALL SELECT * FROM asrt)
           |ORDER BY strategy""".stripMargin),
      doc = "padding-waste census: naive vs length-sorted batching, exact-integer waste accounting"),

    // Robust per-group outlier census: MAD-based flagging (50% breakdown —
    // the cutoff survives the tail it hunts, unlike mean/stddev). Both
    // medians are exact order statistics over keyed histograms; the k·MAD
    // comparison is int64 — NOTHING floats, so the gate never reclassifies
    // rows between runs. The clean synthetic corpus gets deterministic
    // spliced inflation (doc_id % 97) — the PII/C4 contamination pattern.
    "profile_outliers" -> Q(
      fn = (s, dir) =>
        graft.operators.Profile.madOutliers(
          Tables.documents(s, dir).withColumn("v_len",
            when(col("doc_id") % 97 === 0, col("n_chars") * 20)
              .otherwise(col("n_chars"))),
          "lang", "v_len", k = 3),
      oracle = Some(
        """WITH b AS (SELECT lang AS g,
          |    CAST(CASE WHEN doc_id % 97 = 0 THEN n_chars * 20 ELSE n_chars END
          |      AS BIGINT) AS v
          |  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL),
          |h1 AS (SELECT g, v, count(*) AS c FROM b GROUP BY 1, 2),
          |t1 AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM h1 GROUP BY 1),
          |c1 AS (SELECT g, v, sum(c) OVER (PARTITION BY g ORDER BY v
          |    ROWS UNBOUNDED PRECEDING) AS cum FROM h1),
          |med AS (SELECT c1.g, min(v) AS med FROM c1 JOIN t1 ON c1.g = t1.g
          |  WHERE cum >= (n * 50 + 99) // 100 GROUP BY 1),
          |d AS (SELECT b.g, abs(v - med) AS dv FROM b JOIN med ON b.g = med.g),
          |h2 AS (SELECT g, dv, count(*) AS c FROM d GROUP BY 1, 2),
          |t2 AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM h2 GROUP BY 1),
          |c2 AS (SELECT g, dv, sum(c) OVER (PARTITION BY g ORDER BY dv
          |    ROWS UNBOUNDED PRECEDING) AS cum FROM h2),
          |mad AS (SELECT c2.g, min(dv) AS mad FROM c2 JOIN t2 ON c2.g = t2.g
          |  WHERE cum >= (n * 50 + 99) // 100 GROUP BY 1)
          |SELECT b.g AS lang, count(*) AS n_rows, min(med) AS median,
          |  min(mad) AS mad,
          |  CAST(sum(CASE WHEN abs(v - med) > 3 * mad THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_outliers
          |FROM b JOIN med ON b.g = med.g JOIN mad ON b.g = mad.g
          |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "MAD outlier census: exact integer medians, drift-free robust quality gate"),


    // Benford leading-digit audit over object sizes — the data-forensics
    // census (fabricated/synthetic numeric columns flunk it). Shares and
    // reference shares are scaled integers (micro-units, floor division);
    // nothing floats. TPC-H's near-uniform prices SHOULD flunk — the
    // excess column reports exactly how.
    "profile_benford" -> Q(
      fn = (s, dir) => {
        val benford = typedLit(Map(1 -> 301029, 2 -> 176091, 3 -> 124938,
          4 -> 96910, 5 -> 79181, 6 -> 66946, 7 -> 57991, 8 -> 51152,
          9 -> 45757))
        val sizes = Tables.objects(s, dir).select(col("size"))
        val t = sizes.agg(count(lit(1)).as("total"))
        sizes.select(substring(col("size").cast("string"), 1, 1).cast("int").as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
          .crossJoin(t)
          .select(col("digit"), col("n"), col("total"),
            expr("(n * 1000000) div total").as("share_micro"),
            element_at(benford, col("digit")).as("benford_micro"))
          .withColumn("excess_micro", col("share_micro") - col("benford_micro"))
          .orderBy(col("digit"))
      },
      oracle = Some(Oracle.withObjects(
        """, s AS (SELECT CAST(substr(CAST(size AS VARCHAR), 1, 1) AS INT) AS digit
          |  FROM objects),
          |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM s),
          |h AS (SELECT digit, count(*) AS n FROM s GROUP BY 1),
          |b(digit, benford_micro) AS (VALUES (1, 301029), (2, 176091),
          |  (3, 124938), (4, 96910), (5, 79181), (6, 66946), (7, 57991),
          |  (8, 51152), (9, 45757))
          |SELECT h.digit, h.n, t.total,
          |  (h.n * 1000000) // t.total AS share_micro, b.benford_micro,
          |  (h.n * 1000000) // t.total - b.benford_micro AS excess_micro
          |FROM h JOIN b USING (digit) CROSS JOIN t ORDER BY h.digit""".stripMargin)),
      doc = "Benford leading-digit forensics census: scaled-integer shares vs log10(1+1/d)"),

    // Epoch-shuffle shard manifest: a fresh deterministic permutation per
    // epoch (md5 keyed by epoch‖id), sharded; Σ rank·id per (epoch, shard)
    // pins the ENTIRE read order in one exact integer — the oracle match
    // certifies the permutation itself, not just shard membership.
    "pack_epoch_shuffle" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir).select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("toks"))
        graft.operators.Packing.epochShuffleManifest(
          d, "doc_id", "toks", epochs = 3, shards = 8, salt = "ep1")
      },
      oracle = Some(
        s"""WITH d AS (SELECT doc_id, CAST(len($wordsSql) AS INT) AS toks
           |  FROM documents),
           |e AS (SELECT doc_id, toks, unnest(range(3)) AS epoch FROM d),
           |hx AS (SELECT doc_id, toks, epoch,
           |    CAST('0x' || substr(md5(concat('ep1', CAST(epoch AS VARCHAR),
           |      '|', CAST(doc_id AS VARCHAR))), 1, 15) AS BIGINT) AS h FROM e),
           |r AS (SELECT doc_id, toks, epoch, h, h % 8 AS shard,
           |    row_number() OVER (PARTITION BY epoch, h % 8
           |      ORDER BY h, doc_id) AS rank FROM hx)
           |SELECT epoch, shard, count(*) AS n_docs,
           |  CAST(sum(toks) AS BIGINT) AS n_tokens,
           |  min_by(doc_id, rank) AS first_doc,
           |  CAST(sum(rank * doc_id) AS BIGINT) AS order_checksum
           |FROM r GROUP BY 1, 2 ORDER BY epoch, shard""".stripMargin),
      doc = "epoch-shuffle manifest: per-epoch deterministic permutation, order-checksummed"),

    // Document chunking: 64-token sliding windows, 16-token overlap
    // (stride 48) — the context-window preprocessing step upstream of
    // pack_sequences. Chunk text compares by md5 so the output stays narrow.
    "text_chunking" -> Q(
      fn = (s, dir) =>
        TextAnalysis.chunkDocuments(Tables.documents(s, dir), "doc_id", "text",
          chunkTokens = 64, overlap = 16)
          .orderBy(col("doc_id"), col("chunk_id")),
      oracle = Some(
        s"""WITH d AS (SELECT doc_id, $wordsSql AS w FROM documents),
           |c AS (SELECT doc_id, w,
           |        greatest(1, CAST(floor((len(w) - 16 + 47) / 48.0) AS INT)) AS nc FROM d),
           |ex AS (SELECT doc_id, w, unnest(generate_series(0, nc - 1)) AS i FROM c),
           |ch AS (SELECT doc_id, CAST(i AS INT) AS chunk_id,
           |         CAST(i * 48 + 1 AS INT) AS tok_start,
           |         w[(i * 48 + 1):(i * 48 + 64)] AS cw FROM ex)
           |SELECT doc_id, chunk_id, tok_start, CAST(len(cw) AS INT) AS n_tokens,
           |       md5(array_to_string(cw, ' ')) AS chunk_hash
           |FROM ch ORDER BY doc_id, chunk_id""".stripMargin),
      doc = "document chunking (sliding context windows, overlap carry-over)"),

    // TF-IDF top-3 keyword extraction per doc: idf rounds to 6 dp before
    // the decimal tf·idf product, so scores — and the top-k selection they
    // drive — are engine-exact; term asc tiebreaks equal scores.
    "text_tfidf_topterms" -> Q(
      fn = (s, dir) =>
        TextAnalysis.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text", 3)
          .withColumnRenamed("id", "doc_id")
          .orderBy(col("doc_id"), col("rank")),
      oracle = Some(
        s"""WITH tok AS (SELECT doc_id AS id, unnest($wordsSql) AS w FROM documents),
           |tf AS (SELECT id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
           |n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
           |dfr AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
           |scored AS (SELECT id, w, tf,
           |    round(CAST(tf * CAST(round(ln(n / df), 6) AS DECIMAL(18,6)) AS DOUBLE), 6) AS score
           |  FROM tf JOIN dfr USING (w), n),
           |ranked AS (SELECT id, w, tf, score,
           |    row_number() OVER (PARTITION BY id ORDER BY score DESC, w) AS rn
           |  FROM scored)
           |SELECT id AS doc_id, CAST(rn AS INT) AS rank, w AS term, tf, score
           |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rank""".stripMargin),
      doc = "TF-IDF top-k keyword extraction (decimal-exact scores, bounded window)"),

    // THE end-to-end corpus build: near-dup dedup (survivors + absorption)
    // → C4/Gopher quality gate → stratified training-mix sampling →
    // token-budget packing, one composed pipeline, hash-checked — every
    // stage is a previously-proven oracle piece chained into one CTE tree.
    "pipeline_corpus_build" -> Q(
      fn = (s, dir) => {
        import graft.operators.{Packing, Sampling}
        val d = Tables.documents(s, dir)
        val corpus = d.select(col("doc_id"), col("text"), col("lang"))
          .unionByName(d.filter(col("doc_id") % 5 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"),
              concat(col("text"), lit(" quality data pipeline tail marker")).as("text"),
              col("lang")))
        val pairs = Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.5, maxDf = 8)
        val survivors = Dedup.dedupCorpus(corpus, "doc_id", pairs)
        val gated = survivors.filter(TextAnalysis.c4Keep(col("text")))
        val sampled = Sampling.stratifiedHashSample(gated, "lang", "doc_id",
          Map("en" -> 0.6, "de" -> 1.0, "fr" -> 1.0, "es" -> 1.0, "zh" -> 0.3),
          defaultFraction = 0.0, salt = "mix2")
        val toks = sampled.select(col("doc_id"), col("n_absorbed"),
          TextAnalysis.tokenCount(col("text")).as("toks"))
        Packing.assignBins(toks, "doc_id", "toks", budget = 256, shards = 4,
            salt = "packE2E")
          .groupBy(col("shard"), col("seq_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("toks")).cast("long").as("n_tokens"),
            sum(col("n_absorbed")).as("absorbed_total"),
            min(col("doc_id")).as("first_doc"))
          .withColumn("fill_ratio", col("n_tokens").cast("double") / 256.0)
          .orderBy(col("shard"), col("seq_id"))
      },
      oracle = Some(
        s"""WITH RECURSIVE corpus AS (
           |  SELECT doc_id, text, lang FROM documents
           |  UNION ALL
           |  SELECT doc_id + 1000000 AS doc_id,
           |         concat(text, ' quality data pipeline tail marker') AS text, lang
           |  FROM documents WHERE doc_id % 5 = 0),
           |$clusterCtes,
           |clusters AS (SELECT id, min(label) AS cluster FROM reach GROUP BY id),
           |absorbed AS (SELECT cluster, count(*) - 1 AS n_absorbed
           |             FROM clusters GROUP BY cluster),
           |survivors AS (SELECT c.doc_id, c.text, c.lang,
           |         coalesce(a.n_absorbed, 0) AS n_absorbed
           |  FROM corpus c
           |  LEFT JOIN clusters l ON l.id = c.doc_id AND l.id != l.cluster
           |  LEFT JOIN absorbed a ON a.cluster = c.doc_id
           |  WHERE l.id IS NULL),
           |gated AS (SELECT * FROM survivors WHERE
           |  len($wordsSql) BETWEEN 10 AND 100000
           |  AND CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
           |      / len($wordsSql) BETWEEN 3.0 AND 10.0
           |  AND NOT contains(lower(text), 'lorem ipsum')
           |  AND NOT contains(text, '{')
           |  AND NOT list_contains($wordsSql, 'javascript')
           |  AND (length(text) - length(replace(text, '#', ''))) * 20 <= len($wordsSql)
           |  AND len(list_filter($wordsSql, x -> regexp_matches(x, '[a-z]'))) * 5
           |      >= len($wordsSql) * 4
           |  AND len(list_filter($wordsSql,
           |      x -> x IN ('the','a','and','of','to','in','is','for','on','with'))) >= 2),
           |sampled AS (SELECT * FROM gated WHERE
           |  CAST('0x' || substr(md5(concat('mix2', CAST(doc_id AS VARCHAR))), 1, 15) AS BIGINT)
           |    % 10000 < CASE lang WHEN 'en' THEN 6000 WHEN 'zh' THEN 3000 ELSE 10000 END),
           |toks AS (SELECT doc_id, n_absorbed, CAST(len($wordsSql) AS INT) AS toks,
           |  CAST('0x' || substr(md5(concat('packE2E', CAST(doc_id AS VARCHAR))), 1, 15) AS BIGINT)
           |    % 4 AS shard FROM sampled),
           |cum AS (SELECT doc_id, n_absorbed, toks, shard,
           |  sum(toks) OVER (PARTITION BY shard ORDER BY doc_id) AS c FROM toks),
           |bins AS (SELECT shard, CAST(floor((c - 1) / 256) AS BIGINT) AS seq_id,
           |                doc_id, n_absorbed, toks FROM cum)
           |SELECT shard, seq_id, count(*) AS n_docs,
           |       CAST(sum(toks) AS BIGINT) AS n_tokens,
           |       CAST(sum(n_absorbed) AS BIGINT) AS absorbed_total,
           |       min(doc_id) AS first_doc,
           |       CAST(sum(toks) AS DOUBLE) / 256 AS fill_ratio
           |FROM bins GROUP BY 1, 2 ORDER BY shard, seq_id""".stripMargin),
      doc = "end-to-end corpus build: dedup → quality gate → mix sample → packing"),

    // Document fingerprint (order-insensitive content hash).
    "text_fingerprint" -> Q(
      fn = (s, dir) => Tables.documents(s, dir)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id")),
      oracle = Some(
        s"""SELECT doc_id,
           |  md5(array_to_string(list_sort(list_distinct($wordsSql)), ' ')) AS fp
           |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "document fingerprinting"),

    // Gopher quality rules (Rae et al. 2021 §A1.1) — the OTHER canonical
    // web-filtering rule set beside text_c4_filters: word-count bounds,
    // mean-word-length band, symbol-to-word ratio, alphabetic-word
    // fraction, and the ≥2-of-8-stopwords test. (Gopher's repetition rules
    // live in text_repetition.) Every gate compares as cross-multiplied
    // integers — no float ratio ever materializes, so no boundary drift.
    // One codegen'd narrow pass, trivially map-parallel at any scale.
    "text_gopher_rules" -> Q(
      fn = (s, dir) => {
        val w = TextAnalysis.words(col("text"))
        val nWords = size(w).cast("long")
        val sumChars = aggregate(w, lit(0L), (acc, x) => acc + length(x))
        val nSym = size(filter(w, x => x.contains("#") || x.contains("...")))
          .cast("long")
        val nAlpha = size(filter(w, x => x.rlike("[a-z]"))).cast("long")
        val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
        val nStop = size(array_intersect(array_distinct(w),
          array(stops.map(lit): _*))).cast("long")
        Tables.documents(s, dir).select(col("doc_id"),
            nWords.as("n_words"),
            (nWords < 50 || nWords > 100000).as("flag_word_count"),
            (sumChars < nWords * 3 || sumChars > nWords * 10).as("flag_word_len"),
            (nSym * 10 > nWords).as("flag_symbol"),
            (nAlpha * 5 < nWords * 4).as("flag_alpha"),
            (nStop < 2).as("flag_stop"))
          .withColumn("keep",
            !(col("flag_word_count") || col("flag_word_len") ||
              col("flag_symbol") || col("flag_alpha") || col("flag_stop")))
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        s"""WITH f AS (SELECT doc_id, $wordsSql AS w FROM documents),
           |m AS (SELECT doc_id, len(w) AS n_words,
           |    list_sum(list_transform(w, x -> len(x))) AS sum_chars,
           |    len(list_filter(w, x -> contains(x, '#') OR contains(x, '...'))) AS n_sym,
           |    len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
           |    len(list_intersect(list_distinct(w),
           |      ['the','be','to','of','and','that','have','with'])) AS n_stop
           |  FROM f)
           |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           |  n_words < 50 OR n_words > 100000 AS flag_word_count,
           |  sum_chars < n_words * 3 OR sum_chars > n_words * 10 AS flag_word_len,
           |  n_sym * 10 > n_words AS flag_symbol,
           |  n_alpha * 5 < n_words * 4 AS flag_alpha,
           |  n_stop < 2 AS flag_stop,
           |  NOT (n_words < 50 OR n_words > 100000
           |    OR sum_chars < n_words * 3 OR sum_chars > n_words * 10
           |    OR n_sym * 10 > n_words OR n_alpha * 5 < n_words * 4
           |    OR n_stop < 2) AS keep
           |FROM m ORDER BY doc_id""".stripMargin),
      doc = "Gopher quality-rule gates (word stats, symbol/alpha ratios, stopword test) as exact-int flags"),

    // DSIR importance weights (Xie et al. 2023): per-doc log-likelihood
    // ratio between a TARGET distribution (here: the English slice) and
    // the raw corpus, over hashed bigram features (10k buckets, the
    // portable md5 kernel) with add-one smoothing. The feature table is
    // bucket-sized (≤10k rows — broadcasts at any corpus scale); the
    // per-doc reduce is one combinable integer sum. Each bucket's term is
    // one exact-int product chain → one correctly-rounded division → one ln
    // → floor(·1e6) into BIGINT micro-units (scaled-integer tau): the graded
    // surface carries NO decimal-of-rounded-double — r5/r6 showed
    // round(double,n)→DECIMAL hashes are engine-build-sensitive, and an
    // integer sum of micro-unit taus is order-free and exact.
    "text_dsir_weights" -> Q(
      fn = (s, dir) => {
        val w = TextAnalysis.words(col("text"))
        val bigrams = when(size(w) >= 2,
          transform(sequence(lit(1), size(w) - 1),
            i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
          .otherwise(array().cast("array<string>"))
        val gb = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), explode(bigrams).as("g"))
          .withColumn("b",
            expr("cast(conv(substring(md5(g), 1, 15), 16, 10) as bigint) % 10000"))
        graft.operators.CacheOnce.pin(gb)
        gb.count() // pin: census + term table + per-doc reduce
        val tot = gb.agg(count(lit(1)).as("r_total"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t_total"))
        val cr = gb.groupBy(col("b")).agg(count(lit(1)).as("cr"))
        val ct = gb.filter(col("lang") === "en")
          .groupBy(col("b")).agg(count(lit(1)).as("ct"))
        val terms = cr.join(ct, Seq("b"), "left").crossJoin(tot)
          .select(col("b"), floor(log(
            ((coalesce(col("ct"), lit(0L)) + 1L).cast("double")
              * (col("r_total") + 10000L).cast("double"))
              / ((col("cr") + 1L).cast("double")
                * (col("t_total") + 10000L).cast("double"))) * lit(1.0e6))
            .as("tau_u"))
        gb.join(terms, Seq("b"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            sum(col("tau_u")).as("logw_micros"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        s"""WITH d AS (SELECT doc_id, lang, $wordsSql AS w FROM documents),
           |g AS (SELECT doc_id, lang, unnest(CASE WHEN len(w) >= 2
           |    THEN list_transform(generate_series(1, len(w) - 1),
           |                        i -> w[i] || ' ' || w[i+1])
           |    ELSE CAST([] AS VARCHAR[]) END) AS g FROM d),
           |gb AS (SELECT doc_id, lang,
           |    CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 10000 AS b FROM g),
           |tot AS (SELECT count(*) AS r_total,
           |    count(*) FILTER (lang = 'en') AS t_total FROM gb),
           |cr AS (SELECT b, count(*) AS cr FROM gb GROUP BY b),
           |ct AS (SELECT b, count(*) AS ct FROM gb WHERE lang = 'en' GROUP BY b),
           |terms AS (SELECT cr.b, CAST(floor(ln(
           |      (CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE) * CAST(r_total + 10000 AS DOUBLE))
           |      / (CAST(cr.cr + 1 AS DOUBLE) * CAST(t_total + 10000 AS DOUBLE))) * 1000000.0)
           |    AS BIGINT) AS tau_u
           |  FROM cr LEFT JOIN ct ON cr.b = ct.b, tot)
           |SELECT doc_id, count(*) AS n_bigrams,
           |       CAST(sum(tau_u) AS BIGINT) AS logw_micros
           |FROM gb JOIN terms USING (b)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      doc = "DSIR hashed-bigram importance weights: bucket-sized term table, scaled-integer tau, exact int doc sums"),

    // Content-defined chunking dedup (the rsync/LBFS/backup-storage
    // primitive): chunk boundaries fall where a local rolling feature
    // (md5 of the adjacent word pair, mod 8 — expected chunk ≈ 8 words)
    // hits zero, so an insertion early in a document only perturbs the
    // chunk it lands in — unlike fixed-size blocks, every later chunk
    // re-aligns and still dedups. Row-local kernel (no shuffle until the
    // chunk census), one groupBy(chunk) with partial aggregation. The
    // every-3rd-doc duplicated corpus makes the dedup ratio non-trivial;
    // the ratio is one int/int division (IEEE-exact cross-engine).
    "store_cdc_chunks" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 3 === 0)
            .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
        val chunks = Dedup.cdcChunks(corpus, "doc_id", "text", m = 8)
        chunks.groupBy(col("chunk"))
          .agg(count(lit(1)).as("cnt"))
          .agg(sum(col("cnt")).as("n_chunks"),
            count(lit(1)).as("n_unique"),
            sum(col("cnt") * length(col("chunk"))).as("total_chars"),
            sum(length(col("chunk"))).as("unique_chars"))
          .select(col("n_chunks"), col("n_unique"), col("total_chars"),
            col("unique_chars"),
            (col("total_chars").cast("double") / col("unique_chars").cast("double"))
              .as("dedup_ratio"))
      },
      oracle = Some(
        s"""WITH $corpusCte,
           |${cdcChunkCtes("", "corpus")},
           |cc AS (SELECT chunk, count(*) AS cnt FROM ch GROUP BY chunk)
           |SELECT CAST(sum(cnt) AS BIGINT) AS n_chunks, count(*) AS n_unique,
           |  CAST(sum(cnt * len(chunk)) AS BIGINT) AS total_chars,
           |  CAST(sum(len(chunk)) AS BIGINT) AS unique_chars,
           |  CAST(sum(cnt * len(chunk)) AS DOUBLE) / CAST(sum(len(chunk)) AS DOUBLE) AS dedup_ratio
           |FROM cc""".stripMargin),
      doc = "content-defined chunking (LBFS/rsync shape): boundary-local kernel, chunk-level dedup census"),

    // Asymmetric containment dedup: every 7th doc's FIRST HALF is spliced
    // back as a new short doc — its shingles are a subset of the parent's,
    // so Jaccard ≈ |small|/|big| ≈ 0.5 (below any near-dup threshold) but
    // containment = 1.0. This is the dedup case symmetric scores
    // structurally miss (quotes, excerpts, partial scrapes).
    "dedup_containment" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val w = TextAnalysis.words(col("text"))
        val corpus = d.select(col("doc_id"), col("text"))
          .unionByName(d.filter(col("doc_id") % 7 === 0)
            .select((col("doc_id") + 2000000).as("doc_id"),
              array_join(slice(w, lit(1), greatest((size(w) / 2).cast("int"), lit(4))),
                " ").as("text")))
        Dedup.containmentPairs(corpus, "doc_id", "text", 3, 0.9)
          .orderBy(col("id_a"), col("id_b"))
      },
      oracle = Some(
        s"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 2000000 AS doc_id,
           |    array_to_string(($wordsSql)[1:greatest(CAST(len($wordsSql) AS INT) // 2, 4)],
           |      ' ') AS text
           |  FROM documents WHERE doc_id % 7 = 0),
           |sh AS (SELECT doc_id AS id, list_distinct(list_transform(
           |    generate_series(1, greatest(len($wordsSql) - 2, 1)),
           |    i -> array_to_string(($wordsSql)[i:i+2], ' '))) AS shl FROM corpus),
           |e0 AS (SELECT id, len(shl) AS n_sh, unnest(shl) AS s FROM sh),
           |p AS (SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS na, b.n_sh AS nb,
           |             count(*) AS inter
           |      FROM e0 a JOIN e0 b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2, 3, 4),
           |c AS (SELECT id_a, id_b, CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
           |             round(CAST(inter AS DOUBLE) / least(na, nb), 6) AS containment
           |      FROM p)
           |SELECT id_a, id_b, na, nb, containment FROM c
           |WHERE containment >= 0.9 ORDER BY id_a, id_b""".stripMargin),
      doc = "containment (|A∩B|/min) near-dup pairs: catches embedded/excerpted docs Jaccard misses"),

    // Incremental backup planning over the CDC chunk store: corpus v2 =
    // every 10th doc edited at its HEAD (the worst case for fixed-size
    // blocking, which would shift every later block). Content-defined
    // boundaries re-align right after the edit, so only the edited-chunk
    // bytes upload; the census is the incremental-backup cost estimate.
    // One left join against the v1 chunk store (groupBy-deduped — at scale
    // a bucketed stored table like the MinHash signature tables), flag
    // sums CAST to BIGINT per the repo invariant.
    "store_cdc_incremental" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        val v1 = Dedup.cdcChunks(d, "doc_id", "text", m = 8)
          .select(col("chunk")).distinct().withColumn("known", lit(1))
        val v2docs = d.select(col("doc_id"),
          when(col("doc_id") % 10 === 0, concat(lit("edit marker "), col("text")))
            .otherwise(col("text")).as("text"))
        Dedup.cdcChunks(v2docs, "doc_id", "text", m = 8)
          .join(v1, Seq("chunk"), "left")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("known").isNull, 1L).otherwise(0L)).as("n_new_chunks"),
            sum(when(col("known").isNull, length(col("chunk"))).otherwise(0L))
              .as("new_chars"),
            sum(when(col("known").isNotNull, length(col("chunk"))).otherwise(0L))
              .as("reused_chars"))
          .select(col("n_chunks"), col("n_new_chunks"), col("new_chars"),
            col("reused_chars"),
            (col("reused_chars").cast("double")
              / (col("new_chars") + col("reused_chars")).cast("double"))
              .as("reuse_ratio"))
      },
      oracle = Some(
        s"""WITH ${cdcChunkCtes("o_", "documents")},
           |v2 AS (SELECT doc_id, CASE WHEN doc_id % 10 = 0
           |    THEN 'edit marker ' || text ELSE text END AS text FROM documents),
           |${cdcChunkCtes("n_", "v2")},
           |store AS (SELECT DISTINCT chunk FROM o_ch),
           |probe AS (SELECT n_ch.chunk,
           |    CASE WHEN store.chunk IS NULL THEN 1 ELSE 0 END AS is_new
           |  FROM n_ch LEFT JOIN store ON n_ch.chunk = store.chunk)
           |SELECT count(*) AS n_chunks,
           |  CAST(sum(is_new) AS BIGINT) AS n_new_chunks,
           |  CAST(sum(CASE WHEN is_new = 1 THEN len(chunk) ELSE 0 END) AS BIGINT) AS new_chars,
           |  CAST(sum(CASE WHEN is_new = 0 THEN len(chunk) ELSE 0 END) AS BIGINT) AS reused_chars,
           |  CAST(sum(CASE WHEN is_new = 0 THEN len(chunk) ELSE 0 END) AS DOUBLE)
           |    / CAST(sum(len(chunk)) AS DOUBLE) AS reuse_ratio
           |FROM probe""".stripMargin),
      doc = "CDC incremental backup plan: head-edited v2 vs v1 chunk store, re-aligned reuse census"),

    // Distributed classifier TRAINING: the model is an L×B-bounded relation
    // of integer sufficient statistics (token count + doc frequency per
    // (label, hashed-feature bucket)) — NB and Rocchio both train from
    // exactly these counts, and the map-side combine absorbs any corpus
    // size. Split is the deterministic doc_id hash (80% train).
    "text_classifier_train" -> Q(
      fn = (s, dir) =>
        TextAnalysis.classProfiles(
          Tables.documents(s, dir).filter(col("doc_id") % 10 < 8),
          "doc_id", "text", "lang", buckets = 256)
          .orderBy(col("label"), col("bucket")),
      oracle = Some(
        s"""WITH tok AS (SELECT doc_id, lang AS label, unnest($wordsSql) AS w
           |  FROM documents WHERE doc_id % 10 < 8),
           |tb AS (SELECT doc_id, label,
           |  CAST(CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 256 AS INT) AS bucket
           |  FROM tok)
           |SELECT label, bucket, count(*) AS n, count(DISTINCT doc_id) AS df
           |FROM tb GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "multinomial classifier training: hashed bag-of-words class profiles (integer sufficient statistics)"),

    // Held-out eval of the trained profiles via Rocchio argmax — the argmax
    // over score/N_l is EXACT (pairwise cross-multiplication in
    // DECIMAL(38,0) / HUGEINT, smaller-label tiebreak; no float division
    // anywhere in the graded chain). Graded: the confusion matrix.
    "text_classifier_eval" -> Q(
      fn = (s, dir) => {
        val d = Tables.documents(s, dir)
        TextAnalysis.rocchioPredict(
          d.filter(col("doc_id") % 10 < 8), d.filter(col("doc_id") % 10 >= 8),
          "doc_id", "text", "lang", buckets = 256)
          .groupBy(col("label_true"), col("label_pred"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("label_true"), col("label_pred"))
      },
      oracle = Some(
        s"""WITH tok AS (SELECT doc_id, lang,
           |  CAST(CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 256 AS INT) AS bucket
           |  FROM (SELECT doc_id, lang, unnest($wordsSql) AS w FROM documents)),
           |prof AS (SELECT lang AS label, bucket, CAST(count(*) AS BIGINT) AS n
           |  FROM tok WHERE doc_id % 10 < 8 GROUP BY 1, 2),
           |tot AS (SELECT label, CAST(sum(n) AS BIGINT) AS nl FROM prof GROUP BY 1),
           |dv AS (SELECT doc_id, lang AS label_true, bucket, CAST(count(*) AS BIGINT) AS c
           |  FROM tok WHERE doc_id % 10 >= 8 GROUP BY 1, 2, 3),
           |sc AS (SELECT dv.doc_id, p.label, CAST(sum(dv.c * p.n) AS BIGINT) AS s
           |  FROM dv JOIN prof p USING (bucket) GROUP BY 1, 2),
           |docs AS (SELECT DISTINCT doc_id, label_true FROM dv),
           |dense AS (SELECT d.doc_id, d.label_true, t.label, t.nl,
           |    COALESCE(sc.s, 0) AS s
           |  FROM docs d CROSS JOIN tot t
           |  LEFT JOIN sc ON sc.doc_id = d.doc_id AND sc.label = t.label),
           |win AS (SELECT a.doc_id, a.label_true, a.label AS label_pred
           |  FROM dense a JOIN dense b ON a.doc_id = b.doc_id
           |  GROUP BY a.doc_id, a.label_true, a.label
           |  HAVING sum(CASE WHEN CAST(b.s AS HUGEINT) * a.nl > CAST(a.s AS HUGEINT) * b.nl
           |      OR (CAST(b.s AS HUGEINT) * a.nl = CAST(a.s AS HUGEINT) * b.nl
           |          AND b.label < a.label) THEN 1 ELSE 0 END) = 0)
           |SELECT label_true, label_pred, count(*) AS n
           |FROM win GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "held-out classifier eval: Rocchio nearest-centroid confusion matrix, exact cross-multiplied argmax"),


    // CCNet composed end-to-end (dedup -> langid -> LM score -> per-lang
    // perplexity terciles). Boundary state is the BUCKETED score histogram
    // (floor(mean_surprisal*100)) so the tercile computation is bounded per
    // language; the graded census is (lang, tier) docs + tokens.
    "pipeline_ccnet" -> Q(
      fn = (s, dir) =>
        TextAnalysis.ccnetTiers(Tables.documents(s, dir), "doc_id", "text", 4)
          .orderBy(col("lang"), col("tier")),
      oracle = Some(
        s"""WITH d AS (SELECT doc_id AS id, $wordsSql AS ws FROM documents),
           |l0 AS (SELECT id, unnest(list_transform(
           |    generate_series(0, CAST(floor((len(ws) + 3) / 4) AS INT) - 1),
           |    i -> struct_pack(line_no := i, line := array_to_string(ws[i*4+1 : i*4+4], ' ')))) AS u
           |  FROM d),
           |l AS (SELECT id, CAST(u.line_no AS BIGINT) AS line_no, u.line AS line FROM l0),
           |win0 AS (SELECT line, min(id * 4294967296 + line_no) AS keep_key FROM l GROUP BY line),
           |kept AS (SELECT id, line FROM l JOIN win0 USING (line)
           |         WHERE id * 4294967296 + line_no = keep_key),
           |tok AS (SELECT id, unnest(string_split_regex(line, '\\s+')) AS wd FROM kept),
           |lm AS (SELECT wd, count(*) AS c FROM tok GROUP BY wd),
           |nn AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM lm),
           |sv AS (SELECT wd, CAST(round(ln(n / c), 6) AS DECIMAL(18,6)) AS surp FROM lm, nn),
           |ds AS (SELECT id, count(*) AS n_tokens,
           |    CAST(floor(round(CAST(sum(surp) AS DOUBLE) / count(*), 6) * 100) AS BIGINT) AS bucket
           |  FROM tok JOIN sv USING (wd) GROUP BY id),
           |ls AS (SELECT doc_id AS id,
           |  len(list_filter($wordsSql, w -> w IN ('the','a','and','of','to','in','is'))) AS s_en,
           |  len(list_filter($wordsSql, w -> w IN ('el','la','de','que','y','en','los'))) AS s_es,
           |  len(list_filter($wordsSql, w -> w IN ('der','die','und','das','von','ist','ein'))) AS s_de,
           |  len(list_filter($wordsSql, w -> w IN ('le','la','et','les','des','est','une'))) AS s_fr
           |  FROM documents),
           |lng AS (SELECT id, CASE
           |  WHEN s_fr > greatest(s_de, s_es, s_en, 0) THEN 'fr'
           |  WHEN s_de > greatest(s_es, s_en, 0) THEN 'de'
           |  WHEN s_es > greatest(s_en, 0) THEN 'es'
           |  WHEN s_en > 0 THEN 'en'
           |  ELSE 'und' END AS lang FROM ls),
           |db AS (SELECT ds.id, lng.lang, ds.n_tokens, ds.bucket FROM ds JOIN lng USING (id)),
           |hist AS (SELECT lang, bucket, count(*) AS nb FROM db GROUP BY 1, 2),
           |cum AS (SELECT lang, bucket, nb,
           |    sum(nb) OVER (PARTITION BY lang ORDER BY bucket) AS cumn FROM hist),
           |tot AS (SELECT lang, CAST(sum(nb) AS BIGINT) AS nl FROM hist GROUP BY 1),
           |bnd AS (SELECT cum.lang,
           |    min(CASE WHEN cumn * 3 >= nl THEN bucket END) AS b1,
           |    min(CASE WHEN cumn * 3 >= nl * 2 THEN bucket END) AS b2
           |  FROM cum JOIN tot ON cum.lang = tot.lang GROUP BY cum.lang),
           |tier AS (SELECT db.lang,
           |    CASE WHEN db.bucket <= b1 THEN 'head'
           |         WHEN db.bucket <= b2 THEN 'middle' ELSE 'tail' END AS tier,
           |    db.n_tokens
           |  FROM db JOIN bnd ON db.lang = bnd.lang)
           |SELECT lang, tier, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
           |FROM tier GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "CCNet pipeline capstone: line dedup -> lang ID -> LM surprisal -> per-lang perplexity terciles"),
    // The pretraining-corpus capstone: quality gates -> exact dedup ->
    // lang ID -> alpha=0.5 temperature mix -> shard packing, one plan.
    // Weight quantization (floor(sqrt*1e9)) and the DECIMAL/HUGEINT budget
    // division keep every graded value an exact integer.
    "pipeline_pretrain_mix" -> Q(
      fn = (s, dir) =>
        TextAnalysis.pretrainCorpusPlan(Tables.documents(s, dir),
          "doc_id", "text", budgetTokens = 100000L, shardTokens = 4096)
          .orderBy(col("lang")),
      oracle = Some(
        s"""WITH w0 AS (SELECT doc_id, $wordsSql AS w FROM documents),
           |m AS (SELECT doc_id, len(w) AS n_words,
           |    list_sum(list_transform(w, x -> len(x))) AS sum_chars,
           |    len(list_filter(w, x -> contains(x, '#') OR contains(x, '...'))) AS n_sym,
           |    len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
           |    md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS fp
           |  FROM w0),
           |ls AS (SELECT doc_id AS id,
           |  len(list_filter($wordsSql, w -> w IN ('the','a','and','of','to','in','is'))) AS s_en,
           |  len(list_filter($wordsSql, w -> w IN ('el','la','de','que','y','en','los'))) AS s_es,
           |  len(list_filter($wordsSql, w -> w IN ('der','die','und','das','von','ist','ein'))) AS s_de,
           |  len(list_filter($wordsSql, w -> w IN ('le','la','et','les','des','est','une'))) AS s_fr
           |  FROM documents),
           |lng AS (SELECT id, CASE
           |  WHEN s_fr > greatest(s_de, s_es, s_en, 0) THEN 'fr'
           |  WHEN s_de > greatest(s_es, s_en, 0) THEN 'de'
           |  WHEN s_es > greatest(s_en, 0) THEN 'es'
           |  WHEN s_en > 0 THEN 'en'
           |  ELSE 'und' END AS lang FROM ls),
           |base AS (SELECT m.doc_id AS id, lng.lang,
           |    CAST(m.n_words AS BIGINT) AS n_words, m.fp,
           |    NOT (m.n_words < 20 OR m.n_words > 100000
           |      OR m.sum_chars < m.n_words * 3 OR m.sum_chars > m.n_words * 10
           |      OR m.n_sym * 10 > m.n_words OR m.n_alpha * 5 < m.n_words * 4) AS keep
           |  FROM m JOIN lng ON lng.id = m.doc_id),
           |q AS (SELECT * FROM base WHERE keep),
           |win AS (SELECT fp, min(id) AS keep_id FROM q GROUP BY fp),
           |surv AS (SELECT q.* FROM q JOIN win ON q.fp = win.fp AND q.id = win.keep_id),
           |pl AS (SELECT lang, count(*) AS docs_in,
           |    CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS docs_quality
           |  FROM base GROUP BY 1),
           |sl AS (SELECT lang, count(*) AS docs_final,
           |    CAST(sum(n_words) AS BIGINT) AS tokens FROM surv GROUP BY 1),
           |j AS (SELECT pl.lang, pl.docs_in, pl.docs_quality,
           |    coalesce(sl.docs_final, 0) AS docs_final,
           |    coalesce(sl.tokens, 0) AS tokens
           |  FROM pl LEFT JOIN sl ON pl.lang = sl.lang),
           |j2 AS (SELECT *, CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000000000.0)
           |    AS BIGINT) AS wq FROM j),
           |t AS (SELECT CAST(sum(wq) AS BIGINT) AS wq_total FROM j2),
           |a AS (SELECT j2.*, CASE WHEN t.wq_total = 0 THEN 0
           |    ELSE CAST((CAST(100000 AS HUGEINT) * j2.wq) // t.wq_total AS BIGINT)
           |    END AS alloc_tokens FROM j2 CROSS JOIN t)
           |SELECT lang, docs_in, docs_quality, docs_final, tokens, wq,
           |  alloc_tokens, (alloc_tokens + 4095) // 4096 AS n_shards
           |FROM a ORDER BY lang""".stripMargin),
      doc = "pretraining-corpus capstone: quality gates -> dedup -> lang ID -> temperature mix -> shards"),

    // N-gram novelty curve — the "value of the next batch of data"
    // measurement (diminishing-returns census): per arrival batch, the
    // share of its word 3-grams never seen in ANY earlier document.
    // First-occurrence attribution is one groupBy(gram).min(doc_id) —
    // the classic shuffle-on-content shape that scales to any corpus
    // (state ∝ distinct grams, partitioned by gram hash; no window, no
    // ordering dependence beyond the stable doc_id arrival order).
    // Measured sf0.01: novelty falls 0.91 → 0.40 across 5 batches —
    // the quantified case for dedup-before-training.
    "text_ngram_novelty" -> Q(
      fn = (s, dir) => {
        val w = split(lower(col("text")), " ")
        val grams = Tables.documents(s, dir)
          .select(col("doc_id"), w.as("w"))
          .filter(size(col("w")) >= 3)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(w) - 3), i -> " +
              "concat(element_at(w, i + 1), ' ', element_at(w, i + 2), " +
              "' ', element_at(w, i + 3)))")).as("g"))
          .distinct()
        val first = grams.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
        grams.join(first, "g")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
              .as("n_novel"))
          .groupBy(expr("doc_id div 100").as("batch"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_grams")).as("n_grams"),
            sum(col("n_novel")).as("n_novel"),
            round(sum(col("n_novel")).cast("double") /
              sum(col("n_grams")).cast("double"), 9).as("novelty"))
          .orderBy(col("batch"))
      },
      oracle = Some(
        """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS w
          |  FROM documents),
          |ng AS (SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
          |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM toks)
          |  WHERE len(w) >= 3),
          |dng AS (SELECT DISTINCT doc_id, g FROM ng),
          |fst AS (SELECT g, min(doc_id) AS first_doc FROM dng GROUP BY 1),
          |per AS (SELECT d.doc_id, count(*) AS n_grams,
          |    count(*) FILTER (WHERE f.first_doc = d.doc_id) AS n_novel
          |  FROM dng d JOIN fst f USING (g) GROUP BY 1)
          |SELECT doc_id // 100 AS batch, count(*) AS n_docs,
          |  CAST(sum(n_grams) AS BIGINT) AS n_grams,
          |  CAST(sum(n_novel) AS BIGINT) AS n_novel,
          |  round(CAST(sum(n_novel) AS DOUBLE) / sum(n_grams), 9) AS novelty
          |FROM per GROUP BY batch ORDER BY batch""".stripMargin),
      doc = "n-gram novelty curve per arrival batch: first-occurrence via groupBy-min, diminishing-returns census"),

    // ROUGE-2 overlap eval between reference docs and their synthetic
    // variants — the summarization/near-copy eval harness as a relational
    // operator: distinct-bigram sets, one equi-join on (pair, bigram) to
    // count the intersection (never a cross join), exact integer
    // overlap/counts, round-9 P/R/F1 (set-based F1 = 2·ov/(|ref|+|cand|),
    // one division of exact integers). At corpus scale the join is
    // partitioned by bigram content — the same shuffle class as exact
    // dedup; the pairing key (doc_id ↔ doc_id + 10⁶) is the standard
    // synthetic-variant splice used by the dedup family.
    "text_rouge_overlap" -> Q(
      fn = (s, dir) => {
        val base = Tables.documents(s, dir).filter(col("doc_id") % 5 === 0)
        val corpus = base.select(col("doc_id"), col("text"))
          .unionByName(base.select((col("doc_id") + 1000000).as("doc_id"),
            concat(col("text"), lit(" quality data pipeline tail marker"))
              .as("text")))
        val w = split(lower(col("text")), " ")
        val bg = corpus.select(col("doc_id"), w.as("wl"))
          .filter(size(col("wl")) >= 2)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(1, size(wl) - 1), " +
              "i -> concat(element_at(wl, i), ' ', element_at(wl, i + 1)))"))
            .as("b"))
          .distinct()
        val n = bg.groupBy(col("doc_id")).agg(count(lit(1)).as("nb"))
        val ov = bg.select((col("doc_id") + 1000000).as("cand_id"), col("b"))
          .join(bg.select(col("doc_id").as("cand_id"), col("b")),
            Seq("cand_id", "b"))
          .groupBy((col("cand_id") - 1000000).as("doc_id"))
          .agg(count(lit(1)).as("overlap"))
        val o = coalesce(col("overlap"), lit(0L))
        n.join(n.select((col("doc_id") - 1000000).as("doc_id"),
            col("nb").as("nc")), "doc_id")
          .join(ov, Seq("doc_id"), "left")
          .select(col("doc_id"), col("nb").as("n_ref"), col("nc").as("n_cand"),
            o.as("overlap"),
            round(o.cast("double") / col("nc").cast("double"), 9).as("rouge_p"),
            round(o.cast("double") / col("nb").cast("double"), 9).as("rouge_r"),
            round((lit(2L) * o).cast("double") /
              (col("nb") + col("nc")).cast("double"), 9).as("rouge_f1"))
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        """WITH corpus AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0
          |  UNION ALL
          |  SELECT doc_id + 1000000, text || ' quality data pipeline tail marker'
          |  FROM documents WHERE doc_id % 5 = 0),
          |w AS (SELECT doc_id, string_split(lower(text), ' ') AS wl FROM corpus
          |  ),
          |bg AS (SELECT doc_id, list_distinct(list_transform(
          |    generate_series(1, len(wl) - 1),
          |    i -> wl[i] || ' ' || wl[i+1])) AS bl FROM w WHERE len(wl) >= 2),
          |e AS (SELECT doc_id, unnest(bl) AS b FROM bg),
          |n AS (SELECT doc_id, count(*) AS nb FROM e GROUP BY 1),
          |ov AS (SELECT r.doc_id AS rid, count(*) AS overlap
          |  FROM e r JOIN e c ON c.doc_id = r.doc_id + 1000000 AND r.b = c.b
          |  GROUP BY 1)
          |SELECT r.doc_id AS doc_id, r.nb AS n_ref, c.nb AS n_cand,
          |  coalesce(overlap, 0) AS overlap,
          |  round(CAST(coalesce(overlap, 0) AS DOUBLE) / c.nb, 9) AS rouge_p,
          |  round(CAST(coalesce(overlap, 0) AS DOUBLE) / r.nb, 9) AS rouge_r,
          |  round(CAST(2 * coalesce(overlap, 0) AS DOUBLE) / (r.nb + c.nb), 9)
          |    AS rouge_f1
          |FROM n r JOIN n c ON c.doc_id = r.doc_id + 1000000
          |LEFT JOIN ov ON ov.rid = r.doc_id ORDER BY doc_id""".stripMargin),
      doc = "ROUGE-2 set overlap eval: distinct bigrams, content-partitioned intersection join, exact counts, round-9 P/R/F1"),

    // The SQL-client surface for the dedup family: MinHash-LSH near-dup
    // detection as ONE pure spark.sql statement through the injected
    // minhash_md5_sig kernel — proof that a SQL-only user of the engine
    // can run the banded dedup path with no DataFrame code. Same banding
    // algebra as Dedup.minhashLshPairs (16 bands × 4 rows, DISTINCT
    // candidates, ≥32/64 agreement); the oracle is the SAME
    // minhashOracle used by dedup_minhash_lsh, so the SQL surface is
    // hash-certified against the kernel chain end-to-end.
    "sql_surface_dedup" -> Q(
      fn = (s, dir) => {
        graft.functions.GraftFunctions.install(s)
        Tables.documents(s, dir).createOrReplaceTempView("graft_documents")
        s.sql(
          """WITH corpus AS (
            |  SELECT doc_id, text FROM graft_documents
            |  UNION ALL
            |  SELECT doc_id + 1000000 AS doc_id,
            |         concat(text, ' quality data pipeline tail marker') AS text
            |  FROM graft_documents WHERE doc_id % 5 = 0),
            |sig AS (SELECT doc_id AS id,
            |    minhash_md5_sig(split(lower(trim(text)), '\\s+'), 3, 64) AS sg
            |  FROM corpus),
            |bands AS (SELECT id, sg, b, slice(sg, b * 4 + 1, 4) AS bucket
            |  FROM sig LATERAL VIEW explode(sequence(0, 15)) t AS b),
            |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
            |  FROM bands a JOIN bands b
            |  ON a.b = b.b AND a.bucket = b.bucket AND a.id < b.id),
            |est AS (SELECT id_a, id_b,
            |    round(CAST(size(filter(zip_with(sa.sg, sb.sg, (x, y) -> x = y),
            |      v -> v)) AS DOUBLE) / CAST(64 AS DOUBLE), 6) AS est_jaccard
            |  FROM cand JOIN sig sa ON cand.id_a = sa.id
            |  JOIN sig sb ON cand.id_b = sb.id)
            |SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.5
            |ORDER BY id_a, id_b""".stripMargin)
      },
      oracle = Some(minhashOracle(nearDupCte)),
      doc = "pure-SQL MinHash-LSH dedup through the injected minhash_md5_sig kernel (SQL client surface)"),

    // Lexical diversity census: type-token ratio and MATTR (moving-average
    // TTR, window 20) per language — the data-quality gate that catches
    // keyword-stuffed or template text that length/punct filters miss
    // (TTR alone penalizes long docs; MATTR's fixed window removes the
    // length bias, which is why it grades beside it). Everything is
    // row-local higher-order functions (windows never leave the row) and
    // EXACT integers: MATTR = Σ_w distinct(w) / (20·n_windows) — BIGINT
    // numerator/denominator graded beside the round-9 ratio. Zero
    // shuffles beyond the per-language rollup.
    "text_ttr_mattr" -> Q(
      fn = (s, dir) => {
        val wl = split(lower(col("text")), " ")
        val t = Tables.documents(s, dir).select(col("lang"), wl.as("wl"))
          .select(col("lang"), size(col("wl")).cast("long").as("n_tokens"),
            size(array_distinct(col("wl"))).cast("long").as("n_types"),
            when(size(col("wl")) >= 20, expr(
              "aggregate(transform(sequence(1, size(wl) - 19), " +
                "i -> size(array_distinct(slice(wl, i, 20)))), " +
                "0L, (a, x) -> a + x)")).as("mattr_sum"),
            when(size(col("wl")) >= 20, (size(col("wl")) - 19).cast("long"))
              .as("n_windows"))
        t.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"),
            sum(col("n_types")).as("types"),
            sum(col("mattr_sum")).as("mattr_num"),
            (lit(20L) * sum(col("n_windows"))).as("mattr_den"))
          .select(col("lang"), col("n_docs"), col("tokens"), col("types"),
            round(col("types").cast("double") / col("tokens").cast("double"), 9)
              .as("ttr"),
            col("mattr_num"), col("mattr_den"),
            round(col("mattr_num").cast("double") /
              col("mattr_den").cast("double"), 9).as("mattr"))
          .orderBy(col("lang"))
      },
      oracle = Some(
        """WITH w AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS wl
          |  FROM documents),
          |t AS (SELECT doc_id, lang, len(wl) AS n_tokens,
          |    len(list_distinct(wl)) AS n_types,
          |    CASE WHEN len(wl) >= 20 THEN
          |      list_sum(list_transform(range(len(wl) - 19),
          |        i -> len(list_distinct(wl[i + 1:i + 20]))))
          |    ELSE NULL END AS mattr_sum,
          |    CASE WHEN len(wl) >= 20 THEN len(wl) - 19 ELSE NULL END
          |      AS n_windows
          |  FROM w)
          |SELECT lang, count(*) AS n_docs,
          |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
          |  CAST(sum(n_types) AS BIGINT) AS types,
          |  round(CAST(sum(n_types) AS DOUBLE) / sum(n_tokens), 9) AS ttr,
          |  CAST(sum(mattr_sum) AS BIGINT) AS mattr_num,
          |  CAST(20 * sum(n_windows) AS BIGINT) AS mattr_den,
          |  round(CAST(sum(mattr_sum) AS DOUBLE) / (20 * sum(n_windows)), 9)
          |    AS mattr
          |FROM t GROUP BY lang ORDER BY lang""".stripMargin),
      doc = "lexical diversity: TTR + windowed MATTR(20), row-local HOF windows, exact BIGINT num/den, round-9 ratios"),

    // Temperature-sweep mixing: the α ∈ {0.25, 0.5, 0.75} operating
    // points of the pretraining language-mix decision measured off ONE
    // shared per-language aggregate (the dedup_minhash_param_sweep
    // pattern — tune by re-weighting a tiny stats table, never by
    // re-scanning the corpus). tokens^α is built from IEEE
    // correctly-rounded sqrt chains ONLY (α=0.25 → √√x, 0.5 → √x,
    // 0.75 → √x·√√x), so no libm pow() enters the graded chain; weights
    // follow the round-6-then-DECIMAL house discipline of mix_epoch_plan.
    "mix_alpha_sweep" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.types.DecimalType
        val g = Tables.documents(s, dir).filter(col("lang").isNotNull)
          .select(col("lang"),
            size(TextAnalysis.words(col("text"))).cast("long").as("t"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("n_tokens"))
        graft.operators.CacheOnce.pin(g); g.count() // feeds the sweep AND the budget total
        val tok = col("n_tokens").cast("double")
        val w = g.select(col("lang"), col("n_docs"), col("n_tokens"),
          explode(array(
            struct(lit("a25").as("alpha"),
              round(sqrt(sqrt(tok)), 6).as("weight")),
            struct(lit("a50").as("alpha"),
              round(sqrt(tok), 6).as("weight")),
            struct(lit("a75").as("alpha"),
              round(sqrt(tok) * sqrt(sqrt(tok)), 6).as("weight"))))
            .as("aw"))
          .select(col("lang"), col("n_docs"), col("n_tokens"),
            col("aw.alpha").as("alpha"), col("aw.weight").as("weight"))
        val tot = w.groupBy(col("alpha"))
          .agg(sum(col("weight").cast(DecimalType(28, 6))).as("sum_w"))
        val tt = g.agg(sum(col("n_tokens")).as("tot_tokens"))
        w.join(tot, "alpha").crossJoin(tt)
          .select(col("alpha"), col("lang"), col("n_docs"), col("n_tokens"),
            col("weight"),
            round(col("weight") / col("sum_w").cast("double"), 9).as("share"),
            floor((col("tot_tokens") * 3).cast("double") * col("weight") /
              col("sum_w").cast("double")).cast("long").as("alloc_tokens"))
          .orderBy(col("alpha"), col("lang"))
      },
      oracle = Some(
        s"""WITH d AS (SELECT lang, CAST(len($wordsSql) AS BIGINT) AS t
           |  FROM documents WHERE lang IS NOT NULL),
           |g AS (SELECT lang, count(*) AS n_docs,
           |    CAST(sum(t) AS BIGINT) AS n_tokens FROM d GROUP BY 1),
           |w AS (SELECT lang, n_docs, n_tokens, alpha,
           |    CASE alpha
           |      WHEN 'a25' THEN round(sqrt(sqrt(CAST(n_tokens AS DOUBLE))), 6)
           |      WHEN 'a50' THEN round(sqrt(CAST(n_tokens AS DOUBLE)), 6)
           |      ELSE round(sqrt(CAST(n_tokens AS DOUBLE))
           |        * sqrt(sqrt(CAST(n_tokens AS DOUBLE))), 6) END AS weight
           |  FROM g CROSS JOIN (SELECT unnest(['a25', 'a50', 'a75']) AS alpha) a),
           |tot AS (SELECT alpha, sum(CAST(weight AS DECIMAL(28,6))) AS sum_w
           |  FROM w GROUP BY 1),
           |tt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM g)
           |SELECT w.alpha, lang, n_docs, n_tokens, weight,
           |  round(weight / CAST(sum_w AS DOUBLE), 9) AS share,
           |  CAST(floor(CAST(tot_tokens * 3 AS DOUBLE) * weight
           |    / CAST(sum_w AS DOUBLE)) AS BIGINT) AS alloc_tokens
           |FROM w JOIN tot USING (alpha) CROSS JOIN tt
           |ORDER BY alpha, lang""".stripMargin),
      doc = "temperature sweep: three alpha operating points off one language-stats table, sqrt-chain weights (no libm pow)"),

    // TextRank corpus keywords (Mihalcea & Tarau, EMNLP'04): PageRank over
    // the word co-occurrence graph. Candidates are alphabetic words of
    // length >= 4 (the POS-filter proxy both engines replay with the same
    // anchored regex); edges are consecutive candidate pairs after the
    // filter (window 2 over the FILTERED sequence), symmetrized, deduped.
    // Rank rides the integer-grid fixed-point kernel — 3 iterations on the
    // SCALE=1e12 grid, DIV-truncated, so every rank is a bit-reproducible
    // BIGINT (graph_pagerank's discipline). Scale shape: the token stream
    // reduces to DISTINCT bigrams before any iteration — a vocabulary²-
    // bounded relation however big the corpus — and each iteration is one
    // node-keyed shuffle with map-side combine against the once-partitioned
    // edge relation (Graph.pagerankFixedPoint's pinned layout).
    "text_textrank_keywords" -> Q(
      fn = (s, dir) => {
        val kept = Tables.documents(s, dir)
          .select(filter(TextAnalysis.words(col("text")),
            w => w.rlike("^[a-z]{4,}$")).as("ws"))
        val e0 = kept.filter(size(col("ws")) >= 2)
          .select(explode(transform(sequence(lit(0), size(col("ws")) - 2),
            i => struct(element_at(col("ws"), i + 1).as("src"),
              element_at(col("ws"), i + 2).as("dst")))).as("p"))
          .select(col("p.src"), col("p.dst"))
        val e = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
          .filter(col("src") =!= col("dst"))
        graft.operators.Graph.pagerankFixedPoint(e, 3)
          .orderBy(col("rank").desc, col("node")).limit(20)
          .select(col("node").as("word"), col("rank"))
      },
      oracle = Some {
        val iterCtes = (1 to 3).map { k =>
          s"""r$k AS (SELECT e.dst AS v,
             |    (15 * (1000000000000 // n.n)) // 100
             |      + (85 * CAST(sum(r.r // deg.d) AS BIGINT)) // 100 AS r
             |  FROM e JOIN r${k - 1} r ON e.src = r.v
             |         JOIN deg ON e.src = deg.src CROSS JOIN n
             |  GROUP BY e.dst, n.n)""".stripMargin
        }.mkString(",\n")
        s"""WITH d AS (SELECT list_filter($wordsSql,
           |    w -> regexp_matches(w, '^[a-z]{4,}$$')) AS ws FROM documents),
           |p0 AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
           |    i -> struct_pack(src := ws[i], dst := ws[i+1]))) AS u
           |  FROM d WHERE len(ws) >= 2),
           |e AS (SELECT DISTINCT src, dst FROM (
           |    SELECT u.src AS src, u.dst AS dst FROM p0
           |    UNION ALL SELECT u.dst, u.src FROM p0)
           |  WHERE src <> dst),
           |deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
           |n AS (SELECT count(*) AS n FROM deg),
           |r0 AS (SELECT src AS v, 1000000000000 // n.n AS r
           |  FROM deg CROSS JOIN n),
           |$iterCtes
           |SELECT v AS word, r AS rank FROM r3
           |ORDER BY rank DESC, word LIMIT 20""".stripMargin
      },
      doc = "TextRank corpus keywords: integer-grid PageRank over the symmetrized word co-occurrence graph"),

    // WordPiece greedy longest-match-first segmentation (Wu et al. 2016 —
    // the BERT tokenizer's inference rule), with a DATA-DERIVED vocabulary
    // both engines replay: every observed length-1 substring (coverage —
    // greedy always advances) + the top-64 substrings of length 2..4 by
    // Σ word-count (ties by piece). The whole surface is integers: piece
    // counts, piece-per-word counts, frequency scores — nothing float.
    // Spark folds each DISTINCT word (the BPE word-histogram reduction)
    // through 16 broadcast-hash-join rounds (explode ≤4 candidate
    // substrings, equi-join the broadcast vocab, longest wins via a
    // partial-aggregable max(struct)); the oracle replays the same greedy
    // walk as a recursive CTE with a NOT EXISTS longest-match guard.
    "text_wordpiece_tokenize" -> Q(
      fn = (s, dir) =>
        TextAnalysis.wordpieceSegment(Tables.documents(s, dir), "text")
          .orderBy(col("wc").desc, col("word")).limit(30),
      oracle = Some(
        s"""WITH RECURSIVE $subwordVocabCtes,
           |rec(w, wc, pos, np, sc) AS (
           |  SELECT w, wc, 1, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM wf
           |  UNION ALL
           |  SELECT r.w, r.wc, r.pos + v.l, r.np + 1, r.sc + v.c
           |  FROM rec r JOIN vocab v ON v.piece = substr(r.w, r.pos, v.l)
           |  WHERE r.pos <= len(r.w)
           |    AND NOT EXISTS (SELECT 1 FROM vocab v2
           |      WHERE v2.l > v.l AND v2.piece = substr(r.w, r.pos, v2.l)))
           |SELECT w AS word, wc, np AS n_pieces, sc AS score_sum
           |FROM rec WHERE pos > len(w)
           |ORDER BY wc DESC, word LIMIT 30""".stripMargin),
      doc = "WordPiece greedy longest-match segmentation with in-query data-derived vocabulary (integer-only surface)"),

    // OPTIMAL segmentation under the same vocabulary — the DP objective
    // (max total piece frequency, ties to fewest pieces) that WordPiece's
    // greedy rule only approximates; SentencePiece's Viterbi decode shape
    // (Kudo 2018). Spark runs a layered frontier DP (one best (score, −np)
    // state per (word, endpos) — lexicographic order survives extension,
    // so per-endpos max IS the DP), 16 broadcast-join rounds. The oracle
    // can't fold a DP, so it ENUMERATES every segmentation of the 30
    // graded words via a recursive CTE (path count per word ≤
    // tetranacci(16) ≈ 2·10⁴ — bounded because only the graded top-30
    // recurse; the vocab still derives from the full corpus) and takes the
    // argmax. By construction viterbi best_score ≥ the greedy score —
    // VocabCoverageSpec asserts dominance row-by-row.
    "text_unigram_viterbi" -> Q(
      fn = (s, dir) =>
        TextAnalysis.viterbiSegment(Tables.documents(s, dir), "text")
          .orderBy(col("wc").desc, col("word")).limit(30),
      oracle = Some(
        s"""WITH RECURSIVE $subwordVocabCtes,
           |top30 AS (SELECT w, wc FROM wf ORDER BY wc DESC, w LIMIT 30),
           |rec(w, wc, pos, np, sc) AS (
           |  SELECT w, wc, 1, CAST(0 AS BIGINT), CAST(0 AS BIGINT) FROM top30
           |  UNION ALL
           |  SELECT r.w, r.wc, r.pos + v.l, r.np + 1, r.sc + v.c
           |  FROM rec r JOIN vocab v ON v.piece = substr(r.w, r.pos, v.l)
           |  WHERE r.pos <= len(r.w))
           |SELECT word, wc, best_score, n_pieces_opt FROM (
           |  SELECT w AS word, wc, sc AS best_score, np AS n_pieces_opt,
           |    row_number() OVER (PARTITION BY w ORDER BY sc DESC, np) AS rk
           |  FROM rec WHERE pos > len(w)) t
           |WHERE rk = 1 ORDER BY wc DESC, word""".stripMargin),
      doc = "optimal (Viterbi) subword segmentation: layered frontier DP vs the oracle's exhaustive path enumeration"),

    // Distinctive terms per source — the corpus-exploration readout BERTopic
    // calls class-TF-IDF, restated without logs so the ranking is exact:
    // lift(w, s) = P(w | s) / P(w) = (tf_ws · T) / (T_s · tf_w), both
    // products widened to DECIMAL(38,0) BEFORE the single division (the
    // collocations discipline — at 10¹³ tokens an int64 product overflows
    // silently), one correctly-rounded decimal→double per side, ONE
    // division: bit-identical cross-engine, and ln(lift) monotone ⇒ this
    // IS the c-TF-IDF ranking minus the float log. Count floor tf_ws ≥ 5;
    // top-10 per source by (lift desc, w) via a keyed window. One token
    // scan → two vocabulary-sized aggregates → broadcast margins join.
    "text_distinctive_terms" -> Q(
      fn = (s, dir) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val tok = Tables.documents(s, dir)
          .select(col("source"), explode(TextAnalysis.words(col("text"))).as("w"))
        val sw = tok.groupBy(col("source"), col("w"))
          .agg(count(lit(1)).as("tf_sw")).filter(col("tf_sw") >= 5)
        val perS = tok.groupBy(col("source")).agg(count(lit(1)).as("t_s"))
        val perW = tok.groupBy(col("w")).agg(count(lit(1)).as("tf_w"))
        val tot = tok.agg(count(lit(1)).as("t"))
        val wTop = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("lift").desc, col("w"))
        sw.join(perS, Seq("source")).join(perW, Seq("w"))
          .crossJoin(broadcast(tot))
          .withColumn("lift",
            (col("tf_sw").cast(dec) * col("t").cast(dec)).cast("double")
              / (col("t_s").cast(dec) * col("tf_w").cast(dec)).cast("double"))
          .withColumn("rnk", row_number().over(wTop)).filter(col("rnk") <= 10)
          .select(col("source"), col("rnk").cast("long").as("rnk"), col("w"),
            col("tf_sw"), col("tf_w"), (round(col("lift"), 9) + 0.0).as("lift"))
          .orderBy(col("source"), col("rnk"))
      },
      oracle = Some(
        s"""WITH tok AS (SELECT source, unnest($wordsSql) AS w FROM documents),
           |sw AS (SELECT source, w, count(*) AS tf_sw FROM tok
           |  GROUP BY 1, 2 HAVING count(*) >= 5),
           |ps AS (SELECT source, count(*) AS t_s FROM tok GROUP BY 1),
           |pw AS (SELECT w, count(*) AS tf_w FROM tok GROUP BY 1),
           |tot AS (SELECT count(*) AS t FROM tok),
           |l AS (SELECT sw.source, sw.w, sw.tf_sw, pw.tf_w,
           |    CAST(CAST(sw.tf_sw AS DECIMAL(38,0)) * t AS DOUBLE)
           |      / CAST(CAST(ps.t_s AS DECIMAL(38,0)) * tf_w AS DOUBLE) AS lift
           |  FROM sw JOIN ps USING (source) JOIN pw USING (w) CROSS JOIN tot),
           |r AS (SELECT *, row_number() OVER (PARTITION BY source
           |    ORDER BY lift DESC, w) AS rnk FROM l)
           |SELECT source, rnk, w, tf_sw, tf_w, round(lift, 9) + 0.0 AS lift
           |FROM r WHERE rnk <= 10 ORDER BY source, rnk""".stripMargin),
      doc = "distinctive terms per source: log-free c-TF-IDF (exact decimal products, one division), top-10 by keyed window"),

    // Heaps'-law vocabulary-growth census per source: cumulative (docs,
    // tokens, distinct types) at ten points along the ingest axis — the
    // curve that sizes a tokenizer's vocab and predicts how much NEW
    // vocabulary the next 10× of corpus will bring (V ≈ K·nᵝ; this emits
    // the exact curve, the modeler fits β downstream — no logs in the
    // graded surface). Scale shape: the ingest axis is bucketed by id
    // RANGE (one min/max agg broadcast back), NOT by row_number — an
    // exact-count decile would force a per-source global sort; id-range
    // buckets are a narrow map-side expression at any scale. "First
    // appearance" is min(bucket) per (source, type): one groupBy, then
    // the decile spine left-joins the three censuses and a keyed window
    // does the cumulative sums. Exact integers end to end.
    "text_heaps_law" -> Q(
      fn = (s, dir) => {
        val d0 = Tables.documents(s, dir)
          .select(col("source"), col("doc_id"), col("text"))
        val mm = d0.groupBy(col("source"))
          .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        val db = d0.join(broadcast(mm), "source")
          .withColumn("b", expr("((doc_id - mn) * 10) div (mx - mn + 1)"))
        val words = db.select(col("source"), col("b"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
          .filter(col("w") =!= "")
        val tok = words.groupBy(col("source"), col("b"))
          .agg(count(lit(1)).as("toks"))
        val nv = words.groupBy(col("source"), col("w"))
          .agg(min(col("b")).as("b"))
          .groupBy(col("source"), col("b")).agg(count(lit(1)).as("vnew"))
        val dc = db.groupBy(col("source"), col("b"))
          .agg(count(lit(1)).as("docs"))
        val spine = d0.select(col("source")).distinct()
          .select(col("source"), explode(sequence(lit(0L), lit(9L))).as("b"))
        val j = spine
          .join(dc, Seq("source", "b"), "left")
          .join(tok, Seq("source", "b"), "left")
          .join(nv, Seq("source", "b"), "left")
          .na.fill(0L, Seq("docs", "toks", "vnew"))
        val win = org.apache.spark.sql.expressions.Window
        val wc = win.partitionBy(col("source")).orderBy(col("b"))
          .rowsBetween(win.unboundedPreceding, win.currentRow)
        j.select(col("source"), (col("b") + 1L).as("decile"),
            sum(col("docs")).over(wc).as("docs_cum"),
            sum(col("toks")).over(wc).as("tokens_cum"),
            sum(col("vnew")).over(wc).as("vocab_cum"))
          .orderBy(col("source"), col("decile"))
      },
      oracle = Some(
        s"""WITH mm AS (SELECT source, min(doc_id) AS mn, max(doc_id) AS mx
           |  FROM documents GROUP BY 1),
           |db AS (SELECT d.source, d.doc_id, d.text,
           |    ((d.doc_id - mn) * 10) // (mx - mn + 1) AS b
           |  FROM documents d JOIN mm USING (source)),
           |w0 AS (SELECT source, b, unnest($wordsSql) AS w FROM db),
           |wf AS (SELECT source, b, w FROM w0 WHERE w <> ''),
           |tok AS (SELECT source, b, count(*) AS toks FROM wf GROUP BY 1, 2),
           |fo AS (SELECT source, w, min(b) AS b FROM wf GROUP BY 1, 2),
           |nv AS (SELECT source, b, count(*) AS vnew FROM fo GROUP BY 1, 2),
           |dc AS (SELECT source, b, count(*) AS docs FROM db GROUP BY 1, 2),
           |spine AS (SELECT source, b
           |  FROM (SELECT DISTINCT source FROM documents)
           |  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS b)),
           |j AS (SELECT s.source, s.b,
           |    coalesce(dc.docs, 0) AS docs, coalesce(tok.toks, 0) AS toks,
           |    coalesce(nv.vnew, 0) AS vnew
           |  FROM spine s
           |  LEFT JOIN dc ON s.source = dc.source AND s.b = dc.b
           |  LEFT JOIN tok ON s.source = tok.source AND s.b = tok.b
           |  LEFT JOIN nv ON s.source = nv.source AND s.b = nv.b)
           |SELECT source, b + 1 AS decile,
           |  CAST(sum(docs) OVER c AS BIGINT) AS docs_cum,
           |  CAST(sum(toks) OVER c AS BIGINT) AS tokens_cum,
           |  CAST(sum(vnew) OVER c AS BIGINT) AS vocab_cum
           |FROM j WINDOW c AS (PARTITION BY source ORDER BY b
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |ORDER BY source, decile""".stripMargin),
      doc = "Heaps'-law vocab-growth census per source: id-range ingest deciles (no sort), first-appearance types via min(bucket), exact integer curve"),

    // Term burstiness (Church & Gale 1995): the Fano factor var/mean of a
    // term's per-document count, over ALL docs (zeros included). Poisson
    // scatter gives Fano ≈ 1 — function words; content words CLUMP (a doc
    // that mentions a term mentions it again) and score ≫ 1 — the signal
    // that separates topical vocabulary from glue, used to pick keywords
    // and stopword lists without any external resource. Zeros need no
    // rows: with S₁ = Σc and S₂ = Σc² over docs CONTAINING the term,
    // Fano = (N·S₂ − S₁²) / ((N−1)·S₁) exactly — integer num/den graded
    // as digit strings, one IEEE division. Top-50 terms by df (a scale-
    // sound TakeOrdered), stats from one (doc, term) groupBy.
    "text_burstiness" -> Q(
      fn = (s, dir) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val d = Tables.documents(s, dir)
        val cnt = d.select(col("doc_id"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
          .filter(col("w") =!= "")
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        val stats = cnt.groupBy(col("w")).agg(count(lit(1)).as("df"),
          sum(col("c")).as("s1"),
          sum(col("c").cast(dec) * col("c")).as("s2"))
        val top = stats.orderBy(col("df").desc, col("w")).limit(50)
        // n >= 2 guard: a single-document corpus zeroes the Fano
        // denominator — Spark 0/0 is NaN where DuckDB diverges (r9 ADVICE);
        // the factor is undefined there, so emit no rows (oracle mirrored).
        val tot = d.agg(count(lit(1)).as("n")).filter(col("n") >= 2L)
        top.crossJoin(broadcast(tot))
          .withColumn("num", col("n").cast(dec) * col("s2")
            - col("s1").cast(dec) * col("s1"))
          .withColumn("den", (col("n") - 1L).cast(dec) * col("s1"))
          .select(col("w").as("term"), col("df"), col("s1").as("tf"),
            col("num").cast("string").as("fano_num"),
            col("den").cast("string").as("fano_den"),
            (round(col("num").cast("double") / col("den").cast("double"), 9)
              + 0.0).as("fano"))
          .orderBy(col("term"))
      },
      oracle = Some(
        s"""WITH cnt AS (SELECT doc_id, w, count(*) AS c FROM (
           |    SELECT doc_id, unnest($wordsSql) AS w FROM documents)
           |  WHERE w <> '' GROUP BY 1, 2),
           |stats AS (SELECT w, count(*) AS df, sum(c) AS s1,
           |    sum(CAST(c AS HUGEINT) * c) AS s2
           |  FROM cnt GROUP BY 1),
           |top AS (SELECT * FROM stats ORDER BY df DESC, w LIMIT 50),
           |tot AS (SELECT count(*) AS n FROM documents HAVING count(*) >= 2),
           |z AS (SELECT w, df, s1,
           |    CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1 AS num,
           |    CAST(n - 1 AS HUGEINT) * s1 AS den
           |  FROM top CROSS JOIN tot)
           |SELECT w AS term, CAST(df AS BIGINT) AS df, CAST(s1 AS BIGINT) AS tf,
           |  CAST(num AS VARCHAR) AS fano_num, CAST(den AS VARCHAR) AS fano_den,
           |  round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 9) + 0.0 AS fano
           |FROM z ORDER BY term""".stripMargin),
      doc = "Church-Gale term burstiness: exact Fano factor over all docs (zeros algebraic, never materialized), top-50 by df, digit-string moments"),

    // Gini-Simpson vocabulary concentration per source — the probability
    // two independently drawn tokens are the SAME type, the concentration
    // complement to text_ttr_mattr's type ratio (ecology's Simpson index,
    // IR's repeat-rate). Exact rational: λ_num = Σ_w n_w(n_w−1),
    // λ_den = N(N−1) — both integer sums off one (source, term) groupBy,
    // graded as digit strings with one IEEE division for the diversity
    // 1 − λ. Scale: token scan → vocab-sized groupBy, no windows at all.
    "text_simpson_diversity" -> Q(
      fn = (s, dir) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val cnt = Tables.documents(s, dir)
          .select(col("source"),
            explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
          .filter(col("w") =!= "")
          .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
        cnt.groupBy(col("source"))
          .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"),
            sum(col("c").cast(dec) * (col("c") - 1L)).as("lam_num"))
          .filter(col("n_tokens") >= 2L)
          .withColumn("lam_den",
            col("n_tokens").cast(dec) * (col("n_tokens") - 1L))
          .select(col("source"), col("n_types"), col("n_tokens"),
            col("lam_num").cast("string").as("lam_num"),
            col("lam_den").cast("string").as("lam_den"),
            (round(lit(1.0) - col("lam_num").cast("double")
              / col("lam_den").cast("double"), 9) + 0.0).as("simpson_diversity"))
          .orderBy(col("source"))
      },
      oracle = Some(
        s"""WITH cnt AS (SELECT source, w, count(*) AS c FROM (
           |    SELECT source, unnest($wordsSql) AS w FROM documents)
           |  WHERE w <> '' GROUP BY 1, 2),
           |a AS (SELECT source, count(*) AS n_types, sum(c) AS n_tokens,
           |    sum(CAST(c AS HUGEINT) * (c - 1)) AS lam_num
           |  FROM cnt GROUP BY 1)
           |SELECT source, CAST(n_types AS BIGINT) AS n_types,
           |  CAST(n_tokens AS BIGINT) AS n_tokens,
           |  CAST(lam_num AS VARCHAR) AS lam_num,
           |  CAST(CAST(n_tokens AS HUGEINT) * (n_tokens - 1) AS VARCHAR)
           |    AS lam_den,
           |  round(CAST(1.0 AS DOUBLE) - CAST(lam_num AS DOUBLE)
           |    / CAST(CAST(n_tokens AS HUGEINT) * (n_tokens - 1) AS DOUBLE),
           |    9) + 0.0 AS simpson_diversity
           |FROM a WHERE n_tokens >= 2 ORDER BY source""".stripMargin),
      doc = "Gini-Simpson vocabulary concentration per source: exact rational repeat-rate, digit-string num/den, one IEEE division"),

    // Split balance audit: Cramér's V between the deterministic 8/1/1 hash
    // split and the source axis — the check that a hash split did NOT skew
    // any source into one fold (V ≈ 0 ⇔ split ⊥ source; compare
    // sample_group_kfold, where fold = f(source) makes V = 1 BY DESIGN and
    // this audit is the wrong tool). Same 10¹² integer-grid χ² as
    // profile_cramers_v — exact cell divisions, no cross-cell float sum —
    // plus the per-(split, source) cell census for the top deviations.
    "split_balance_cramers" -> Q(
      fn = (s, dir) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val d = Tables.documents(s, dir)
          .select(splitOf(col("doc_id")).as("split"), col("source"))
        val cells = d.groupBy(col("split"), col("source"))
          .agg(count(lit(1)).as("nij"))
        val rm = cells.groupBy(col("split")).agg(sum(col("nij")).as("rm"))
        val cm = cells.groupBy(col("source")).agg(sum(col("nij")).as("cm"))
        val terms = cells.join(broadcast(rm), "split")
          .join(broadcast(cm), "source")
          .withColumn("term", expr("(CAST(nij AS DECIMAL(38,0)) * nij" +
            " * 1000000000000) div (CAST(rm AS DECIMAL(38,0)) * cm)"))
        val agg = terms.agg(sum(col("nij")).as("n"),
          sum(col("term").cast(dec)).as("sfp"),
          countDistinct(col("split")).as("nr"),
          countDistinct(col("source")).as("nc"))
        agg.withColumn("chi2_fp", greatest(
            (col("n").cast(dec) * col("sfp")
              - col("n").cast(dec) * lit(1000000000000L)).cast(dec),
            lit(0).cast(dec)))
          .select(col("n").as("n_docs"), col("nr").as("n_splits"),
            col("nc").as("n_sources"),
            col("chi2_fp").cast("string").as("chi2_fp"),
            (round(sqrt(col("chi2_fp").cast("double")
              / (col("n").cast("double")
                * (least(col("nr"), col("nc")) - 1L).cast("double")
                * lit(1.0e12))), 9) + 0.0).as("cramers_v"))
      },
      oracle = Some(
        s"""WITH corpus AS (SELECT doc_id, source FROM documents),
           |$splitCte,
           |cells AS (SELECT sp.split, c.source, count(*) AS nij
           |  FROM corpus c JOIN sp ON c.doc_id = sp.id GROUP BY 1, 2),
           |r AS (SELECT split, sum(nij) AS rm FROM cells GROUP BY 1),
           |cc AS (SELECT source, sum(nij) AS cm FROM cells GROUP BY 1),
           |terms AS (SELECT cells.nij,
           |    (CAST(cells.nij AS HUGEINT) * cells.nij * 1000000000000)
           |      // (CAST(r.rm AS HUGEINT) * cc.cm) AS term
           |  FROM cells JOIN r USING (split) JOIN cc USING (source)),
           |a AS (SELECT sum(nij) AS n, sum(term) AS sfp,
           |    (SELECT count(*) FROM r) AS nr,
           |    (SELECT count(*) FROM cc) AS nc FROM terms),
           |z AS (SELECT n, nr, nc,
           |    greatest(CAST(n AS HUGEINT) * sfp
           |      - CAST(n AS HUGEINT) * 1000000000000, 0) AS chi2
           |  FROM a)
           |SELECT CAST(n AS BIGINT) AS n_docs, CAST(nr AS BIGINT) AS n_splits,
           |  CAST(nc AS BIGINT) AS n_sources,
           |  CAST(chi2 AS VARCHAR) AS chi2_fp,
           |  round(sqrt(CAST(chi2 AS DOUBLE)
           |    / (CAST(n AS DOUBLE) * CAST(least(nr, nc) - 1 AS DOUBLE)
           |      * CAST(1000000000000.0 AS DOUBLE))), 9) + 0.0 AS cramers_v
           |FROM z""".stripMargin),
      doc = "hash-split balance audit: split×source Cramér's V on the 10¹² integer grid — near-0 certifies the 8/1/1 split skews no source"))
}
