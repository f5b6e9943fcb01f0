package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for large-scale training-data pipelines (north-star ops,
  * BASELINE.json): exact, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup. Everything is expression-level (codegen'd); the
  * only shuffles are the groupBys/joins that the algorithms inherently need,
  * and candidate generation is always bucketed (LSH bands / shared shingles /
  * sign buckets) so no O(n²) all-pairs materializes at 100 TB.
  */
object Dedup {

  /** Word tokens: lowercase, whitespace-split. */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Reference formulation of distinct word n-gram shingles. The hot path
    * uses [[graft.functions.ShingleHashes]] (same windows, hashed, codegen);
    * this string form defines the semantics and backs the property test
    * (PropertySpec: hash cardinality == distinct string-shingle count). */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = words(text)
    array_distinct(transform(sequence(lit(1), greatest(size(w) - (n - 1), lit(1))),
      i => array_join(slice(w, i, lit(n)), " ")))
  }

  /** Exact dedup: content-hash groupBy. Returns one winner row per distinct
    * content (min id), plus the duplicate count. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact n-gram Jaccard near-dup pairs ≥ threshold. Candidate pairs come
    * from a shared-shingle join (docs with no common shingle never meet), so
    * the shuffle is bounded by shingle frequency, not n². */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // shingles never materialize as strings: ShingleHashes emits the distinct
    // 64-bit window hashes in one codegen pass, so the self-join shuffles
    // 8-byte keys (collision odds at 100 TB shingle cardinality ~2^40 are
    // ~2^-16 per pair-count — below float-round noise)
    val sh = df.select(col(idCol).as("id"),
      graft.functions.VectorExprs.shingleHashes(words(col(textCol)), n).as("hs"))
      .withColumn("n_sh", size(col("hs")))
    // materialize the exploded shingle set once — the self-join would
    // otherwise re-run scan+shingle+hash for EACH side (at 100 TB this is a
    // written signature table; persist is its single-job equivalent)
    val exploded = sh.select(col("id"), col("n_sh"), explode(col("hs")).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = exploded.as("a")
    val b = exploded.as("b")
    val inter = a.join(b, col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash signature: k hash functions h_i(s) = xxh64(shingleHash(s), i),
    * signature[i] = min over shingles. Two codegen'd passes per row
    * ([[graft.functions.ShingleHashes]] → [[graft.functions.MinHashSig]]).
    * This is the per-row signature kernel (streaming / map-only contexts);
    * [[minhashLshPairs]] instead derives signatures with an exploded
    * partial-aggregation so the whole pipeline is oracle-reproducible. */
  def minhashSignature(text: Column, numHashes: Int = 64, n: Int = 3): Column =
    graft.functions.VectorExprs.minhashSig(
      graft.functions.VectorExprs.shingleHashes(words(text), n), numHashes)

  /** Portable 60-bit shingle hash: the first 15 hex chars of md5, parsed as
    * an integer — bit-identical in any engine with md5 (DuckDB:
    * `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`), unlike xxh64 whose seed
    * wiring is engine-private. 60 bits keeps every downstream `h1 + i*h2m`
    * strictly inside non-negative signed-64 range. */
  private def hash60(s: Column, from: Int): Column =
    conv(substring(md5(s), from, 15), 16, 10).cast("long")

  /** Second hash for Kirsch-Mitzenmacher double hashing, reduced mod a prime
    * so `i * h2m` (i < numHashes) cannot overflow when added to a 60-bit h1. */
  private val DoubleHashPrime = 1000000007L

  /** MinHash-LSH candidate pairs: signatures split into `bands` bands of
    * `rows` rows; docs sharing any band bucket become candidates; candidates
    * are scored by signature agreement (the MinHash estimate of Jaccard).
    * The band join is the standard sub-quadratic LSH shape: only hash-equal
    * bands shuffle together.
    *
    * Signature derivation is explode → k-way partial min-aggregation over
    * portable md5-derived hashes (h_i = h1 + i·h2m, double hashing): one md5
    * per (doc, shingle), map-side combine does the min work before the
    * one shuffle by id, and every value is reproducible in the DuckDB oracle
    * — unlike the xxh64 kernel this replaced, which forced a rows-only check. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      bands: Int = 16, rows: Int = 4,
                      estThreshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rows
    val exploded = df
      .select(col(idCol).as("id"), explode(shingles(col(textCol))).as("s"))
      .select(col("id"), hash60(col("s"), 1).as("h1"),
        pmod(hash60(col("s"), 17), lit(DoubleHashPrime)).as("h2m"))
    val minAggs = (0 until numHashes).map(i =>
      min(col("h1") + lit(i.toLong) * col("h2m")).as(s"s$i"))
    // materialize signatures once — both the band join and the scoring join
    // would otherwise recompute shingling+MinHash (at 100 TB this is a
    // written signature table; persist is its single-job equivalent)
    val sig = exploded.groupBy("id").agg(minAggs.head, minAggs.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"s$i")): _*).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the band self-join shuffles only (id, band, bucket) — 24 bytes/row —
    // never the 8·numHashes-byte signatures; those rejoin after candidate
    // dedup from the (tiny relative to the corpus) signature table
    val banded = sig.select(col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(array_join(transform(slice(col("sig"), b * rows + 1, lit(rows)),
            _.cast("string")), ",")).as("bucket")))).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))
    val a = banded.as("a")
    val b = banded.as("b")
    val cand = a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          x => x)).cast("double") / size(col("sig_a")))
      .filter(col("est_jaccard") >= estThreshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  /** 64-bit SimHash over word hashes: bit j of the fingerprint is the sign of
    * Σ_words (bit j of xxh64(word) ? +1 : -1). One codegen'd pass per row
    * ([[graft.functions.SimHash64]]) — the per-row kernel; [[simhashPairs]]
    * derives fingerprints via exploded aggregation for oracle portability. */
  def simhash(text: Column): Column =
    graft.functions.VectorExprs.simhash64(words(text))

  private val SimHashBits = 60

  /** SimHash near-dup pairs: hamming distance ≤ maxDist, candidates bucketed
    * by the high 16 bits (docs differing there are far anyway for small
    * distances — standard block-permutation trade-off).
    *
    * 60-bit fingerprints from portable md5-derived word hashes: explode words
    * → 60 signed bit-sum aggregates (map-side combined, one shuffle by id) →
    * sign bits packed into a long. Every value is DuckDB-reproducible, so the
    * query is hash-checked rather than rows-only. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 8): DataFrame = {
    val exploded = df
      .select(col(idCol).as("id"), explode(words(col(textCol))).as("w"))
      .select(col("id"), hash60(col("w"), 1).as("h"))
    val bitAggs = (0 until SimHashBits).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1)
        .otherwise(-1)).as(s"b$j"))
    val fingerprint = (0 until SimHashBits)
      .map(j => when(col(s"b$j") > 0, shiftleft(lit(1L), j)).otherwise(0L))
      .reduce(_ + _)
    val withSim = exploded.groupBy("id").agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("id"), fingerprint.as("sim"))
      .withColumn("block", shiftright(col("sim"), SimHashBits - 16))
    val a = withSim.as("a")
    val b = withSim.as("b")
    a.join(b, col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .withColumn("hamming", bit_count(col("a.sim").bitwiseXOR(col("b.sim"))))
      .filter(col("hamming") <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("hamming"))
  }

  /** Embedding-cosine near-dup pairs ≥ simThreshold. Candidates are bucketed
    * by LSH sign-bit pattern ([[Vectors.lshBuckets]]) when `lshPlanes` > 0;
    * 0 = exact all-pairs (correctness baseline, test scale only). */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, embCol: String,
                            simThreshold: Double = 0.95,
                            lshPlanes: Int = 0, dim: Int = 64): DataFrame = {
    val base =
      if (lshPlanes > 0) Vectors.lshBuckets(df, embCol, dim, lshPlanes)
      else df.withColumn("lsh_bucket", lit(0L))
    // norms are per-ROW (computed once below the join), so each of the O(n²/b)
    // candidate pairs costs exactly one codegen'd dot product
    val v = base.select(col(idCol).as("id"), col("lsh_bucket"), col(embCol).as("emb"))
      .withColumn("nrm", sqrt(Vectors.norm2(col("emb"))))
    val a = v.as("a")
    val b = v.as("b")
    a.join(b, col("a.lsh_bucket") === col("b.lsh_bucket") && col("a.id") < col("b.id"))
      .withColumn("cos_sim", round(
        Vectors.dot(col("a.emb"), col("b.emb")) / (col("a.nrm") * col("b.nrm")), 6))
      .filter(col("cos_sim") >= simThreshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos_sim"))
  }
}
