package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication for large-scale training-data pipelines (north-star ops,
  * BASELINE.json): exact, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup. Everything is expression-level (codegen'd); the
  * only shuffles are the groupBys/joins that the algorithms inherently need,
  * and candidate generation is always bucketed (LSH bands / shared shingles /
  * sign buckets) so no O(n²) all-pairs materializes at 100 TB.
  *
  * Ownership note on `persist`: methods whose output is BOUNDED (pair
  * lists, censuses, sweeps) eagerly cut it with localCheckpoint and release
  * their internal caches before returning — the r9 cache-hygiene rule, so
  * long registry sessions never accumulate signature-table blocks. Methods
  * whose output is CORPUS-sized ([[dedupCorpus]], [[removeDuplicateSpans]],
  * [[resolveClustersIncremental]]) intentionally leave their pins in place:
  * checkpointing a corpus-sized lazy output would double-write it, and the
  * caller stores that output anyway — a long-lived driver looping over
  * corpora should `spark.catalog.clearCache()` between runs; at 100 TB those
  * intermediates are WRITTEN tables and the persists become no-ops of the
  * stored layout.
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
    * the shuffle is bounded by shingle frequency, not n².
    *
    * `maxDf` > 0 enables the document-frequency cap every production near-dup
    * pipeline needs: a corpus-common shingle (a stop phrase) pairs df² docs —
    * a quadratic hot key at 100 TB. Shingles with df > maxDf are dropped from
    * the universe BEFORE the self-join (Jaccard is then defined over the
    * capped universe — numerator and set sizes alike), which bounds any
    * single shingle's pair contribution at maxDf². The hot set is tiny by
    * Zipf (few distinct shingles are corpus-common), so it broadcasts. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxDf: Int = 0): DataFrame = {
    // shingles never materialize as strings: ShingleHashes emits the distinct
    // 64-bit window hashes in one codegen pass, so the self-join shuffles
    // 8-byte keys (collision odds at 100 TB shingle cardinality ~2^40 are
    // ~2^-16 per pair-count — below float-round noise)
    val sh = df.select(col(idCol).as("id"),
      graft.functions.VectorExprs.shingleHashes(words(col(textCol)), n).as("hs"))
    val allBase = sh.select(col("id"), size(col("hs")).as("n_full"),
      explode(col("hs")).as("s"))
    val (surviving, allPin) =
      if (maxDf <= 0) (allBase.withColumnRenamed("n_full", "n_sh"), None)
      else {
        // the df-cap path reads this relation three times (hot set,
        // anti-join, set-size recount) — persist it once; the uncapped path
        // reads it once and skips the cache
        val all = allBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val hot = all.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf).select(col("s"))
        val kept = all.drop("n_full").join(broadcast(hot), Seq("s"), "left_anti")
        // set sizes over the capped universe, so Jaccard stays a true ratio
        (kept.join(kept.groupBy("id").agg(count(lit(1)).as("n_sh")), Seq("id")),
          Some(all))
      }
    // materialize the exploded shingle set once — the self-join would
    // otherwise re-run scan+shingle+hash for EACH side (at 100 TB this is a
    // written signature table; persist is its single-job equivalent)
    val exploded = surviving.select(col("id"), col("n_sh"), col("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = exploded.as("a")
    val b = exploded.as("b")
    val inter = a.join(b, col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("inter"))
    val out = inter
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      // pair-sized — eager cut, release the signature caches (r9 ADVICE)
      .localCheckpoint()
    exploded.unpersist(); allPin.foreach(_.unpersist())
    out
  }

  /** Exact shingle-set overlap for an EXPLICIT pair list: |A∩B| and |A∪B|
    * per (id_a, id_b). The pair relation is expected to be candidate-sized
    * (LSH output, audit samples — orders of magnitude below the corpus),
    * so the shingle-hash ARRAYS ride the two id joins and the intersection
    * evaluates row-locally — no exploded shared-shingle self-join, whose
    * cost scales with the corpus rather than with the pairs being scored.
    * This is the ground-truth side of sketch-calibration audits
    * (`dedup_minhash_calibration`). */
  def exactJaccardFor(pairs: DataFrame, df: DataFrame, idCol: String,
                      textCol: String, n: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        graft.functions.VectorExprs.shingleHashes(words(col(textCol)), n).as("hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sh.count() // pin: both pair-side joins read it
    val out = pairs
      .join(sh.select(col("id").as("id_a"), col("hs").as("hs_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("hs").as("hs_b")), Seq("id_b"))
      .withColumn("n_inter", size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
      .withColumn("n_union",
        (size(col("hs_a")) + size(col("hs_b"))).cast("long") - col("n_inter"))
      .drop("hs_a", "hs_b")
      // candidate-pair-sized — eager cut, release the pin (r9 ADVICE)
      .localCheckpoint()
    sh.unpersist()
    out
  }

  /** Asymmetric containment near-dup pairs: C = |A∩B| / min(|A|,|B|) ≥
    * threshold — catches a short document EMBEDDED in a longer one, which
    * symmetric Jaccard misses (the big doc's union dilutes the score to
    * near min/max size ratio). Same bounded shared-shingle join as
    * [[jaccardPairs]].
    *
    * `maxDf` is the scale guard on the shared-shingle self-join: one
    * boilerplate shingle appearing in D documents alone fans the join out
    * to O(D²) rows, which at 100 TB is the whole job. The default is HIGH
    * (10 000) because containment's signal lives in rarer shingles than
    * Jaccard's — a tiny contained doc must keep its shingles — but a
    * shingle in ≥10k documents is chrome (cookie banners, nav bars) and
    * carries no containment evidence; dropping it bounds the join at
    * maxDf²·|distinct hot shingles| instead of unbounded. Sizes (`na`,
    * `nb`) count the capped universe so C stays a true ratio. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.9,
                       maxDf: Long = 10000L): DataFrame = {
    require(maxDf >= 1, s"maxDf must be positive, got $maxDf")
    val sh = df.select(col(idCol).as("id"),
      graft.functions.VectorExprs.shingleHashes(words(col(textCol)), n).as("hs"))
      // persisted once: the hot census and the exploded probe both read it
      // — without the cache the scan+shingle kernel re-runs per reader
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // hot set is tiny by construction (only shingles in >maxDf docs)
    val hot = sh.select(explode(col("hs")).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
    // Fold the hot set to a single array literal (1-row broadcast cross
    // join): `hs` is sorted-DISTINCT per doc, so hot removal and the
    // kept-shingle recount are row-local array ops — array_except + size —
    // and the old shape's id-keyed groupBy recount + equi-join of the
    // exploded relation disappear entirely (r13; guide §2.4).
    val hotArr = hot.agg(
      coalesce(collect_set(col("s")), expr("array()").cast("array<bigint>"))
        .as("hotset"))
    val exploded = sh.crossJoin(broadcast(hotArr))
      .select(col("id"), array_except(col("hs"), col("hotset")).as("ks"))
      .select(col("id"), size(col("ks")).cast("long").as("n_sh"),
        explode(col("ks")).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = exploded.as("a")
    val b = exploded.as("b")
    val out = a.join(b, col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("containment", round(col("inter").cast("double") /
        least(col("na"), col("nb")), 6))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("na"), col("nb"), col("containment"))
      // pair-sized — eager cut, release the signature caches (r9 ADVICE)
      .localCheckpoint()
    exploded.unpersist(); sh.unpersist()
    out
  }

  /** Content-defined chunks (LBFS/rsync/backup-dedup primitive): a chunk
    * boundary falls AFTER word i when the md5 of the adjacent word pair
    * (w[i-1], w[i]) ≡ 0 (mod m) — a purely LOCAL feature, so an edit
    * perturbs only the chunk it lands in and every later boundary
    * re-aligns (fixed-size blocks shift forever). Doc end always closes
    * the final chunk. Row-local kernel, no shuffle; expected chunk length
    * ≈ m words. Emits one (id, chunk) row per chunk. */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                m: Int = 8): DataFrame =
    df.withColumn("ws", expr(s"split(lower(trim($textCol)), '\\\\s+')"))
      // sort-after-distinct: kept aligned with the DuckDB twin, whose
      // list_distinct scrambles order
      .withColumn("bnds", expr(
        s"""array_sort(array_distinct(concat(
           |  filter(sequence(2, greatest(size(ws), 2)),
           |    i -> i <= size(ws)
           |      AND cast(conv(substring(md5(concat(element_at(ws, i - 1), ' ',
           |        element_at(ws, i))), 1, 15), 16, 10) as bigint) % $m = 0),
           |  array(size(ws)))))""".stripMargin))
      .select(col(idCol), explode(expr(
        """transform(sequence(1, size(bnds)), k ->
          |  array_join(slice(ws,
          |    (case when k = 1 then 0 else element_at(bnds, k - 1) end) + 1,
          |    element_at(bnds, k)
          |      - (case when k = 1 then 0 else element_at(bnds, k - 1) end)), ' '))"""
          .stripMargin)).as("chunk"))

  /** MinHash signature: k hash functions h_i(s) = xxh64(shingleHash(s), i),
    * signature[i] = min over shingles. Two codegen'd passes per row
    * ([[graft.functions.ShingleHashes]] → [[graft.functions.MinHashSig]]).
    * Fastest kernel when cross-engine reproducibility is not needed;
    * [[minhashLshPairs]] uses the md5-portable row-local kernel
    * ([[graft.functions.MinHashMd5Sig]]) so the whole pipeline is
    * oracle-reproducible. */
  def minhashSignature(text: Column, numHashes: Int = 64, n: Int = 3): Column =
    graft.functions.VectorExprs.minhashSig(
      graft.functions.VectorExprs.shingleHashes(words(text), n), numHashes)

  /** MinHash-LSH candidate pairs: signatures split into `bands` bands of
    * `rows` rows; docs sharing any band bucket become candidates; candidates
    * are scored by signature agreement (the MinHash estimate of Jaccard).
    * The band join is the standard sub-quadratic LSH shape: only hash-equal
    * bands shuffle together.
    *
    * Signature derivation is ROW-LOCAL ([[graft.functions.MinHashMd5Sig]]):
    * one codegen'd pass per doc computes sig[i] = min over shingles of
    * (h1 + i·h2) mod 2^60 where h1/h2 are the two 60-bit halves of md5(shingle) —
    * Kirsch-Mitzenmacher double hashing over a portable digest. No explode,
    * no shuffle: the DuckDB oracle reproduces every value from
    * `substr(md5(s),…)` substrings, which the hash-check proves. (This
    * replaced an exploded 64-way min-aggregation. Measured at sf0.1,
    * local[32]: the kernel evaluates the corpus signatures in ~0.4 s vs the
    * exploded form's multi-second shuffle+aggregate — but the md5 count is
    * identical, so the win is the removed explode/shuffle, not the digests.
    * The flat ~10 s bench lines in rounds 2-3 were one-time MD5 JIT warmup
    * plus a 4-thread bench default, both fixed in Bench.scala — the
    * steady-state query is ~1 s.) */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      bands: Int = 16, rows: Int = 4,
                      estThreshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rows
    // materialize signatures once — both the band join and the scoring join
    // would otherwise recompute shingling+MinHash (at 100 TB this is a
    // written signature table; persist is its single-job equivalent)
    val sig = minhashSignatures(df, idCol, textCol, bands, rows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pin the cache eagerly: the band self-join's two scan branches are
    // independent stages that otherwise race to fill it, and BOTH evaluate
    // the kernel ("Block rdd_N already exists" in the logs = double compute)
    sig.count()
    // the band self-join shuffles (id, buckets, band, bucket) — the
    // bands-long bucket array rides along (8·bands bytes) so each matched
    // pair can check "is this my FIRST matching band" locally and surface
    // exactly once: no distinct-shuffle over the candidate pairs, which
    // outnumber the banded rows ~20× on dup-dense corpora. The
    // 8·numHashes-byte signatures still never shuffle here; they rejoin from
    // the (tiny relative to the corpus) signature table for scoring.
    val banded = bandSignatures(sig, bands, rows)
    val a = banded.as("a")
    val b = banded.as("b")
    val cand = a.join(b, col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .filter(graft.functions.VectorExprs.firstEqIndex(
        col("a.buckets"), col("b.buckets")) === col("a.band"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    val out = cand
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      // codegen'd agreement count — the interpreted zip_with/filter HOF stack
      // was the second hot spot after shingling (one eval per candidate pair)
      .withColumn("est_jaccard",
        graft.functions.VectorExprs.sigAgreement(col("sig_a"), col("sig_b"))
          .cast("double") / lit(numHashes))
      .filter(col("est_jaccard") >= estThreshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
      // pair-sized — eager cut, release the signature cache (r9 ADVICE)
      .localCheckpoint()
    sig.unpersist()
    out
  }

  /** Incremental MinHash-LSH: near-dup pairs for a NEW document batch
    * against an EXISTING signature table, plus within the batch — the shape
    * every production dedup pipeline actually runs daily. Existing×existing
    * pairs are never re-examined: the corpus-sized relation contributes one
    * banded probe-side join, so incremental cost scales with the batch, not
    * the corpus. `existingSigs` is the persisted (id, sig) table
    * [[minhashLshPairs]] materializes (ids must be disjoint from the batch).
    * At 100 TB the corpus side's banding is itself a stored artifact: write
    * the banded relation bucketed by (band, bucket) once and the
    * incremental join co-locates with no corpus-side shuffle — this method
    * bands the signature table inline, which re-shuffles the corpus bands
    * per run (correct, one wide pass; the bucketed layout is the
    * production refinement).
    *
    * Same banded candidate generation, first-matching-band dedup, and
    * signature-agreement scoring as the full pass; output pairs are
    * (least, greatest)-ordered, so the result equals the FULL pass over
    * old ∪ new restricted to pairs touching a new doc (the oracle twin). */
  def minhashLshIncremental(newDocs: DataFrame, idCol: String, textCol: String,
                            existingSigs: DataFrame,
                            bands: Int = 16, rows: Int = 4,
                            estThreshold: Double = 0.5): DataFrame =
    minhashIncrementalCore(newDocs, idCol, textCol,
      bandSignatures(existingSigs, bands, rows),
      existingSigs.select(col("id"), col("sig")), bands, rows, estThreshold)

  /** The bucketed-layout refinement of [[minhashLshIncremental]]: write the
    * corpus's banded relation and signature table ONCE as bucketed+sorted
    * tables, and every daily incremental run joins against them with NO
    * corpus-side shuffle — the candidate join reads `<name>_banded` already
    * hash-partitioned on (band, bucket) (only the batch side exchanges), and
    * the scoring joins read `<name>_sigs` already partitioned on id. At
    * 100 TB this turns the per-run cost from "re-shuffle the corpus bands"
    * into "scan the colliding buckets" — the same reason the reference keeps
    * its signatures in an indexed table rather than re-deriving them.
    * BucketedLayoutSpec asserts the exchange-free corpus side on the live
    * plan and that results are bit-identical to the inline-banded pass. */
  def writeSignatureTables(sig: DataFrame, name: String, numBuckets: Int,
                           bands: Int = 16, rows: Int = 4): Unit = {
    val spark = sig.sparkSession
    // a fresh session's in-memory catalog has forgotten the table but its
    // files survive under the warehouse — CTAS refuses a non-empty location,
    // so clear both catalog entry and stale directory before rewriting
    def reset(table: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val p = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    reset(s"${name}_sigs")
    reset(s"${name}_banded")
    sig.select(col("id"), col("sig")).write.format("parquet")
      .bucketBy(numBuckets, "id").sortBy("id")
      .saveAsTable(s"${name}_sigs")
    bandSignatures(sig, bands, rows).write.format("parquet")
      .bucketBy(numBuckets, "band", "bucket").sortBy("band", "bucket")
      .saveAsTable(s"${name}_banded")
  }

  /** [[writeSignatureTables]] only when `name` isn't already built in this
    * session — the layout build is a ONE-TIME cost amortized over every
    * incremental run (daily batches probe the same stored tables), so
    * callers that may run repeatedly per process (bench, notebooks) must
    * not pay the CTAS per call. `sig` is by-name: never computed on the
    * skip path. Assumes a same-process build used the same parameters —
    * the reader's stored-band/row validation still fails loudly if not. */
  def ensureSignatureTables(spark: org.apache.spark.sql.SparkSession,
                            sig: => DataFrame, name: String, numBuckets: Int,
                            bands: Int = 16, rows: Int = 4): Unit =
    if (!(spark.catalog.tableExists(s"${name}_sigs") &&
          spark.catalog.tableExists(s"${name}_banded")))
      writeSignatureTables(sig, name, numBuckets, bands, rows)

  /** Incremental pass against the bucketed tables [[writeSignatureTables]]
    * produced. Result is identical to [[minhashLshIncremental]] over the
    * same corpus signatures. */
  def minhashLshIncrementalBucketed(newDocs: DataFrame, idCol: String,
                                    textCol: String, name: String,
                                    bands: Int = 16, rows: Int = 4,
                                    estThreshold: Double = 0.5): DataFrame = {
    val spark = newDocs.sparkSession
    val banded = spark.table(s"${name}_banded")
    // the stored banding is baked into the table; a caller passing a
    // different (bands, rows) would band the batch incompatibly and the
    // equi-join would silently return wrong pairs — the buckets array
    // length records the stored band count, so mismatches fail loudly
    val storedBands = banded.select(size(col("buckets"))).head.getInt(0)
    require(storedBands == bands,
      s"stored table ${name}_banded has $storedBands bands, caller requested $bands")
    // rows is equally baked in: the signature length is bands·rows, so a
    // rows mismatch would band the batch with incompatible bucket values
    // and compare different-length signatures — silently wrong pairs
    val storedRows = spark.table(s"${name}_sigs")
      .select(size(col("sig"))).head.getInt(0) / storedBands
    require(storedRows == rows,
      s"stored table ${name}_sigs has $storedRows rows/band, caller requested $rows")
    minhashIncrementalCore(newDocs, idCol, textCol,
      banded, spark.table(s"${name}_sigs"), bands, rows, estThreshold)
  }

  private def minhashIncrementalCore(newDocs: DataFrame, idCol: String,
                                     textCol: String, bandedExisting: DataFrame,
                                     existingSigs: DataFrame,
                                     bands: Int, rows: Int,
                                     estThreshold: Double): DataFrame = {
    val numHashes = bands * rows
    val newSig = minhashSignatures(newDocs, idCol, textCol, bands, rows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bNew = bandSignatures(newSig, bands, rows)
    // new×existing collisions + new×new ordered self-join; the probe side
    // (bNew) is batch-sized, so AQE broadcasts it against the corpus bands
    def pairs(j: DataFrame) = j
      .filter(graft.functions.VectorExprs.firstEqIndex(
        col("a.buckets"), col("b.buckets")) === col("a.band"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
    val no = pairs(bNew.as("a").join(bandedExisting.as("b"),
      col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")))
    val nn = pairs(bNew.as("a").join(bNew.as("b"),
      col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id")))
    val cand = no.unionByName(nn)
    val allSigs = existingSigs.unionByName(newSig)
    val out = cand
      .join(allSigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(allSigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est_jaccard",
        graft.functions.VectorExprs.sigAgreement(col("sig_a"), col("sig_b"))
          .cast("double") / lit(numHashes))
      .filter(col("est_jaccard") >= estThreshold)
      .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 6).as("est_jaccard"))
      // batch-pair-sized — eager cut, release the batch signatures (r9 ADVICE)
      .localCheckpoint()
    newSig.unpersist()
    out
  }

  /** The persisted signature-table side of the incremental contract — the
    * ONE signature derivation every LSH entry point shares (changing the
    * shingle size or kernel here changes them all together). */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        bands: Int = 16, rows: Int = 4): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.functions.VectorExprs.minhashMd5Sig(words(col(textCol)), 3, bands * rows).as("sig"))

  /** Shared banding projection: (id, buckets, band, bucket) rows, the
    * buckets array riding along for the first-matching-band dedup.
    * `private[graft]` so BucketedLayoutSpec can assert co-location plans. */
  private[graft] def bandSignatures(sig: DataFrame, bands: Int, rows: Int): DataFrame =
    sig.select(col("id"),
        graft.functions.VectorExprs.lshBandBuckets(col("sig"), bands, rows).as("buckets"))
      .select(col("id"), col("buckets"), posexplode(col("buckets")))
      .select(col("id"), col("buckets"), col("pos").as("band"), col("col").as("bucket"))

  /** 64-bit SimHash over word hashes: bit j of the fingerprint is the sign of
    * Σ_words (bit j of xxh64(word) ? +1 : -1). One codegen'd pass per row
    * ([[graft.functions.SimHash64]]) — the per-row kernel; [[simhashPairs]]
    * derives fingerprints via exploded aggregation for oracle portability. */
  def simhash(text: Column): Column =
    graft.functions.VectorExprs.simhash64(words(text))

  private val SimHashBits = 60
  private val SimHashBlocks = 4     // 4 blocks × 15 bits
  private val SimHashBlockBits = 15

  /** SimHash near-dup pairs under the Charikar/Manku BLOCKED-candidate
    * contract: a pair surfaces when ≥1 of the 4 15-bit blocks matches
    * exactly AND hamming ≤ maxDist. By pigeonhole this is EXHAUSTIVE for
    * hamming ≤ 3 (blocks − 1); beyond that it is the standard probabilistic
    * recall trade every blocked simhash deployment makes — pairs whose
    * diffs spread across all four blocks are not candidates (Manku's full
    * construction uses C(blocks, diffs) permuted tables to close the gap;
    * that is the production refinement, not the default). Versus the single
    * high-16-bit block this replaced, candidates are ~4× but each block's
    * buckets are a valid partition key at scale, and recall no longer
    * depends on WHERE the differing bits fall.
    *
    * 60-bit fingerprints from portable md5-derived word hashes, computed
    * row-locally ([[graft.functions.SimHashMd5]]) — no explode, no 60-way
    * aggregate, no shuffle; every value remains DuckDB-reproducible, so the
    * query is hash-checked rather than rows-only. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 8): DataFrame =
    blockedSimhashPairs(df, idCol, textCol, maxDist,
      Seq.fill(SimHashBlocks)(SimHashBlockBits))

  /** EXHAUSTIVE blocked SimHash (Manku et al., WWW'07 §3, the permuted-table
    * construction): split the fingerprint into B = maxDist + 1 blocks. By
    * pigeonhole, any pair at hamming ≤ maxDist leaves ≥ 1 block untouched,
    * so single-block candidate tables miss NOTHING at ≤ maxDist — unlike
    * [[simhashPairs]]'s fixed 4-block scheme, which is exhaustive only to
    * hamming ≤ 3 and probabilistic beyond. The trade is candidate volume:
    * narrower blocks (60/B bits) mean coarser buckets, ~n²·B/2^(60/B) random
    * collisions — the B you can afford bounds the maxDist you can certify.
    * Block widths differ by ≤ 1 bit when B ∤ 60 (wider blocks first), which
    * preserves the pigeonhole argument (it needs any partition, not equal
    * widths). Graded against a brute-force all-pairs oracle: the hash-match
    * IS the exhaustiveness proof at the graded distance. */
  def simhashPairsExhaustive(df: DataFrame, idCol: String, textCol: String,
                             maxDist: Int = 5): DataFrame = {
    val blocks = maxDist + 1
    require(blocks >= 2 && blocks <= SimHashBits,
      s"maxDist + 1 block tables must fit in $SimHashBits bits")
    val base = SimHashBits / blocks
    val rem = SimHashBits % blocks
    blockedSimhashPairs(df, idCol, textCol, maxDist,
      (0 until blocks).map(b => base + (if (b < rem) 1 else 0)))
  }

  /** Shared blocked-candidate core: fingerprint → one row per (doc, block) →
    * block-equality self-join → first-matching-block dedup → hamming filter.
    * `widths` is the bit width of each block, low bits first. */
  private def blockedSimhashPairs(df: DataFrame, idCol: String, textCol: String,
                                  maxDist: Int, widths: Seq[Int]): DataFrame = {
    val blocks = widths.size
    val offsets = widths.scanLeft(0)(_ + _).init
    val withSim = df.select(col(idCol).as("id"),
      graft.functions.VectorExprs.simhashMd5(words(col(textCol))).as("sim"))
    // `blocks` rows per doc: (block index, block value); the self-join key is
    // (blk, bv) so only block-equal docs shuffle together
    val blocked = withSim.select(col("id"), col("sim"), explode(array(
      (0 until blocks).map(b => struct(lit(b).as("blk"),
        shiftright(col("sim"), offsets(b))
          .bitwiseAND(lit((1L << widths(b)) - 1)).as("bv"))): _*)).as("bb"))
      .select(col("id"), col("sim"), col("bb.blk"), col("bb.bv"))
      // materialize once, eagerly — both self-join sides read this relation,
      // and without the pin each side re-runs scan→words→SimHashMd5 (the
      // round-3 bench regression; minhashLshPairs pins its sig table the
      // same way; at 100 TB this is a written fingerprint table)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    blocked.count()
    val a = blocked.as("a")
    val b = blocked.as("b")
    // a pair matching in several blocks surfaces once: keep it only where the
    // joined block is its FIRST matching block — derivable locally from the
    // fingerprint xor (block b' matches ⇔ its xor bits are zero), so no
    // distinct-shuffle over the candidate pairs
    val xorv = col("a.sim").bitwiseXOR(col("b.sim"))
    val firstBlk = (blocks - 1 to 0 by -1).foldLeft(lit(-1)) { (acc, bp) =>
      when(shiftright(xorv, offsets(bp))
        .bitwiseAND(lit((1L << widths(bp)) - 1)) === 0L, lit(bp)).otherwise(acc)
    }
    val out = a.join(b, col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
        col("a.id") < col("b.id"))
      .filter(firstBlk === col("a.blk"))
      .withColumn("hamming", bit_count(xorv))
      .filter(col("hamming") <= maxDist)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("hamming"))
      // pair-sized — eager cut, release the fingerprint cache (r9 ADVICE)
      .localCheckpoint()
    blocked.unpersist()
    out
  }

  /** Duplicate-cluster resolution: near-dup PAIRS → connected components →
    * one canonical keeper per cluster (the min id — the rule every dedup
    * pipeline needs after pair generation, since near-dup is transitive in
    * practice: a~b, b~c ⇒ keep one of {a,b,c}).
    *
    * Min-label propagation (the Pregel/GraphX connected-components algorithm
    * without the GraphX dependency): every node starts labeled with itself;
    * each round, a node adopts the min label in its neighborhood; fixpoint ⇒
    * labels = component minima. The driver loop is the standard shape for
    * iterative graph algorithms on DataFrames — each round is ONE
    * shuffle-join bounded by the edge count, rounds needed = graph diameter
    * (near-dup clusters are shallow: a handful of rounds). Each round's
    * result persists and the previous unpersists, so lineage stays O(1).
    *
    * Adaptive execution, same shape as Spark's own broadcast-join threshold:
    * below `localEdgeThreshold` edges (long ids only) the whole component
    * resolution runs as ONE executor task — union-find over the coalesced
    * edge list via mapPartitions, executor-side, no driver collect. A dedup
    * pair list is near-dup EDGES, which are orders of magnitude rarer than
    * docs; even a 100 TB corpus commonly yields a pair list in the millions,
    * where a 4-shuffle-per-round distributed loop is pure scheduling
    * overhead (measured: ~0.2 s vs ~4 s at sf0.1). Above the threshold the
    * distributed pointer-jump loop takes over unchanged.
    *
    * Returns (id, cluster) — cluster is the component's min id. */
  def resolveClusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
                      maxIter: Int = 20,
                      localEdgeThreshold: Long = 4L << 20): DataFrame = {
    // Eager localCheckpoint severs the pair-generation lineage: without it,
    // EVERY round's plan re-embeds (and Catalyst re-optimizes) the whole
    // upstream near-dup pipeline — the classic iterative-DataFrame trap
    // (this exact query went 152 s → ~5 s at sf0.1 from this change).
    val p = pairs.select(col(idA).as("src"), col(idB).as("dst")).localCheckpoint()
    val integral = p.schema.fields.forall(f => f.dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType => true
      case _ => false
    })
    if (integral && p.count() <= localEdgeThreshold) return resolveClustersLocal(p)
    // undirected: both directions
    val edges = p.unionByName(p.select(col("dst").as("src"), col("src").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // init fused with round 1: label(v) = min(v, min neighbor) is one
    // aggregation over the edge list — no join needed while labels still
    // equal ids
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("_m"))
      .select(col("src").as("id"), least(col("src"), col("_m")).as("label"))
      .localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // step 1: adopt the min label in the neighborhood
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min(col("label")).as("nbr"))
      val step1 = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nbr"), col("label"))).as("l1"))
      // step 2: pointer jumping — follow my label to ITS label, halving the
      // remaining chain length every round (O(log diameter) convergence vs
      // O(diameter) for plain propagation)
      val mapping = step1.select(col("id").as("mid"), col("l1").as("mlabel"))
      val step2 = step1.join(mapping, step1("l1") === mapping("mid"), "left")
        .select(col("id"), col("old"),
          least(col("l1"), coalesce(col("mlabel"), col("l1"))).as("label"))
      val mat = step2.localCheckpoint() // flat lineage for the next round
      changed = mat.filter(col("label") < col("old")).count()
      labels = mat.drop("old")
      iter += 1
    }
    edges.unpersist()
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** INCREMENTAL connected components — the daily-ingest form of
    * [[resolveClusters]]: given the stored assignment `prev` (id → cluster,
    * cluster = component min id) and a BATCH of new near-dup pairs, produce
    * the updated assignment without touching any historical pair.
    *
    * Contraction argument: components are closed under their representative
    * labels, so it suffices to (1) map each batch edge's endpoints through
    * `prev` (absent → the id itself — a new doc), (2) drop edges that stay
    * inside one existing cluster, (3) run CC on the CONTRACTED graph —
    * whose size is bounded by the batch pair count, never the corpus — and
    * (4) relabel: old rows re-map via their representative, new ids via
    * themselves. Because every stored label is already its component's min
    * id, the contracted component minima equal the full-graph minima, so
    * the result is IDENTICAL to resolving base ∪ batch from scratch (the
    * graded query proves it against the full-recompute oracle).
    *
    * Scale shape: `prev` is scanned once for the endpoint lookups (at
    * 100 TB: a bucketed-by-id stored table, co-located join) and once for
    * the relabel; the relabel relation is batch-sized and broadcasts. The
    * full recompute would re-shuffle every historical pair every day —
    * this touches O(corpus) only in two embarrassingly-parallel joins.
    *
    * `newIds`: optionally, the batch's full id set (so pair-less new docs
    * get singleton rows); defaults to the batch pairs' unseen endpoints. */
  def resolveClustersIncremental(prev: DataFrame, newPairs: DataFrame,
                                 idA: String = "id_a", idB: String = "id_b",
                                 newIds: Option[DataFrame] = None): DataFrame = {
    val p = prev.select(col("id"), col("cluster"))
    CacheOnce.pin(p) // re-execution-safe: this pin is deliberately left
    p.count() // pin: feeds two lookup joins + the relabel scan
    val e0 = newPairs.select(col(idA).as("a"), col(idB).as("b"))
    val contracted = e0
      .join(p.select(col("id").as("a"), col("cluster").as("ca")), Seq("a"), "left")
      .join(p.select(col("id").as("b"), col("cluster").as("cb")), Seq("b"), "left")
      .select(coalesce(col("ca"), col("a")).as("id_a"),
        coalesce(col("cb"), col("b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    val fresh = newIds.getOrElse(
      e0.select(col("a").as("id")).unionByName(e0.select(col("b").as("id")))
        .distinct())
      .join(p.select(col("id")), Seq("id"), "left_anti")
    // batch-sized by construction → the relabel side broadcasts
    val rl = resolveClusters(contracted)
      .select(col("id").as("rep"), col("cluster").as("newc"))
    CacheOnce.pin(rl)
    rl.count() // pin: iterative output feeding two joins
    val oldSide = p.join(broadcast(rl), p("cluster") === rl("rep"), "left")
      .select(p("id"), coalesce(col("newc"), p("cluster")).as("cluster"))
    val newSide = fresh.join(broadcast(rl), fresh("id") === rl("rep"), "left")
      .select(fresh("id"), coalesce(col("newc"), fresh("id")).as("cluster"))
    oldSide.unionByName(newSide)
  }

  /** End-to-end dedup: given near-dup PAIRS over `corpus`, resolve duplicate
    * clusters and return the deduplicated corpus — every non-canonical
    * member dropped (min-id keeps), each keeper annotated with how many
    * duplicates it absorbed (0 for docs with no near-dup).
    *
    * Scale shape: the loser list is the duplicate set — potentially huge at
    * 100 TB, so it anti-joins (sort-merge) rather than broadcasting; AQE
    * downgrades both joins to broadcast when the cluster relation is small.
    * One resolveClusters pass feeds both the anti-join and the absorption
    * counts (persisted — it is the output of an iterative computation whose
    * lineage must not re-run). */
  def dedupCorpus(corpus: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val clusters = resolveClusters(pairs)
    CacheOnce.pin(clusters)
    val losers = clusters.filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    val absorbed = clusters.groupBy(col("cluster").as(idCol))
      .agg((count(lit(1)) - 1).as("n_absorbed"))
    corpus.join(losers, Seq(idCol), "left_anti")
      .join(absorbed, Seq(idCol), "left")
      .withColumn("n_absorbed", coalesce(col("n_absorbed"), lit(0L)))
  }

  /** Small-graph path: union-find (union by rank + path compression) over the
    * edge list in a single executor task. coalesce(1) moves the edges to one
    * partition WITHOUT a shuffle; the task is O(E α(E)) time and O(V+E)
    * memory — at the 4M-edge threshold that's tens of MB, the same order a
    * broadcast-join side would occupy. Output is deterministic: every node
    * labels with its component's min id, rows sorted by the caller. */
  private def resolveClustersLocal(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col("src").cast("long"), col("dst").cast("long")).as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        val nodes = scala.collection.mutable.ArrayBuffer.empty[Long]
        it.foreach { case (a, b) =>
          if (!parent.contains(a)) { parent(a) = a; nodes += a }
          if (!parent.contains(b)) { parent(b) = b; nodes += b }
          val (ra, rb) = (find(a), find(b))
          // union by min root keeps the invariant root == component min so
          // far, making the final labels independent of edge order
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        nodes.iterator.map(v => (v, find(v)))
      }
      .toDF("id", "cluster")
  }

  /** Benchmark decontamination (the GPT-3 appendix-C / PaLM check every
    * training run needs): a training doc is CONTAMINATED if it shares any
    * word n-gram (n = 13 canonically) with the evaluation benchmark.
    *
    * Scale shape: the training side never materializes string n-grams —
    * [[graft.functions.ShingleHashes]] emits the distinct 64-bit window
    * hashes in one codegen pass, so the probe is an 8-byte-key join. The
    * benchmark is tiny relative to any training corpus, so its distinct
    * n-gram set BROADCASTS and the whole check is map-side: one pass over
    * 100 TB, no shuffle until the per-doc count aggregate (map-side
    * combined, bounded by matches — normally a vanishing fraction).
    * Returns one row per contaminated doc: distinct shared n-grams +
    * distinct benchmark docs hit — the drop/flag decision inputs. */
  def contamination(train: DataFrame, trainId: String, trainText: String,
                    benchmark: DataFrame, benchId: String, benchText: String,
                    n: Int = 13): DataFrame = {
    val tsh = train.select(col(trainId).as("doc_id"),
      explode(graft.functions.VectorExprs.shingleHashes(
        words(col(trainText)), n)).as("s"))
    val bsh = benchmark.select(col(benchId).as("bench_id"),
      explode(graft.functions.VectorExprs.shingleHashes(
        words(col(benchText)), n)).as("s"))
    tsh.join(broadcast(bsh), Seq("s"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("s")).as("n_shared_ngrams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }

  /** Duplicated n-gram span analysis (the signal behind Lee et al. 2022's
    * "Deduplicating Training Data Makes Language Models Better" exact
    * substring dedup): for each doc, what fraction of its distinct n-grams
    * (n = 20 canonically — long enough that natural re-use is negligible)
    * also appears elsewhere in the corpus. High fraction ⇒ the doc is
    * largely copied material even when no single whole-doc match exists.
    *
    * Scale shape: the same two bounded shuffles as every shingle op here —
    * distinct hashed windows per doc (codegen, no string n-grams), ONE
    * groupBy(gram) for document frequency, rejoin + per-doc aggregate.
    * The df relation reduces to distinct grams; no pair set, no self-join. */
  def duplicatedNgramSpans(df: DataFrame, idCol: String, textCol: String,
                           n: Int = 20): DataFrame = {
    val grams = df.select(col(idCol).as("doc_id"),
      explode(graft.functions.VectorExprs.shingleHashes(
        words(col(textCol)), n)).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gdf = grams.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val out = grams.join(gdf, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_ratio",
        round(col("n_dup_grams").cast("double") / col("n_grams"), 6))
      // one census row per doc — eager cut, release the gram cache (r9 ADVICE)
      .localCheckpoint()
    grams.unpersist()
    out
  }

  /** Exact-substring REMOVAL (Lee et al. 2022's actual dedup action, one
    * step past [[duplicatedNgramSpans]]'s census): every n-word span that
    * appears anywhere else in the corpus keeps only its FIRST occurrence
    * (min (doc, position) — the deterministic stand-in for the paper's
    * suffix-array order) and every other occurrence's word range is cut
    * from its document. Returns per doc: word count, words removed, and
    * the reconstructed kept text.
    *
    * Scale shape: positional window hashes (codegen'd, 8 bytes/window, no
    * n-gram strings leave the scan) → ONE groupBy(gram) for (keeper, df)
    * → rejoin → per-doc cut-start lists (bounded by doc length) → row-local
    * reconstruction via an indexed array filter. Two bounded shuffles, no
    * pair relation, no self-join — the same spine as the census, plus a
    * doc-length-bounded local pass to rebuild the text. */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           n: Int = 20): DataFrame = {
    val ws = df.select(col(idCol).as("doc_id"),
      graft.operators.TextAnalysis.words(col(textCol)).as("ws"))
    CacheOnce.pin(ws) // corpus-sized output contract: pin deliberately left
    val grams = ws.select(col("doc_id"), posexplode(
      graft.functions.VectorExprs.positionalShingleHashes(col("ws"), n)))
      .toDF("doc_id", "pos", "s")
    val key = col("doc_id") * 4294967296L + col("pos")
    val gstats = grams.groupBy(col("s"))
      .agg(min(key).as("keep_key"), count(lit(1)).as("df"))
    val cuts = grams.join(gstats, Seq("s"))
      .filter(col("df") > 1 && key =!= col("keep_key"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("cut_starts"))
    ws.join(cuts, Seq("doc_id"), "left")
      .withColumn("cut_starts",
        coalesce(col("cut_starts"), lit(Array.empty[Int])))
      .withColumn("kept", filter(col("ws"), (_, i) =>
        !exists(col("cut_starts"), p => p <= i && i <= p + (n - 1))))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        (size(col("ws")) - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("kept_text"))
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
    // zero-norm embeddings have no defined cosine: 0/0 = NaN, and BOTH
    // engines order NaN above every threshold — exclude them up front or one
    // zero vector pairs with the whole corpus
    val v = base.select(col(idCol).as("id"), col("lsh_bucket"), col(embCol).as("emb"))
      .withColumn("nrm", sqrt(Vectors.norm2(col("emb"))))
      .filter(col("nrm") > 0)
    val a = v.as("a")
    val b = v.as("b")
    a.join(b, col("a.lsh_bucket") === col("b.lsh_bucket") && col("a.id") < col("b.id"))
      .withColumn("cos_sim", round(
        Vectors.dot(col("a.emb"), col("b.emb")) / (col("a.nrm") * col("b.nrm")), 6))
      .filter(col("cos_sim") >= simThreshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos_sim"))
  }

  /** Semantic dedup (the SemDeDup shape, Abbas et al. 2023): candidate
    * buckets are LEARNED k-means clusters instead of [[embeddingNearDupPairs]]'s
    * random hyperplanes — embeddings cluster by MEANING, so semantically-close
    * pairs co-locate far more often than under random signs, and the
    * within-cluster cosine scan catches paraphrase-level duplicates that
    * shingle methods miss entirely. Same scale spine as every bucketed
    * near-dup here: assignment is one codegen'd pass ([[Vectors.ivfAssign]] —
    * at 100 TB the corpus is written partitioned by cluster), the self-join
    * keys on the cluster id, no all-pairs anywhere. Centroids arrive as
    * literals (query parameters, typically [[Vectors.kmeansRefine]] output). */
  def semanticNearDupPairs(df: DataFrame, idCol: String, embCol: String,
                           centroids: Seq[(Long, Seq[Double])],
                           simThreshold: Double = 0.95): DataFrame = {
    val v = Vectors.ivfAssign(df, embCol, centroids)
      .select(col(idCol).as("id"), col("ivf_cid").as("cid"),
        col(embCol).cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(Vectors.norm2(col("emb"))))
      .filter(col("nrm") > 0)
      // pin eagerly: both self-join sides read this relation — without it
      // each side re-runs the k-centroid argmin per row (the simhash lesson;
      // at 100 TB the assignment is the written cluster partitioning)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    v.count()
    val a = v.as("a")
    val b = v.as("b")
    val out = a.join(b, col("a.cid") === col("b.cid") && col("a.id") < col("b.id"))
      .withColumn("cos_sim", round(
        Vectors.dot(col("a.emb"), col("b.emb")) / (col("a.nrm") * col("b.nrm")), 6))
      .filter(col("cos_sim") >= simThreshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos_sim"))
      // pair-sized — eager cut, release the assignment cache (r9 ADVICE)
      .localCheckpoint()
    v.unpersist()
    out
  }

  /** LSH parameter sweep over one shared signature table: each (bands,
    * rows) arm with bands·rows == numHashes re-bands the SAME 64-slot
    * signatures (banding is a projection, not a recompute), generates its
    * candidate set, and reports the S-curve census — candidate count,
    * summed slot agreement, and pairs clearing est ≥ 1/2. Many bands ×
    * few rows catches low-similarity pairs (high recall, more candidates);
    * few bands × many rows admits only near-identical pairs. At 100 TB
    * the sweep costs one signature pass plus `arms` band-joins — the
    * signatures never recompute and never reshuffle between arms. */
  def minhashParamSweep(df: DataFrame, idCol: String, textCol: String,
                        arms: Seq[(Int, Int)]): DataFrame = {
    val nh = arms.map { case (b, r) => b * r }.distinct
    require(nh.size == 1, s"arms must share numHashes, got $arms")
    val numHashes = nh.head
    val sig = minhashSignatures(df, idCol, textCol, arms.head._1, arms.head._2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sig.count()
    val per = arms.map { case (bands, rows) =>
      val banded = bandSignatures(sig, bands, rows)
      val a = banded.as("a")
      val b = banded.as("b")
      val cand = a.join(b, col("a.band") === col("b.band") &&
          col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .filter(graft.functions.VectorExprs.firstEqIndex(
          col("a.buckets"), col("b.buckets")) === col("a.band"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      cand
        .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .select(graft.functions.VectorExprs.sigAgreement(
          col("sig_a"), col("sig_b")).cast("long").as("agree"))
        .agg(count(lit(1)).as("n_candidates"),
          coalesce(sum(col("agree")), lit(0L)).as("sum_agreement"),
          coalesce(sum(when(col("agree") * 2 >= numHashes, 1L).otherwise(0L)),
            lit(0L)).as("n_dup_pairs"))
        .select(lit(bands).as("bands"), lit(rows).as("rows_per_band"),
          col("n_candidates"), col("sum_agreement"), col("n_dup_pairs"))
    }
    // arms-row census — eager cut, release the shared signatures (r9 ADVICE)
    val out = per.reduce(_.unionByName(_)).localCheckpoint()
    sig.unpersist()
    out
  }
}
