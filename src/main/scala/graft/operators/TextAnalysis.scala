package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (north-star ops): token
  * counting, quality scoring, language ID, document fingerprinting. All pure
  * column expressions — one scan, no shuffle, codegen'd end to end.
  */
object TextAnalysis {

  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish subword count: alnum runs + punctuation marks each count as one
    * token (regex proxy for byte-pair tokenizers; deterministic, portable). */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "[^A-Za-z0-9]+"), w => length(w) > 0)) +
      length(text) - length(regexp_replace(text, "[.,;:!?'\"()]", ""))

  private val stopwordsEn = Seq("the", "a", "and", "of", "to", "in", "is",
    "for", "on", "with")

  /** Quality metrics: word count, mean word length, punctuation ratio,
    * stopword ratio. Ratios are rounded to 6 dp so cross-engine double
    * division hashes stably. */
  def qualityMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val w = words(t)
    val nWords = size(w)
    val punct = length(t) - length(regexp_replace(t, "[.,;:!?]", ""))
    val stops = graft.functions.VectorExprs.stopwordCounts(w, Seq(stopwordsEn))
      .getItem(0)
    df.select(col(idCol),
      nWords.as("n_words"),
      round(length(regexp_replace(t, "\\s", "")).cast("double") / nWords, 6)
        .as("mean_word_len"),
      round(punct.cast("double") / length(t), 6).as("punct_ratio"),
      round(stops.cast("double") / nWords, 6).as("stopword_ratio"))
  }

  private val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "de" -> Seq("der", "die", "und", "das", "von", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une"))

  /** N-gram/stopword language-ID heuristic: score = stopword hits per
    * language, argmax wins, ties and zero-hit docs → 'und'. Deterministic
    * argmax: languages compared in fixed order, strictly-greater wins. All
    * four scores come from ONE codegen'd pass over the token array
    * ([[graft.functions.StopwordCounts]]) instead of four interpreted
    * filter/isin HOF stacks. */
  def langId(text: Column): Column =
    graft.functions.VectorExprs.stopwordLangId(words(text), langStopwords)

  /** Document fingerprint: hash of the sorted distinct word set — a
    * word-order-insensitive rolling-hash analog, stable across engines. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(words(text))), " "))

  /** Longest run of equal adjacent elements in a SORTED array == the max
    * multiplicity of any value — one O(n) aggregate pass, no explode. */
  private def maxRun(sorted: Column): Column =
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  /** Word 2-grams (non-distinct, order-preserving); empty below 2 words. */
  private def bigrams(w: Column): Column =
    when(size(w) >= 2,
      transform(sequence(lit(1), size(w) - 1), i => array_join(slice(w, i, lit(2)), " ")))
      .otherwise(typedLit(Seq.empty[String]))

  /** Repetition-based quality signals (the Gopher/MassiveText repetition
    * rules, re-expressed row-locally): word and 2-gram multiplicities plus
    * the duplicate/top-fraction ratios a filtering pipeline thresholds on.
    *
    * Scale shape: pure column expressions over each row's token array — one
    * scan, zero shuffles at any corpus size. Multiplicity counts come from
    * sorted-run scans ([[maxRun]]), not explode+groupBy, so nothing leaves
    * the row. Fractions are single int/int IEEE divisions (bit-identical
    * across engines — no rounding needed, unlike order-dependent sums). */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol), words(col(textCol)).as("w"))
      .select(col(idCol),
        size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct_words"),
        maxRun(array_sort(col("w"))).as("top_word_count"),
        bigrams(col("w")).as("bi"))
      .select(col(idCol), col("n_words"), col("n_distinct_words"),
        col("top_word_count"),
        size(col("bi")).cast("long").as("n_bigrams"),
        size(array_distinct(col("bi"))).cast("long").as("n_distinct_bigrams"),
        maxRun(array_sort(col("bi"))).as("top_bigram_count"))
    base.select(col(idCol), col("n_words"), col("n_distinct_words"),
      col("top_word_count"), col("n_bigrams"), col("n_distinct_bigrams"),
      col("top_bigram_count"),
      when(col("n_words") === 0, lit(0.0))
        .otherwise((col("n_words") - col("n_distinct_words")) / col("n_words"))
        .as("dup_word_frac"),
      when(col("n_bigrams") === 0, lit(0.0))
        .otherwise(col("top_bigram_count") / col("n_bigrams"))
        .as("top_bigram_frac"))
  }

  /** PII patterns shared by [[redactPii]]: kept to syntax with identical
    * semantics in Java regex and RE2 (no lookaround, no backreferences) so
    * the DuckDB oracle twin matches byte for byte. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    ("ip", "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"))

  /** PII redaction for training corpora: per-category match counts (on the
    * original text) plus the text with every match replaced by its
    * placeholder, categories applied in [[piiPatterns]] order.
    *
    * Scale shape: pure regexp column expressions — one scan, no shuffle, no
    * UDF; the regex state machines compile once per task via codegen. */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val redacted = piiPatterns.foldLeft(col(textCol)) {
      case (c, (_, pat, tag)) => regexp_replace(c, pat, tag)
    }
    val counts = piiPatterns.map { case (name, pat, _) =>
      regexp_count(col(textCol), lit(pat)).cast("int").as(s"n_${name}s")
    }
    df.select(col(idCol) +: counts :+ redacted.as("text_redacted"): _*)
  }

  /** Document chunking — the preprocessing twin of [[Packing]]: split each
    * document into `chunkTokens`-token sliding windows with `overlap` tokens
    * of context carry-over (stride = chunkTokens − overlap; every doc yields
    * ≥ 1 chunk, the last one short). Emits (chunk_id, tok_start, n_tokens,
    * chunk_hash) per window.
    *
    * Scale shape: row-local transform + posexplode — one scan, zero
    * shuffles; output rows ≈ corpus tokens / stride regardless of document
    * skew, so no hot keys exist to salt. All window arithmetic is integer. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap $overlap must be in [0, $chunkTokens)")
    val stride = chunkTokens - overlap
    val w = words(col(textCol))
    // ceil((n − overlap) / stride) via integer arithmetic, min 1
    val nChunks = greatest(lit(1),
      floor((size(w) - lit(overlap) + lit(stride - 1)).cast("double") / lit(stride))
        .cast("int"))
    df.select(col(idCol), w.as("_w"), nChunks.as("_nc"))
      .select(col(idCol), posexplode(transform(sequence(lit(0), col("_nc") - 1),
        i => slice(col("_w"), i * stride + 1, lit(chunkTokens)))))
      .select(col(idCol), col("pos").as("chunk_id"),
        (col("pos") * stride + 1).as("tok_start"),
        size(col("col")).as("n_tokens"),
        md5(array_join(col("col"), " ")).as("chunk_hash"))
  }

  /** C4/Gopher-style heuristic document filters — the standard pretraining
    * quality battery (C4's boilerplate/placeholder rules + Gopher's
    * symbol/alpha/stopword rules), re-expressed as one row-local flag per
    * rule plus the conjunction `keep`.
    *
    * Flags (true = document PASSES the rule):
    *   - f_words:    word count in [minWords, maxWords]
    *   - f_word_len: mean word length in [3, 10]
    *   - f_lorem:    no 'lorem ipsum' placeholder
    *   - f_brace:    no '{' (code/markup leakage)
    *   - f_policy:   no 'javascript' token (C4's boilerplate-line analog)
    *   - f_symbol:   '#' symbols ≤ 1/20 of words (Gopher symbol-to-word)
    *   - f_alpha:    ≥ 4/5 of words contain a letter (Gopher alpha-word)
    *   - f_stopword: ≥ 2 hits from the English stopword set (Gopher)
    *
    * Ratio rules compare as cross-multiplied INTEGERS (20·symbols ≤ words),
    * so no float leaves the row; the two genuine ratios (mean word length)
    * are single exact int/int divisions. Pure column expressions — one scan,
    * zero shuffles at any corpus size, codegen'd end to end. */
  def c4GopherFilters(df: DataFrame, idCol: String, textCol: String,
                      minWords: Int = 10, maxWords: Int = 100000): DataFrame = {
    val t = col(textCol)
    val flags = c4FlagColumns(t, minWords, maxWords)
    df.select(col(idCol) +: size(words(t)).as("n_words") +:
      flags.map { case (n, c) => c.as(n) } :+
      flags.map(_._2).reduce(_ && _).as("keep"): _*)
  }

  /** The 8 rules as named predicate columns over a text column — shared by
    * the batch operator and the streaming ingest gate. Catalyst's
    * subexpression elimination collapses the repeated tokenizations in the
    * generated code. */
  def c4FlagColumns(t: Column, minWords: Int = 10,
                    maxWords: Int = 100000): Seq[(String, Column)] = {
    val w = words(t)
    val nWords = size(w)
    val meanLen = length(regexp_replace(t, "\\s", "")).cast("double") / nWords
    val hashes = length(t) - length(regexp_replace(t, "#", ""))
    val alphaWords = size(filter(w, x => x.rlike("[a-z]")))
    val stops = graft.functions.VectorExprs.stopwordCounts(w, Seq(stopwordsEn))
      .getItem(0)
    Seq(
      "f_words" -> nWords.between(minWords, maxWords),
      "f_word_len" -> (meanLen >= 3.0 && meanLen <= 10.0),
      "f_lorem" -> not(lower(t).contains("lorem ipsum")),
      "f_brace" -> not(t.contains("{")),
      "f_policy" -> not(array_contains(w, "javascript")),
      "f_symbol" -> (hashes * 20 <= nWords),
      "f_alpha" -> (alphaWords * 5 >= nWords * 4),
      "f_stopword" -> (stops >= 2))
  }

  /** The conjunction of all 8 rules — the keep gate as one predicate. */
  def c4Keep(t: Column, minWords: Int = 10, maxWords: Int = 100000): Column =
    c4FlagColumns(t, minWords, maxWords).map(_._2).reduce(_ && _)

  /** Unigram-LM surprisal scoring — the perplexity-proxy quality signal
    * (Wenzek et al.'s CCNet uses a KenLM; the unigram self-LM is its
    * engine-portable analog): train word frequencies on the corpus itself,
    * then score each doc by its mean per-token surprisal ln(N/c). High mean
    * ⇒ rare-word-heavy (gibberish or niche); low ⇒ boilerplate-common.
    *
    * Scale shape: two shuffles, both inherent — one groupBy(word) to train
    * the LM (map-side combined), one groupBy(doc) to score. N reduces to a
    * driver scalar that rides into the plan as a literal; the token→LM join
    * is left to AQE, which broadcasts while the vocabulary is small — and a
    * broadcast join has no skew surface, so Zipf-hot words ("the") cost
    * nothing extra. If the vocabulary ever outgrows broadcast, the join
    * falls to sort-merge and AQE's skew-join split handles the hot-word
    * partitions (the head of the vocabulary would then be broadcast
    * separately in a production two-tier lookup). Per-word surprisal
    * rounds to 6 dp BEFORE the per-doc sum and
    * sums as DECIMAL, so doc scores are order-independent and any last-ulp
    * ln() disagreement between engines is absorbed ahead of aggregation. */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("id"), explode(words(col(textCol))).as("w"))
    val lm = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = lm.agg(sum(col("c"))).head().getLong(0).toDouble
    val scored = lm.select(col("w"),
      round(log(lit(n) / col("c")), 6).cast("decimal(18,6)").as("surp"))
    val out = tok.join(scored, Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("surp")).as("_ssum"))
      .select(col("id"), col("n_tokens"),
        round(col("_ssum").cast("double") / col("n_tokens"), 6).as("mean_surprisal"))
      // per-doc scores — eager cut, release the LM pin (r9 ADVICE)
      .localCheckpoint()
    lm.unpersist()
    out
  }

  /** The two-tier LM lookup [[unigramSurprisal]]'s doc comment promises —
    * the production topology once the vocabulary outgrows a single
    * broadcast: the Zipf HEAD (top `headSize` words by count, tiebreak on
    * word) broadcasts and matches map-side, covering the overwhelming
    * majority of token OCCURRENCES; only rare-word tokens reach the
    * shuffled tail join, whose partitions are skew-free by construction
    * (every hot word is in the head). head ∪ tail partitions the token
    * stream exactly, so the result is bit-identical to the single-join
    * form — graded against the SAME oracle as `text_perplexity`. */
  def unigramSurprisalTiered(df: DataFrame, idCol: String, textCol: String,
                             headSize: Int = 10000): DataFrame = {
    val tok = df.select(col(idCol).as("id"), explode(words(col(textCol))).as("w"))
    val lm = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = lm.agg(sum(col("c"))).head().getLong(0).toDouble
    val scored = lm.select(col("w"), col("c"),
      round(log(lit(n) / col("c")), 6).cast("decimal(18,6)").as("surp"))
    val head = broadcast(scored.orderBy(col("c").desc, col("w")).limit(headSize)
      .select(col("w"), col("surp")))
    val headHits = tok.join(head, Seq("w"))
    val tailHits = tok.join(head.select(col("w")), Seq("w"), "left_anti")
      .join(scored.select(col("w"), col("surp")), Seq("w"))
    val out = headHits.unionByName(tailHits)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("surp")).as("_ssum"))
      .select(col("id"), col("n_tokens"),
        round(col("_ssum").cast("double") / col("n_tokens"), 6).as("mean_surprisal"))
      // per-doc scores — eager cut, release the LM pin (r9 ADVICE)
      .localCheckpoint()
    lm.unpersist()
    out
  }

  /** Documents exploded to LINES of `wordsPerLine` words. The fixture corpus
    * is newline-free, so line structure is synthesized deterministically —
    * a stand-in for the natural line/sentence segmentation of web text that
    * keeps every downstream line operator oracle-reproducible. */
  def docLines(df: DataFrame, idCol: String, textCol: String,
               wordsPerLine: Int = 4): DataFrame = {
    val ws = words(col(textCol))
    df.select(col(idCol).as("id"), ws.as("ws"))
      .select(col("id"), posexplode(transform(
        sequence(lit(0),
          floor((size(col("ws")) + lit(wordsPerLine - 1)) / lit(wordsPerLine))
            .cast("int") - 1),
        i => array_join(slice(col("ws"), i * wordsPerLine + 1, lit(wordsPerLine)), " "))))
      .select(col("id"), col("pos").cast("long").as("line_no"), col("col").as("line"))
  }

  /** EXACT heavy hitters (items with share ≥ 1/k) in two bounded passes —
    * the way to mine top tokens/n-grams from 100 TB without shuffling the
    * full vocabulary: (1) per-partition Misra–Gries summaries (4k counters
    * each) whose union is a PROVABLE candidate superset — pigeonhole gives
    * every global-share-≥1/k item a partition where its local share is
    * ≥ 1/k > 1/(4k+1), and MG with b counters keeps anything above
    * share 1/(b+1); (2) exact counts for the candidate set only (a
    * broadcast semi-join, so the groupBy shuffles candidate-sized data).
    * The output is EXACT and partitioning-independent — unlike sketches,
    * whose merge order leaks into the result. */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    require(k >= 2, s"heavy hitters needs k >= 2, got $k")
    val spark = items.sparkSession
    import spark.implicits._
    val ds = items.select(col(itemCol).cast("string")).as[String]
    val budget = 4 * k
    val candidates = ds.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        counters.get(x) match {
          case Some(c) => counters(x) = c + 1
          case None if counters.size < budget => counters(x) = 1L
          case None => // decrement-all step (amortized O(1) per arrival)
            val dead = List.newBuilder[String]
            counters.keysIterator.foreach { key =>
              val c = counters(key) - 1
              if (c == 0) dead += key else counters(key) = c
            }
            dead.result().foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("item").distinct()
    val n = ds.count()
    items.select(col(itemCol).cast("string").as("item"))
      .join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k >= n)
  }

  /** Winnowing document fingerprints (Schleimer et al. 2003 — the MOSS
    * algorithm): hash every k-word gram, slide a window of `w` gram hashes,
    * keep each window's MINIMUM — the selected set is the document's
    * fingerprint, with the paper's guarantee that any shared run of
    * ≥ w+k-1 words contributes a shared fingerprint. The density bound
    * (≈ 2/(w+1) of grams selected) is what makes fingerprint indexes a
    * fraction of [[duplicatedNgramSpans]]'s full gram relation — winnowing
    * is the storage-scale variant of span-level dedup.
    *
    * Entirely ROW-LOCAL (one scan, zero shuffles): grams, windows, mins,
    * and the distinct-sort all run inside codegen'd array HOFs. The gram
    * hash is the portable md5-60-bit kernel (the [[graft.operators.Sampling
    * .sampleBucket]] construction) because winnowing SELECTS BY HASH ORDER —
    * a non-portable hash would select different grams per engine. */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
                            k: Int = 4, w: Int = 5): DataFrame = {
    val md5h: Column => Column = s =>
      conv(substring(md5(s), 1, 15), 16, 10).cast("long")
    val ws = words(col(textCol))
    val gh = transform(sequence(lit(0), greatest(size(ws) - k, lit(0))),
      i => md5h(array_join(slice(ws, i + 1, lit(k)), " ")))
    df.select(col(idCol).as("doc_id"), gh.as("gh"))
      .select(col("doc_id"), size(col("gh")).cast("long").as("n_grams"),
        array_sort(array_distinct(transform(
          sequence(lit(0), greatest(size(col("gh")) - w, lit(0))),
          j => array_min(slice(col("gh"), j + 1, lit(w)))))).as("fingerprints"))
      .withColumn("n_fingerprints", size(col("fingerprints")).cast("long"))
      .select(col("doc_id"), col("n_grams"), col("n_fingerprints"),
        col("fingerprints"))
  }

  /** Within-host boilerplate removal (the WET/CCNet cleanup step distinct
    * from [[lineDedupStats]]'s global first-occurrence dedup): a line that
    * appears on ≥ `minDocs` DISTINCT documents of the same host is chrome
    * (nav bars, footers, cookie banners) and is dropped from EVERY document
    * of that host — no first-occurrence survivor, because boilerplate is
    * noise, not content. Returns per doc: line counts and the rebuilt text.
    *
    * Scale shape: lines reduce to 8-byte hashes for the frequency pass;
    * distinct (host, line-hash, doc) then ONE groupBy(host, line-hash) —
    * both combinable, skew-safe (a hot host's lines still spread over the
    * hash dimension). The boilerplate relation (host, lh) is join-keyed and
    * corpus-reduced; per-doc reconstruction collects only that doc's own
    * lines (bounded by doc length). */
  def boilerplateRemoval(df: DataFrame, idCol: String, hostCol: String,
                         textCol: String, wordsPerLine: Int = 4,
                         minDocs: Int = 3): DataFrame = {
    val lines = df.select(col(idCol).as("id"), col(hostCol).as("host"),
        words(col(textCol)).as("ws"))
      .select(col("id"), col("host"), posexplode(transform(
        sequence(lit(0),
          floor((size(col("ws")) + lit(wordsPerLine - 1)) / lit(wordsPerLine))
            .cast("int") - 1),
        i => array_join(slice(col("ws"), i * wordsPerLine + 1, lit(wordsPerLine)), " "))))
      .select(col("id"), col("host"), col("pos").cast("long").as("line_no"),
        col("col").as("line"), xxhash64(col("col")).as("lh"))
      // corpus-sized-output exemption (the Dedup.scala header policy): the
      // reconstructed kept_text is corpus-sized, so checkpoint-and-release
      // would double-write it; the line cache stays pinned for the two
      // readers and is reclaimed by the caller's clearCache between runs.
      // (pin is re-execution-safe below — a second run of the same plan
      // must not WARN-flood or double-cache)
    CacheOnce.pin(lines)
    val boiler = lines.select(col("host"), col("lh"), col("id")).distinct()
      .groupBy(col("host"), col("lh"))
      .agg(count(lit(1)).as("docs"))
      .filter(col("docs") >= minDocs)
      .select(col("host"), col("lh"), lit(true).as("is_boiler"))
    lines.join(boiler, Seq("host", "lh"), "left")
      .withColumn("is_boiler", coalesce(col("is_boiler"), lit(false)))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_boiler_lines"),
        array_join(transform(array_sort(collect_list(
          when(!col("is_boiler"), struct(col("line_no"), col("line"))))),
          s => s.getField("line")), " ").as("kept_text"))
  }

  /** C4-style cross-document line dedup (C4 §2.2 removes any three-sentence
    * span occurring more than once in the corpus; the line is its unit here):
    * every duplicated line keeps only its FIRST occurrence — min (doc,
    * line_no) — and all other occurrences drop. Returns the per-doc census
    * (total lines, kept lines, lines that were corpus-duplicated).
    *
    * Scale shape: ONE groupBy(line) with map-side combine computes each
    * line's occurrence count and arg-min keeper (encoded as a single int64,
    * so the aggregate is skew-proof even for a boilerplate line repeated
    * millions of times — contrast a window over the line partition, which
    * would pile the hot line onto one task); the winners relation rejoins
    * by line (sort-merge at corpus scale, broadcast when small). */
  def lineDedupStats(df: DataFrame, idCol: String, textCol: String,
                     wordsPerLine: Int = 4): DataFrame = {
    // lines reduce to 8-byte hashes immediately: the groupBy and the
    // winners rejoin shuffle fixed-width keys instead of line strings
    // (the counts the operator emits are hash-invariant; at 100 TB the
    // line text never leaves the scan)
    val lines = docLines(df, idCol, textCol, wordsPerLine)
      .select(col("id"), col("line_no"), xxhash64(col("line")).as("lh"))
    // arg-min key packs (id, line_no) into one int64: 2^32 line slots per
    // doc (a 4-billion-line doc exceeds any storable text cell), ids below
    // 2^31 — both bounds hold for any realistic corpus keying scheme
    val key = col("id") * 4294967296L + col("line_no")
    val winners = lines.groupBy(col("lh"))
      .agg(min(key).as("keep_key"), count(lit(1)).as("occ"))
    lines.join(winners, Seq("lh"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(key === col("keep_key"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("occ") > 1, 1L).otherwise(0L)).as("n_in_dup_group"))
  }

  /** Bigram LM training: adjacent-word pair counts + context counts +
    * conditional probability p(w2|w1) = c(w1,w2)/c(w1) — the n-gram step up
    * from [[unigramSurprisal]]'s LM and the building block of KenLM-style
    * scoring. Scale shape: ONE explode pass emits the (w1, w2) stream (no
    * per-doc state), groupBy with map-side combine counts pairs, and the
    * context relation REDUCES off the pair counts (sum per w1) rather than
    * re-scanning the corpus. The pair→context join is vocabulary²-bounded,
    * AQE broadcasts while small. Single long/long division is IEEE-exact
    * cross-engine; no decimal cast needed. */
  def bigramLm(df: DataFrame, textCol: String): DataFrame = {
    val bg = df.select(words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("ws")) - 2),
        i => struct(element_at(col("ws"), i + 1).as("w1"),
          element_at(col("ws"), i + 2).as("w2")))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
    val ctx = bg.groupBy(col("w1")).agg(sum(col("c")).as("c_ctx"))
    bg.join(ctx, Seq("w1"))
      .withColumn("cond_p", round(col("c").cast("double") / col("c_ctx"), 6))
      .select(col("w1"), col("w2"), col("c"), col("c_ctx"), col("cond_p"))
  }

  /** Interpolated Kneser-Ney bigram probabilities (fixed discount
    * d = 0.75) — the smoothing that actually ships in n-gram LMs (KenLM's
    * default family), where [[bigramLm]]'s raw MLE is the training
    * statistic. The signature idea: a word's back-off weight is its
    * CONTINUATION count (how many distinct contexts it follows), not its
    * frequency — "Francisco" is frequent but predicts poorly outside
    * "San _".
    *
    *   P_KN(w2|w1) = max(c(w1,w2) − d, 0)/c(w1)
    *               + d·N₊(w1·)/c(w1) · N₊(·w2)/N₊(··)
    *
    * Scale shape: ONE explode pass emits pairs; every other relation —
    * context totals+fan-out N₊(w1·), continuation counts N₊(·w2), the
    * distinct-bigram total — REDUCES off the pinned pair counts, no
    * corpus re-scan. Joins are vocabulary-bounded, AQE-broadcast while
    * small. Numerics: all inputs are exact int64; d = 0.75 is an exact
    * double; the probability is one fixed IEEE chain over operands both
    * engines hold bit-identically, so it ships unrounded. */
  def kneserNeyBigram(df: DataFrame, textCol: String): DataFrame = {
    val bg = df.select(words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("ws")) - 2),
        i => struct(element_at(col("ws"), i + 1).as("w1"),
          element_at(col("ws"), i + 2).as("w2")))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bg.count() // pin: the pair relation feeds four derived relations
    // context totals + forward fan-out N₊(w1·) in one reduce
    val ctx = bg.groupBy(col("w1"))
      .agg(sum(col("c")).as("c_ctx"), count(lit(1)).as("n_fwd"))
    // continuation counts N₊(·w2)
    val cont = bg.groupBy(col("w2")).agg(count(lit(1)).as("n_bwd"))
    val nTot = bg.agg(count(lit(1)).as("n_bg"))
    val out = bg.join(ctx, Seq("w1")).join(cont, Seq("w2"))
      .crossJoin(broadcast(nTot))
      .withColumn("p_kn",
        greatest(col("c").cast("double") - lit(0.75), lit(0.0)) /
          col("c_ctx").cast("double") +
          (lit(0.75) * col("n_fwd").cast("double") / col("c_ctx").cast("double")) *
            (col("n_bwd").cast("double") / col("n_bg").cast("double")))
      .select(col("w1"), col("w2"), col("c"), col("c_ctx"), col("n_fwd"),
        col("n_bwd"), col("p_kn"))
      // LM-table-sized (the artifact itself) — eager cut, release the pair
      // cache it was derived from (r9 ADVICE)
      .localCheckpoint()
    bg.unpersist()
    out
  }

  /** Collocation mining: pointwise-mutual-information lift for adjacent
    * word pairs — lift(a,b) = c_ab·N / (c_a·c_b), the phrase-detection
    * statistic (word2vec's phrase pass, tokenizer multi-word candidates).
    * Scale shape: ONE explode pass feeds the bigram counts; unigram counts
    * and the token total N both REDUCE off already-aggregated relations
    * (no corpus re-scan); the `minCount` prune lands right after the
    * bigram partial-agg, so the two vocabulary-sized joins and the
    * broadcast-able N row see only surviving candidates. The c_ab·N and
    * c_a·c_b products widen to DECIMAL(38,0) BEFORE multiplying — at full
    * corpus scale (N ~ 1e13 tokens) an int64 product overflows silently —
    * then one correctly-rounded decimal→double conversion per side and ONE
    * division: bit-identical cross-engine at any scale, and exactly the
    * int/int division value wherever products fit 2^53 (all test SFs).
    * PMI = ln(lift) is monotone — ranking by lift IS the PMI ranking,
    * minus the float log. */
  def collocations(df: DataFrame, textCol: String, minCount: Int): DataFrame = {
    val ws = df.select(words(col(textCol)).as("ws"))
    val uni = ws.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val nDf = uni.agg(sum(col("c")).as("n"))
    val bg = ws.filter(size(col("ws")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("ws")) - 2),
        i => struct(element_at(col("ws"), i + 1).as("w1"),
          element_at(col("ws"), i + 2).as("w2")))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    bg.join(uni.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
      .crossJoin(broadcast(nDf))
      .withColumn("lift",
        (col("c_ab").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * col("n").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("double")
          / (col("c_a").cast(org.apache.spark.sql.types.DecimalType(38, 0))
            * col("c_b").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .cast("double"))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"), col("lift"))
  }

  /** One BPE training iteration's pair statistics (Sennrich et al. 2016):
    * count adjacent symbol pairs over the WORD HISTOGRAM (BPE trains on
    * word frequencies, not the token stream — that reduction is the first
    * groupBy and shrinks 100 TB of text to a vocabulary-sized relation
    * before any per-character work happens). The top pair is the next
    * merge; the driver loop applying merges repeatedly is [[bpePairCounts]]
    * per iteration over a progressively merged symbol column. Initial
    * symbol vocabulary = characters (ASCII corpus; a production tokenizer
    * byte-fallbacks first). */
  def bpePairCounts(df: DataFrame, textCol: String): DataFrame = {
    val wf = df.select(explode(words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    val chars = split(col("w"), "")
    wf.filter(length(col("w")) >= 2)
      .select(col("wc"), explode(transform(sequence(lit(0), length(col("w")) - 2),
        i => concat(element_at(chars, i + 1), element_at(chars, i + 2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("n"))
  }

  /** Model-based quality filtering (the fasttext-classifier stage of the
    * GPT-3/CCNet pipelines): INFERENCE of a linear bag-of-hashed-words
    * model — each word hashes into a D-dimensional weight table, the doc
    * scores bias + mean(weight), keep ⇔ score ≥ 0. The weights are a
    * trained artifact and arrive as literals (query parameters, exactly
    * like IVF centroids); the hash is the portable md5-60-bit kernel used
    * everywhere else, so scores are engine-reproducible. Row-local until
    * the per-doc aggregate — ONE scan at any corpus size; per-word weights
    * round to 6 dp before the DECIMAL sum (order-independent).
    *
    * The output stays in EXACT arithmetic: `weight_sum` is the decimal sum
    * (its double cast is deterministic — one correctly-rounded conversion
    * of the same decimal on any engine) and the keep gate compares
    * `sum + bias·n ≥ 0` as decimals — the mean-score formulation
    * (`round(bias + sum/n, 6)`) puts a rounding boundary after a double
    * division, and the sf0.1 oracle run caught exactly one row landing on
    * it (1e-6 drift). Divide-then-round is for humans; gates compare
    * exact. */
  def qualityClassifierScore(df: DataFrame, idCol: String, textCol: String,
                             weights: Seq[Double], bias: Double): DataFrame = {
    val d = weights.size
    val biasDec = lit(BigDecimal(bias).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .cast("decimal(18,6)")
    val tok = df.select(col(idCol).as("id"), explode(words(col(textCol))).as("w"))
    val h = expr("cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint)")
    val wt = round(element_at(typedLit(weights), (h % d).cast("int") + 1), 6)
      .cast("decimal(18,6)")
    tok.select(col("id"), wt.as("wt"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("wt")).as("_s"))
      .select(col("id"), col("n_tokens"),
        col("_s").cast("double").as("weight_sum"),
        (col("_s") + biasDec * col("n_tokens") >= 0).as("keep"))
  }

  /** Full BPE training (Sennrich et al. 2016 Algorithm 1): `nMerges`
    * iterations of count-pairs → pick argmax → merge everywhere. The state
    * is the WORD HISTOGRAM with each word as a symbol array — corpus-reduced
    * before the loop, so every iteration runs over a vocabulary-sized
    * relation regardless of corpus size. The winning pair per iteration is
    * ONE collected row (a query parameter, exactly like
    * [[Vectors.kmeansRefine]]'s centroids); the merge applies via
    * [[mergePairGreedy]] — Sennrich's greedy left-to-right pairwise
    * semantics, expressed positionally so the identical formulation runs
    * in the DuckDB oracle. Ties on count break by pair text, so the merge
    * sequence is total-order deterministic. Returns the merge table
    * (iter, pair, merged, n). */
  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (merges, wf) = bpeTrainState(df, textCol, nMerges)
    wf.unpersist()
    merges.toDF("iter", "pair", "merged", "n")
  }

  /** BPE APPLIED: train `nMerges` merges, segment every word with them, and
    * report per-doc token counts — the train→tokenize round trip, and the
    * number a token-budget planner actually consumes. The merged segmenter
    * is the (word → symbol string) HISTOGRAM relation, so tokenizing the
    * corpus is one word-keyed join (broadcast while the vocabulary is
    * small), not a per-doc reapplication of the merge loop. */
  def bpeTokenCounts(df: DataFrame, idCol: String, textCol: String,
                     nMerges: Int): DataFrame = {
    val (_, wf) = bpeTrainState(df, textCol, nMerges)
    // localCheckpoint materializes the (vocabulary-sized) segmenter eagerly,
    // so the loop's persisted histogram can release immediately instead of
    // leaking for the session lifetime
    val segmenter = wf.select(col("w"), size(col("syms")).as("nt")).localCheckpoint()
    wf.unpersist()
    df.select(col(idCol).as("id"), explode(words(col(textCol))).as("w"))
      .join(segmenter, Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"), sum(col("nt")).cast("long").as("n_bpe_tokens"))
  }

  /** Greedy left-to-right non-overlapping merge of adjacent (p1, p2)
    * symbol pairs — Sennrich's reference semantics: within a homogeneous
    * run, pairs (1,2), (3,4), … merge (NOT the separator-consuming string
    * replace, which skips the (3,4) merge in runs ≥ 4). Sequential
    * greediness is captured positionally: a match at position k MERGES iff
    * its offset inside its run of consecutive matches is even — computed
    * per position from the last non-match below it (match[0] is a false
    * sentinel, so the lookback set is never empty). O(n²) per word, run on
    * the vocabulary-sized histogram, never the corpus. */
  private[graft] def mergePairGreedy(syms: Column, p1: String, p2: String): Column = {
    val n = size(syms)
    def matchAt(k: Column): Column =
      when(k >= 1 && k <= n - 1,
        element_at(syms, k) === lit(p1) &&
          element_at(syms, k + 1) === lit(p2))
        .otherwise(lit(false))
    def mergeAt(k: Column): Column = {
      // last non-match at or below k-1; match[0] is a false sentinel, so
      // the set is non-empty for every k >= 1
      val prevFalse = array_max(filter(sequence(lit(0), greatest(k, lit(0))),
        j => j <= k - 1 && !matchAt(j)))
      matchAt(k) && pmod(k - prevFalse, lit(2)) === 1
    }
    when(n < 2, syms).otherwise(
      flatten(transform(sequence(lit(1), n),
        i => when(mergeAt(i), array(lit(p1 + p2)))
          .when(mergeAt(i - 1), array().cast("array<string>"))
          .otherwise(array(element_at(syms, i))))))
  }

  /** Shared BPE loop state: the merge list and the final (w, syms, wc)
    * histogram — `syms` an array of current symbols (left persisted —
    * callers unpersist). */
  private def bpeTrainState(df: DataFrame, textCol: String, nMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    var wf = df.select(explode(words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .select(col("w"),
        filter(split(col("w"), ""), x => x =!= lit("")).as("syms"),
        col("wc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (it <- 1 to nMerges) {
      val syms = col("syms")
      val top = wf.filter(size(syms) >= 2)
        .select(col("wc"), explode(transform(sequence(lit(0), size(syms) - 2),
          i => concat(element_at(syms, i + 1), lit(" "), element_at(syms, i + 2)))).as("pair"))
        .groupBy(col("pair")).agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("pair")).limit(1).collect()
      if (top.nonEmpty) {
        val pair = top(0).getString(0)
        val Array(p1, p2) = pair.split(" ", 2)
        merges += ((it, pair, p1 + p2, top(0).getLong(1)))
        val old = wf
        wf = wf.select(col("w"), mergePairGreedy(col("syms"), p1, p2).as("syms"),
            col("wc"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        wf.count()
        old.unpersist()
      }
    }
    (merges.toSeq, wf)
  }

  /** Vocabulary coverage cutoffs: the smallest head-vocabulary size whose
    * cumulative token share reaches each threshold (the number every
    * tokenizer/vocab decision starts from, and the principled way to size
    * [[unigramSurprisalTiered]]'s broadcast head).
    *
    * Scale shape: the cumulative sum over the frequency-sorted vocabulary is
    * a DISTRIBUTED two-pass prefix sum, not a global window. At web scale the
    * raw-token vocabulary (typos, numbers, URLs) runs to 10⁸–10⁹ rows, so a
    * single-task `Window.orderBy` sort of it is a real scale-killer (r4
    * verdict). Instead: range-partition on (count desc, word) — globally
    * ordered across partitions — compute per-partition row/token totals (a
    * partition-count-sized census collected to the driver, the same literal
    * pattern as IVF centroids), broadcast the exclusive prefix offsets back,
    * and run the running sum per PARTITION KEY. Every window in the plan is
    * partitioned; `VocabCoverageSpec` asserts no empty-partitionSpec
    * WindowExec survives. */
  def vocabCoverage(df: DataFrame, textCol: String,
                    thresholds: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val lm = df.select(explode(words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val cum = Prefix.withRankAndCumSum(lm,
      Seq(col("c").desc, col("w")), col("c"), nPart)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = cum.agg(sum(col("c"))).head().getLong(0)
    val out = thresholds.map { t =>
      cum.filter(col("cum") * 100 >= lit(n) * t)
        .agg(min(col("rnk")).cast("long").as("vocab_size"),
          min_by(col("cum"), col("rnk")).as("covered_tokens"))
        .select(lit(t).as("threshold_pct"), col("vocab_size"),
          col("covered_tokens"), lit(n).as("total_tokens"))
    }.reduce(_ unionByName _)
      // thresholds-row census — eager cut, release the pin (r9 ADVICE)
      .localCheckpoint()
    cum.unpersist()
    out
  }

  /** Exact percentiles as order statistics over the VALUE HISTOGRAM: the
    * p-th percentile is the smallest value whose cumulative count reaches
    * ⌈n·p/100⌉. The histogram reduces the corpus to its distinct values
    * (doc lengths, quality scores, token counts — always ≪ rows), and the
    * cumulative count is [[Prefix.withRankAndCumSum]]'s distributed prefix
    * sum — no global sort, no single-partition window, and EXACT (integer
    * rank arithmetic), unlike approx_percentile's sketch, whose merge order
    * makes it engine- and run-dependent. The data-card statistic every
    * corpus report starts from. */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     percents: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val hist = df.groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val cum = Prefix.withRankAndCumSum(hist, Seq(col("v")), col("c"), nPart)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = cum.agg(sum(col("c"))).head().getLong(0)
    val out = percents.map { p =>
      val rank = (n * p + 99) / 100 // ⌈n·p/100⌉, exact long arithmetic
      cum.filter(col("cum") >= rank)
        .agg(min(col("v")).as("value"))
        .select(lit(p).as("pct"), col("value"), lit(n).as("n_rows"))
    }.reduce(_ unionByName _)
      // percentile-row census — eager cut, release the pin (r9 ADVICE)
      .localCheckpoint()
    cum.unpersist()
    out
  }

  /** Per-GROUP exact percentiles — [[exactQuantiles]] keyed by a group
    * column (per-language length percentiles, per-source quality bands).
    * Same order-statistics-over-histogram idea, but the cumulative count
    * is a KEYED window over the per-group value histogram: frames are
    * bounded by a group's distinct values (≪ its rows), so no global
    * window and no driver-side total — group totals join back as a
    * relation and the rank threshold ⌈n·p/100⌉ is exact long arithmetic.
    * One histogram pass serves every requested percentile via an
    * exploded percentile list. */
  def groupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                       percents: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val hist = df.groupBy(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.withColumn("cum", sum(col("c")).over(w))
    val totals = hist.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val out = cum.join(totals, Seq("g"))
      .select(col("g"), col("v"), col("cum"), col("n"),
        explode(array(percents.map(lit): _*)).as("pct"))
      .filter(col("cum") >= expr("(n * pct + 99) div 100"))
      .groupBy(col("g"), col("pct"), col("n"))
      .agg(min(col("v")).as("value"))
      .select(col("g").as(groupCol), col("pct"), col("value"),
        col("n").as("n_rows"))
      .orderBy(col(groupCol), col("pct"))
      // (group × pct)-row census — eager cut, release the pin (r9 ADVICE)
      .localCheckpoint()
    hist.unpersist()
    out
  }

  /** TF-IDF top-k keyword extraction per document — the per-doc companion
    * of [[bm25]] (which scores docs for one query; this surfaces each doc's
    * most distinctive terms, the classic tagging/feature step).
    *
    * Scale shape: explode → groupBy(doc, term) with map-side combine for tf;
    * df reduces off that relation; the tf→idf join is vocabulary-sized (AQE
    * broadcasts it while small, shuffle-joins when the vocabulary is a real
    * table). The final top-k window partitions by DOCUMENT — per-doc
    * distinct-term counts are bounded, so no hot key exists regardless of
    * corpus size. idf rounds to 6 dp and multiplies tf as DECIMAL, making
    * scores and therefore the top-k selection engine-exact (term tiebreak). */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    val tok = df.select(col(idCol).as("id"), explode(words(col(textCol))).as("w"))
    val tf = tok.groupBy(col("id"), col("w")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = df.select(col(idCol)).distinct().count().toDouble
    val dfRel = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfRel, Seq("w"))
      .withColumn("score",
        round((col("tf") * round(log(lit(n) / col("df")), 6).cast("decimal(18,6)"))
          .cast("double"), 6))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score").desc, col("w"))
    val out = scored.withColumn("rn", row_number().over(win)).filter(col("rn") <= k)
      .select(col("id"), col("rn").as("rank"), col("w").as("term"),
        col("tf"), col("score"))
      // k rows per doc — eager cut, release the tf cache (r9 ADVICE)
      .localCheckpoint()
    tf.unpersist()
    out
  }

  /** BM25 relevance scoring of a keyword query over the corpus — the
    * retrieval/quality-filter primitive of a training-data pipeline
    * (Robertson-Spärck Jones; the same scoring Lucene/ES defaults to).
    *
    * Scale shape: ONE tokenization pass per doc. Per-term tf comes from the
    * codegen'd multi-set membership kernel ([[graft.functions.StopwordCounts]]
    * with one singleton set per query term), so the corpus collapses to a
    * compact (id, dl, tfs) projection — no explode, no per-(doc,term) HOF
    * filter. Corpus stats (N, avgdl) and per-term df reduce in a single tiny
    * aggregation to driver scalars; idf then rides into the scoring
    * projection as literals, so scoring is a row-local expression with a
    * top-k (TakeOrderedAndProject) on top — zero shuffles beyond the scalar
    * agg. Per-term contributions DECIMAL-cast before the row-local sum so
    * the score is exact regardless of term order (matches the oracle's
    * decimal-sum semantics); a term with tf=0 contributes exactly 0.
    * Scores round to 6 dp (cross-engine double math), doc id tiebreaks.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
    */
  def bm25(df: DataFrame, idCol: String, textCol: String, query: Seq[String],
           topK: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25 requires at least one query term")
    val qTerms = query.map(_.toLowerCase).distinct
    // compact projection: a few ints per doc (at 100 TB this is the written
    // doc-stats table; persist is its single-job equivalent) — the stats agg
    // and the scoring pass both read it instead of re-tokenizing the corpus
    val proj = df.select(col(idCol).as("id"), words(col(textCol)).as("w"))
      .select(col("id"), size(col("w")).as("dl"),
        graft.functions.VectorExprs.stopwordCounts(col("w"),
          qTerms.map(Seq(_))).as("tfs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // N, avgdl, df per term — one aggregation, |query|+2 driver scalars
    val aggs = Seq(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")) ++
      qTerms.indices.map(i =>
        sum(when(col("tfs").getItem(i) > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val st = proj.agg(aggs.head, aggs.tail: _*).head()
    val nDocs = st.getLong(0).toDouble
    val avgdl = st.getDouble(1)
    val idf = qTerms.indices.map { i =>
      val dfi = st.getLong(2 + i).toDouble
      math.log((nDocs - dfi + 0.5) / (dfi + 0.5) + 1.0)
    }
    val contribs = qTerms.indices.map { i =>
      val tf = col("tfs").getItem(i).cast("double")
      (lit(idf(i)) * (tf * lit(k1 + 1)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))))
        .cast("decimal(28,10)")
    }
    val out = proj.filter(qTerms.indices.map(i => col("tfs").getItem(i) > 0).reduce(_ || _))
      .select(col("id"),
        round(contribs.reduce(_ + _).cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
      // topK rows — eager cut, release the doc-stats pin (r9 ADVICE)
      .localCheckpoint()
    proj.unpersist()
    out
  }

  /** Hashed bag-of-words class profiles — the sufficient statistics of a
    * multinomial text classifier (Naive Bayes and Rocchio/nearest-centroid
    * both train FROM exactly these counts): token occurrences `n` and
    * document frequency `df` per (label, feature bucket). Features are the
    * portable md5-60-bit kernel mod `buckets` (the same hash family as
    * [[qualityClassifierScore]]'s inference side), so TRAINING at 100 TB is
    * one explode + groupBy with map-side combine onto an L×B-bounded
    * relation: the model never exceeds n_labels × buckets rows no matter
    * the corpus size, and the hot-bucket aggregation is skew-proof (partial
    * aggregation absorbs any boilerplate token before the shuffle). */
  def classProfiles(df: DataFrame, idCol: String, textCol: String,
                    labelCol: String, buckets: Int): DataFrame = {
    val tok = df.select(col(idCol).as("id"), col(labelCol).as("label"),
      explode(words(col(textCol))).as("w"))
    val b = (expr("cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint)")
      % buckets).cast("int")
    tok.select(col("id"), col("label"), b.as("bucket"))
      .groupBy(col("label"), col("bucket"))
      .agg(count(lit(1)).as("n"), countDistinct(col("id")).as("df"))
  }

  /** Rocchio / nearest-centroid prediction over [[classProfiles]] statistics
    * with an EXACT integer argmax: score(d, l) = Σ_b c_db·n_lb and the
    * winner maximizes score/N_l — compared pairwise by cross-multiplication
    * (s_a·N_b vs s_b·N_a over DECIMAL(38,0), never a float division), ties
    * broken by smaller label. Returns one row per test doc:
    * (id, label_true, label_pred).
    *
    * Scale shape: the L×B profile is broadcast (bounded by construction);
    * test docs reduce to per-bucket counts in one map-side-combined groupBy;
    * the only shuffle is the per-doc argmax self-join keyed on id (L rows
    * per doc, L = label count). Products are ≤ s_max·N_max ≈ 1e16·1e13 at
    * 100 TB — beyond int64, inside DECIMAL(38,0); the oracle compares via
    * HUGEINT. A doc whose buckets miss every profile row scores 0 for all
    * labels and deterministically predicts the smallest label. */
  def rocchioPredict(train: DataFrame, test: DataFrame, idCol: String,
                     textCol: String, labelCol: String,
                     buckets: Int): DataFrame = {
    // prof and docVec are each consumed twice (score join + totals; scores
    // + doc roster), so documents is scanned+exploded 4x where the
    // algorithm needs 2. Pinning both and cutting with a localCheckpoint
    // was tried in r14 and REVERTED: an interleaved same-JVM shape A/B
    // (graft.AbRocchio) measured the pinned form 1.6-1.9x SLOWER steady
    // state (1.59 s vs ~2.96 s at sf0.1/32c) — the persist
    // materialization + checkpoint cut cost more than the two explodes
    // they save, and two full bench laps flagged the pinned form against
    // its own floor (0.834 s -> 2.06/2.1). Recompute wins here.
    val prof = classProfiles(train, idCol, textCol, labelCol, buckets)
      .select(col("label"), col("bucket"), col("n"))
    val totals = prof.groupBy(col("label")).agg(sum(col("n")).as("nl"))
    val b = (expr("cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint)")
      % buckets).cast("int")
    val docVec = test
      .select(col(idCol).as("id"), col(labelCol).as("label_true"),
        explode(words(col(textCol))).as("w"))
      .select(col("id"), col("label_true"), b.as("bucket"))
      .groupBy(col("id"), col("label_true"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val scores = docVec.join(broadcast(prof), Seq("bucket"))
      .groupBy(col("id"), col("label"))
      .agg(sum(col("c") * col("n")).as("s"))
    val docs = docVec.select(col("id"), col("label_true")).distinct()
    val dense = docs.crossJoin(broadcast(totals))
      .join(scores, Seq("id", "label"), "left")
      .select(col("id"), col("label_true"), col("label"), col("nl"),
        coalesce(col("s"), lit(0L)).as("s"))
    val a = dense.select(col("id"), col("label_true"), col("label").as("la"),
      col("s").cast("decimal(38,0)").as("sa"),
      col("nl").cast("decimal(38,0)").as("na"))
    val bb = dense.select(col("id"), col("label").as("lb"),
      col("s").cast("decimal(38,0)").as("sb"),
      col("nl").cast("decimal(38,0)").as("nb"))
    val beaten = (col("sb") * col("na") > col("sa") * col("nb")) ||
      (col("sb") * col("na") === col("sa") * col("nb") &&
        col("lb") < col("la"))
    a.join(bb, Seq("id"))
      .groupBy(col("id"), col("label_true"), col("la"))
      .agg(sum(when(beaten, 1L).otherwise(0L)).as("losses"))
      .filter(col("losses") === 0)
      .select(col("id"), col("label_true"), col("la").as("label_pred"))
  }
  /** CCNet-style corpus pipeline (Wenzek et al. 2020) composed end-to-end:
    * (1) cross-doc LINE dedup, first occurrence wins — the survivor's text
    * is the payload, so this dedup shuffles line content (contrast
    * [[lineDedupStats]], which ships only hash-narrow counts); (2) language
    * ID on the original doc ([[langId]]); (3) unigram-LM surprisal scored
    * over the DEDUPED token stream; (4) per-language perplexity TERCILES
    * (head/middle/tail, CCNet's quality bands) over a BUCKETED score
    * histogram — `floor(mean_surprisal·100)` — so the boundary state is
    * ≤ ~2000 rows per language no matter the corpus (the windows below run
    * on that bounded histogram, never on the doc stream). Returns the
    * (lang, tier) census: docs + surviving tokens.
    *
    * Docs whose every line was claimed by an earlier doc leave the corpus
    * (zero kept lines), exactly like the reference pipeline's empty-doc
    * drop. */
  def ccnetTiers(df: DataFrame, idCol: String, textCol: String,
                 wordsPerLine: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = docLines(df, idCol, textCol, wordsPerLine)
    val key = col("id") * 4294967296L + col("line_no")
    // first-occurrence-wins line dedup in ONE pass (r14, guide §2.4): the
    // old argmin-rejoin (groupBy(line).min(key) then equi-join back on
    // line) shipped the full line-content relation into an exchange AND
    // sort-merged it against the winner set — two walks over the heaviest
    // relation in the pipeline. A min_by window over the same partitioning
    // keeps exactly the min-key row per line with one exchange + one sort:
    // same rows (min key is unique per line — ids and line_nos are), so
    // the graded lineage is unchanged.
    val wFirst = org.apache.spark.sql.expressions.Window
      .partitionBy(col("line")).orderBy(key.asc)
    val kept = lines
      .withColumn("_rn", row_number().over(wFirst))
      .filter(col("_rn") === 1)
      .select(col("id"), col("line"))
    val tok = kept.select(col("id"), explode(split(col("line"), "\\s+")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lm = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val n = lm.agg(sum(col("c"))).head().getLong(0).toDouble
    val scored = lm.select(col("w"),
      round(log(lit(n) / col("c")), 6).cast("decimal(18,6)").as("surp"))
    val ds = tok.join(scored, Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("surp")).as("_ssum"))
      .select(col("id"), col("n_tokens"),
        floor(round(col("_ssum").cast("double") / col("n_tokens"), 6) * 100)
          .cast("long").as("bucket"))
    val langs = df.select(col(idCol).as("id"), langId(col(textCol)).as("lang"))
    val db = ds.join(langs, Seq("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = db.groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("nb"))
    val wcum = Window.partitionBy(col("lang")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cumn", sum(col("nb")).over(wcum))
    val tot = hist.groupBy(col("lang")).agg(sum(col("nb")).as("nl"))
    val bnd = cum.join(tot, Seq("lang"))
      .groupBy(col("lang"))
      .agg(min(when(col("cumn") * 3 >= col("nl"), col("bucket"))).as("b1"),
        min(when(col("cumn") * 3 >= col("nl") * 2, col("bucket"))).as("b2"))
    val out = db.join(broadcast(bnd), Seq("lang"))
      .withColumn("tier", when(col("bucket") <= col("b1"), "head")
        .when(col("bucket") <= col("b2"), "middle").otherwise("tail"))
      .groupBy(col("lang"), col("tier"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      // (lang × tier)-row census — eager cut, release the pins (r9 ADVICE)
      .localCheckpoint()
    tok.unpersist(); db.unpersist()
    out
  }

  /** The pretraining-corpus plan composed end to end — Gopher quality
    * gates → exact fingerprint dedup → language ID → α=0.5 temperature
    * mixing → shard packing — the whole curation funnel as ONE declarative
    * plan, graded per language: docs in, docs surviving quality, docs
    * surviving dedup, surviving tokens, the quantized mixing weight
    * (floor(√tokens·1e9) — √ and × are correctly-rounded IEEE, so the int
    * is bit-stable cross-engine), the allocated token budget
    * (budget·w/Σw in DECIMAL(38,0)/HUGEINT integer division — no float),
    * and ceil-packed shard counts.
    *
    * Scale shape: one scan computes flags + fingerprint + langid
    * (row-local column expressions); dedup is one groupBy(fingerprint)
    * argmin rejoin; the mixing arithmetic runs on the L-row language
    * census. Nothing here grows with the corpus except the two inherent
    * shuffles (dedup key, language census). */
  def pretrainCorpusPlan(df: DataFrame, idCol: String, textCol: String,
                         budgetTokens: Long = 100000L,
                         shardTokens: Int = 4096): DataFrame = {
    val w = words(col(textCol))
    val nWords = size(w).cast("long")
    val sumChars = aggregate(w, lit(0L), (acc, x) => acc + length(x))
    val nSym = size(filter(w, x => x.contains("#") || x.contains("..."))).cast("long")
    val nAlpha = size(filter(w, x => x.rlike("[a-z]"))).cast("long")
    // the language-bearing gates only (word stats + symbol/alpha ratios):
    // the corpus is multilingual, so Gopher's English-stopword rule would
    // zero the funnel (text_gopher_rules keeps it for the per-rule audit);
    // the word floor is 20 — the fixture's docs run 10-99 words
    val keep = !(nWords < 20 || nWords > 100000 ||
      sumChars < nWords * 3 || sumChars > nWords * 10 ||
      nSym * 10 > nWords || nAlpha * 5 < nWords * 4)
    val base = df.select(col(idCol).as("id"), langId(col(textCol)).as("lang"),
        nWords.as("n_words"), keep.as("keep"),
        fingerprint(col(textCol)).as("fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = base.filter(col("keep"))
    val winners = q.groupBy(col("fp")).agg(min(col("id")).as("keep_id"))
    val surv = q.join(winners, Seq("fp")).filter(col("id") === col("keep_id"))
    val perLang = base.groupBy(col("lang"))
      .agg(count(lit(1)).as("docs_in"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("docs_quality"))
    val survLang = surv.groupBy(col("lang"))
      .agg(count(lit(1)).as("docs_final"), sum(col("n_words")).as("tokens"))
    val j = perLang.join(survLang, Seq("lang"), "left")
      .withColumn("docs_final", coalesce(col("docs_final"), lit(0L)))
      .withColumn("tokens", coalesce(col("tokens"), lit(0L)))
      .withColumn("wq", floor(sqrt(col("tokens").cast("double")) * 1e9).cast("long"))
    val tot = j.agg(sum(col("wq")).as("wq_total"))
    val out = j.crossJoin(tot)
      .withColumn("alloc_tokens", when(col("wq_total") === 0, lit(0L))
        .otherwise(expr(
          s"(CAST($budgetTokens AS DECIMAL(38,0)) * CAST(wq AS DECIMAL(38,0))) div wq_total")))
      .withColumn("n_shards", expr(s"(alloc_tokens + ${shardTokens - 1}) div $shardTokens"))
      .select(col("lang"), col("docs_in"), col("docs_quality"),
        col("docs_final"), col("tokens"), col("wq"), col("alloc_tokens"),
        col("n_shards"))
      // per-lang plan rows — eager cut, release the pin (r9 ADVICE)
      .localCheckpoint()
    base.unpersist()
    out
  }

  /** WordPiece-style greedy longest-match-first segmentation (the BERT
    * tokenizer's inference rule — Wu et al. 2016 §4.1; also fastText's
    * subword lookup shape). The vocabulary is DATA-DERIVED in-query so
    * both engines replay it: every length-1 substring observed (coverage
    * guarantee — greedy always advances) plus the `topK` most frequent
    * substrings of length 2..`maxPieceLen`, frequency = Σ word-count over
    * every occurrence position, ties by piece. Segmentation then folds
    * each DISTINCT word (BPE's word-histogram reduction: per-character
    * work happens on a vocabulary-sized relation, never the token stream):
    * at each position take the longest vocab piece that matches, advance,
    * accumulate piece count + frequency score.
    *
    * Scale shape: one explode of ≤ `maxPieceLen` candidate substrings per
    * (word, position) equi-joined against the BROADCAST vocab (topK +
    * alphabet rows), then a row-local fold — vocabulary-sized shuffle,
    * two jobs total, no iteration. Returns one row per distinct word:
    * (word, wc, n_pieces, score_sum). */
  def wordpieceSegment(df: DataFrame, textCol: String, topK: Int = 64,
                       maxPieceLen: Int = 4, maxWordLen: Int = 16): DataFrame = {
    val (wf, vocab) = subwordVocab(df, textCol, topK, maxPieceLen, maxWordLen)
    // The greedy cursor is a function of the word alone (given the vocab),
    // so the former 16-superstep loop collapses into (1) ONE jump table —
    // the longest match (jump length, score) at EVERY position, one explode
    // + one broadcast-hash join + one partial-aggregable max — and (2) a
    // row-local fold that walks the cursor over the packed jump arrays
    // (O(1) element_at per step, no joins, no checkpoints). Same semantics:
    // the per-position argmax here is exactly the old per-round argmax, the
    // fold just replays them in cursor order. 16 scheduled rounds → 2 jobs;
    // 3.2 s → sub-second at sf0.1.
    val jumps = wf
      .select(col("w"), col("wc"),
        explode(sequence(lit(1), length(col("w")))).as("p"))
      .select(col("w"), col("wc"), col("p"),
        explode(transform(sequence(lit(1), lit(maxPieceLen)),
          l => struct(l.as("l"),
            col("w").substr(col("p"), l).as("piece")))).as("cand"))
      .join(broadcast(vocab),
        col("cand.piece") === vocab("piece") && col("cand.l") === vocab("l"))
      // longest match wins; l pins the piece uniquely, so max(struct) is
      // a plain partial-aggregable max — no window sort
      .groupBy(col("w"), col("wc"), col("p"))
      .agg(max(struct(col("cand.l").as("l"), col("c").as("c"))).as("m"))
    // pack per word: jl[p] = jump length at p, jc[p] = its score (positions
    // are dense 1..len — length-1 coverage guarantees a match everywhere)
    val packed = jumps.groupBy(col("w"), col("wc"))
      .agg(sort_array(collect_list(struct(col("p"),
        col("m.l").as("l"), col("m.c").as("c")))).as("js"))
      .withColumn("jl", transform(col("js"), j => j.getField("l")))
      .withColumn("jc", transform(col("js"), j => j.getField("c")))
    val out = packed
      .withColumn("st", aggregate(sequence(lit(1), lit(maxWordLen)),
        struct(lit(1).as("pos"), lit(0L).as("np"), lit(0L).as("sc")),
        (acc, _) => {
          val pos = acc.getField("pos")
          when(pos > length(col("w")), acc).otherwise(
            struct((pos + element_at(col("jl"), pos)).as("pos"),
              (acc.getField("np") + 1L).as("np"),
              (acc.getField("sc") + element_at(col("jc"), pos)).as("sc")))
        }))
      .select(col("w").as("word"), col("wc"),
        col("st.np").as("n_pieces"), col("st.sc").as("score_sum"))
      // distinct-word-sized; eager cut so the shared vocab frames can be
      // released before return (the stressCentrality unpersist discipline)
      .localCheckpoint()
    wf.unpersist(); vocab.unpersist()
    out
  }

  /** Shared subword-vocabulary derivation for [[wordpieceSegment]] and
    * [[viterbiSegment]]: the capped distinct-word histogram plus every
    * observed length-1 substring (coverage guarantee) and the topK most
    * frequent substrings of length 2..maxPieceLen (frequency = Σ
    * word-count over occurrence positions, ties by piece). Both frames
    * persisted and pinned — the segmentation loops join them every round. */
  private def subwordVocab(df: DataFrame, textCol: String, topK: Int,
                           maxPieceLen: Int,
                           maxWordLen: Int): (DataFrame, DataFrame) = {
    val wf = df.select(explode(words(col(textCol))).as("w"))
      .filter(length(col("w")).between(1, maxWordLen))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    wf.count() // pin: vocab derivation + segmentation loop share it
    // all substrings of length 1..maxPieceLen, weighted by word count
    def pieces(l: Int) = wf.filter(length(col("w")) >= l)
      .select(col("wc"), explode(transform(
        sequence(lit(1), length(col("w")) - (l - 1)),
        i => col("w").substr(i, lit(l)))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wc")).as("c"))
      .select(col("piece"), col("c"), lit(l).as("l"))
    val vocab = pieces(1).unionAll(
      (2 to maxPieceLen).map(pieces).reduce(_ unionAll _)
        .orderBy(col("c").desc, col("piece")).limit(topK))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    vocab.count() // pin: joined every round
    (wf, vocab)
  }

  /** OPTIMAL subword segmentation — the DP objective WordPiece's greedy
    * rule approximates (SentencePiece's Viterbi decode shape, Kudo 2018):
    * per distinct word, maximize total piece frequency, ties to FEWEST
    * pieces. The lexicographic (score, −n_pieces) objective has optimal
    * substructure, and — like [[wordpieceSegment]]'s greedy cursor — the
    * whole DP is a function of the word alone given the vocab. So instead
    * of maxWordLen scheduled frontier rounds, build ONE match table (every
    * (position, length) whose substring is in vocab: one explode + one
    * broadcast-hash join), pack it per word as a (p-1)*maxPieceLen+l → c
    * map, and run the Viterbi relaxation as a row-local fold: dp slot j
    * holds the best (score, −np) reaching endpos j−1, each position p
    * relaxes dp[p+l] from dp[p] for the ≤maxPieceLen match lengths.
    * 16 scheduled rounds → 2 jobs. Integer-only surface; one row per
    * distinct word: (word, wc, best_score, n_pieces_opt). */
  def viterbiSegment(df: DataFrame, textCol: String, topK: Int = 64,
                     maxPieceLen: Int = 4, maxWordLen: Int = 16): DataFrame = {
    val (wf, vocab) = subwordVocab(df, textCol, topK, maxPieceLen, maxWordLen)
    val matches = wf
      .select(col("w"), col("wc"),
        explode(sequence(lit(1), length(col("w")))).as("p"))
      .select(col("w"), col("wc"), col("p"),
        explode(transform(sequence(lit(1), lit(maxPieceLen)),
          l => struct(l.as("l"),
            col("w").substr(col("p"), l).as("piece")))).as("cand"))
      .join(broadcast(vocab),
        col("cand.piece") === vocab("piece") && col("cand.l") === vocab("l"))
      .select(col("w"), col("wc"),
        ((col("p") - 1) * maxPieceLen + col("cand.l")).as("k"), col("c"))
    // (w, p, l) is unique after the join — (piece, l) is unique in vocab —
    // so the packed map has unique keys; element_at returns null (= no
    // piece of that length here) for absent keys, no sentinel array needed
    val packed = matches.groupBy(col("w"), col("wc"))
      .agg(map_from_entries(collect_list(struct(col("k"), col("c")))).as("cm"))
    val sentinel = struct(lit(-1L).as("sc"), lit(0L).as("nn"))
    val out = packed
      .withColumn("dp", aggregate(sequence(lit(1), lit(maxWordLen)),
        transform(sequence(lit(1), lit(maxWordLen + 1)),
          j => when(j === 1, struct(lit(0L).as("sc"), lit(0L).as("nn")))
            .otherwise(sentinel)),
        (acc, p) => when(p > length(col("w")), acc).otherwise(
          transform(sequence(lit(1), lit(maxWordLen + 1)), j => {
            val base = element_at(acc, p)
            val c = element_at(col("cm"),
              ((p - lit(1)) * maxPieceLen + (j - p)).cast("int"))
            when((j - p).between(1, maxPieceLen)
                && base.getField("sc") >= 0 && c.isNotNull,
              greatest(element_at(acc, j),
                struct((base.getField("sc") + c).as("sc"),
                  (base.getField("nn") - 1L).as("nn"))))
            .otherwise(element_at(acc, j))
          }))))
      .select(col("w").as("word"), col("wc"),
        element_at(col("dp"), length(col("w")) + 1).as("m"))
      .select(col("word"), col("wc"), col("m.sc").as("best_score"),
        (-col("m.nn")).as("n_pieces_opt"))
      // distinct-word-sized; eager cut so the shared vocab frames can be
      // released before return (the stressCentrality unpersist discipline)
      .localCheckpoint()
    wf.unpersist(); vocab.unpersist()
    out
  }
}
