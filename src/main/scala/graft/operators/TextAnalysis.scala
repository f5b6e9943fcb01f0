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

  /** BM25 relevance scoring of a keyword query over the corpus — the
    * retrieval/quality-filter primitive of a training-data pipeline
    * (Robertson-Spärck Jones; the same scoring Lucene/ES defaults to).
    *
    * Scale shape: per-doc term frequencies are restricted to the QUERY terms
    * before anything shuffles (an array_intersect-style membership filter on
    * the exploded tokens), so the tf relation is |docs-containing-a-term|
    * rows, not corpus-token rows; df/avgdl reduce to a handful of scalars
    * that ride into the scoring projection as a broadcast (literal) join.
    * Scores round to 6 dp (cross-engine double math), doc id tiebreaks.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
    */
  def bm25(df: DataFrame, idCol: String, textCol: String, query: Seq[String],
           topK: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = df.sparkSession
    val qTerms = query.map(_.toLowerCase).distinct
    val docs = df.select(col(idCol).as("id"), words(col(textCol)).as("w"))
      .withColumn("dl", size(col("w")))
    // corpus stats: one tiny agg (2 scalars), read driver-side like any
    // query parameter
    val stats = docs.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")).head()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getDouble(1)
    // (doc, query-term) tf — tokens filtered to query terms BEFORE exploding
    val tf = docs.select(col("id"), col("dl"),
        explode(array_intersect(col("w"), typedLit(qTerms))).as("t"),
        col("w"))
      .withColumn("tf", size(filter(col("w"), x => x === col("t"))))
      .drop("w")
    // df per query term (≤ |query| rows) → idf, joined back broadcast
    val dfPerTerm = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      .withColumn("idf",
        log((lit(nDocs.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
    tf.join(broadcast(dfPerTerm), Seq("t"))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy(col("id"))
      // DECIMAL-cast before summing: per-term contribs are deterministic
      // scalars, but double += is order-dependent across partitions
      .agg(round(sum(col("contrib").cast("decimal(28,10)")).cast("double"), 6)
        .as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(topK)
  }
}
