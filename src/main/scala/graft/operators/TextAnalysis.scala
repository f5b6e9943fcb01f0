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
    val stops = size(filter(w, x => x.isin(stopwordsEn: _*)))
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
    * argmax: languages compared in fixed order, strictly-greater wins. */
  def langId(text: Column): Column = {
    val w = words(text)
    val scores = langStopwords.map { case (lang, stops) =>
      lang -> size(filter(w, x => x.isin(stops: _*)))
    }
    val best = scores.foldLeft((lit("und"), lit(0))) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }
    best._1
  }

  /** Document fingerprint: hash of the sorted distinct word set — a
    * word-order-insensitive rolling-hash analog, stable across engines. */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(words(text))), " "))
}
