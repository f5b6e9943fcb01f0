package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The north-star text pipeline at the stream boundary: continuous corpus
  * ingest with exact dedup and the quality gate applied before documents
  * ever land in the corpus — the streaming twin of `dedup_exact` +
  * `text_c4_filters`.
  *
  * Scale shape: the quality gate and content hash are row-local (no state);
  * the only stateful operator is the dedup, whose state is bounded by the
  * watermark — exactly the event-pipeline pattern ([[EventStream]]), applied
  * to documents. A duplicate arriving after its original's watermark horizon
  * re-enters (at-least-once ingest); the downstream batch dedup
  * ([[graft.operators.Dedup.exactDedup]]) remains the periodic ground-truth
  * pass, which is how production corpus pipelines layer the two.
  */
object CorpusIngest {

  /** Streaming ingest over (doc_id, event_time, text): drop rule-failing
    * docs (C4/Gopher gate), then suppress content-hash duplicates within the
    * watermark window. Gate BEFORE dedup: rejected docs must not occupy
    * dedup state. */
  def ingest(docs: DataFrame, eventTimeCol: String = "event_time",
             textCol: String = "text",
             watermarkDelay: String = "10 minutes"): DataFrame =
    docs
      .filter(TextAnalysis.c4Keep(col(textCol)))
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
      .drop("content_hash")

  /** [[ingest]] plus the two model/benchmark gates the batch pipeline has
    * (`text_quality_classifier`, `text_contamination`), applied at the
    * stream boundary:
    *   - classifier gate: row-local linear scoring
    *     ([[TextAnalysis.qualityClassifierScore]]'s expression, inlined so
    *     the stream stays stateless here) — keep ⇔ bias + mean weight ≥ 0;
    *   - decontamination gate: a stream-STATIC join against the benchmark's
    *     distinct n-gram hashes (broadcast — benchmarks are tiny), dropping
    *     any doc sharing a 13-gram with the eval set BEFORE it can land.
    * Order: cheap row-local gates first, then the contamination semi-join,
    * then the stateful dedup last — rejected docs never occupy state. */
  def ingestGated(docs: DataFrame, benchmarkGrams: DataFrame,
                  weights: Seq[Double], bias: Double,
                  eventTimeCol: String = "event_time",
                  textCol: String = "text",
                  watermarkDelay: String = "10 minutes",
                  contaminationN: Int = 13): DataFrame = {
    val d = weights.size
    // per-word hashed weight, same portable md5-60-bit kernel as the batch
    // classifier — built from Column functions so it composes inside HOF
    // lambdas (expr() strings cannot see lambda variables)
    val wt: org.apache.spark.sql.Column => org.apache.spark.sql.Column = w =>
      round(element_at(typedLit(weights),
        (conv(substring(md5(w), 1, 15), 16, 10).cast("long") % d).cast("int") + 1), 6)
    val ws = graft.operators.Dedup.words(col(textCol))
    // row-local fold over the words array — stateless in-stream; the keep
    // gate compares sum + bias·n >= 0 in exact decimals (same contract as
    // the batch classifier: no divide-then-round boundary)
    // wt(w) is a double; cast it to decimal BEFORE adding, or Spark
    // promotes the whole step to double arithmetic and the gate loses the
    // exactness contract it shares with the batch classifier
    val wsum = aggregate(ws, lit(0.0).cast("decimal(18,6)"),
      (acc, w) => (acc + wt(w).cast("decimal(18,6)")).cast("decimal(18,6)"))
    val biasDec = lit(BigDecimal(bias).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .cast("decimal(18,6)")
    docs
      .filter(TextAnalysis.c4Keep(col(textCol)))
      .filter(wsum + biasDec * size(ws) >= 0)
      .withColumn("_grams", graft.functions.VectorExprs.shingleHashes(
        graft.operators.Dedup.words(col(textCol)), contaminationN))
      .join(broadcast(benchmarkGrams.select(col("s")).distinct()
        .agg(collect_set(col("s")).as("_bench"))))
      .filter(!arrays_overlap(col("_grams"), col("_bench")))
      .drop("_grams", "_bench")
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
      .drop("content_hash")
  }
}
