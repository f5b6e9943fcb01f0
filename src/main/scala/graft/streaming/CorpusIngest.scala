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
}
