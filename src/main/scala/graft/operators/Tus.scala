package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D12 TUS resumable uploads in deterministic batch form (reference
  * src/storage/protocols/tus/ — file-store.ts PATCH append path,
  * upload-id.ts:1-60 id codec, postgres-locker.ts per-key lock).
  *
  * The TUS protocol is an offset-tracked append log: each PATCH declares the
  * `Upload-Offset` it believes the server is at; the server accepts the body
  * only when the declared offset equals the committed offset, else 409
  * Conflict — and after a 409 every later append from the same (now
  * out-of-sync) client stream also mismatches, because committed bytes stop
  * advancing while the client's declared offsets keep counting its own sent
  * bytes. An upload completes when the committed offset reaches the declared
  * `Upload-Length`.
  *
  * Batch form: replay the full append log per upload and derive each
  * upload's terminal state. The sequential acceptance rule collapses to a
  * closed form — an append is accepted iff no earlier append of the same
  * upload mismatched — so the whole replay is two windows per upload key
  * (no iteration), shuffling once on `upload_id`.
  */
object Tus {

  /** Replay an append log. `appends` must carry `upload_id`, `seq` (client
    * stream order), `declared_offset`, `size` (body bytes), and
    * `upload_length` (the total the client declared at creation).
    *
    * Adds per-append `expected_offset` (prefix sum of accepted sizes — equals
    * the true prefix sum until the first fault), `accepted`, and returns the
    * per-upload terminal state:
    * `committed_offset`, `n_appends`, `n_accepted`, `n_rejected`, and
    * `status` ∈ {complete, active, conflict}:
    *   - conflict: some append 409'd (offset mismatch)
    *   - complete: all bytes in (committed == upload_length)
    *   - active:   clean so far but bytes still missing (resumable — the
    *               whole point of TUS)
    */
  def replay(appends: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("upload_id")).orderBy(col("seq"))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val perAppend = appends
      // offset the server is at before this append, assuming all prior
      // appends were accepted (the client's own bookkeeping)
      .withColumn("clean_prefix", coalesce(sum(col("size")).over(prior), lit(0L)))
      .withColumn("faulted", col("declared_offset") =!= col("clean_prefix"))
      // first 409 poisons the rest of the stream: committed stops advancing,
      // declared keeps counting sent bytes, so nothing later can match
      .withColumn("first_fault_seq",
        min(when(col("faulted"), col("seq"))).over(Window.partitionBy(col("upload_id"))))
      .withColumn("accepted",
        col("first_fault_seq").isNull || col("seq") < col("first_fault_seq"))
    perAppend
      .groupBy(col("upload_id"), col("upload_length"))
      .agg(
        sum(when(col("accepted"), col("size")).otherwise(lit(0L))).as("committed_offset"),
        count(lit(1)).as("n_appends"),
        sum(when(col("accepted"), 1L).otherwise(0L)).as("n_accepted"),
        sum(when(!col("accepted"), 1L).otherwise(0L)).as("n_rejected"))
      .withColumn("status",
        when(col("n_rejected") > 0, lit("conflict"))
          .when(col("committed_offset") === col("upload_length"), lit("complete"))
          .otherwise(lit("active")))
  }

  /** The TUS upload-id codec (upload-id.ts:46-49): ids are
    * `tenant/bucket/objectName/version` with a `/`-separated version tail.
    * Round-trips through [[decodeUploadId]]. */
  def encodeUploadId(tenant: String, bucket: String, objectName: String,
                     version: String): String = {
    require(tenant.nonEmpty && version.nonEmpty, "tenant and version required")
    s"$tenant/$bucket/$objectName/$version"
  }

  /** Inverse of [[encodeUploadId]] (upload-id.ts:52-60: first two segments
    * are tenant and bucket, LAST segment is the version, the middle — which
    * may itself contain `/` — is the object key). */
  def decodeUploadId(id: String): (String, String, String, String) = {
    val parts = id.split("/", -1)
    require(parts.length >= 4, s"invalid upload id: $id")
    (parts(0), parts(1), parts.slice(2, parts.length - 1).mkString("/"), parts.last)
  }
}
