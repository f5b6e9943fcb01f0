package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** D11 multipart-upload lifecycle as keyed streaming state (SURVEY §2.12,
  * reference src/storage/uploader.ts:189-301 + pg.ts:1455-1613): parts for an
  * upload accumulate (possibly out of order, across micro-batches); a
  * `complete` command validates contiguity and emits the assembled upload
  * (size = Σ parts, S3-style multipart etag `md5(concat(part etags))-N`);
  * `abort` drops the state. Stale uploads are evicted by processing-time
  * timeout — the reference gets the same effect from its 24 h multipart
  * expiry job.
  *
  * Byte assembly itself is out of analytic scope (it happens in the blob
  * store); this is the metadata state machine that gates it.
  */
object MultipartAssembly {

  /** kind ∈ part | complete | abort; part events carry (part_number, size,
    * etag). */
  final case class PartEvent(upload_id: String, kind: String,
                             part_number: Int, size: Long, etag: String)
  final case class UploadState(parts: Map[Int, (Long, String)])
  final case class UploadResult(upload_id: String, status: String,
                                n_parts: Int, total_size: Long, etag: String)

  /** `staleAfter = Some(d)` arms processing-time eviction (the production
    * setting; note it makes the engine run no-data batches to evaluate
    * timeouts — pair it with a real trigger interval, not Trigger(0)).
    * `None` disables eviction. */
  def assemble(events: Dataset[PartEvent],
               staleAfter: Option[String] = Some("24 hours")): Dataset[UploadResult] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (staleAfter.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.upload_id)
      .flatMapGroupsWithState[UploadState, UploadResult](
        OutputMode.Append, timeoutConf) {
        (id: String, rows: Iterator[PartEvent], state: GroupState[UploadState]) =>
          if (state.hasTimedOut) {
            // reference: expired uploads are aborted by the cleanup worker
            val n = state.getOption.map(_.parts.size).getOrElse(0)
            state.remove()
            Iterator(UploadResult(id, "expired", n, 0L, ""))
          } else {
            val out = Vector.newBuilder[UploadResult]
            rows.toSeq.sortBy(e => (e.kind != "part", e.part_number)).foreach { ev =>
              val parts = state.getOption.map(_.parts).getOrElse(Map.empty)
              ev.kind match {
                case "part" =>
                  // last write per part_number wins (reference upserts parts)
                  state.update(UploadState(parts + (ev.part_number -> (ev.size, ev.etag))))
                  staleAfter.foreach(state.setTimeoutDuration)
                case "abort" =>
                  if (state.exists) state.remove()
                  out += UploadResult(id, "aborted", parts.size, 0L, "")
                case "complete" =>
                  val nums = parts.keys.toSeq.sorted
                  val contiguous = nums.nonEmpty && nums == (1 to nums.max)
                  if (!contiguous) {
                    // InvalidPartOrder / InvalidPart (s3-handler.ts complete)
                    out += UploadResult(id, "invalid-parts", parts.size, 0L, "")
                  } else {
                    val totalSize = nums.map(parts(_)._1).sum
                    val etag = org.apache.commons.codec.digest.DigestUtils
                      .md5Hex(nums.map(parts(_)._2).mkString) + "-" + nums.size
                    if (state.exists) state.remove()
                    out += UploadResult(id, "completed", nums.size, totalSize, etag)
                  }
              }
            }
            out.result().iterator
          }
      }
  }
}
