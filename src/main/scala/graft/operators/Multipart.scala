package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multipart-upload metadata operators (SURVEY §2.4 A6, §2.6 O8, reference
  * src/storage/database/pg.ts:1455-1613). */
object Multipart {

  /** A6: `in_progress_size` accumulation — the reference increments a counter
    * per part insert (pg.ts:1526-1544); batch form is a grouped sum. */
  def uploadProgress(parts: DataFrame): DataFrame =
    parts.groupBy(col("upload_id"))
      .agg(sum(col("size")).as("in_progress_size"),
        count(lit(1)).as("num_parts"),
        max(col("part_number")).as("max_part"))

  /** O8: ListParts pagination — `part_number > $after ORDER BY part_number
    * LIMIT maxParts` (pg.ts:1581-1613). */
  def listParts(parts: DataFrame, uploadId: String, partNumberAfter: Int,
                maxParts: Int = 1000): DataFrame =
    parts.filter(col("upload_id") === uploadId &&
        col("part_number") > partNumberAfter)
      .orderBy(col("part_number"))
      .limit(math.min(maxParts, 1000))
}
