package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S3 wire-shape response projection (SURVEY §3.2, reference
  * src/storage/protocols/s3/s3-handler.ts:204-276): reshape a listing result
  * into ListBucketResult rows — CommonPrefixes vs Contents with ETag/Size
  * pulled from metadata. One `select`; the XML serialization is presentation,
  * not engine work.
  */
object S3Response {

  /** `EncodingType=url` key encoding (s3-handler.ts:335,367, object.ts:687):
    * JS `encodeURIComponent` semantics as a Column — Spark's `url_encode`
    * (form encoding) fixed up to encodeURIComponent's unreserved set
    * (space → %20, and `! ' ( ) * ~` stay literal). */
  def uriEncode(c: Column): Column =
    Seq("\\+" -> "%20", "%21" -> "!", "%27" -> "'", "%28" -> "(",
      "%29" -> ")", "%2A" -> "*", "%7E" -> "~")
      .foldLeft(url_encode(c)) { case (acc, (from, to)) =>
        regexp_replace(acc, from, to)
      }

  /** Listing rows (name, is_folder, size, created_at) → ListBucketResult
    * shape. Folder rows become CommonPrefixes entries; leaves become
    * Contents with Key/LastModified/Size/ETag. `encodingType = Some("url")`
    * applies S3 EncodingType=url to keys and prefixes. */
  def listBucketResult(listing: DataFrame, etag: Option[String] = None,
                       encodingType: Option[String] = None): DataFrame = {
    val keyCol: Column => Column =
      if (encodingType.contains("url")) uriEncode else identity
    listing.select(
      when(col("is_folder"), keyCol(col("name"))).as("common_prefix"),
      when(!col("is_folder"), keyCol(col("name"))).as("key"),
      when(!col("is_folder"), col("created_at")).as("last_modified"),
      when(!col("is_folder"), col("size")).as("content_length"),
      when(!col("is_folder"), md5(col("name"))).as("etag"))
  }

  /** ListMultipartUploads shape (s3-handler.ts:290-293): uploads keyed by
    * (key, upload_id), capped at 1000. */
  def listUploadsResult(uploads: DataFrame, maxUploads: Int = 1000): DataFrame =
    uploads.select(col("key"), col("upload_id"), col("created_at").as("initiated"))
      .orderBy(col("key"), col("upload_id"))
      .limit(math.min(maxUploads, 1000))
}
