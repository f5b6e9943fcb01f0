package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2: the blob-store listing as a DataFrame (SURVEY §2.1, reference
  * backend/adapter.ts:60-71 `listObjectsV2` + scanner.ts:260-287).
  *
  * The reference pages ListObjectsV2 1000 keys at a time into a scratch
  * table; here the listing IS a relation: the `binaryFile` source enumerates
  * the tree in parallel and prunes the `content` column whenever the query
  * only touches metadata (verified in SourcesSpec via ReadSchema), so a
  * manifest scan never reads object bytes. Hadoop FS treats s3a:// exactly
  * like file:// — at 100 TB this is the distributed manifest feeding the
  * orphan anti-joins (J2/J3), with `pathGlobFilter` as the prefix pushdown.
  */
object FileListing {

  /** List a storage tree as (key, size, modified) — keys relative to root. */
  def listFiles(spark: SparkSession, root: String, glob: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
    val withGlob = glob.fold(reader)(g => reader.option("pathGlobFilter", g))
    val rootUri = "file:" + root.stripSuffix("/") + "/"
    withGlob.load(root)
      .select(
        regexp_replace(col("path"), lit(rootUri), lit("")).as("key"),
        col("length").as("size"),
        col("modificationTime").as("modified"))
  }
}
