package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Orphan scanner — the reference's batch reconciliation between the blob
  * store listing and the metadata relation (src/storage/scanner/scanner.ts).
  *
  * The reference pages both sides 1000 keys at a time through a scratch table
  * (pg.ts:1615-1760) because Postgres can't join 100 M keys in one go. Spark
  * can: each direction is ONE distributed anti-join. At 100 TB both sides are
  * large → Catalyst picks a shuffled sort-merge join on the key, which is the
  * right plan; AQE converts to broadcast automatically when one side turns
  * out small. No driver-side paging loop, no scratch table.
  */
object Scanner {

  /** (S3 ∖ DB): keys present in the blob-store listing with no matching
    * metadata row → orphaned blobs (scanner.ts:323-363, J2). */
  def orphanedS3Keys(s3Listing: DataFrame, objects: DataFrame): DataFrame =
    s3Listing.join(objects.select(col("name")),
      s3Listing("key") === col("name"), "left_anti")

  /** (DB ∖ S3): metadata rows whose blob is gone (scanner.ts:365-403, J3). */
  def orphanedDbRows(objects: DataFrame, s3Listing: DataFrame): DataFrame =
    objects.join(s3Listing.select(col("key")),
      col("name") === col("key"), "left_anti")

  /** E6 backup-object worker feed (events/objects/backup-object.ts:34-77):
    * every orphaned blob becomes one `backup-object` job — the key copies to
    * the `__internal/` prefix and the original is optionally deleted; the
    * singleton key dedups retries per (tenant, key) exactly as pg-boss does.
    * A pure projection over the J2 anti-join — the whole reconciliation
    * (list ∖ metadata → backup queue) stays one distributed job. */
  def backupJobs(orphans: DataFrame, tenantRef: String,
                 deleteOriginal: Boolean = true): DataFrame =
    orphans.select(
      concat_ws("/", lit(tenantRef), col("key")).as("singleton_key"),
      col("key").as("source_key"),
      concat(lit("__internal/"), col("key")).as("destination_key"),
      col("size"),
      lit(deleteOriginal).as("delete_original"))

  /** Batch multi-key lookup (J5, pg.ts:1203-1228 `name = ANY($2)`): semi-join
    * against a (small, broadcast) key set. */
  def findObjects(objects: DataFrame, keys: DataFrame): DataFrame =
    objects.join(broadcast(keys), objects("name") === keys("key"), "left_semi")

  /** Composite-key lookup (J6, pg.ts:1229-1253 `(name, version) IN (...)`). */
  def findObjectVersions(objects: DataFrame, keyVersions: DataFrame): DataFrame =
    objects.join(broadcast(keyVersions),
      objects("name") === keyVersions("key") &&
        objects("version") === keyVersions("v"), "left_semi")
}
