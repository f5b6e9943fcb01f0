package graft.operators

import graft.functions.PathFns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchical listing / search over the `objects` relation — the engine's
  * core operator family (SURVEY §3.1, reference
  * src/storage/object.ts:619-721 + migrations/tenant/0050-search-v2-optimised.sql).
  *
  * Spark-first shape: one declarative pipeline
  * `filter(prefix, cursor) → commonPrefix → folders ∪ files → orderBy → limit(k+1)`.
  * The reference's hybrid skip-scan (O(k·log n) index seeks) exists because
  * Postgres reads heap pages; a columnar scan + groupBy is the Spark idiom —
  * predicate pushdown prunes row groups on `bucket_id`/`name` min-max stats,
  * and TakeOrderedAndProject makes the final top-k a distributed heap, so no
  * global sort materializes at 100 TB.
  */
object Listing {

  /** Result schema shared by all listing variants: folder rows carry NULL
    * size/timestamps (reference 0027:29-36, object.ts:663-667). */
  private def folderRows(withCp: DataFrame): DataFrame =
    withCp.filter(col("cp").isNotNull)
      .groupBy(col("cp").as("name"))
      .agg(count(lit(1)).as("_n")) // groupBy (not distinct) keeps one shuffle
      .select(col("name"), lit(true).as("is_folder"),
        lit(null).cast("long").as("size"),
        lit(null).cast("timestamp").as("created_at"))

  private def fileRows(withCp: DataFrame): DataFrame =
    withCp.filter(col("cp").isNull)
      .select(col("name"), lit(false).as("is_folder"), col("size"), col("created_at"))

  /** ListObjectsV2 (S3 semantics, reference s3-handler.ts:204-276 +
    * storage.search_v2 0050:598-672): delimiter collapse into common
    * prefixes, byte-ordered keyset pagination via `startAfter`, page cap.
    *
    * Scale notes: `limit` caps at 1000 (s3-handler.ts:219) so the result is
    * tiny; everything before the limit is a single scan + one partial-agg
    * shuffle over only the keys under `prefix` (pushed-down filters).
    */
  def listObjectsV2(objects: DataFrame, bucket: String, prefix: String,
                    delimiter: Option[String] = Some("/"),
                    startAfter: Option[String] = None,
                    maxKeys: Int = 1000): DataFrame = {
    val cap = math.min(maxKeys, 1000)
    val scoped = objects
      .filter(col("bucket_id") === bucket && hasPrefix(col("name"), prefix))
      .filter(startAfter.map(t => col("name") > lit(t)).getOrElse(lit(true)))
    delimiter match {
      case Some(d) =>
        val withCp = scoped.withColumn("cp", commonPrefix(col("name"), prefix, d))
        // per-branch limit before union (reference 0027:41-52, U2): k+k→k
        folderRows(withCp).orderBy(col("name")).limit(cap)
          .unionByName(fileRows(withCp).orderBy(col("name")).limit(cap))
          .orderBy(col("name")).limit(cap)
      case None =>
        scoped.select(col("name"), lit(false).as("is_folder"), col("size"),
          col("created_at")).orderBy(col("name")).limit(cap)
    }
  }

  /** Legacy `storage.search` (0002:131-147 via 0050:327+): case-insensitive
    * prefix match, sorted by lower(name) byte-order, OFFSET pagination. */
  def searchLegacy(objects: DataFrame, bucket: String, prefix: String,
                   limit: Int = 100, offset: Int = 0): DataFrame = {
    val cap = math.min(limit, 1500)
    val scoped = objects.filter(col("bucket_id") === bucket &&
      hasPrefixCI(col("name"), prefix))
    val withCp = scoped.withColumn("cp", commonPrefix(col("name"), prefix, "/"))
    folderRows(withCp).unionByName(fileRows(withCp))
      .orderBy(lower(col("name")), col("name"))
      .offset(offset).limit(cap)
  }

  /** `storage.search_by_timestamp` (0050:676-790, A5): folders aggregate
    * MIN(created_at) as both created/updated; keyset pagination on the
    * ms-truncated (timestamp, name) row value. */
  def searchByTimestamp(objects: DataFrame, bucket: String, prefix: String,
                        after: Option[(String, String)] = None,
                        limit: Int = 100): DataFrame = {
    val cap = math.min(limit, 1500)
    val scoped = objects.filter(col("bucket_id") === bucket &&
      hasPrefix(col("name"), prefix))
    val withCp = scoped.withColumn("cp", commonPrefix(col("name"), prefix, "/"))
    val folders = withCp.filter(col("cp").isNotNull)
      .groupBy(col("cp").as("name"))
      .agg(min(col("created_at")).as("created_at"))
      .select(col("name"), lit(true).as("is_folder"), col("created_at"))
    val files = withCp.filter(col("cp").isNull)
      .select(col("name"), lit(false).as("is_folder"), col("created_at"))
    val unioned = folders.unionByName(files)
    val paged = after match {
      case Some((ts, tok)) =>
        // cursor timestamp parses in the session tz (UTC) — never via
        // java.sql.Timestamp, whose valueOf uses the JVM default tz
        unioned.filter(keysetAfter(col("created_at"), col("name"),
          to_timestamp(lit(ts)), lit(tok)))
      case None => unioned
    }
    paged.orderBy(truncMs(col("created_at")), col("name")).limit(cap)
  }

  /** Whitelisted dynamic sort (O3, 0023:22-42 / pg.ts:616-625): sortColumn ∈
    * {name, updated_at, created_at}, else default name asc; name is always the
    * tiebreak (O2).
    *
    * `after` is the O5 keyset cursor on the DYNAMIC sort key — the reference's
    * `(sortBy.after, nextToken)` pair (pg.ts:633-651): the page predicate is
    * the row value `ROW(date_trunc(ms, sortCol), name) >/< ROW(after, token)`
    * with the operator following the sort order, so "sort by modified,
    * page 2" stays an index-range scan, never OFFSET. An empty after-value
    * coalesces to epoch exactly as the reference's
    * `COALESCE(NULLIF($n,'')::timestamptz, 'epoch')`. */
  def sortedListing(objects: DataFrame, bucket: String, prefix: String,
                    sortColumn: String, sortOrder: String, limit: Int,
                    after: Option[(String, String)] = None): DataFrame = {
    val colName = sortColumn match {
      case "updated_at" | "created_at" | "last_accessed_at" => sortColumn
      case _ => "name"
    }
    val key: Column =
      if (colName == "name") col("name") else truncMs(col(colName))
    val desc = sortOrder.toLowerCase == "desc"
    val (k1, k2) =
      if (desc) (key.desc, col("name").desc) else (key.asc, col("name").asc)
    val scoped = objects
      .filter(col("bucket_id") === bucket && hasPrefix(col("name"), prefix))
    val paged = after match {
      case Some((av, tok)) if colName != "name" =>
        val aTs = to_timestamp(lit(if (av.isEmpty) "1970-01-01 00:00:00" else av))
        scoped.filter(
          if (desc) keysetBefore(col(colName), col("name"), aTs, lit(tok))
          else keysetAfter(col(colName), col("name"), aTs, lit(tok)))
      case Some((_, tok)) =>
        scoped.filter(if (desc) col("name") < tok else col("name") > tok)
      case None => scoped
    }
    paged.orderBy(k1, k2).limit(math.min(limit, 1500))
  }

  /** Sorted list-v2 WITH delimiter collapse (0050:694-790 `search_v2` sorted
    * variant): folders aggregate MIN(child created_at) as BOTH timestamps
    * ("to match the old prefixes table behavior", 0050:726) and are rtrim'd
    * of the delimiter; the combined relation sorts on
    * `COALESCE(date_trunc(ms, sortCol), epoch)` with byte-ordered name
    * tiebreak, and the O5 cursor is the same row-value predicate as
    * [[sortedListing]]. One partial-agg shuffle (folders) + top-k — the
    * listObjectsV2 plan shape with a sort key swapped in. */
  def sortedListingV2(objects: DataFrame, bucket: String, prefix: String,
                      sortColumn: String, sortOrder: String, limit: Int,
                      after: Option[(String, String)] = None): DataFrame = {
    val colName = sortColumn match {
      case "updated_at" | "created_at" | "last_accessed_at" => sortColumn
      case _ => "name"
    }
    val scoped = objects
      .filter(col("bucket_id") === bucket && hasPrefix(col("name"), prefix))
      .withColumn("cp", commonPrefix(col("name"), prefix, "/"))
    // the sort column must survive the projection: folders carry NULL
    // last_accessed_at (0050:733 — epoch-coalesced by the sort key), files
    // carry theirs when the relation has one
    val hasLaa = objects.columns.contains("last_accessed_at")
    val fileLaa: Column =
      if (hasLaa) col("last_accessed_at") else lit(null).cast("timestamp")
    val folders = scoped.filter(col("cp").isNotNull)
      .groupBy(rtrim(col("cp"), "/").as("name"))
      .agg(min(col("created_at")).as("created_at"))
      .select(col("name"), lit(true).as("is_prefix"),
        col("created_at").as("updated_at"), col("created_at"),
        lit(null).cast("timestamp").as("last_accessed_at"))
    val files = scoped.filter(col("cp").isNull)
      .select(col("name"), lit(false).as("is_prefix"),
        col("updated_at"), col("created_at"), fileLaa.as("last_accessed_at"))
    val combined = folders.unionByName(files)
    val epoch = to_timestamp(lit("1970-01-01 00:00:00"))
    val key: Column =
      if (colName == "name") col("name")
      else coalesce(truncMs(col(colName)), epoch)
    val desc = sortOrder.toLowerCase == "desc"
    val paged = after match {
      case Some((av, tok)) if colName != "name" =>
        val aTs = to_timestamp(lit(if (av.isEmpty) "1970-01-01 00:00:00" else av))
        combined.filter(
          if (desc) keysetBefore(coalesce(col(colName), epoch), col("name"), aTs, lit(tok))
          else keysetAfter(coalesce(col(colName), epoch), col("name"), aTs, lit(tok)))
      case Some((_, tok)) =>
        combined.filter(if (desc) col("name") < tok else col("name") > tok)
      case None => combined
    }
    val (k1, k2) =
      if (desc) (key.desc, col("name").desc) else (key.asc, col("name").asc)
    paged.orderBy(k1, k2).limit(math.min(limit, 1500))
      .select(col("name"), col("is_prefix"), col("updated_at"), col("created_at"))
  }

  /** listBuckets (pg.ts:746-789): optional contains-search on `name` with
    * escaped-LIKE semantics — the reference wraps the user term in
    * `%escapeLike(term)%` (pg.ts:753-756), so `%`/`_` inside the term match
    * LITERALLY; in Spark that is a plain case-insensitive `contains`
    * ([[ilikeContains]]) — no pattern compilation at all. Whitelisted sort +
    * LIMIT/OFFSET pagination as in the reference; `id` tiebreaks for a total
    * order. Bucket catalogs are small dims (the relation broadcast-joins
    * everywhere else), so OFFSET here is not a scale concern. */
  def listBuckets(buckets: DataFrame, search: Option[String] = None,
                  sortColumn: String = "name", sortOrder: String = "asc",
                  limit: Int = 100, offset: Int = 0): DataFrame = {
    val filtered = search.filter(_.nonEmpty)
      .map(t => buckets.filter(ilikeContains(col("name"), t)))
      .getOrElse(buckets)
    val sortKey = sortColumn match {
      case "id" | "name" | "created_at" => col(sortColumn)
      case _ => col("name")
    }
    val ordered = sortOrder.toLowerCase match {
      case "desc" => filtered.orderBy(sortKey.desc, col("id").desc)
      case _ => filtered.orderBy(sortKey.asc, col("id").asc)
    }
    ordered.offset(offset).limit(limit)
  }

  /** O5 continuation-token page: decode → [[sortedListing]] — the wiring the
    * reference does in `ListObjectsV2` when `nextToken` carries a
    * `sortColumnAfter` row-value cursor (pg.ts:633-651, object.ts:676-712). */
  def sortedListingPage(objects: DataFrame, bucket: String, prefix: String,
                        token: String, limit: Int): DataFrame = {
    val c = graft.functions.TokenCodec.decode(token)
    val after =
      if (c.startAfter.isEmpty && c.sortColumnAfter.isEmpty) None
      else Some((c.sortColumnAfter.getOrElse(""), c.startAfter))
    sortedListing(objects, bucket, prefix, c.sortColumn, c.sortOrder, limit, after)
  }
}
