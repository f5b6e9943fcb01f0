package graft

import graft.functions.{FilterDsl, PathFns}
import graft.operators.{Listing, Multipart, Scanner}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Joins, aggregations, windows, set ops, pagination and the JSON filter DSL
  * (SURVEY §2.2–2.8). Every query is deterministic (unique total order) and
  * every aggregate over doubles goes through DECIMAL so both engines produce
  * bit-identical values.
  */
object QueriesRel {

  def queries: Map[String, Q] = Map(

    // ───────────── joins ─────────────

    // J2: S3 ∖ DB orphan anti-join. DB side excludes image/png rows so the
    // difference is non-empty in both directions.
    "j2_orphan_s3" -> Q(
      fn = (s, dir) => {
        val db = Tables.objects(s, dir).filter(col("mimetype") =!= "image/png")
        Scanner.orphanedS3Keys(Tables.s3Keys(s, dir), db).orderBy(col("key"))
      },
      oracle = Some(Oracle.withS3(
        """SELECT key, size FROM s3_keys
          |WHERE key NOT IN (SELECT name FROM objects WHERE mimetype <> 'image/png')
          |ORDER BY key""".stripMargin)),
      doc = "J2 orphaned blobs (scanner.ts:323-363)"),

    // J3: DB ∖ S3 orphan anti-join.
    "j3_orphan_db" -> Q(
      fn = (s, dir) =>
        Scanner.orphanedDbRows(Tables.objects(s, dir), Tables.s3Keys(s, dir))
          .select(col("name"), col("size"), col("mimetype")).orderBy(col("name")),
      oracle = Some(Oracle.withS3(
        """SELECT name, size, mimetype FROM objects
          |WHERE name NOT IN (SELECT key FROM s3_keys)
          |ORDER BY name""".stripMargin)),
      doc = "J3 orphaned metadata rows (scanner.ts:365-403)"),

    // J5: batch multi-key lookup via broadcast semi-join.
    "j5_multikey_lookup" -> Q(
      fn = (s, dir) => {
        val objects = Tables.objects(s, dir)
        val keys = objects.filter(col("size").between(50000, 50500))
          .select(col("name").as("key"))
        Scanner.findObjects(objects, keys)
          .select(col("name"), col("size"), col("mimetype")).orderBy(col("name"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT name, size, mimetype FROM objects
          |WHERE name IN (SELECT name FROM objects WHERE size BETWEEN 50000 AND 50500)
          |ORDER BY name""".stripMargin)),
      doc = "J5 name = ANY($) lookup (pg.ts:1203-1228)"),

    // J7-shape: FK chain with broadcast dims (objects→buckets analog at star
    // scale: orders→customer→nation→region).
    "j7_star_join" -> Q(
      fn = (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        o.filter(col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("r_name"))
      },
      oracle = Some(
        """SELECT r_name,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          |  count(*) AS n_orders
          |FROM orders
          |JOIN customer ON o_custkey = c_custkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE o_orderdate < TIMESTAMP '1997-01-01'
          |GROUP BY r_name ORDER BY r_name""".stripMargin),
      doc = "J7 FK joins w/ broadcast dims (uploader.ts:72-116 shape)"),

    // J1: legacy-search folder→object left join on reconstructed names
    // (0002:131-147): depth-2 'folders' rejoin to real objects, deeper ones
    // null-extend.
    "j1_folder_join" -> Q(
      fn = (s, dir) => {
        val objects = Tables.objects(s, dir)
        val scoped = objects.filter(col("bucket_id") === "F" &&
          PathFns.hasPrefix(col("name"), "R/"))
        val folders = scoped.select(PathFns.splitPart(col("name"), 2).as("folder")).distinct()
        folders.join(objects.filter(col("bucket_id") === "F"),
            concat(lit("R/"), col("folder")) === col("name"), "left")
          .select(col("folder"), col("name"), col("size"))
          .orderBy(col("folder"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT folder, name, size FROM (
          |  SELECT DISTINCT string_split(name, '/')[2] AS folder FROM objects
          |  WHERE bucket_id = 'F' AND name LIKE 'R/%') f
          |LEFT JOIN (SELECT * FROM objects WHERE bucket_id = 'F') o
          |  ON concat('R/', f.folder) = o.name
          |ORDER BY folder""".stripMargin)),
      doc = "J1 legacy folder join (0002:131-147)"),

    // ───────────── aggregations / windows ─────────────

    // A3: distinct folder extraction at a depth.
    "a3_distinct_folders" -> Q(
      fn = (s, dir) => Tables.objects(s, dir)
        .filter(col("bucket_id") === "O")
        .select(PathFns.splitPart(col("name"), 1).as("folder")).distinct()
        .orderBy(col("folder")),
      oracle = Some(Oracle.withObjects(
        """SELECT DISTINCT string_split(name, '/')[1] AS folder FROM objects
          |WHERE bucket_id = 'O' ORDER BY folder""".stripMargin)),
      doc = "A3 distinct folders (0002:131-138)"),

    // A4: DISTINCT ON — first object row per collapsed prefix.
    "a4_first_per_prefix" -> Q(
      fn = (s, dir) => {
        val scoped = Tables.objects(s, dir).filter(col("bucket_id") === "F" &&
          PathFns.hasPrefix(col("name"), "R/"))
        scoped.withColumn("cp", PathFns.commonPrefix(col("name"), "R/"))
          .filter(col("cp").isNotNull)
          .groupBy(col("cp"))
          .agg(min(col("name")).as("first_name"),
            min_by(col("size"), col("name")).as("first_size"))
          .orderBy(col("cp"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT cp, min(name) AS first_name, arg_min(size, name) AS first_size
          |FROM (SELECT *, CASE WHEN strpos(substr(name, 3), '/') > 0
          |  THEN concat('R/', substr(substr(name, 3), 1, strpos(substr(name, 3), '/')))
          |  ELSE NULL END AS cp
          |  FROM objects WHERE bucket_id = 'F' AND name LIKE 'R/%') w
          |WHERE cp IS NOT NULL GROUP BY cp ORDER BY cp""".stripMargin)),
      doc = "A4 DISTINCT ON first-per-prefix (0020:8-39)"),

    // A5: search_by_timestamp — folders carry MIN(created_at), keyset cursor
    // on the ms-truncated (timestamp, name) row value.
    "a5_search_by_timestamp" -> Q(
      fn = (s, dir) =>
        Listing.searchByTimestamp(Tables.objects(s, dir), "F", "R/",
          Some(("1996-06-01 00:00:00", "R/")), 150),
      oracle = Some(Oracle.withObjects(
        """SELECT name, is_folder, created_at FROM (
          |  SELECT cp AS name, TRUE AS is_folder, min(created_at) AS created_at
          |  FROM (SELECT *, CASE WHEN strpos(substr(name, 3), '/') > 0
          |    THEN concat('R/', substr(substr(name, 3), 1, strpos(substr(name, 3), '/')))
          |    ELSE NULL END AS cp
          |    FROM objects WHERE bucket_id = 'F' AND name LIKE 'R/%') w
          |  WHERE cp IS NOT NULL GROUP BY cp
          |  UNION ALL
          |  SELECT name, FALSE AS is_folder, created_at
          |  FROM (SELECT *, CASE WHEN strpos(substr(name, 3), '/') > 0
          |    THEN concat('R/', substr(substr(name, 3), 1, strpos(substr(name, 3), '/')))
          |    ELSE NULL END AS cp
          |    FROM objects WHERE bucket_id = 'F' AND name LIKE 'R/%') w2
          |  WHERE cp IS NULL
          |) u
          |WHERE date_trunc('millisecond', created_at) > TIMESTAMP '1996-06-01'
          |   OR (date_trunc('millisecond', created_at) = TIMESTAMP '1996-06-01' AND name > 'R/')
          |ORDER BY date_trunc('millisecond', created_at), name LIMIT 150""".stripMargin)),
      doc = "A5 search_by_timestamp + P5 composite cursor (0050:676-790)"),

    // A6: multipart progress accumulation.
    "a6_multipart_progress" -> Q(
      fn = (s, dir) => Multipart.uploadProgress(Tables.multipartParts(s, dir))
        .orderBy(col("upload_id")),
      oracle = Some(Oracle.withParts(
        """SELECT upload_id, CAST(sum(size) AS BIGINT) AS in_progress_size,
          |count(*) AS num_parts, max(part_number) AS max_part
          |FROM parts GROUP BY upload_id ORDER BY upload_id""".stripMargin)),
      doc = "A6 in_progress_size accumulation (pg.ts:1526-1544)"),

    // W1: first-row-per-group via window ranking (DISTINCT ON dual).
    "w1_first_per_group" -> Q(
      fn = (s, dir) => {
        val objects = Tables.objects(s, dir)
        val w = Window.partitionBy(col("bucket_id"), col("folder")).orderBy(col("name"))
        objects.withColumn("folder", PathFns.splitPart(col("name"), 1))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("bucket_id"), col("folder"), col("name"), col("size"))
          .orderBy(col("bucket_id"), col("folder"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT bucket_id, folder, name, size FROM (
          |  SELECT bucket_id, string_split(name, '/')[1] AS folder, name, size,
          |    row_number() OVER (PARTITION BY bucket_id, string_split(name, '/')[1]
          |                       ORDER BY name) AS rn
          |  FROM objects) t
          |WHERE rn = 1 ORDER BY bucket_id, folder""".stripMargin)),
      doc = "W1 first-row-per-group (0020:8)"),

    // P12: existence probe with LIMIT — count is deterministic even though
    // the probed rows aren't.
    "p12_existence_probe" -> Q(
      fn = (s, dir) => Tables.objects(s, dir)
        .filter(col("bucket_id") === "F" && PathFns.hasPrefix(col("name"), "R/9"))
        .limit(100)
        .agg(count(lit(1)).as("n")),
      oracle = Some(Oracle.withObjects(
        """SELECT count(*) AS n FROM (
          |  SELECT 1 FROM objects WHERE bucket_id = 'F' AND name LIKE 'R/9%' LIMIT 100) t""".stripMargin)),
      doc = "P12 SELECT 1 ... LIMIT n probe (pg.ts:498-517)"),

    // ───────────── sorts / pagination / set ops ─────────────

    // O2/O3: whitelisted dynamic sort, DESC with name tiebreak.
    "o3_sorted_listing_desc" -> Q(
      fn = (s, dir) =>
        Listing.sortedListing(Tables.objects(s, dir), "F", "N/", "updated_at", "desc", 120),
      oracle = Some(Oracle.withObjects(
        """SELECT * FROM objects WHERE bucket_id = 'F' AND name LIKE 'N/%'
          |ORDER BY date_trunc('millisecond', updated_at) DESC, name DESC
          |LIMIT 120""".stripMargin)),
      doc = "O2/O3 dynamic sort (0023:22-42, pg.ts:616-625)"),

    // O2/O3 + U1: the sorted list-v2 WITH delimiter collapse (0050:694-790
    // search_v2 sorted variant): folders aggregate MIN(child created_at) as
    // both timestamps (0050:726) and rtrim the delimiter; combined relation
    // sorts on the epoch-coalesced ms-truncated key, byte-order tiebreak.
    "o2_sorted_v2_delimiter" -> Q(
      fn = (s, dir) =>
        Listing.sortedListingV2(Tables.objects(s, dir), "F", "N/",
          "updated_at", "desc", 120),
      oracle = Some(Oracle.withObjects(
        """, raw AS (
          |  SELECT name, created_at, updated_at,
          |    CASE WHEN strpos(substr(name, 3), '/') > 0
          |      THEN concat('N/', substr(substr(name, 3), 1, strpos(substr(name, 3), '/')))
          |      ELSE NULL END AS cp
          |  FROM objects WHERE bucket_id = 'F' AND name LIKE 'N/%'),
          |folders AS (SELECT rtrim(cp, '/') AS name, TRUE AS is_prefix,
          |    min(created_at) AS updated_at, min(created_at) AS created_at
          |  FROM raw WHERE cp IS NOT NULL GROUP BY cp),
          |files AS (SELECT name, FALSE AS is_prefix, updated_at, created_at
          |  FROM raw WHERE cp IS NULL),
          |combined AS (SELECT * FROM folders UNION ALL SELECT * FROM files)
          |SELECT name, is_prefix, updated_at, created_at FROM combined
          |ORDER BY coalesce(date_trunc('millisecond', updated_at),
          |                  TIMESTAMP '1970-01-01') DESC, name DESC
          |LIMIT 120""".stripMargin)),
      doc = "sorted list-v2 with delimiter (0050:694-790, folders MIN(created))"),

    // O5: keyset cursor on a DYNAMIC sort column, DESC — "sort by modified,
    // page 2". The continuation token (F14 codec) carries the row-value
    // cursor (sortColumnAfter, name); sortedListingPage decodes and applies
    // ROW(date_trunc(ms, updated_at), name) < ROW(after, token).
    "o5_sorted_cursor_desc" -> Q(
      fn = (s, dir) => {
        val token = graft.functions.TokenCodec.encode(graft.functions.TokenCodec.Cursor(
          startAfter = "N/40", sortColumn = "updated_at", sortOrder = "desc",
          sortColumnAfter = Some("1995-06-01 00:00:00")))
        Listing.sortedListingPage(Tables.objects(s, dir), "F", "N/", token, 100)
      },
      oracle = Some(Oracle.withObjects(
        """SELECT * FROM objects WHERE bucket_id = 'F' AND name LIKE 'N/%'
          |AND (date_trunc('millisecond', updated_at) < TIMESTAMP '1995-06-01 00:00:00'
          |     OR (date_trunc('millisecond', updated_at) = TIMESTAMP '1995-06-01 00:00:00'
          |         AND name < 'N/40'))
          |ORDER BY date_trunc('millisecond', updated_at) DESC, name DESC
          |LIMIT 100""".stripMargin)),
      doc = "O5 keyset cursor on dynamic sort column, DESC (pg.ts:633-651, 0039:43-52)"),

    // listBuckets contains-search: the term carries literal '_' and '%' —
    // escaped-LIKE semantics (pg.ts:41-47) mean they must match themselves,
    // not wildcard; the DuckDB twin is a literal contains() for the same
    // reason. Only the 7 '_100%'-suffixed bucket names qualify.
    "bucket_search_contains" -> Q(
      fn = (s, dir) =>
        Listing.listBuckets(Tables.buckets(s, dir), Some("_100%"), "name", "asc", 10, 0),
      oracle = Some(Oracle.withBuckets(
        """SELECT * FROM buckets WHERE contains(lower(name), '_100%')
          |ORDER BY name, id LIMIT 10""".stripMargin)),
      doc = "listBuckets escaped-ILIKE contains search + pagination (pg.ts:746-789)"),

    // O4: legacy offset pagination with ILIKE prefix + lower(name) sort.
    "o4_offset_pagination" -> Q(
      fn = (s, dir) =>
        Listing.searchLegacy(Tables.objects(s, dir), "F", "r/", 50, 20),
      oracle = Some(Oracle.withObjects(
        """SELECT name, is_folder, size, created_at FROM (
          |  SELECT cp AS name, TRUE AS is_folder, CAST(NULL AS BIGINT) AS size,
          |         CAST(NULL AS TIMESTAMP) AS created_at
          |  FROM (SELECT *, CASE WHEN strpos(substr(name, 3), '/') > 0
          |    THEN concat('R/', substr(substr(name, 3), 1, strpos(substr(name, 3), '/')))
          |    ELSE NULL END AS cp
          |    FROM objects WHERE bucket_id = 'F' AND lower(name) LIKE 'r/%') w
          |  WHERE cp IS NOT NULL GROUP BY cp
          |  UNION ALL
          |  SELECT name, FALSE AS is_folder, size, created_at
          |  FROM (SELECT *, CASE WHEN strpos(substr(name, 3), '/') > 0
          |    THEN concat('R/', substr(substr(name, 3), 1, strpos(substr(name, 3), '/')))
          |    ELSE NULL END AS cp
          |    FROM objects WHERE bucket_id = 'F' AND lower(name) LIKE 'r/%') w2
          |  WHERE cp IS NULL
          |) u ORDER BY lower(name), name OFFSET 20 LIMIT 50""".stripMargin)),
      doc = "O4 offset pagination + F10 lower-collation (0002:136, 0050:327+)"),

    // O8: parts pagination.
    "o8_parts_pagination" -> Q(
      fn = (s, dir) => Tables.multipartParts(s, dir)
        .filter(col("part_number") > 2)
        .orderBy(col("upload_id"), col("part_number"), col("id"))
        .limit(100),
      oracle = Some(Oracle.withParts(
        """SELECT * FROM parts WHERE part_number > 2
          |ORDER BY upload_id, part_number, id LIMIT 100""".stripMargin)),
      doc = "O8 ListParts keyset (pg.ts:1581-1613)"),

    // U3: set difference.
    "u3_except" -> Q(
      fn = (s, dir) => {
        val objects = Tables.objects(s, dir)
        objects.filter(col("size") > 90000).select(col("name"))
          .except(objects.filter(col("mimetype") === "text/plain").select(col("name")))
          .orderBy(col("name"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT name FROM objects WHERE size > 90000
          |EXCEPT
          |SELECT name FROM objects WHERE mimetype = 'text/plain'
          |ORDER BY name""".stripMargin)),
      doc = "U3 set difference (scanner.ts:30-73)"),

    // ───────────── scalar functions / filter DSL ─────────────

    // F1-F8 combined projection over synthesized keys.
    // Array-returning scalars (F1 foldername, F6 get_prefixes) are projected
    // through array_join: the driver's compare sorts rows via pandas, which
    // cannot hash numpy arrays (round-1 fn_path_scalars ORACLE-FAIL). The raw
    // array forms stay covered by PathFnsSpec.
    "fn_path_scalars" -> Q(
      fn = (s, dir) => Tables.objects(s, dir)
        .filter(col("bucket_id") === "O")
        .select(col("name"),
          concat_ws("/", PathFns.foldername(col("name"))).as("folder_path"),
          PathFns.filename(col("name")).as("file_name"),
          PathFns.extension(col("name")).as("ext"),
          PathFns.getLevel(col("name")).as("level"),
          PathFns.getPrefix(col("name")).as("parent"),
          concat_ws("|", PathFns.getPrefixes(col("name"))).as("ancestors"))
        .orderBy(col("name")).limit(500),
      oracle = Some(Oracle.withObjects(
        """SELECT name,
          |  array_to_string(string_split(name, '/')[1:-2], '/') AS folder_path,
          |  string_split(name, '/')[-1] AS file_name,
          |  string_split(string_split(name, '/')[-1], '.')[-1] AS ext,
          |  CAST(len(string_split(name, '/')) AS INT) AS level,
          |  regexp_replace(name, '[\/]{1}[^\/]+\/?$', '') AS parent,
          |  array_to_string(list_transform(generate_series(1, len(string_split(name, '/')) - 1),
          |                 i -> array_to_string(string_split(name, '/')[1:i], '/')), '|') AS ancestors
          |FROM objects WHERE bucket_id = 'O' ORDER BY name LIMIT 500""".stripMargin)),
      doc = "F1-F8 path scalars (0002:85-122, 0026:6-56)"),

    // P8: JSON metadata filter DSL — range.
    "p8_filter_dsl_range" -> Q(
      fn = (s, dir) => Tables.events(s, dir)
        .filter(FilterDsl.filter(col("props"),
          """{"$and":[{"k":{"$gte":30}},{"k":{"$lt":60}}]}"""))
        .select(col("event_id"), col("event_type"), col("props"))
        .orderBy(col("event_id")),
      oracle = Some(
        """SELECT event_id, event_type, props FROM events
          |WHERE TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 30
          |  AND TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) < 60
          |ORDER BY event_id""".stripMargin),
      doc = "P8 filter DSL $and/$gte/$lt (filter.ts:152-308)"),

    // P8: $or / $eq / $in.
    "p8_filter_dsl_or_in" -> Q(
      fn = (s, dir) => Tables.events(s, dir)
        .filter(FilterDsl.filter(col("props"),
          """{"$or":[{"k":{"$eq":69}},{"k":{"$in":[5,7,11]}}]}"""))
        .select(col("event_id"), col("event_type"), col("props"))
        .orderBy(col("event_id")),
      oracle = Some(
        """SELECT event_id, event_type, props FROM events
          |WHERE TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) = 69
          |   OR TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) IN (5, 7, 11)
          |ORDER BY event_id""".stripMargin),
      doc = "P8 filter DSL $or/$eq/$in"),

    // ───────────── headline analytics (bench anchors) ─────────────

    // TPC-H Q3 shape: selective join + grouped top-k by revenue.
    "q3_topk_revenue" -> Q(
      fn = (s, dir) => {
        val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") < to_timestamp(lit("1997-03-15 00:00:00")))
        val l = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") > to_timestamp(lit("1997-03-15 00:00:00")))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      oracle = Some(
        """SELECT l_orderkey, o_orderdate, o_orderpriority,
          |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1997-03-15'
          |  AND l_shipdate > TIMESTAMP '1997-03-15'
          |GROUP BY l_orderkey, o_orderdate, o_orderpriority
          |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),
      doc = "headline: selective join + grouped top-k"),

    // TPC-H Q6 shape: pushdown-friendly selective scan-aggregate.
    "q6_selective_sum" -> Q(
      fn = (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
          col("l_discount").cast(DecimalType(18, 2)))).cast("double").as("revenue"),
          count(lit(1)).as("n")),
      oracle = Some(
        """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          |  count(*) AS n
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),
      doc = "headline: selective scan-agg, filters pushed to parquet"),

    // TPC-H Q5 shape: the 6-way star — fact joins shuffle on their FKs,
    // only the genuinely tiny dims (nation⋈region, 25 rows at ANY scale)
    // are broadcast. supplier/customer joins stay shuffles on purpose:
    // at 100 TB those tables are millions of rows and hard-coded
    // broadcasts would OOM the build side; AQE still upgrades them to
    // broadcast at small SF. The local-supplier condition
    // (c_nationkey = s_nationkey) rides the supplier join.
    "q5_local_volume" -> Q(
      fn = (s, dir) => {
        val nr = Tables.nation(s, dir)
          .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val su = Tables.supplier(s, dir)
          .join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
        val o = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        Tables.lineitem(s, dir)
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(su, col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      oracle = Some(
        """SELECT n_name,
          |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          |  count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o_orderdate < TIMESTAMP '1997-01-01'
          |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      doc = "headline: 6-way star join, tiny dims broadcast, fact joins shuffled"),

    // TPC-H Q13 shape: order-count distribution INCLUDING zero-order
    // customers. Orders pre-aggregate to per-customer counts BEFORE the
    // outer join (the join carries one row per customer instead of one per
    // order — at 100 TB that's the difference between shuffling the fact
    // table and shuffling a key-count sketch of it); the left join +
    // coalesce(n, 0) preserves customers with no orders.
    "q13_order_distribution" -> Q(
      fn = (s, dir) => {
        val perCust = Tables.orders(s, dir)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        Tables.customer(s, dir)
          .join(perCust, col("c_custkey") === col("o_custkey"), "left")
          .select(coalesce(col("n"), lit(0L)).as("n_orders"))
          .groupBy(col("n_orders")).agg(count(lit(1)).as("n_customers"))
          .orderBy(col("n_customers").desc, col("n_orders").desc)
      },
      oracle = Some(
        """SELECT n_orders, count(*) AS n_customers
          |FROM (SELECT c_custkey, count(o_orderkey) AS n_orders
          |      FROM customer LEFT JOIN orders
          |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          |      GROUP BY c_custkey) t
          |GROUP BY n_orders
          |ORDER BY n_customers DESC, n_orders DESC""".stripMargin),
      doc = "Q13 shape: zero-preserving outer join + two-level distribution (pre-aggregated probe side)"),

    // TPC-H Q15 shape: top supplier(s) by quarterly revenue — a global
    // argmax WITH tie preservation. The max is a 1-row aggregate
    // broadcast back against the per-supplier revenue relation (NOT an
    // empty-partition window, which would serialize the whole relation
    // through one task — PlanAudit rejects that shape). Revenue compares
    // in exact DECIMAL so the equality is engine-identical; the double
    // cast happens only at output.
    "q15_top_supplier" -> Q(
      fn = (s, dir) => {
        val rev = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
          .groupBy(col("l_suppkey"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4))).as("r"))
        val mx = rev.agg(max(col("r")).as("mx"))
        rev.join(broadcast(mx), col("r") === col("mx"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("r").cast("double").as("total_rev"))
          .orderBy(col("s_suppkey"))
      },
      oracle = Some(
        """WITH rev AS (SELECT l_suppkey,
          |    sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS r
          |  FROM lineitem
          |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          |    AND l_shipdate < TIMESTAMP '1996-04-01'
          |  GROUP BY l_suppkey)
          |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_rev
          |FROM rev JOIN supplier ON l_suppkey = s_suppkey
          |WHERE r = (SELECT max(r) FROM rev)
          |ORDER BY s_suppkey""".stripMargin),
      doc = "Q15 shape: exact-decimal global argmax with ties, 1-row broadcast instead of a global window"),

    // TPC-H Q22 shape: global scalar threshold + anti-join. "Wealthy but
    // idle" customers: above-average positive balance AND no orders. The
    // average is never materialized as a division — the gate compares
    // bal·n > Σbal in exact DECIMAL (cross-multiplied form; a double
    // division would put customers sitting exactly on the boundary at
    // last-ulp cross-engine risk). The anti-join shuffles on custkey.
    "q22_idle_customers" -> Q(
      fn = (s, dir) => {
        val cust = Tables.customer(s, dir)
          .withColumn("bal", round(col("c_acctbal"), 2).cast(DecimalType(18, 2)))
        val g = cust.filter(col("c_acctbal") > 0.0)
          .agg(sum(col("bal")).as("s"), count(lit(1)).as("n"))
        cust.join(broadcast(g))
          .filter(col("bal") * col("n") > col("s"))
          .join(Tables.orders(s, dir),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_custs"),
            sum(col("bal")).cast("double").as("total_bal"))
          .orderBy(col("c_nationkey"))
      },
      oracle = Some(
        """WITH pos AS (SELECT
          |    sum(CAST(round(c_acctbal, 2) AS DECIMAL(18,2))) AS s, count(*) AS n
          |  FROM customer WHERE c_acctbal > 0),
          |idle AS (SELECT c_nationkey,
          |    CAST(round(c_acctbal, 2) AS DECIMAL(18,2)) AS bal
          |  FROM customer, pos
          |  WHERE CAST(round(c_acctbal, 2) AS DECIMAL(18,2)) * n > s
          |    AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
          |SELECT c_nationkey, count(*) AS n_custs,
          |       CAST(sum(bal) AS DOUBLE) AS total_bal
          |FROM idle GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      doc = "Q22 shape: cross-multiplied scalar threshold + anti-join (no double-division boundary)"),

    // TPC-H Q11 shape: groups whose share of a GLOBAL aggregate exceeds a
    // threshold — here the scale-free ABOVE-MEAN gate value·n > total in
    // exact DECIMAL (cross-multiplied — no double division against a
    // boundary, and no tuned constant that degenerates at another SF);
    // the global (total, n) is a 1-row broadcast against the per-part
    // relation.
    "q11_part_share" -> Q(
      fn = (s, dir) => {
        val perPart = Tables.lineitem(s, dir)
          .groupBy(col("l_partkey"))
          .agg(sum((col("l_extendedprice") * col("l_quantity"))
            .cast(DecimalType(18, 2))).as("value"))
        val total = perPart.agg(sum(col("value")).as("total"),
          count(lit(1)).as("n"))
        perPart.join(broadcast(total))
          .filter(col("value") * col("n") > col("total"))
          .select(col("l_partkey"), col("value").cast("double").as("part_value"))
          .orderBy(col("l_partkey"))
      },
      oracle = Some(
        """WITH pp AS (SELECT l_partkey,
          |    sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2))) AS value
          |  FROM lineitem GROUP BY l_partkey)
          |SELECT l_partkey, CAST(value AS DOUBLE) AS part_value
          |FROM pp WHERE value * (SELECT count(*) FROM pp)
          |               > (SELECT sum(value) FROM pp)
          |ORDER BY l_partkey""".stripMargin),
      doc = "Q11 shape: above-mean share of a global aggregate, cross-multiplied DECIMAL gate"),

    // RFM customer segmentation: recency/frequency/monetary quintiles.
    // The quintile boundary is a GLOBAL order statistic, so the scale-safe
    // form is the distributed two-pass rank (Prefix.withRankAndCumSum —
    // range-partitioned, no single-partition window). All three metrics
    // rank in ONE pass over a melted (metric, value) relation; the score is
    // pure integer math, score = 1 + (rank-1)·5 div n, replayed verbatim by
    // the oracle (NOT SQL ntile, whose remainder distribution differs).
    // Monetary sums via round-to-cents DECIMAL — exact cross-engine.
    "rfm_segmentation" -> Q(
      fn = (s, dir) => {
        val asOf = to_timestamp(lit("2002-01-01 00:00:00"))
        val c = Tables.orders(s, dir)
          .groupBy(col("o_custkey").as("custkey"))
          .agg(
            datediff(asOf, max(col("o_orderdate"))).as("recency"),
            count(lit(1)).as("frequency"),
            sum(round(col("o_totalprice"), 2).cast(DecimalType(18, 2)))
              .cast(DecimalType(18, 2)).as("monetary"))
        graft.operators.CacheOnce.pin(c)
        val n = c.count()
        val melted = c.select(lit("recency").as("metric"), col("custkey"),
            col("recency").cast(DecimalType(18, 2)).as("value"))
          .unionByName(c.select(lit("frequency").as("metric"), col("custkey"),
            col("frequency").cast(DecimalType(18, 2)).as("value")))
          .unionByName(c.select(lit("monetary").as("metric"), col("custkey"),
            col("monetary").as("value")))
        val ranked = graft.operators.Prefix.withRankAndCumSum(
          melted, Seq(col("metric"), col("value"), col("custkey")), lit(1L), 32)
        val metricIdx = when(col("metric") === "frequency", 0L)
          .when(col("metric") === "monetary", 1L).otherwise(2L)
        val scored = ranked
          .withColumn("prank", col("rnk") - metricIdx * n)
          .withColumn("score", expr(s"1 + ((prank - 1) * 5) div ${n}L"))
        val out = scored.groupBy(col("custkey"))
          .agg(
            max(when(col("metric") === "recency", col("score"))).as("r_score"),
            max(when(col("metric") === "frequency", col("score"))).as("f_score"),
            max(when(col("metric") === "monetary", col("score"))).as("m_score"))
          .groupBy(col("r_score"), col("f_score"), col("m_score"))
          .agg(count(lit(1)).as("n_customers"), sum(col("custkey")).as("custkey_sum"))
          .orderBy(col("r_score"), col("f_score"), col("m_score"))
        out
      },
      oracle = Some(
        """WITH c AS (SELECT o_custkey AS custkey,
          |    date_diff('day', max(o_orderdate), TIMESTAMP '2002-01-01') AS recency,
          |    count(*) AS frequency,
          |    CAST(sum(CAST(round(o_totalprice, 2) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS monetary
          |  FROM orders GROUP BY 1),
          |n AS (SELECT count(*) AS n FROM c),
          |m AS (SELECT 'recency' AS metric, custkey, CAST(recency AS DECIMAL(18,2)) AS value FROM c
          |  UNION ALL SELECT 'frequency', custkey, CAST(frequency AS DECIMAL(18,2)) FROM c
          |  UNION ALL SELECT 'monetary', custkey, monetary FROM c),
          |r AS (SELECT metric, custkey,
          |    row_number() OVER (PARTITION BY metric ORDER BY value, custkey) AS prank FROM m),
          |sc AS (SELECT metric, custkey, 1 + ((prank - 1) * 5) // n.n AS score FROM r, n),
          |p AS (SELECT custkey,
          |    max(CASE WHEN metric = 'recency' THEN score END) AS r_score,
          |    max(CASE WHEN metric = 'frequency' THEN score END) AS f_score,
          |    max(CASE WHEN metric = 'monetary' THEN score END) AS m_score
          |  FROM sc GROUP BY 1)
          |SELECT r_score, f_score, m_score, count(*) AS n_customers,
          |       CAST(sum(custkey) AS BIGINT) AS custkey_sum
          |FROM p GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score""".stripMargin),
      doc = "RFM quintile segmentation: one distributed rank pass over all three melted metrics"),

    // Market-basket association rules (support/confidence/lift) over
    // co-ordered parts. Pair generation is ROW-LOCAL off one basket
    // groupBy (orders are bounded), pair support partial-aggregates, and
    // the support floor is applied BEFORE rule expansion — the classic
    // Apriori-first-pass shape, no quadratic pair set beyond what the
    // floor admits. Confidence/lift are single IEEE divisions off exact
    // int supports; the item-support dim broadcasts.
    "basket_rules" -> Q(
      fn = (s, dir) => {
        // ONE basket pass: collect_set dedups (o, p) inside the groupBy, so
        // the standalone distinct shuffle is pure overhead; item supports
        // and the basket count both derive from the pinned basket relation
        // (exploding deduped sets ≡ distinct (o, p)) — no second corpus scan
        val baskets = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .groupBy(col("o")).agg(collect_set(col("p")).as("ps"))
        graft.operators.CacheOnce.pin(baskets)
        val n = baskets.count() // pin: feeds pairs + supports; n = basket census
        val pairs = baskets
          .select(explode(expr(
            """flatten(transform(ps, x -> transform(
              |  filter(ps, y -> y > x), y -> struct(x AS x, y AS y))))""".stripMargin))
            .as("pr"))
          .groupBy(col("pr.x").as("x"), col("pr.y").as("y"))
          .agg(count(lit(1)).as("s_pair"))
          .filter(col("s_pair") >= 3)
        val sup = baskets.select(explode(col("ps")).as("p"))
          .groupBy(col("p")).agg(count(lit(1)).as("s_item"))
        val rules = pairs
          .select(col("x").as("ante"), col("y").as("cons"), col("s_pair"))
          .unionByName(pairs.select(col("y").as("ante"), col("x").as("cons"),
            col("s_pair")))
        rules
          .join(broadcast(sup.select(col("p").as("ante"), col("s_item").as("s_ante"))),
            Seq("ante"))
          .join(broadcast(sup.select(col("p").as("cons"), col("s_item").as("s_cons"))),
            Seq("cons"))
          .select(col("ante"), col("cons"), col("s_pair"), col("s_ante"), col("s_cons"),
            (col("s_pair").cast("double") / col("s_ante").cast("double"))
              .as("confidence"),
            (col("s_pair").cast("double") * lit(n.toDouble)
              / (col("s_ante") * col("s_cons")).cast("double")).as("lift"))
          .orderBy(col("ante"), col("cons"))
      },
      oracle = Some(
        """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
          |n AS (SELECT count(DISTINCT o) AS n FROM items),
          |pairs AS (SELECT a.p AS x, b.p AS y, count(*) AS s_pair
          |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
          |  GROUP BY 1, 2 HAVING count(*) >= 3),
          |sup AS (SELECT p, count(*) AS s_item FROM items GROUP BY p),
          |rules AS (SELECT x AS ante, y AS cons, s_pair FROM pairs
          |  UNION ALL SELECT y, x, s_pair FROM pairs)
          |SELECT ante, cons, s_pair, sa.s_item AS s_ante, sc.s_item AS s_cons,
          |  CAST(s_pair AS DOUBLE) / CAST(sa.s_item AS DOUBLE) AS confidence,
          |  CAST(s_pair AS DOUBLE) * CAST(n.n AS DOUBLE)
          |    / CAST(sa.s_item * sc.s_item AS DOUBLE) AS lift
          |FROM rules JOIN sup sa ON rules.ante = sa.p
          |           JOIN sup sc ON rules.cons = sc.p CROSS JOIN n
          |ORDER BY ante, cons""".stripMargin),
      doc = "market-basket association rules: row-local pair expansion, support floor, broadcast supports"))
}
