package graft

import graft.functions.Validators
import graft.operators.{IcebergCatalog, Listing, Locks, ObjectStore, PrefixIndex, Rls, S3Response, Scanner, Tus}
import org.apache.spark.sql.functions._

/** DML batch forms (D1–D7), Iceberg catalog (I1–I5), RLS, validators, and S3
  * response shaping — the remaining SURVEY §2 inventory.
  */
object QueriesDml {

  private val objCols =
    "name, bucket_id, owner_id, size, created_at, updated_at, version, mimetype"

  def queries: Map[String, Q] = Map(

    // D1 upsert: last-wins merge of an update batch over the relation.
    "d1_upsert_merge" -> Q(
      fn = (s, dir) => {
        val existing = Tables.objects(s, dir).filter(col("bucket_id") === "F")
        val incoming = existing.filter(col("size") > 90000)
          .withColumn("size", col("size") + 1)
          .withColumn("version", lit("v2"))
        ObjectStore.upsert(existing, incoming)
          .select(col("name"), col("size"), col("version"))
          .orderBy(col("name"))
      },
      oracle = Some(Oracle.withObjects(
        s""", existing AS (SELECT * FROM objects WHERE bucket_id = 'F'),
           |incoming AS (SELECT name, bucket_id, owner_id, size + 1 AS size,
           |  created_at, updated_at, 'v2' AS version, mimetype
           |  FROM existing WHERE size > 90000),
           |merged AS (SELECT *, row_number() OVER (PARTITION BY bucket_id, name
           |    ORDER BY _prio DESC) AS rn
           |  FROM (SELECT $objCols, 0 AS _prio FROM existing
           |        UNION ALL SELECT $objCols, 1 AS _prio FROM incoming) u)
           |SELECT name, size, version FROM merged WHERE rn = 1 ORDER BY name""".stripMargin)),
      doc = "D1 ON CONFLICT DO UPDATE as batch merge (pg.ts:905-961)"),

    // D2 duplicate check: the conflicting keys an insert batch would hit.
    "d2_create_conflicts" -> Q(
      fn = (s, dir) =>
        ObjectStore.createConflicts(Tables.objects(s, dir),
          Tables.incomingBatch(s, dir)).orderBy(col("bucket_id"), col("name")),
      oracle = Some(Oracle.withObjects(
        """, incoming AS (
          |  SELECT bucket_id, name FROM objects WHERE size BETWEEN 10000 AND 10300
          |  UNION ALL SELECT 'F', 'zzz/brand-new.dat')
          |SELECT bucket_id, name FROM incoming
          |WHERE EXISTS (SELECT 1 FROM objects o WHERE o.bucket_id = incoming.bucket_id
          |              AND o.name = incoming.name)
          |ORDER BY bucket_id, name""".stripMargin)),
      doc = "D2 KeyAlreadyExists duplicate probe (pg.ts:1004-1040)"),

    // D4 delete with RETURNING: the deleted set.
    "d4_delete_returning" -> Q(
      fn = (s, dir) => {
        val (_, deleted) = ObjectStore.deleteWhere(Tables.objects(s, dir),
          col("bucket_id") === "O" &&
            col("created_at") < to_timestamp(lit("1995-06-01 00:00:00")))
        deleted.select(col("name"), col("size")).orderBy(col("name"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT name, size FROM objects
          |WHERE bucket_id = 'O' AND created_at < TIMESTAMP '1995-06-01'
          |ORDER BY name""".stripMargin)),
      doc = "D4 DELETE ... RETURNING (pg.ts:1042-1117)"),

    // D6 bulk move: prefix rename + re-sort (rename map over the relation).
    "d6_bulk_move" -> Q(
      fn = (s, dir) => Tables.objects(s, dir)
        .filter(col("bucket_id") === "F")
        .withColumn("name", when(col("name").startsWith("R/9"),
          concat(lit("archive/"), col("name"))).otherwise(col("name")))
        .select(col("name"), col("size"))
        .orderBy(col("name")).limit(500),
      oracle = Some(Oracle.withObjects(
        """SELECT CASE WHEN name LIKE 'R/9%' THEN concat('archive/', name)
          |  ELSE name END AS name, size
          |FROM objects WHERE bucket_id = 'F'
          |ORDER BY name LIMIT 500""".stripMargin)),
      doc = "D6 moveObject batch form (object.ts:461-608)"),

    // D7 delete-all-before cutoff, summarized as the reclaimed totals.
    "d7_delete_all_before" -> Q(
      fn = (s, dir) => {
        val (_, deleted) = ObjectStore.deleteAllBefore(Tables.objects(s, dir), "F",
          to_timestamp(lit("1995-03-01 00:00:00")))
        deleted.agg(count(lit(1)).as("n_deleted"), sum(col("size")).as("bytes_reclaimed"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT count(*) AS n_deleted, CAST(sum(size) AS BIGINT) AS bytes_reclaimed
          |FROM objects WHERE bucket_id = 'F' AND created_at < TIMESTAMP '1995-03-01'""".stripMargin)),
      doc = "D7 emptyBucket/delete-all-before (storage.ts:326-343)"),

    // J6 composite-key lookup join.
    "j6_composite_lookup" -> Q(
      fn = (s, dir) => {
        val objects = Tables.objects(s, dir)
        val kv = objects.filter(col("size").between(20000, 20100))
          .select(col("name").as("key"), col("version").as("v"))
        Scanner.findObjectVersions(objects, kv)
          .select(col("name"), col("version"), col("size")).orderBy(col("name"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT name, version, size FROM objects
          |WHERE EXISTS (SELECT 1 FROM objects o2
          |  WHERE o2.size BETWEEN 20000 AND 20100
          |  AND o2.name = objects.name AND o2.version = objects.version)
          |ORDER BY name""".stripMargin)),
      doc = "J6 (name, version) tuple-list lookup (pg.ts:1229-1253)"),

    // I3 list tables in a namespace (keyset).
    "i3_list_tables" -> Q(
      fn = (s, dir) =>
        IcebergCatalog.listTables(IcebergCatalog.tables(s, dir), "5", None, 100),
      oracle = Some(
        """WITH tables AS (SELECT concat('tbl-', s_suppkey) AS id,
          |  CAST(s_nationkey AS VARCHAR) AS namespace_id,
          |  lower(replace(s_name, '#', '_')) AS name,
          |  concat('s3://warehouse/', s_nationkey, '/', s_suppkey, '/metadata.json') AS location
          |  FROM supplier)
          |SELECT id, namespace_id, name, location FROM tables
          |WHERE namespace_id = '5' ORDER BY name LIMIT 100""".stripMargin),
      doc = "I3 catalog listing (tenant-catalog.ts:287-326)"),

    // I4 drop + async cleanup: dropping the bkt-1 namespaces emits one
    // delete-iceberg-resources job per dropped table, singleton-keyed.
    "i4_drop_cleanup_events" -> Q(
      fn = (s, dir) => {
        val (_, _, events) = IcebergCatalog.dropNamespaces(
          IcebergCatalog.namespaces(s, dir), IcebergCatalog.tables(s, dir),
          col("bucket_id") === "bkt-1")
        events.orderBy(col("singleton_key"))
      },
      oracle = Some(
        """WITH namespaces AS (SELECT CAST(n_nationkey AS VARCHAR) AS id,
          |  concat('bkt-', n_regionkey) AS bucket_id FROM nation),
          |tables AS (SELECT concat('tbl-', s_suppkey) AS id,
          |  CAST(s_nationkey AS VARCHAR) AS namespace_id,
          |  concat('s3://warehouse/', s_nationkey, '/', s_suppkey, '/metadata.json') AS location
          |  FROM supplier),
          |dropped AS (SELECT t.* FROM tables t
          |  JOIN namespaces n ON t.namespace_id = n.id WHERE n.bucket_id = 'bkt-1')
          |SELECT 'delete-iceberg-resources' AS queue,
          |       concat('delete_', id) AS singleton_key,
          |       concat('{"tableId":"', id, '","location":"', location, '"}') AS payload
          |FROM dropped ORDER BY singleton_key""".stripMargin),
      doc = "I4 drop lifecycle event emission (tenant-catalog.ts:550-662, delete-iceberg-resources.ts:23)"),

    // I2 per-bucket quota usage.
    "i2_quota_usage" -> Q(
      fn = (s, dir) => IcebergCatalog.quotaUsage(
        IcebergCatalog.namespaces(s, dir), IcebergCatalog.tables(s, dir))
        .orderBy(col("bucket_id")),
      oracle = Some(
        """WITH namespaces AS (SELECT CAST(n_nationkey AS VARCHAR) AS id,
          |  concat('bkt-', n_regionkey) AS bucket_id,
          |  lower(replace(n_name, ' ', '_')) AS name FROM nation),
          |tables AS (SELECT concat('tbl-', s_suppkey) AS id,
          |  CAST(s_nationkey AS VARCHAR) AS namespace_id FROM supplier),
          |ns AS (SELECT bucket_id, count(*) AS n_namespaces FROM namespaces GROUP BY 1),
          |tb AS (SELECT n.bucket_id, count(*) AS n_tables FROM tables t
          |       JOIN namespaces n ON t.namespace_id = n.id GROUP BY 1)
          |SELECT COALESCE(ns.bucket_id, tb.bucket_id) AS bucket_id, n_namespaces, n_tables
          |FROM ns FULL OUTER JOIN tb ON ns.bucket_id = tb.bucket_id
          |ORDER BY bucket_id""".stripMargin),
      doc = "I2 tenant quota counts (multitenant/0019:1-4)"),

    // I5 reconciler diff: desired vs actual catalog state, both directions.
    "i5_reconciler_diff" -> Q(
      fn = (s, dir) => {
        val desired = IcebergCatalog.tables(s, dir).select(col("location"))
        val actual = IcebergCatalog.tables(s, dir)
          .filter(expr("CAST(substr(id, 5) AS BIGINT) % 10 != 0"))
          .select(col("location"))
          .unionByName(Tables.region(s, dir)
            .select(concat(lit("s3://warehouse/stale/"), col("r_regionkey")).as("location")))
        IcebergCatalog.reconcilerDiff(desired, actual).orderBy(col("location"))
      },
      oracle = Some(
        """WITH tables AS (SELECT s_suppkey,
          |  concat('s3://warehouse/', s_nationkey, '/', s_suppkey, '/metadata.json') AS location
          |  FROM supplier),
          |desired AS (SELECT location FROM tables),
          |actual AS (SELECT location FROM tables WHERE s_suppkey % 10 != 0
          |  UNION ALL SELECT concat('s3://warehouse/stale/', r_regionkey) FROM region)
          |SELECT location, 'create' AS action FROM desired
          |  WHERE location NOT IN (SELECT location FROM actual)
          |UNION ALL
          |SELECT location, 'drop' AS action FROM actual
          |  WHERE location NOT IN (SELECT location FROM desired)
          |ORDER BY location""".stripMargin),
      doc = "I5 catalog reconciler (reconciler.ts, J2-pattern diff)"),

    // Snapshot expiry + orphan-file GC planning (Iceberg expireSnapshots —
    // the maintenance verb that follows I4's async cleanup): retire
    // pre-cutoff snapshots keeping each table's current one, then the
    // deletable set = files reachable only from retired snapshots (J2-style
    // anti-join per (table, file)). Fixture: orders (every 10th) are
    // snapshots of tables keyed by customer; their lineitems are manifest
    // entries with partkey-derived table-relative file paths, so
    // consecutive snapshots of a table SHARE files — exactly the Iceberg
    // reachability structure.
    "i6_snapshot_expiry" -> Q(
      fn = (s, dir) => {
        val snaps = Tables.orders(s, dir).filter(col("o_orderkey") % 10 === 0)
          .select(concat(lit("tbl-"), col("o_custkey") % 50).as("table_id"),
            col("o_orderkey").as("snapshot_id"),
            col("o_orderdate").cast("timestamp").as("ts"))
        val refs = Tables.lineitem(s, dir).filter(col("l_orderkey") % 10 === 0)
          .select(col("l_orderkey").as("snapshot_id"),
            concat(lit("data/"), col("l_partkey"), lit(".parquet")).as("file"),
            ((col("l_partkey") % 997 + 1) * 100).as("bytes"))
        IcebergCatalog.expireSnapshots(snaps, refs,
          to_timestamp(lit("1997-01-01 00:00:00")))
      },
      oracle = Some(
        """WITH snaps AS (SELECT concat('tbl-', o_custkey % 50) AS table_id,
          |    o_orderkey AS snapshot_id, CAST(o_orderdate AS TIMESTAMP) AS ts
          |  FROM orders WHERE o_orderkey % 10 = 0),
          |latest AS (SELECT table_id, snapshot_id FROM (
          |    SELECT table_id, snapshot_id, row_number() OVER (
          |      PARTITION BY table_id ORDER BY ts DESC, snapshot_id DESC) AS rn
          |    FROM snaps) WHERE rn = 1),
          |flagged AS (SELECT s.table_id, s.snapshot_id,
          |    (s.ts < TIMESTAMP '1997-01-01' AND l.snapshot_id IS NULL) AS expired
          |  FROM snaps s LEFT JOIN latest l
          |    ON s.table_id = l.table_id AND s.snapshot_id = l.snapshot_id),
          |r AS (SELECT f.table_id, f.expired,
          |    concat('data/', l_partkey, '.parquet') AS file,
          |    (l_partkey % 997 + 1) * 100 AS bytes
          |  FROM lineitem JOIN flagged f ON l_orderkey = f.snapshot_id),
          |live AS (SELECT DISTINCT table_id, file, bytes FROM r WHERE NOT expired),
          |expf AS (SELECT DISTINCT table_id, file, bytes FROM r WHERE expired),
          |del AS (SELECT e.* FROM expf e LEFT JOIN live v
          |    ON e.table_id = v.table_id AND e.file = v.file
          |  WHERE v.file IS NULL),
          |sc AS (SELECT table_id, count(*) AS n_snapshots,
          |    CAST(sum(CASE WHEN expired THEN 1 ELSE 0 END) AS BIGINT) AS n_expired
          |  FROM flagged GROUP BY 1),
          |lc AS (SELECT table_id, count(*) AS n_live_files FROM live GROUP BY 1),
          |dc AS (SELECT table_id, count(*) AS n_deletable_files,
          |    CAST(sum(bytes) AS BIGINT) AS deletable_bytes FROM del GROUP BY 1)
          |SELECT sc.table_id, n_snapshots, n_expired,
          |  coalesce(n_live_files, 0) AS n_live_files,
          |  coalesce(n_deletable_files, 0) AS n_deletable_files,
          |  coalesce(deletable_bytes, 0) AS deletable_bytes
          |FROM sc LEFT JOIN lc ON sc.table_id = lc.table_id
          |LEFT JOIN dc ON sc.table_id = dc.table_id
          |ORDER BY sc.table_id""".stripMargin),
      doc = "Iceberg snapshot expiry: retain-current, expired-only reachability, GC census"),

    // RLS: authenticated user sees public buckets + own rows.
    "rls_scoped_listing" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val buckets = Seq(("F", true), ("O", false)).toDF("id", "public")
        Rls.scopedObjects(Tables.objects(s, dir), buckets,
          Rls.Context("authenticated", Some("user-7"), "read"))
          .groupBy(col("bucket_id")).agg(count(lit(1)).as("visible"))
          .orderBy(col("bucket_id"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT bucket_id, count(*) AS visible FROM objects
          |WHERE bucket_id = 'F' OR owner_id = 'user-7'
          |GROUP BY bucket_id ORDER BY bucket_id""".stripMargin)),
      doc = "RLS parameterized view (pg-connection.ts:65-74, rls_tests.yaml)"),

    // RLS, second policy×role×operation combination (rls_tests.yaml matrix):
    // UPDATE visibility for an authenticated user through the declarative
    // Policy engine — owner-scoped everywhere, plus an operation-gated policy
    // (storage.allow_only_operation = 'upload', rls_tests.yaml:70-82) that
    // opens bucket F during uploads. The OR-of-policies grant compiles to one
    // pushed-down filter; rows the user may update, censused per bucket.
    "rls_owner_scoped" -> Q(
      fn = (s, dir) => {
        val policies = Seq(
          Rls.Policy("owner_update", Set("authenticated"), "update",
            ctx => ctx.uid.map(col("owner_id") === _).getOrElse(lit(false))),
          Rls.Policy("upload_window_F", Set("authenticated"), "update",
            _ => col("bucket_id") === "F", operations = Set("upload")))
        Rls.visible(Tables.objects(s, dir), policies,
          Rls.Context("authenticated", Some("user-7"), "upload"), "update")
          .groupBy(col("bucket_id"))
          .agg(count(lit(1)).as("n_updatable"),
            sum(when(col("owner_id") === "user-7", 1L).otherwise(0L)).as("n_own"))
          .orderBy(col("bucket_id"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT bucket_id, count(*) AS n_updatable,
          |       CAST(sum(CASE WHEN owner_id = 'user-7' THEN 1 ELSE 0 END) AS BIGINT) AS n_own
          |FROM objects
          |WHERE owner_id = 'user-7' OR bucket_id = 'F'
          |GROUP BY bucket_id ORDER BY bucket_id""".stripMargin)),
      doc = "RLS owner-scoped UPDATE + operation-gated policy (rls_tests.yaml:70-82)"),

    // RLS, third graded slice of the policy×role×operation matrix
    // (rls_tests.yaml): one census row per (role, permission) cell under ONE
    // shared policy set — including the DENY cells (anon has no delete
    // policy → 0 rows; the reference's 403/empty-result path), and the
    // service_role bypass. Each cell is the same pushed-down-filter
    // compilation as rls_scoped_listing; the union is 4 tiny aggregates.
    "rls_matrix_census" -> Q(
      fn = (s, dir) => {
        val objects = Tables.objects(s, dir)
        val policies = Seq(
          Rls.Policy("read_public", Set("anon", "authenticated"), "select",
            _ => col("bucket_id") === "F"),
          Rls.Policy("read_own", Set("authenticated"), "select",
            ctx => ctx.uid.map(col("owner_id") === _).getOrElse(lit(false))),
          Rls.Policy("delete_own", Set("authenticated"), "delete",
            ctx => ctx.uid.map(col("owner_id") === _).getOrElse(lit(false))))
        def cell(role: String, uid: Option[String], perm: String) =
          Rls.visible(objects, policies, Rls.Context(role, uid, "storage"), perm)
            .agg(count(lit(1)).as("n_visible"))
            .select(lit(role).as("ctx_role"), lit(perm).as("perm"), col("n_visible"))
        cell("anon", None, "select")
          .unionByName(cell("anon", None, "delete"))
          .unionByName(cell("authenticated", Some("user-7"), "delete"))
          .unionByName(cell("service_role", None, "delete"))
          .orderBy(col("ctx_role"), col("perm"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT 'anon' AS ctx_role, 'delete' AS perm, CAST(0 AS BIGINT) AS n_visible
          |UNION ALL
          |SELECT 'anon', 'select', count(*) FROM objects WHERE bucket_id = 'F'
          |UNION ALL
          |SELECT 'authenticated', 'delete', count(*) FROM objects WHERE owner_id = 'user-7'
          |UNION ALL
          |SELECT 'service_role', 'delete', count(*) FROM objects
          |ORDER BY ctx_role, perm""".stripMargin)),
      doc = "RLS role×permission matrix census incl. anon delete-deny + service_role bypass (rls_tests.yaml)"),

    // RLS WITH CHECK in batch form (rls_tests.yaml write-violation asserts,
    // status 400): the rows of an insert batch the policy set REJECTS for
    // this context — owner must match the authenticated uid unless the
    // operation-gated upload policy opens bucket F. Violations censused per
    // bucket; `violations.nonEmpty` is the reference's "new row violates
    // row-level security policy".
    "rls_write_check" -> Q(
      fn = (s, dir) => {
        val batch = Tables.objects(s, dir)
          .filter(col("size").between(20000, 21000))
          .select(col("bucket_id"), col("name"), col("owner_id"))
        val policies = Seq(
          Rls.Policy("insert_own", Set("authenticated"), "insert",
            ctx => ctx.uid.map(col("owner_id") === _).getOrElse(lit(false))),
          Rls.Policy("upload_open_F", Set("authenticated"), "insert",
            _ => col("bucket_id") === "F", operations = Set("upload")))
        Rls.writeViolations(batch, policies,
          Rls.Context("authenticated", Some("user-7"), "upload"), "insert")
          .groupBy(col("bucket_id"))
          .agg(count(lit(1)).as("n_rejected"),
            countDistinct(col("owner_id")).as("n_owners"))
          .orderBy(col("bucket_id"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT bucket_id, count(*) AS n_rejected,
          |       count(DISTINCT owner_id) AS n_owners
          |FROM objects
          |WHERE size BETWEEN 20000 AND 21000
          |  AND NOT (owner_id = 'user-7' OR bucket_id = 'F')
          |GROUP BY bucket_id ORDER BY bucket_id""".stripMargin)),
      doc = "RLS WITH CHECK write-violation batch (Rls.writeViolations, rls_tests.yaml 400-path)"),

    // RLS, fourth matrix slice: authenticated CROSS-OWNER UPDATE-DENY.
    // Same policy set as rls_owner_scoped, but the request operation is
    // 'read', so the operation-gated upload window does NOT open bucket F —
    // the only grant left is owner match, and every cross-owner row of the
    // update batch violates (the reference's 403/"violates row-level
    // security policy" path for updates, rls_tests.yaml update cells).
    "rls_update_deny" -> Q(
      fn = (s, dir) => {
        val batch = Tables.objects(s, dir)
          .filter(col("size").between(30000, 31000))
          .select(col("bucket_id"), col("name"), col("owner_id"))
        val policies = Seq(
          Rls.Policy("owner_update", Set("authenticated"), "update",
            ctx => ctx.uid.map(col("owner_id") === _).getOrElse(lit(false))),
          Rls.Policy("upload_window_F", Set("authenticated"), "update",
            _ => col("bucket_id") === "F", operations = Set("upload")))
        Rls.writeViolations(batch, policies,
          Rls.Context("authenticated", Some("user-7"), "read"), "update")
          .groupBy(col("bucket_id"))
          .agg(count(lit(1)).as("n_denied"),
            countDistinct(col("owner_id")).as("n_owners"))
          .orderBy(col("bucket_id"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT bucket_id, count(*) AS n_denied,
          |       count(DISTINCT owner_id) AS n_owners
          |FROM objects
          |WHERE size BETWEEN 30000 AND 31000 AND owner_id <> 'user-7'
          |GROUP BY bucket_id ORDER BY bucket_id""".stripMargin)),
      doc = "RLS cross-owner UPDATE-DENY: operation gate closed, owner grant only (rls_tests.yaml)"),

    // RLS, fifth matrix slice: the SERVICE-ROLE DELETE-BYPASS as an
    // operation, not just a visibility census — the same delete batch
    // evaluated under the authenticated owner policy (cross-owner rows
    // rejected) and under service_role (writeViolations short-circuits to
    // empty: the reference's superuser connection skips RLS entirely).
    "rls_delete_bypass" -> Q(
      fn = (s, dir) => {
        val batch = Tables.objects(s, dir)
          .filter(col("size").between(15000, 15500))
          .select(col("bucket_id"), col("name"), col("owner_id"))
        val policies = Seq(
          Rls.Policy("delete_own", Set("authenticated"), "delete",
            ctx => ctx.uid.map(col("owner_id") === _).getOrElse(lit(false))))
        def cell(role: String, uid: Option[String]) =
          Rls.writeViolations(batch, policies,
              Rls.Context(role, uid, "storage"), "delete")
            .agg(count(lit(1)).as("n_rejected"))
            .select(lit(role).as("ctx_role"), col("n_rejected"))
        cell("authenticated", Some("user-7"))
          .unionByName(cell("service_role", None))
          .orderBy(col("ctx_role"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT 'authenticated' AS ctx_role, count(*) AS n_rejected
          |FROM objects
          |WHERE size BETWEEN 15000 AND 15500 AND owner_id <> 'user-7'
          |UNION ALL
          |SELECT 'service_role', CAST(0 AS BIGINT)
          |ORDER BY ctx_role""".stripMargin)),
      doc = "RLS service_role delete-bypass vs authenticated owner-scoped delete (rls_tests.yaml)"),

    // RLS, sixth matrix slice: the CONTENT-POLICY battery — the three WITH
    // CHECK shapes rls_tests.yaml attaches beyond owner match, each evaluated
    // alone (the yaml's one-policy-per-test design) plus the OR-combined
    // grant: jsonb-field equality (insert_with_metadata_check,
    // rls_tests.yaml:50-54), a mimetype LIKE class (insert_only_images,
    // :56-60), and a numeric threshold (insert_max_size_limit, :62-66).
    // NULL user_metadata must DENY (jsonb ->> on NULL is NULL → policy
    // false), which Rls.grant's coalesce(pred, false) pins.
    "rls_content_policies" -> Q(
      fn = (s, dir) => {
        val batch = Tables.objects(s, dir)
          .filter(col("size").between(40000, 41000))
          .select(col("name"), col("mimetype"), col("size"), col("user_metadata"))
        val goldTier = Rls.Policy("insert_gold_tier", Set("authenticated"), "insert",
          _ => get_json_object(col("user_metadata"), "$.tier") === "gold")
        val onlyImages = Rls.Policy("insert_only_images", Set("authenticated"), "insert",
          _ => col("mimetype").startsWith("image/"))
        val maxSize = Rls.Policy("insert_max_size", Set("authenticated"), "insert",
          _ => col("size") <= 40500L)
        val ctx = Rls.Context("authenticated", Some("user-7"), "upload")
        def cell(label: String, ps: Seq[Rls.Policy]) =
          Rls.writeViolations(batch, ps, ctx, "insert")
            .agg(count(lit(1)).as("n_rejected"))
            .select(lit(label).as("policy"), col("n_rejected"))
        cell("any_policy", Seq(goldTier, onlyImages, maxSize))
          .unionByName(cell("insert_gold_tier", Seq(goldTier)))
          .unionByName(cell("insert_only_images", Seq(onlyImages)))
          .unionByName(cell("insert_max_size", Seq(maxSize)))
          .orderBy(col("policy"))
      },
      oracle = Some(Oracle.withObjects(
        """, batch AS (SELECT name, mimetype, size, user_metadata
          |  FROM objects WHERE size BETWEEN 40000 AND 41000)
          |SELECT 'any_policy' AS policy, count(*) AS n_rejected FROM batch
          |WHERE NOT (coalesce(json_extract_string(user_metadata, '$.tier') = 'gold', FALSE)
          |           OR mimetype LIKE 'image/%' OR size <= 40500)
          |UNION ALL
          |SELECT 'insert_gold_tier', count(*) FROM batch
          |WHERE NOT coalesce(json_extract_string(user_metadata, '$.tier') = 'gold', FALSE)
          |UNION ALL
          |SELECT 'insert_only_images', count(*) FROM batch
          |WHERE NOT (mimetype LIKE 'image/%')
          |UNION ALL
          |SELECT 'insert_max_size', count(*) FROM batch WHERE NOT (size <= 40500)
          |ORDER BY policy""".stripMargin)),
      doc = "RLS WITH CHECK content battery: jsonb field / mime class / size cap (rls_tests.yaml:50-66)"),

    // RLS, seventh matrix slice: OPERATION GATES — allow_only_operation
    // (single-op set, rls_tests.yaml:72) vs allow_any_operation (multi-op
    // set, :78), probed under three request operations. The delete-op row is
    // the both-gates-closed DENY cell (no applicable policy → empty grant).
    "rls_operation_gates" -> Q(
      fn = (s, dir) => {
        val objects = Tables.objects(s, dir)
        val policies = Seq(
          Rls.Policy("list_only_own", Set("authenticated"), "select",
            ctx => ctx.uid.map(col("owner_id") === _).getOrElse(lit(false)),
            operations = Set("object.list")),
          Rls.Policy("list_or_get_F", Set("authenticated"), "select",
            _ => col("bucket_id") === "F",
            operations = Set("object.list", "object.get_authenticated")))
        def cell(op: String) =
          Rls.visible(objects, policies,
              Rls.Context("authenticated", Some("user-7"), op), "select")
            .agg(count(lit(1)).as("n_visible"))
            .select(lit(op).as("op_name"), col("n_visible"))
        cell("object.list")
          .unionByName(cell("object.get_authenticated"))
          .unionByName(cell("object.delete"))
          .orderBy(col("op_name"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT 'object.list' AS op_name, count(*) AS n_visible FROM objects
          |WHERE owner_id = 'user-7' OR bucket_id = 'F'
          |UNION ALL
          |SELECT 'object.get_authenticated', count(*) FROM objects WHERE bucket_id = 'F'
          |UNION ALL
          |SELECT 'object.delete', CAST(0 AS BIGINT)
          |ORDER BY op_name""".stripMargin)),
      doc = "RLS allow_only vs allow_any operation gates incl. the closed-gate DENY cell (rls_tests.yaml:70-82)"),

    // P10 MIME wildcard validation as a bulk predicate.
    "p10_mime_validation" -> Q(
      fn = (s, dir) => Tables.objects(s, dir)
        .filter(Validators.mimeAllowedCol(col("mimetype"),
          typedLit(Seq("text/*", "application/json"))))
        .groupBy(col("mimetype")).agg(count(lit(1)).as("n"))
        .orderBy(col("mimetype")),
      oracle = Some(Oracle.withObjects(
        """SELECT mimetype, count(*) AS n FROM objects
          |WHERE mimetype LIKE 'text/%' OR mimetype = 'application/json'
          |GROUP BY mimetype ORDER BY mimetype""".stripMargin)),
      doc = "P10 allowed_mime_types incl. type/* wildcards (uploader.ts:305-332)"),

    // P9+P10+size-limit upload admission battery in one row-local pass —
    // the uploader's pre-write checks (uploader.ts:305-332, limits.ts:93-118,
    // 146-170) as bulk flags. Per-bucket size limits come from the
    // reference's "<n><unit>" config strings, parsed driver-side by
    // parseFileSizeToBytes (3-significant-digit semantics spec-tested) and
    // embedded as literals — exactly how the reference resolves config
    // before the row loop.
    "p9_upload_admission" -> Q(
      fn = (s, dir) => {
        val limitF = Validators.parseFileSizeToBytes("60.5kb").get
        val limitO = Validators.parseFileSizeToBytes("0.058mb").get
        val limit = when(col("bucket_id") === "F", lit(limitF)).otherwise(lit(limitO))
        Tables.objects(s, dir)
          .withColumn("f_key", Validators.isValidKey(col("name")))
          .withColumn("f_mime", Validators.mimeAllowedCol(col("mimetype"),
            typedLit(Seq("text/*", "image/png"))))
          .withColumn("f_size", col("size") <= limit)
          .groupBy(col("bucket_id"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("f_key") && col("f_mime") && col("f_size"), 1L)
              .otherwise(0L)).as("n_admitted"),
            sum(when(!col("f_mime"), 1L).otherwise(0L)).as("n_bad_mime"),
            sum(when(!col("f_size"), 1L).otherwise(0L)).as("n_oversize"))
          .orderBy(col("bucket_id"))
      },
      oracle = Some(Oracle.withObjects(
        """, flags AS (SELECT bucket_id,
          |    name != '.' AND name != '..' AND length(name) BETWEEN 1 AND 1024
          |      AND NOT regexp_matches(name, '[\x00-\x1f]')
          |      AND NOT starts_with(name, '/') AND NOT contains(name, '//') AS f_key,
          |    mimetype LIKE 'text/%' OR mimetype = 'image/png' AS f_mime,
          |    size <= CASE WHEN bucket_id = 'F' THEN 60500 ELSE 58000 END AS f_size
          |  FROM objects)
          |SELECT bucket_id, count(*) AS n,
          |  CAST(sum(CASE WHEN f_key AND f_mime AND f_size THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
          |  CAST(sum(CASE WHEN NOT f_mime THEN 1 ELSE 0 END) AS BIGINT) AS n_bad_mime,
          |  CAST(sum(CASE WHEN NOT f_size THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize
          |FROM flags GROUP BY bucket_id ORDER BY bucket_id""".stripMargin)),
      doc = "P9/P10/size upload admission battery (uploader.ts pre-write checks)"),

    // S3 wire shape: ListBucketResult projection over the delimiter listing.
    "s3_list_bucket_result" -> Q(
      fn = (s, dir) => S3Response.listBucketResult(
        operators.Listing.listObjectsV2(Tables.objects(s, dir), "F", "R/", Some("/"), None, 100)),
      oracle = Some {
        val inner = QueriesCore.listV2Sql("F", "R/", 100, None)
        s"""SELECT CASE WHEN is_folder THEN name END AS common_prefix,
           |  CASE WHEN NOT is_folder THEN name END AS key,
           |  CASE WHEN NOT is_folder THEN created_at END AS last_modified,
           |  CASE WHEN NOT is_folder THEN size END AS content_length,
           |  CASE WHEN NOT is_folder THEN md5(name) END AS etag
           |FROM ($inner) t""".stripMargin
      },
      doc = "S3 ListBucketResult shaping (s3-handler.ts:204-276)"),

    // ListMultipartUploads (uploads synthesized from orders).
    "s3_list_uploads" -> Q(
      fn = (s, dir) => {
        val uploads = Tables.orders(s, dir).select(
          concat(lit("O/"), col("o_orderkey"), lit(".bin")).as("key"),
          concat(lit("upload-"), col("o_orderkey")).as("upload_id"),
          col("o_orderdate").as("created_at"))
          .filter(col("key").startsWith("O/1"))
        S3Response.listUploadsResult(uploads, 200)
      },
      oracle = Some(
        """SELECT concat('O/', o_orderkey, '.bin') AS key,
          |  concat('upload-', o_orderkey) AS upload_id,
          |  o_orderdate AS initiated
          |FROM orders WHERE concat('O/', o_orderkey, '.bin') LIKE 'O/1%'
          |ORDER BY key, upload_id LIMIT 200""".stripMargin),
      doc = "ListMultipartUploads shape (s3-handler.ts:290-293)"),

    // S4 object-byte analytics: a REAL distributed byte scan. The documents
    // corpus is materialized as a blob tree (one file per doc, executor-side
    // writes), read back via `binaryFile`, and per-object byte work runs as
    // codegen'd expressions: md5(content) is S3's single-part ETag
    // (headObject, backend/adapter.ts:79-110), and two Range headers —
    // `bytes=100-199` and the suffix form `bytes=-50` — resolve per object
    // exactly as range.ts:9-56 (NULL = 416 unsatisfiable). The oracle never
    // sees the files: it recomputes every column from `documents.text`,
    // which certifies the write→scan→digest round trip byte-for-byte.
    "s4_blob_etag_scan" -> Q(
      fn = (s, dir) => {
        val root = graft.sources.BlobStore.ensureBlobTree(s, dir)
        graft.sources.BlobStore.byteScan(s, root)
          .withColumn("mid_start", when(col("size") > 100, lit(100L)))
          .withColumn("mid_end", when(col("size") > 100, least(lit(199L), col("size") - 1)))
          .withColumn("tail_start", greatest(col("size") - 50, lit(0L)))
          .withColumn("tail_len", col("size") - greatest(col("size") - 50, lit(0L)))
          .orderBy(col("doc_id"))
      },
      oracle = Some(
        """SELECT doc_id, octet_length(encode(text)) AS size, md5(text) AS etag,
          |  CASE WHEN octet_length(encode(text)) > 100 THEN CAST(100 AS BIGINT) END AS mid_start,
          |  CASE WHEN octet_length(encode(text)) > 100
          |       THEN least(CAST(199 AS BIGINT), octet_length(encode(text)) - 1) END AS mid_end,
          |  greatest(octet_length(encode(text)) - 50, 0) AS tail_start,
          |  octet_length(encode(text)) - greatest(octet_length(encode(text)) - 50, 0) AS tail_len
          |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "S4 distributed byte scan: binaryFile ETag digests + bulk Range resolution (adapter.ts:79-249, range.ts:9-56)"),

    // S4/D11: the S3 COMPOSITE multipart ETag — md5 over the ordered part
    // digests plus a `-<n>` part-count suffix (CompleteMultipartUpload,
    // s3-handler.ts + uploader.ts finalize). Digest concatenation is over
    // the hex forms (portable across both engines; S3 proper concatenates
    // raw digest bytes — same structure, different alphabet). Duplicate
    // (upload, part_number) fixture rows carry identical etags, so the
    // ordered concat is tie-insensitive and deterministic.
    "s4_multipart_etag" -> Q(
      fn = (s, dir) => Tables.multipartParts(s, dir)
        .groupBy(col("upload_id"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("size")).as("total_bytes"),
          expr("md5(array_join(transform(array_sort(collect_list(struct(part_number, etag))), p -> p.etag), ''))").as("digest"))
        .filter(col("n_parts") >= 6)
        .select(col("upload_id"), col("n_parts"), col("total_bytes"),
          concat(col("digest"), lit("-"), col("n_parts")).as("composite_etag"))
        .orderBy(col("upload_id")),
      oracle = Some(Oracle.withParts(
        """SELECT upload_id, count(*) AS n_parts, CAST(sum(size) AS BIGINT) AS total_bytes,
          |  concat(md5(string_agg(etag, '' ORDER BY part_number, etag)), '-', count(*)) AS composite_etag
          |FROM parts GROUP BY upload_id HAVING count(*) >= 6
          |ORDER BY upload_id""".stripMargin)),
      doc = "S4 composite multipart ETag: ordered part-digest md5 + -n suffix (CompleteMultipartUpload)"),

    // RLS, seventh matrix slice: COMPOUND operations — the yaml's
    // move/copy/upsert cells (rls_tests.yaml:440-521) where an operation
    // needs a CONJUNCTION of permissions: move = select+update, copy =
    // select+insert, upsert = insert+update, delete = delete. Policy set
    // grants read_all + update_own + insert_all and NO delete, so copy
    // always passes, move/upsert pass only on owned rows, delete never does
    // — and the error string differs by failure mode exactly as the
    // reference's: RLS-filtered deletes read as "Object not found" (empty
    // RETURNING), failed write checks as the 42501 policy violation.
    "rls_compound_ops" -> Q(
      fn = (s, dir) => {
        val ctx = Rls.Context("authenticated", Some("user-7"), "storage")
        val policies = Seq(
          Rls.Policy("read_all", Set("authenticated"), "select", _ => lit(true)),
          Rls.Policy("update_own", Set("authenticated"), "update",
            c => c.uid.map(col("owner_id") === _).getOrElse(lit(false))),
          Rls.Policy("insert_all", Set("authenticated"), "insert", _ => lit(true)))
        def canP(p: String) = Rls.can(policies, ctx, p)
        val reqs = Tables.objects(s, dir)
          .filter(col("size").between(60000, 61000))
          .select(col("bucket_id"), col("name"), col("owner_id"),
            element_at(array(lit("move"), lit("copy"), lit("delete"), lit("upsert")),
              (col("size") % 4 + 1).cast("int")).as("op"))
        reqs
          .withColumn("allowed",
            when(col("op") === "move", canP("select") && canP("update"))
              .when(col("op") === "copy", canP("select") && canP("insert"))
              .when(col("op") === "upsert", canP("insert") && canP("update"))
              .otherwise(canP("delete")))
          .withColumn("status", when(col("allowed"), 200L).otherwise(400L))
          .withColumn("error",
            when(col("allowed"), lit(null).cast("string"))
              .when(col("op") === "delete", lit("Object not found"))
              .otherwise(lit("new row violates row-level security policy")))
          .groupBy(col("op"), col("status"), col("error"))
          .agg(count(lit(1)).as("n"), countDistinct(col("owner_id")).as("n_owners"))
          .orderBy(col("op"), col("status"))
      },
      oracle = Some(Oracle.withObjects(
        """, reqs AS (
          |  SELECT owner_id,
          |    ['move','copy','delete','upsert'][CAST(size % 4 AS INTEGER) + 1] AS op,
          |    owner_id = 'user-7' AS owned
          |  FROM objects WHERE size BETWEEN 60000 AND 61000),
          |graded AS (
          |  SELECT op, owner_id,
          |    CASE WHEN op = 'move' THEN owned
          |         WHEN op = 'copy' THEN TRUE
          |         WHEN op = 'upsert' THEN owned
          |         ELSE FALSE END AS allowed
          |  FROM reqs)
          |SELECT op, CAST(CASE WHEN allowed THEN 200 ELSE 400 END AS BIGINT) AS status,
          |  CASE WHEN allowed THEN NULL
          |       WHEN op = 'delete' THEN 'Object not found'
          |       ELSE 'new row violates row-level security policy' END AS error,
          |  count(*) AS n, count(DISTINCT owner_id) AS n_owners
          |FROM graded GROUP BY op, status, error ORDER BY op, status""".stripMargin)),
      doc = "RLS compound operations: move/copy/upsert permission conjunctions (rls_tests.yaml:440-521)"),

    // RLS, eighth matrix slice: the bucket.empty gate
    // (rls_tests.yaml:185-196) — emptying a bucket is a bulk delete that
    // only touches RLS-visible rows; with no delete grant the RETURNING set
    // is empty and the reference reports 400 "Object not found". With an
    // owner-scoped delete policy the outcome is per-bucket: all rows
    // deletable → emptied, none → the yaml's 400, some → partial (the API
    // deletes what it may and the bucket stays non-empty).
    "rls_empty_bucket_gate" -> Q(
      fn = (s, dir) => {
        val ctx = Rls.Context("authenticated", Some("user-7"), "storage")
        val policies = Seq(
          Rls.Policy("delete_own", Set("authenticated"), "delete",
            c => c.uid.map(col("owner_id") === _).getOrElse(lit(false))))
        Tables.objects(s, dir)
          .filter(col("size").between(70000, 72000))
          .withColumn("deletable", Rls.can(policies, ctx, "delete"))
          .groupBy(col("bucket_id"))
          .agg(count(lit(1)).as("n_objects"),
            sum(when(col("deletable"), 1L).otherwise(0L)).as("n_deletable"))
          .withColumn("outcome",
            when(col("n_deletable") === 0, lit("400 Object not found"))
              .when(col("n_deletable") === col("n_objects"), lit("200 emptied"))
              .otherwise(lit("206 partial")))
          .orderBy(col("bucket_id"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT bucket_id, count(*) AS n_objects,
          |  CAST(sum(CASE WHEN owner_id = 'user-7' THEN 1 ELSE 0 END) AS BIGINT) AS n_deletable,
          |  CASE WHEN sum(CASE WHEN owner_id = 'user-7' THEN 1 ELSE 0 END) = 0
          |       THEN '400 Object not found'
          |       WHEN sum(CASE WHEN owner_id = 'user-7' THEN 1 ELSE 0 END) = count(*)
          |       THEN '200 emptied' ELSE '206 partial' END AS outcome
          |FROM objects WHERE size BETWEEN 70000 AND 72000
          |GROUP BY bucket_id ORDER BY bucket_id""".stripMargin)),
      doc = "RLS bucket.empty gate: delete-scoped bulk delete outcomes (rls_tests.yaml:185-196)"),

    // W2 skip-scan peek, declarative twin: what the reference's repeated
    // ORDER BY name LIMIT 1 seek loop (0050:228-316) RETURNS — each folder
    // with its peeked minimum key. min(name) combines map-side, so the
    // shuffle carries one row per folder at any scale. The faithful seek
    // loop itself is Listing.skipScanFolders (SkipScanSpec pins loop ≡ this).
    "w2_skipscan_folders" -> Q(
      fn = (s, dir) => Listing.foldersPeek(Tables.objects(s, dir), "F", "R/"),
      oracle = Some(Oracle.withObjects(
        """, scoped AS (SELECT name FROM objects WHERE bucket_id = 'F' AND name LIKE 'R/%'),
          |wcp AS (SELECT name, CASE WHEN strpos(substr(name, 3), '/') > 0
          |  THEN concat('R/', substr(substr(name, 3), 1, strpos(substr(name, 3), '/')))
          |  ELSE NULL END AS cp FROM scoped)
          |SELECT cp AS folder, min(name) AS first_key, count(*) AS n_entries
          |FROM wcp WHERE cp IS NOT NULL GROUP BY cp ORDER BY folder""".stripMargin)),
      doc = "W2 skip-scan peek: first-key-per-folder relation (0050:228-316)"),

    // D8 advisory-lock grant schedule: the reference's concurrency machinery
    // (pg_try/pg_advisory_xact_lock keyed by hashStringToInt, pg.ts:1255-1422)
    // as an auditable relation. Lock requests synthesized one per lineitem on
    // the object's FOLDER key (bucket/flag/orderkey — multiple lines per
    // order contend for the same lock, queue depth 1-7). The DJB2-uint32 key
    // kernel (string-to-int.ts:1-9) is graded bit-for-bit; FIFO order and
    // try-lock outcomes fall out of one window per lock key.
    "d8_lock_schedule" -> Q(
      fn = (s, dir) => {
        val reqs = Tables.lineitem(s, dir).select(
          concat(col("l_linestatus"), lit("/"), col("l_returnflag"), lit("/"),
            col("l_orderkey")).as("key_str"),
          col("l_shipdate").as("ts"),
          concat(lit("user-"), col("l_suppkey") % 50).as("requester"),
          col("l_linenumber").as("seq"))
        Locks.schedule(reqs, Seq(col("key_str"), col("seq"), col("requester")))
          .withColumn("n_q", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("lock_key"))))
          .filter(col("n_q") >= 5)
          .select(col("lock_key"), col("key_str"), col("requester"),
            col("grant_order").cast("long").as("grant_order"),
            col("try_acquired"), col("wait_ahead").cast("long").as("wait_ahead"))
          .orderBy(col("lock_key"), col("grant_order"))
      },
      oracle = Some(
        """WITH reqs AS (
          |  SELECT concat(l_linestatus, '/', l_returnflag, '/', l_orderkey) AS key_str,
          |    l_shipdate AS ts, concat('user-', l_suppkey % 50) AS requester,
          |    l_linenumber AS seq
          |  FROM lineitem),
          |hashed AS (
          |  SELECT *, list_reduce(
          |    list_prepend(CAST(5381 AS BIGINT),
          |      [CAST(unicode(x) AS BIGINT) for x in string_split(key_str, '')]),
          |    (h, c) -> xor((h * 33) % 4294967296, c)) AS lock_key
          |  FROM reqs),
          |sched AS (
          |  SELECT lock_key, key_str, requester,
          |    row_number() OVER (PARTITION BY lock_key
          |      ORDER BY ts, key_str, seq, requester) AS grant_order,
          |    count(*) OVER (PARTITION BY lock_key) AS n_q
          |  FROM hashed)
          |SELECT lock_key, key_str, requester,
          |  CAST(grant_order AS BIGINT) AS grant_order,
          |  grant_order = 1 AS try_acquired,
          |  CAST(grant_order - 1 AS BIGINT) AS wait_ahead
          |FROM sched WHERE n_q >= 5 ORDER BY lock_key, grant_order""".stripMargin),
      doc = "D8 advisory locks as batch grant schedule; DJB2-uint32 key kernel graded (pg.ts:1255-1422)"),

    // D9 delete-protection trigger (0055-prevent-direct-deletes.sql): a
    // delete-request log partitioned into executed (API-layer, GUC set) vs
    // blocked (direct SQL, ERRCODE 42501). Pure projection — the trigger is
    // a row-local predicate; the expensive delete stays the D4 anti-join.
    "d9_delete_protection" -> Q(
      fn = (s, dir) => {
        val reqs = Tables.objects(s, dir)
          .filter(col("bucket_id") === "F" && col("size").between(50000, 52000))
          .select(col("bucket_id"), col("name"),
            (col("size") % 2 === 0).as("allow_delete_query"))
        ObjectStore.protectDeletes(reqs)
          .select(col("bucket_id"), col("name"), col("disposition"), col("error_code"))
          .orderBy(col("name"))
      },
      oracle = Some(Oracle.withObjects(
        """, reqs AS (SELECT bucket_id, name, size % 2 = 0 AS allow
          |  FROM objects WHERE bucket_id = 'F' AND size BETWEEN 50000 AND 52000)
          |SELECT bucket_id, name,
          |  CASE WHEN allow THEN 'executed' ELSE 'blocked' END AS disposition,
          |  CASE WHEN NOT allow THEN '42501' END AS error_code
          |FROM reqs ORDER BY name""".stripMargin)),
      doc = "D9 delete-protection trigger as request disposition (0055:1-27)"),

    // D10 prefix-hierarchy trigger maintenance (0026:113-169): the cascade's
    // fixed point as a batch delta. Deleting every depth-3 item of orders
    // ≡3 (mod 10) empties their level-2 folders (op=delete rows); inserting
    // two keys under a brand-new Z/ tree creates three prefixes (op=insert).
    "d10_prefix_maintenance" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val before = Tables.objects(s, dir).filter(col("bucket_id") === "F")
          .select(col("bucket_id"), col("name"))
        val doomed = before.filter(
          size(split(col("name"), "/")) === 3 &&
            element_at(split(col("name"), "/"), 2).cast("long") % 10 === 3)
        val inserted = Seq(("F", "Z/new/deep/file.dat"), ("F", "Z/new/other.dat"))
          .toDF("bucket_id", "name")
        val after = before.join(doomed, Seq("bucket_id", "name"), "left_anti")
          .unionByName(inserted)
        // mutation-proportional delta (≡ prefixDelta(before, after) — the
        // full-diff equivalence is PrefixIndexSpec-pinned; at 100 TB the
        // full diff re-explodes the whole corpus twice per batch)
        PrefixIndex.prefixDeltaIncremental(before, after, doomed, inserted)
          .orderBy(col("op"), col("bucket_id"), col("prefix"))
      },
      oracle = Some(Oracle.withObjects(
        """, before_rel AS (SELECT bucket_id, name FROM objects WHERE bucket_id = 'F'),
          |doomed AS (SELECT bucket_id, name FROM before_rel
          |  WHERE len(string_split(name, '/')) = 3
          |    AND TRY_CAST(string_split(name, '/')[2] AS BIGINT) % 10 = 3),
          |after_rel AS (
          |  SELECT b.bucket_id, b.name FROM before_rel b
          |  WHERE NOT EXISTS (SELECT 1 FROM doomed d
          |    WHERE d.bucket_id = b.bucket_id AND d.name = b.name)
          |  UNION ALL SELECT 'F', 'Z/new/deep/file.dat'
          |  UNION ALL SELECT 'F', 'Z/new/other.dat'),
          |pb AS (SELECT DISTINCT bucket_id, array_to_string(parts[1:i], '/') AS prefix,
          |    CAST(i AS BIGINT) AS level
          |  FROM (SELECT bucket_id, parts,
          |      unnest(generate_series(1, len(parts) - 1)) AS i
          |    FROM (SELECT bucket_id, string_split(name, '/') AS parts FROM before_rel))),
          |pa AS (SELECT DISTINCT bucket_id, array_to_string(parts[1:i], '/') AS prefix,
          |    CAST(i AS BIGINT) AS level
          |  FROM (SELECT bucket_id, parts,
          |      unnest(generate_series(1, len(parts) - 1)) AS i
          |    FROM (SELECT bucket_id, string_split(name, '/') AS parts FROM after_rel)))
          |SELECT bucket_id, prefix, level, op FROM (
          |  SELECT b.*, 'delete' AS op FROM pb b
          |  WHERE NOT EXISTS (SELECT 1 FROM pa a
          |    WHERE a.bucket_id = b.bucket_id AND a.prefix = b.prefix)
          |  UNION ALL
          |  SELECT a.*, 'insert' AS op FROM pa a
          |  WHERE NOT EXISTS (SELECT 1 FROM pb b
          |    WHERE b.bucket_id = a.bucket_id AND b.prefix = a.prefix))
          |ORDER BY op, bucket_id, prefix""".stripMargin)),
      doc = "D10 prefix triggers as derived-fixed-point delta (0026:26-169)"),

    // D12 TUS resumable upload: the offset-tracked append log replayed to
    // terminal state. Faults injected at part 3 of orders ≡0 (mod 13)
    // (declared offset +7 — the 409 class), declared length padded +100 for
    // orders ≡0 (mod 17) (still-resumable class), so all three terminal
    // states appear and every number is exact integer arithmetic.
    "d12_tus_resume" -> Q(
      fn = (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("upload_id")).orderBy(col("part_number"))
        val prior = w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val per = org.apache.spark.sql.expressions.Window.partitionBy(col("upload_id"))
        val appends = Tables.multipartParts(s, dir)
          // the parts fixture carries ~20% duplicate (upload, part) rows by
          // construction; a TUS stream has one append per offset
          .groupBy(col("upload_id"), col("part_number"))
          .agg(min(col("size")).as("size"))
          .withColumn("seq", col("part_number"))
          .withColumn("clean", coalesce(sum(col("size")).over(prior), lit(0L)))
          .withColumn("okey", expr("CAST(substr(upload_id, 8) AS BIGINT)"))
          .withColumn("declared_offset", col("clean") +
            when(col("okey") % 13 === 0 && col("part_number") === 3, lit(7L))
              .otherwise(lit(0L)))
          .withColumn("upload_length", sum(col("size")).over(per) +
            when(col("okey") % 17 === 0, lit(100L)).otherwise(lit(0L)))
          .drop("clean", "okey", "part_number")
        Tus.replay(appends)
          .select(col("upload_id"), col("upload_length"), col("committed_offset"),
            col("n_appends"), col("n_accepted"), col("n_rejected"), col("status"))
          .orderBy(col("upload_id"))
      },
      oracle = Some(Oracle.withParts(
        """, dedup AS (SELECT upload_id, part_number, min(size) AS size
          |  FROM parts GROUP BY upload_id, part_number),
          |base AS (SELECT upload_id, part_number, size,
          |    CAST(coalesce(sum(size) OVER (PARTITION BY upload_id ORDER BY part_number
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS clean,
          |    CAST(substr(upload_id, 8) AS BIGINT) AS okey,
          |    CAST(sum(size) OVER (PARTITION BY upload_id) AS BIGINT) AS total
          |  FROM dedup),
          |app AS (SELECT upload_id, part_number AS seq, size, clean,
          |    clean + CASE WHEN okey % 13 = 0 AND part_number = 3 THEN 7 ELSE 0 END AS declared_offset,
          |    total + CASE WHEN okey % 17 = 0 THEN 100 ELSE 0 END AS upload_length
          |  FROM base),
          |flagged AS (SELECT *,
          |    min(CASE WHEN declared_offset <> clean THEN seq END)
          |      OVER (PARTITION BY upload_id) AS first_fault
          |  FROM app),
          |acc AS (SELECT *, (first_fault IS NULL OR seq < first_fault) AS accepted
          |  FROM flagged)
          |SELECT upload_id, CAST(upload_length AS BIGINT) AS upload_length,
          |  CAST(sum(CASE WHEN accepted THEN size ELSE 0 END) AS BIGINT) AS committed_offset,
          |  count(*) AS n_appends,
          |  CAST(sum(CASE WHEN accepted THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
          |  CAST(sum(CASE WHEN NOT accepted THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected,
          |  CASE WHEN sum(CASE WHEN NOT accepted THEN 1 ELSE 0 END) > 0 THEN 'conflict'
          |       WHEN CAST(sum(CASE WHEN accepted THEN size ELSE 0 END) AS BIGINT) = upload_length
          |       THEN 'complete' ELSE 'active' END AS status
          |FROM acc GROUP BY upload_id, upload_length ORDER BY upload_id""".stripMargin)),
      doc = "D12 TUS resumable append log replayed to terminal state (protocols/tus/file-store.ts, upload-id.ts)"))
}
