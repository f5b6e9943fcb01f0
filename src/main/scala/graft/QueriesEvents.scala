package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream queries (SURVEY §2.9) in their batch form — the streaming
  * twins (readStream + watermark + dropDuplicates/foreachBatch) live in
  * graft.streaming and are exercised by StreamingSpec; these entries pin the
  * *semantics* against the oracle. `ts` is µs-truncated on both sides
  * (Tables.events / CAST(ts AS TIMESTAMP)).
  */
object QueriesEvents {

  def queries: Map[String, Q] = Map(

    // E2 singleton-key dedup: keep the earliest event per (user, type) —
    // pg-boss `singletonKey` suppression (event.ts:13) in batch form.
    "e2_singleton_dedup" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
          .orderBy(col("user_id"), col("event_type"))
      },
      oracle = Some(
        """SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts FROM (
          |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
          |    ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
          |  FROM events) t
          |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin),
      doc = "E2 singletonKey dedup (event.ts:13)"),

    // Tumbling-window aggregation (1h) — the batch twin of the streaming
    // windowed agg; DECIMAL-cast sum for cross-engine determinism.
    "e_hourly_agg" -> Q(
      fn = (s, dir) => Tables.events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(30, 6))).cast("double").as("total_value"))
        .orderBy(col("hour"), col("event_type")),
      oracle = Some(
        """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
          |  count(*) AS n,
          |  CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
          |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
      doc = "windowed agg (streaming twin: graft.streaming)"),

    // Gap-timeout sessionization (30 min): the event-stream structuring
    // step before per-session features, and the batch twin of Structured
    // Streaming's session windows. One keyed window pass (lag flags a
    // session start, a running sum numbers it — O(1) state, hot users are
    // scan-bound) + one combinable groupBy for the census. Tie-safe by
    // construction: at most one row of an equal-ts group opens a session,
    // so session_no is identical under any tie order.
    "t_sessionize" -> Q(
      fn = (s, dir) =>
        operators.Temporal.sessionStats(
          Tables.events(s, dir).select(col("user_id"), col("ts")),
          "user_id", "ts", 1800L)
          .orderBy(col("user_id"), col("session_no")),
      oracle = Some(
        """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
          |l AS (SELECT user_id, ts,
          |        lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts FROM e),
          |f AS (SELECT user_id, ts, CASE WHEN pts IS NULL
          |        OR epoch_us(ts) - epoch_us(pts) > 1800000000 THEN 1 ELSE 0 END AS nf
          |      FROM l),
          |s AS (SELECT user_id, ts, CAST(sum(nf) OVER (
          |        PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT)
          |        AS session_no FROM f)
          |SELECT user_id, session_no, count(*) AS n_events,
          |       min(ts) AS session_start, max(ts) AS session_end,
          |       (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS span_sec
          |FROM s GROUP BY user_id, session_no
          |ORDER BY user_id, session_no""".stripMargin),
      doc = "gap-timeout sessionization + per-session census (batch twin of session windows)"),

    // Ordered-funnel census (view → click → purchase, each stage strictly
    // after the user's first qualifying hit of the previous one) — the
    // MATCH_RECOGNIZE / windowFunnel query as K shrinking filter+join+min
    // passes: no event-list collection, single-timestamp state per user.
    "e_funnel" -> Q(
      fn = (s, dir) => graft.operators.Funnel.census(Tables.events(s, dir),
          "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
        .orderBy(col("stage_no")),
      oracle = Some(
        """WITH s1 AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t FROM events
          |            WHERE event_type = 'view' GROUP BY user_id),
          |s2 AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t FROM events e
          |       JOIN s1 ON e.user_id = s1.user_id
          |       WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t
          |       GROUP BY e.user_id),
          |s3 AS (SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t FROM events e
          |       JOIN s2 ON e.user_id = s2.user_id
          |       WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t
          |       GROUP BY e.user_id)
          |SELECT 1 AS stage_no, 'view' AS stage, count(*) AS n_users FROM s1
          |UNION ALL SELECT 2, 'click', count(*) FROM s2
          |UNION ALL SELECT 3, 'purchase', count(*) FROM s3
          |ORDER BY stage_no""".stripMargin),
      doc = "ordered funnel census: K shrinking conditional-min passes, no sequence window"),

    // A8 queue metrics: counts by state/type for monitoring (queue.ts).
    "e_queue_metrics" -> Q(
      fn = (s, dir) => Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
        .orderBy(col("event_type")),
      oracle = Some(
        """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
          |  min(CAST(ts AS TIMESTAMP)) AS first_ts, max(CAST(ts AS TIMESTAMP)) AS last_ts
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "A8 queue metrics aggregation (queue.ts)"),

    // E3 scheduled/delayed visibility: only events whose schedule time has
    // passed a cutoff 'watermark' are deliverable (event.ts:117-120).
    "e3_delayed_visibility" -> Q(
      fn = (s, dir) => Tables.events(s, dir)
        .filter(col("ts") <= to_timestamp(lit("2024-01-05 00:00:00")))
        .groupBy(col("event_type")).agg(count(lit(1)).as("deliverable"))
        .orderBy(col("event_type")),
      oracle = Some(
        """SELECT event_type, count(*) AS deliverable FROM events
          |WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-05'
          |GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "E3 startAfter visibility cutoff (event.ts:117-120)"),

    // E6 object-admin-delete worker in batch form: every doomed object fans
    // out to (key, key.info) backend deletions, 500 objects per batch — half
    // the 1000-key S3 delete cap (object-admin-delete.ts:74-100,
    // limits.ts:19-21, adapter.ts:255-257).
    "e6_admin_delete_batches" -> Q(
      fn = (s, dir) =>
        graft.operators.ObjectStore.adminDeleteBatches(
          Tables.objects(s, dir), "F",
          to_timestamp(lit("1996-06-01 00:00:00")), 500)
          .orderBy(col("bucket_id"), col("batch")),
      oracle = Some(Oracle.withObjects(
        """SELECT bucket_id, batch, count(*) AS n_objects,
          |       count(*) * 2 AS n_keys,
          |       min_by(concat_ws('/', bucket_id, name, version), name) AS first_key,
          |       max_by(concat_ws('/', bucket_id, name, version), name) AS last_key
          |FROM (SELECT bucket_id, name, version,
          |        CAST(floor((row_number() OVER (PARTITION BY bucket_id ORDER BY name) - 1) / 500)
          |          AS BIGINT) AS batch
          |      FROM objects
          |      WHERE bucket_id = 'F' AND created_at < TIMESTAMP '1996-06-01')
          |GROUP BY 1, 2 ORDER BY bucket_id, batch""".stripMargin)),
      doc = "E6 admin-delete worker batches (object-admin-delete.ts, limits.ts:19-21)"),

    // E6 backup-object worker feed: the scanner's orphan set (J2 anti-join)
    // projected to backup jobs — __internal/ destination keys, per-key
    // singleton dedup keys, optional delete-original
    // (events/objects/backup-object.ts:34-77, scanner.ts:323-363).
    "e6_backup_orphans" -> Q(
      fn = (s, dir) => {
        val db = Tables.objects(s, dir).filter(col("mimetype") =!= "image/png")
        val orphans = graft.operators.Scanner.orphanedS3Keys(
          Tables.s3Keys(s, dir), db)
        graft.operators.Scanner.backupJobs(orphans, "tenant-a", deleteOriginal = true)
          .orderBy(col("source_key"))
      },
      oracle = Some(Oracle.withS3(
        """SELECT concat_ws('/', 'tenant-a', key) AS singleton_key,
          |       key AS source_key,
          |       concat('__internal/', key) AS destination_key,
          |       size, TRUE AS delete_original
          |FROM s3_keys
          |WHERE key NOT IN (SELECT name FROM objects WHERE mimetype <> 'image/png')
          |ORDER BY source_key""".stripMargin)),
      doc = "E6 backup-object jobs from the orphan scan (backup-object.ts:34-77)"),

    // E6 move-jobs worker in batch form (events/pgboss/move-jobs.ts:14-126):
    // relocate every PENDING job from one queue to another — copies land with
    // state='created', singleton keys ride along untouched, completed history
    // stays behind. Jobs synthesized from events (queue=event_type, state from
    // id mod 4 so every pending/terminal state is exercised); output is the
    // post-move per-(queue, state) census with singleton-key preservation
    // checked via count(DISTINCT singleton_key).
    "e6_move_jobs" -> Q(
      fn = (s, dir) => {
        val jobs = Tables.events(s, dir).select(
          col("event_id").as("id"),
          col("event_type").as("queue"),
          concat(col("event_type"), lit(":"), col("user_id")).as("singleton_key"),
          when(col("event_id") % 4 === 0, "completed")
            .when(col("event_id") % 4 === 1, "created")
            .when(col("event_id") % 4 === 2, "active")
            .otherwise("retry").as("state"))
        graft.streaming.EventStream.moveJobs(jobs, "error", "error-retry",
          deleteFromOriginal = true,
          pendingStates = Seq("created", "active", "retry"))
          .groupBy(col("queue"), col("state"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("singleton_key")).as("n_singletons"),
            min(col("id")).as("first_id"), max(col("id")).as("last_id"))
          .orderBy(col("queue"), col("state"))
      },
      oracle = Some(
        """WITH jobs AS (
          |  SELECT event_id AS id, event_type AS queue,
          |         concat(event_type, ':', user_id) AS singleton_key,
          |         CASE WHEN event_id % 4 = 0 THEN 'completed'
          |              WHEN event_id % 4 = 1 THEN 'created'
          |              WHEN event_id % 4 = 2 THEN 'active'
          |              ELSE 'retry' END AS state
          |  FROM events),
          |moved AS (
          |  SELECT id, 'error-retry' AS queue, singleton_key, 'created' AS state
          |  FROM jobs
          |  WHERE queue = 'error' AND state IN ('created', 'active', 'retry')),
          |after AS (
          |  SELECT * FROM jobs
          |  WHERE NOT (queue = 'error' AND state IN ('created', 'active', 'retry'))
          |  UNION ALL SELECT * FROM moved)
          |SELECT queue, state, count(*) AS n,
          |       count(DISTINCT singleton_key) AS n_singletons,
          |       min(id) AS first_id, max(id) AS last_id
          |FROM after GROUP BY 1, 2 ORDER BY queue, state""".stripMargin),
      doc = "E6 move-jobs worker: pending-state queue relocation (move-jobs.ts:14-126)"),

    // E1 webhook emit surface in batch form (webhook.ts:102-195): every
    // lifecycle event shapes the POST body {type:'Webhook', event:{type,
    // payload:{bucketId,name}}, tenant:{ref}} and the log's objectPath
    // `${tenant}/${bucketId}/${name}`; shouldSend (webhook.ts:121-137)
    // suppresses tenants whose disabledEvents list matches either
    // `Webhook:<type>` or the object-scoped `Webhook:<type>:<bucket>/<name>`.
    // Events synthesize from objects (mimetype → lifecycle type); the
    // disable rules are md5-deterministic so both engines replay them.
    // `sentAt` (transport wall-clock) is intentionally absent — it is not
    // part of the shaping semantics. Body built via concat (NOT to_json:
    // engine-specific field ordering/spacing); one combinable groupBy.
    "e1_webhook_payloads" -> Q(
      fn = (s, dir) => {
        val ev = Tables.objects(s, dir).select(
          concat(lit("tenant-"), expr("substring(owner_id, 6)")).as("tenant_ref"),
          when(col("mimetype") === "image/png", "ObjectCreated:Post")
            .when(col("mimetype") === "text/plain", "ObjectCreated:Put")
            .otherwise("ObjectRemoved:Delete").as("event_type"),
          col("bucket_id"), col("name"))
        val shaped = ev.select(col("tenant_ref"), col("event_type"),
          concat_ws("/", col("tenant_ref"), col("bucket_id"), col("name"))
            .as("object_path"),
          concat(lit("{\"type\":\"Webhook\",\"event\":{\"type\":\""),
            col("event_type"),
            lit("\",\"payload\":{\"bucketId\":\""), col("bucket_id"),
            lit("\",\"name\":\""), col("name"),
            lit("\"}},\"tenant\":{\"ref\":\""), col("tenant_ref"),
            lit("\"}}")).as("body"),
          ((expr("cast(conv(substring(md5(concat('dis|', tenant_ref)), 1, 4), " +
            "16, 10) as bigint) % 5") === 0 &&
            col("event_type") === "ObjectRemoved:Delete") ||
            expr("cast(conv(substring(md5(concat('dis|', event_type, ':', " +
              "bucket_id, '/', name)), 1, 4), 16, 10) as bigint) % 97") === 0)
            .as("suppressed"))
        shaped.groupBy(col("tenant_ref"), col("event_type"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("suppressed"), 1L).otherwise(0L)).as("n_suppressed"),
            (count(lit(1)) -
              sum(when(col("suppressed"), 1L).otherwise(0L))).as("n_sent"),
            min(col("object_path")).as("first_path"),
            min_by(col("body"), col("object_path")).as("sample_body"))
          .orderBy(col("tenant_ref"), col("event_type"))
      },
      oracle = Some(Oracle.withObjects(
        """SELECT tenant_ref, event_type, count(*) AS n_total,
          |  CAST(count(*) FILTER (WHERE suppressed) AS BIGINT) AS n_suppressed,
          |  CAST(count(*) - count(*) FILTER (WHERE suppressed) AS BIGINT)
          |    AS n_sent,
          |  min(object_path) AS first_path,
          |  min_by(body, object_path) AS sample_body
          |FROM (
          |  SELECT tenant_ref, event_type,
          |    concat_ws('/', tenant_ref, bucket_id, name) AS object_path,
          |    concat('{"type":"Webhook","event":{"type":"', event_type,
          |      '","payload":{"bucketId":"', bucket_id, '","name":"', name,
          |      '"}},"tenant":{"ref":"', tenant_ref, '"}}') AS body,
          |    (CAST(('0x' || substr(md5(concat('dis|', tenant_ref)), 1, 4))
          |        AS BIGINT) % 5 = 0
          |      AND event_type = 'ObjectRemoved:Delete')
          |    OR CAST(('0x' || substr(md5(concat('dis|', event_type, ':',
          |        bucket_id, '/', name)), 1, 4)) AS BIGINT) % 97 = 0
          |      AS suppressed
          |  FROM (
          |    SELECT concat('tenant-', substr(owner_id, 6)) AS tenant_ref,
          |      CASE WHEN mimetype = 'image/png' THEN 'ObjectCreated:Post'
          |           WHEN mimetype = 'text/plain' THEN 'ObjectCreated:Put'
          |           ELSE 'ObjectRemoved:Delete' END AS event_type,
          |      bucket_id, name
          |    FROM objects))
          |GROUP BY 1, 2 ORDER BY tenant_ref, event_type""".stripMargin)),
      doc = "E1 webhook payload shaping + shouldSend disable filters (webhook.ts:102-195, :121-137)"),

    // E4 dead-letter routing in batch form (event.ts:60-62): every queue's
    // DLQ is `<queue>-dead-letter`; a job that exhausts retryLimit (2, so 3
    // attempts) routes there, a job that succeeds on attempt k ≤ 3 delivers
    // after k-1 retries. Outcomes are md5-deterministic per job id (20%
    // permanent failures; survivors need seed%3 retries), so both engines
    // replay the same attempt ledger. One combinable groupBy per queue.
    "e4_dlq_routing" -> Q(
      fn = (s, dir) => {
        val jobs = Tables.events(s, dir).select(
          col("event_id").as("id"), col("event_type").as("queue"),
          expr("cast(conv(substring(md5(concat('dlq|', cast(event_id as " +
            "string))), 1, 4), 16, 10) as bigint) % 10").as("seed"))
        jobs.select(col("queue"),
            (col("seed") < 2).as("dead"),
            when(col("seed") < 2, 3L).otherwise(col("seed") % 3 + 1)
              .as("attempts"))
          .groupBy(col("queue"))
          .agg(count(lit(1)).as("n_jobs"),
            sum(when(col("dead"), 0L).otherwise(1L)).as("n_delivered"),
            sum(when(col("dead"), 1L).otherwise(0L)).as("n_dead_lettered"),
            sum(col("attempts")).as("total_attempts"),
            sum(col("attempts") - 1).as("total_retries"))
          .withColumn("dlq_name", concat(col("queue"), lit("-dead-letter")))
          .select(col("queue"), col("dlq_name"), col("n_jobs"),
            col("n_delivered"), col("n_dead_lettered"),
            col("total_attempts"), col("total_retries"))
          .orderBy(col("queue"))
      },
      oracle = Some(
        """WITH jobs AS (SELECT event_type AS queue,
          |    CAST(('0x' || substr(md5(concat('dlq|',
          |      CAST(event_id AS VARCHAR))), 1, 4)) AS BIGINT) % 10 AS seed
          |  FROM events),
          |led AS (SELECT queue, seed < 2 AS dead,
          |    CASE WHEN seed < 2 THEN 3 ELSE seed % 3 + 1 END AS attempts
          |  FROM jobs)
          |SELECT queue, concat(queue, '-dead-letter') AS dlq_name,
          |  count(*) AS n_jobs,
          |  CAST(count(*) FILTER (WHERE NOT dead) AS BIGINT) AS n_delivered,
          |  CAST(count(*) FILTER (WHERE dead) AS BIGINT) AS n_dead_lettered,
          |  CAST(sum(attempts) AS BIGINT) AS total_attempts,
          |  CAST(sum(attempts - 1) AS BIGINT) AS total_retries
          |FROM led GROUP BY queue ORDER BY queue""".stripMargin),
      doc = "E4 dead-letter routing + retry ledger (event.ts:60-62, pg-boss retryLimit)"),

    // Stream-parity census for EventStream.windowedCounts: 5-minute
    // tumbling windows per queue under a 10-minute watermark — the batch
    // replay of exactly what the append-mode stream EMITS (a window seals
    // when its end passes the high-water mark = max event ts − delay; later
    // windows stay in state). Window indices live on the 5-min integer
    // grid (unix_micros div), so seal classification has no float boundary.
    // Graded per queue: sealed/open window and event counts + the peak
    // sealed window (max n, min window index as tiebreak). Scale: one
    // combinable groupBy on (type, widx) — node-bounded state, no global
    // window (the high-water mark is a broadcast 1-row agg).
    "e7_windowed_counts_sealed" -> Q(
      fn = (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type"), expr("unix_micros(ts)").as("us"))
        val wmRow = ev.agg((max(col("us")) - lit(600000000L)).as("wm"))
        val census = ev
          .withColumn("widx", expr("us div 300000000"))
          .groupBy(col("event_type"), col("widx"))
          .agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(wmRow))
          .withColumn("sealed", (col("widx") + 1L) * 300000000L <= col("wm"))
        val wpeak = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))
        census
          .withColumn("peak_n",
            max(when(col("sealed"), col("n"))).over(wpeak))
          .groupBy(col("event_type"))
          .agg(
            sum(when(col("sealed"), 1L).otherwise(0L)).as("n_windows_sealed"),
            sum(when(col("sealed"), col("n")).otherwise(0L)).as("n_events_sealed"),
            sum(when(!col("sealed"), 1L).otherwise(0L)).as("n_windows_open"),
            sum(when(!col("sealed"), col("n")).otherwise(0L)).as("n_events_open"),
            max(when(col("sealed"), col("n"))).as("peak_sealed_n"),
            min(when(col("sealed") && col("n") === col("peak_n"), col("widx")))
              .as("peak_sealed_widx"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH ev AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
          |wm AS (SELECT max(us) - 600000000 AS wm FROM ev),
          |census AS (SELECT event_type, us // 300000000 AS widx, count(*) AS n
          |  FROM ev GROUP BY 1, 2),
          |cs AS (SELECT c.event_type, c.widx, c.n,
          |    (c.widx + 1) * 300000000 <= wm.wm AS sealed
          |  FROM census c CROSS JOIN wm),
          |pk AS (SELECT *, max(CASE WHEN sealed THEN n END)
          |    OVER (PARTITION BY event_type) AS peak_n FROM cs)
          |SELECT event_type,
          |  CAST(count(*) FILTER (WHERE sealed) AS BIGINT) AS n_windows_sealed,
          |  CAST(coalesce(sum(n) FILTER (WHERE sealed), 0) AS BIGINT) AS n_events_sealed,
          |  CAST(count(*) FILTER (WHERE NOT sealed) AS BIGINT) AS n_windows_open,
          |  CAST(coalesce(sum(n) FILTER (WHERE NOT sealed), 0) AS BIGINT) AS n_events_open,
          |  CAST(max(CASE WHEN sealed THEN n END) AS BIGINT) AS peak_sealed_n,
          |  CAST(min(CASE WHEN sealed AND n = peak_n THEN widx END) AS BIGINT)
          |    AS peak_sealed_widx
          |FROM pk GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "stream-parity: windowed counts under watermark sealing — emitted vs in-state census (EventStream.windowedCounts twin)"),

    // Stream-parity census for EventStream.sessionizedStats: gap-timeout
    // sessions under the STREAMING conventions, which differ from batch
    // t_sessionize in exactly two pinned ways — (1) session windows are
    // half-open [t, t+gap), so a silence of EXACTLY the gap starts a new
    // session (>= vs the batch >), and (2) a session is only EMITTED once
    // the watermark passes session_end + gap (nothing can extend it);
    // younger sessions are open state. Census: sealed/open sessions grouped
    // by size, with exact integer span sums. Scale: per-user keyed windows
    // (lag + running sum), never a global sort.
    "e8_session_seal_census" -> Q(
      fn = (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), expr("unix_micros(ts)").as("us"))
        val wmRow = ev.agg((max(col("us")) - lit(600000000L)).as("wm"))
        val wu = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("us"))
        val wcum = wu.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        val sessions = ev
          .withColumn("pus", lag(col("us"), 1).over(wu))
          .withColumn("nf", when(col("pus").isNull ||
            col("us") - col("pus") >= 1800000000L, 1L).otherwise(0L))
          .withColumn("session_no", sum(col("nf")).over(wcum))
          .groupBy(col("user_id"), col("session_no"))
          .agg(count(lit(1)).as("n_events"),
            min(col("us")).as("s_us"), max(col("us")).as("e_us"))
        sessions.crossJoin(broadcast(wmRow))
          .withColumn("sealed", col("e_us") + 1800000000L <= col("wm"))
          // span truncates to whole seconds PER SESSION (integer div), then
          // sums — Column `/` is double division, which would truncate the
          // SUM instead and drift from the oracle's per-row floor
          .withColumn("span_sec", expr("(e_us - s_us) div 1000000"))
          .groupBy(col("sealed"), col("n_events"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("span_sec")).as("total_span_sec"),
            max(col("span_sec")).as("max_span_sec"))
          .orderBy(col("sealed").desc, col("n_events"))
      },
      oracle = Some(
        """WITH ev AS (SELECT user_id,
          |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
          |wm AS (SELECT max(us) - 600000000 AS wm FROM ev),
          |l AS (SELECT user_id, us,
          |    lag(us) OVER (PARTITION BY user_id ORDER BY us) AS pus FROM ev),
          |f AS (SELECT user_id, us, CASE WHEN pus IS NULL
          |      OR us - pus >= 1800000000 THEN 1 ELSE 0 END AS nf FROM l),
          |s AS (SELECT user_id, us, sum(nf) OVER (PARTITION BY user_id
          |      ORDER BY us ROWS UNBOUNDED PRECEDING) AS session_no FROM f),
          |sess AS (SELECT user_id, session_no, count(*) AS n_events,
          |    min(us) AS s_us, max(us) AS e_us FROM s GROUP BY 1, 2),
          |cls AS (SELECT sess.*, e_us + 1800000000 <= wm.wm AS sealed
          |  FROM sess CROSS JOIN wm)
          |SELECT sealed, CAST(n_events AS BIGINT) AS n_events,
          |  count(*) AS n_sessions,
          |  CAST(sum((e_us - s_us) // 1000000) AS BIGINT) AS total_span_sec,
          |  CAST(max((e_us - s_us) // 1000000) AS BIGINT) AS max_span_sec
          |FROM cls GROUP BY 1, 2 ORDER BY sealed DESC, n_events""".stripMargin),
      doc = "stream-parity: half-open gap sessions sealed by watermark — emitted vs open census (EventStream.sessionizedStats twin)"),

    // Stream-parity census for EventStream.streamingAsOf: each purchase
    // (query) reads the LATEST view/click (state) for its user under the
    // stream's exact tie contract — state sorts (ts, state-before-query,
    // event_id), a same-ts state IS visible to the query, later states
    // never retro-correct. Emission: only queries at ts ≤ high-water mark
    // (max ts − 10 min) are emitted in append mode; younger ones are
    // pending. Graded per user: query/emit/match counts plus the exact sum
    // of matched state event_ids — certifying WHICH state row every
    // emitted query observed, not just how many matched. Scale: one
    // union + keyed window (the t_asof_join shape) — single shuffle.
    "e9_asof_emit_census" -> Q(
      fn = (s, dir) => {
        val ev = Tables.events(s, dir)
        val state = ev.filter(col("event_type").isin("view", "click"))
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(0).as("k_ord"), col("event_id").as("state_id"))
        val queries = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(1).as("k_ord"), lit(null).cast("long").as("state_id"))
        val wmRow = ev.agg(
          (max(expr("unix_micros(ts)")) - lit(600000000L)).as("wm"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("k_ord"), col("event_id"))
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        state.unionByName(queries)
          .withColumn("asof_state", last(col("state_id"), ignoreNulls = true).over(w))
          .filter(col("k_ord") === 1)
          .crossJoin(broadcast(wmRow))
          .withColumn("emitted", expr("unix_micros(ts)") <= col("wm"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_queries"),
            sum(when(col("emitted"), 1L).otherwise(0L)).as("n_emitted"),
            sum(when(col("emitted") && col("asof_state").isNotNull, 1L)
              .otherwise(0L)).as("n_matched"),
            sum(when(col("emitted"), coalesce(col("asof_state"), lit(0L)))
              .otherwise(0L)).as("sum_state_ids"))
          .orderBy(col("user_id"))
      },
      oracle = Some(
        """WITH st AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
          |    0 AS k_ord, event_id AS state_id
          |  FROM events WHERE event_type IN ('view', 'click')),
          |qr AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
          |    1 AS k_ord, NULL AS state_id
          |  FROM events WHERE event_type = 'purchase'),
          |wm AS (SELECT max(epoch_us(CAST(ts AS TIMESTAMP))) - 600000000 AS wm
          |  FROM events),
          |u AS (SELECT * FROM st UNION ALL SELECT * FROM qr),
          |j AS (SELECT user_id, ts, event_id, k_ord,
          |    last_value(state_id IGNORE NULLS) OVER (PARTITION BY user_id
          |      ORDER BY ts, k_ord, event_id
          |      ROWS UNBOUNDED PRECEDING) AS asof_state
          |  FROM u),
          |q AS (SELECT j.*, epoch_us(ts) <= wm.wm AS emitted
          |  FROM j CROSS JOIN wm WHERE k_ord = 1)
          |SELECT user_id, count(*) AS n_queries,
          |  CAST(count(*) FILTER (WHERE emitted) AS BIGINT) AS n_emitted,
          |  CAST(count(*) FILTER (WHERE emitted AND asof_state IS NOT NULL)
          |    AS BIGINT) AS n_matched,
          |  CAST(coalesce(sum(CASE WHEN emitted
          |    THEN coalesce(asof_state, 0) ELSE 0 END), 0) AS BIGINT)
          |    AS sum_state_ids
          |FROM q GROUP BY user_id ORDER BY user_id""".stripMargin),
      doc = "stream-parity: as-of enrichment with watermark emission — per-key emitted/matched census + exact observed-state sum (EventStream.streamingAsOf twin)"),

    // Stream-parity census for EventStream.streamingHllRegisters: the HLL
    // register relation at a watermark cut vs over the full log. Register
    // max is monotone, so the update-mode stream re-emits exactly the
    // registers that GROW after the cut and news the ones that appear —
    // censused here with exact integers (register count, rank sums, grown/
    // new counts); no float estimate is graded. Scale: two ≤4096-row
    // register relations full-outer-joined on bucket — the sketch bounds
    // the state, never the event count.
    "e10_hll_seal_census" -> Q(
      fn = (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id").cast("string").as("val"),
            expr("unix_micros(ts)").as("us"))
          .filter(col("val").isNotNull)
        val wmRow = ev.agg((max(col("us")) - lit(600000000L)).as("wm"))
        def regs(df: org.apache.spark.sql.DataFrame) =
          graft.operators.Sketches.hllRegisters(
            df.select(lit("user_id").as("col_name"), col("val")))
        val sealedRegs = regs(ev.crossJoin(broadcast(wmRow))
            .filter(col("us") <= col("wm")))
          .select(col("bucket"), col("reg").as("reg_sealed"))
        val full = regs(ev)
          .select(col("bucket"), col("reg").as("reg_full"))
        sealedRegs.join(full, Seq("bucket"), "full_outer")
          .agg(
            sum(when(col("reg_sealed").isNotNull, 1L).otherwise(0L))
              .as("n_reg_sealed"),
            sum(when(col("reg_full").isNotNull, 1L).otherwise(0L))
              .as("n_reg_full"),
            sum(when(col("reg_sealed").isNull, 1L).otherwise(0L))
              .as("n_reg_new"),
            sum(when(col("reg_sealed").isNotNull &&
              col("reg_full") > col("reg_sealed"), 1L).otherwise(0L))
              .as("n_reg_grown"),
            coalesce(sum(col("reg_sealed")), lit(0L)).as("sum_rank_sealed"),
            coalesce(sum(col("reg_full")), lit(0L)).as("sum_rank_full"))
      },
      oracle = Some(
        """WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS val,
          |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
          |  FROM events WHERE user_id IS NOT NULL),
          |wm AS (SELECT max(us) - 600000000 AS wm FROM ev),
          |sealed AS (SELECT h // 281474976710656 AS bucket,
          |    max(CASE WHEN h % 281474976710656 = 0 THEN 49
          |        ELSE 49 - length(bin(h % 281474976710656)) END) AS reg_sealed
          |  FROM (SELECT CAST('0x' || substr(md5(val), 1, 15) AS BIGINT) AS h
          |    FROM ev CROSS JOIN wm WHERE us <= wm.wm) GROUP BY 1),
          |fullr AS (SELECT h // 281474976710656 AS bucket,
          |    max(CASE WHEN h % 281474976710656 = 0 THEN 49
          |        ELSE 49 - length(bin(h % 281474976710656)) END) AS reg_full
          |  FROM (SELECT CAST('0x' || substr(md5(val), 1, 15) AS BIGINT) AS h
          |    FROM ev) GROUP BY 1)
          |SELECT
          |  CAST(count(reg_sealed) AS BIGINT) AS n_reg_sealed,
          |  CAST(count(reg_full) AS BIGINT) AS n_reg_full,
          |  CAST(count(*) FILTER (WHERE reg_sealed IS NULL) AS BIGINT)
          |    AS n_reg_new,
          |  CAST(count(*) FILTER (WHERE reg_sealed IS NOT NULL
          |    AND reg_full > reg_sealed) AS BIGINT) AS n_reg_grown,
          |  CAST(coalesce(sum(reg_sealed), 0) AS BIGINT) AS sum_rank_sealed,
          |  CAST(coalesce(sum(reg_full), 0) AS BIGINT) AS sum_rank_full
          |FROM sealed FULL OUTER JOIN fullr USING (bucket)""".stripMargin),
      doc = "stream-parity: HLL register census at a watermark cut — monotone register growth (grown/new counts, exact rank sums) certifying what update mode re-emits (EventStream.streamingHllRegisters twin)"),

    // Stream-parity census for EventStream.streamingBottomK: the per-group
    // bottom-64-by-hash sample at the watermark cut vs over the full log.
    // Bottom-k-by-hash is a semilattice (bottom-k of a union = bottom-k of
    // bottom-ks), so the full sample is exactly merge(sealed state, late
    // rows) — the census grades retention/eviction per group with exact
    // integers (the md5-60 hash sums certify MEMBERSHIP, not just counts;
    // summed mod 1e9 to stay far inside int64 over 64 members).
    "e11_bottomk_seal_census" -> Q(
      fn = (s, dir) => {
        val h = expr(
          "cast(conv(substring(md5(cast(event_id as string)), 1, 15), 16, 10) as bigint)")
        val ev = Tables.events(s, dir)
          .select(col("event_type").as("g"), col("event_id"),
            expr("unix_micros(ts)").as("us"))
          .withColumn("h", h)
        val wmRow = ev.agg((max(col("us")) - lit(600000000L)).as("wm"))
        val wg = Window.partitionBy(col("g")).orderBy(col("h"), col("event_id"))
        def sample(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("rnk", row_number().over(wg)).filter(col("rnk") <= 64)
          .select(col("g"), col("event_id"), col("h"))
        val sealedSmp = sample(ev.crossJoin(broadcast(wmRow))
          .filter(col("us") <= col("wm")))
        val full = sample(ev)
        val evicted = sealedSmp.join(full.select(col("g"), col("event_id")),
          Seq("g", "event_id"), "left_anti")
        sealedSmp.groupBy(col("g"))
          .agg(count(lit(1)).as("n_sealed"),
            sum(col("h") % 1000000000L).as("hmod_sum_sealed"))
          .join(full.groupBy(col("g"))
            .agg(count(lit(1)).as("n_full"),
              sum(col("h") % 1000000000L).as("hmod_sum_full"),
              min(col("h")).as("min_h_full"),
              max(col("h")).as("max_h_full")), Seq("g"), "full_outer")
          .join(evicted.groupBy(col("g")).agg(count(lit(1)).as("n_evicted")),
            Seq("g"), "left")
          .select(col("g"), coalesce(col("n_sealed"), lit(0L)).as("n_sealed"),
            col("n_full"), coalesce(col("n_evicted"), lit(0L)).as("n_evicted"),
            coalesce(col("hmod_sum_sealed"), lit(0L)).as("hmod_sum_sealed"),
            col("hmod_sum_full"), col("min_h_full"), col("max_h_full"))
          .orderBy(col("g"))
      },
      oracle = Some(
        """WITH ev AS (SELECT event_type AS g, event_id,
          |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
          |    CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
          |      AS BIGINT) AS h
          |  FROM events),
          |wm AS (SELECT max(us) - 600000000 AS wm FROM ev),
          |sealed AS (SELECT g, event_id, h FROM (SELECT g, event_id, h,
          |    row_number() OVER (PARTITION BY g ORDER BY h, event_id) AS rnk
          |  FROM ev CROSS JOIN wm WHERE us <= wm.wm) WHERE rnk <= 64),
          |fullr AS (SELECT g, event_id, h FROM (SELECT g, event_id, h,
          |    row_number() OVER (PARTITION BY g ORDER BY h, event_id) AS rnk
          |  FROM ev) WHERE rnk <= 64),
          |ev2 AS (SELECT s.g, count(*) AS n_evicted FROM sealed s
          |  LEFT JOIN fullr f ON f.g = s.g AND f.event_id = s.event_id
          |  WHERE f.event_id IS NULL GROUP BY s.g),
          |sa AS (SELECT g, count(*) AS n_sealed,
          |    CAST(sum(h % 1000000000) AS BIGINT) AS hmod_sum_sealed
          |  FROM sealed GROUP BY g),
          |fa AS (SELECT g, count(*) AS n_full,
          |    CAST(sum(h % 1000000000) AS BIGINT) AS hmod_sum_full,
          |    min(h) AS min_h_full, max(h) AS max_h_full
          |  FROM fullr GROUP BY g)
          |SELECT g, coalesce(n_sealed, 0) AS n_sealed, n_full,
          |  CAST(coalesce(n_evicted, 0) AS BIGINT) AS n_evicted,
          |  coalesce(hmod_sum_sealed, 0) AS hmod_sum_sealed,
          |  hmod_sum_full, min_h_full, max_h_full
          |FROM fa FULL OUTER JOIN sa USING (g)
          |LEFT JOIN ev2 USING (g) ORDER BY g""".stripMargin),
      doc = "stream-parity: bottom-64-by-hash sample churn at a watermark cut — semilattice retention/eviction census with hash-sum membership certificates (EventStream.streamingBottomK twin)"),

    // Guarantee census for EventStream.streamingHeavyHitters: the actual
    // Misra–Gries fold (EventStream.mgFold — the IDENTICAL code path the
    // stream runs per micro-batch) over each group's (ts, event_id)-ordered
    // log with budget b=8, confirm-joined with exact counts and filtered to
    // the pigeonhole-guaranteed share STRICTLY above 1/(b+1) (the boundary
    // count t = n/(b+1) is NOT covered by the theorem — final counter
    // t − n/(b+1) can reach exactly 0 and be evicted, so both engines use
    // strict >). MG never evicts an item above that share, so the output
    // equals the oracle's plain exact-count relation — a fold bug that
    // wrongly evicts drops a row and fails the hash. Item domain is
    // deliberately skewed (two ~33% hot items over the 1/9 threshold,
    // ~200 cold items far under it) so the guaranteed set is nonempty and
    // nontrivial. Scale: the fold runs inside mapPartitions
    // over (g, ts, event_id)-sorted partitions — O(b) state per group,
    // iterator-streamed, never a collected group.
    "e12_mg_guarantee_census" -> Q(
      fn = (s, dir) => {
        import s.implicits._
        val budget = 8
        // NULL user_id would yield a NULL item via concat; the confirm-join
        // on (g, item) can never match NULL while the oracle's plain join
        // would emit the NULL-item row — the engines diverge the moment the
        // NULL share crosses 1/(b+1) in any group. Drop NULLs identically
        // on both sides (r11 ADVICE).
        val items = Tables.events(s, dir)
          .filter(col("user_id").isNotNull)
          .select(col("event_type").as("g"),
            when(col("user_id") % 3 > 0,
                concat(lit("hot-"), col("user_id") % 2))
              .otherwise(concat(lit("cold-"), col("user_id") % 211))
              .as("item"),
            expr("unix_micros(ts)").as("us"), col("event_id"))
        val candidates = items
          .repartition(col("g"))
          .sortWithinPartitions(col("g"), col("us"), col("event_id"))
          .as[(String, String, Long, Long)]
          .mapPartitions { rows =>
            // group-boundary fold: rows arrive (g, us, event_id)-sorted and
            // each g lives wholly in this partition, so MG state is O(b).
            // mgFold is invoked once per bounded RUN (≤4096 items) with the
            // counters carried forward — exactly the stream's one-fold-per-
            // micro-batch usage, without a per-row map copy and without
            // buffering a whole group
            val out = Seq.newBuilder[(String, String)]
            var curG: String = null
            var counters = Map.empty[String, Long]
            val buf = scala.collection.mutable.ArrayBuffer.empty[String]
            def fold(): Unit = if (buf.nonEmpty) {
              counters = graft.streaming.EventStream
                .mgFold(buf.iterator, counters, budget)._1
              buf.clear()
            }
            def flush(): Unit = if (curG != null) {
              fold()
              counters.keysIterator.foreach(i => out += ((curG, i)))
            }
            rows.foreach { case (g, item, _, _) =>
              if (g != curG) { flush(); curG = g; counters = Map.empty }
              buf += item
              if (buf.length >= 4096) fold()
            }
            flush()
            out.result().iterator
          }.toDF("g", "item")
        val cnt = items.groupBy(col("g"), col("item"))
          .agg(count(lit(1)).as("n_true"))
        val tot = items.groupBy(col("g")).agg(count(lit(1)).as("n_seen"))
        cnt.join(tot, Seq("g"))
          .filter(col("n_true") * (budget + 1) > col("n_seen"))
          .join(candidates, Seq("g", "item"), "left_semi")
          .select(col("g"), col("item"), col("n_true"), col("n_seen"))
          .orderBy(col("g"), col("item"))
      },
      oracle = Some(
        """WITH it AS (SELECT event_type AS g,
          |    CASE WHEN user_id % 3 > 0 THEN 'hot-' || (user_id % 2)
          |         ELSE 'cold-' || (user_id % 211) END AS item
          |  FROM events WHERE user_id IS NOT NULL),
          |cnt AS (SELECT g, item, count(*) AS n_true FROM it GROUP BY 1, 2),
          |tot AS (SELECT g, count(*) AS n_seen FROM it GROUP BY 1)
          |SELECT g, item, n_true, n_seen FROM cnt JOIN tot USING (g)
          |WHERE n_true * 9 > n_seen ORDER BY g, item""".stripMargin),
      doc = "stream-parity: Misra-Gries pigeonhole guarantee — the stream's own fold (mgFold, b=8) confirm-joined to exact counts must equal the share>1/9 relation (EventStream.streamingHeavyHitters twin)"),

    // Emission census for EventStream.streamingRateSpikes: hourly buckets
    // per type with the trailing-24h baseline over EXISTING buckets (the
    // stream's retained-state window), the stream's exact integer spike
    // gate (n·prevHours > 3·prevN at ≥12 baseline hours), and the
    // streaming emission cut — a bucket is emitted only when a LATER hour
    // arrives, so each type's newest bucket is open/withheld. Censused per
    // type with exact integers including the open bucket itself. Scale:
    // one keyed groupBy + one keyed RANGE window — same shape as the
    // graded events_rate_spike, plus the emission delta.
    "e13_rate_spike_emit_census" -> Q(
      fn = (s, dir) => {
        val hours = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("h"))
          .agg(count(lit(1)).as("n"))
        val wtr = Window.partitionBy(col("event_type")).orderBy(col("h"))
          .rangeBetween(-24, -1)
        val wmax = Window.partitionBy(col("event_type"))
        hours
          .withColumn("prev_n", coalesce(sum(col("n")).over(wtr), lit(0L)))
          .withColumn("prev_hours", count(lit(1)).over(wtr))
          .withColumn("open_h", max(col("h")).over(wmax))
          .withColumn("spike", col("prev_hours") >= 12 &&
            col("n") * col("prev_hours") > lit(3L) * col("prev_n"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"),
            sum(when(col("h") < col("open_h"), 1L).otherwise(0L))
              .as("n_emitted"),
            sum(when(col("h") < col("open_h") && col("spike"), 1L)
              .otherwise(0L)).as("n_spikes_emitted"),
            sum(when(col("h") < col("open_h"), col("n")).otherwise(0L))
              .as("sum_emitted_n"),
            max(col("open_h")).as("open_h"),
            max(when(col("h") === col("open_h"), col("n"))).as("open_n"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH hrs AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h,
          |    count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |w AS (SELECT event_type, h, n,
          |    CAST(coalesce(sum(n) OVER tr, 0) AS BIGINT) AS prev_n,
          |    count(*) OVER tr AS prev_hours,
          |    max(h) OVER (PARTITION BY event_type) AS open_h
          |  FROM hrs WINDOW tr AS (PARTITION BY event_type ORDER BY h
          |    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
          |SELECT event_type, count(*) AS n_hours,
          |  CAST(count(*) FILTER (WHERE h < open_h) AS BIGINT) AS n_emitted,
          |  CAST(count(*) FILTER (WHERE h < open_h AND prev_hours >= 12
          |    AND n * prev_hours > 3 * prev_n) AS BIGINT) AS n_spikes_emitted,
          |  CAST(coalesce(sum(n) FILTER (WHERE h < open_h), 0) AS BIGINT)
          |    AS sum_emitted_n,
          |  CAST(max(open_h) AS BIGINT) AS open_h,
          |  CAST(max(CASE WHEN h = open_h THEN n END) AS BIGINT) AS open_n
          |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "stream-parity: rate-spike emission census — trailing-24h baseline over existing buckets, exact integer spike gate, newest bucket open/withheld (EventStream.streamingRateSpikes twin)"),

    // As-of join (an operator Spark lacks natively): every purchase picks
    // the LATEST click by the same user at or before its timestamp —
    // "most recent state at event time", the feature-lookup shape. The
    // Spark side is the union+keyed-window merge formulation (one shuffle,
    // O(1) window state); the oracle is the explicit correlated argmax with
    // (ts, event_id) tiebreak, so tie handling is pinned, not engine-luck.
    "t_asof_join" -> Q(
      fn = (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        graft.operators.Temporal.asOfJoin(purchases, clicks,
          key = "user_id", ts = "ts", tiebreak = "event_id",
          payloadCols = Seq("event_id", "ts"))
          .orderBy(col("event_id"))
      },
      oracle = Some(
        """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          |           FROM events WHERE event_type = 'purchase'),
          |c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          |      FROM events WHERE event_type = 'click')
          |SELECT p.event_id, p.user_id, p.ts,
          |  (SELECT c.event_id FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
          |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS asof_event_id,
          |  (SELECT c.ts FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
          |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS asof_ts
          |FROM p ORDER BY p.event_id""".stripMargin),
      doc = "as-of join: latest prior state per key (union + keyed window, merge-join shape)"),

    // Hourly gap filling + forward fill (time_bucket_gapfill): each key's
    // span densifies to an integer-hour grid; missing buckets flag and the
    // last observed DECIMAL sum carries forward. Keyed windows only.
    "e_gapfill" -> Q(
      fn = (s, dir) =>
        graft.operators.Temporal.gapFillHourly(
          Tables.events(s, dir).filter(col("user_id") % 37 === 5),
          key = "user_id", ts = "ts", valueCol = "value"),
      oracle = Some(
        """WITH h0 AS (SELECT user_id,
          |    epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)))
          |      // 3600000000 AS hi,
          |    count(*) AS n_events,
          |    sum(CAST(value AS DECIMAL(18,4))) AS sv
          |  FROM events WHERE user_id % 37 = 5 GROUP BY 1, 2),
          |g AS (SELECT user_id, unnest(generate_series(mn, mx)) AS hi
          |  FROM (SELECT user_id, min(hi) AS mn, max(hi) AS mx
          |        FROM h0 GROUP BY 1)),
          |j AS (SELECT g.user_id, g.hi, h0.n_events, h0.sv
          |  FROM g LEFT JOIN h0 ON g.user_id = h0.user_id AND g.hi = h0.hi)
          |SELECT user_id, make_timestamp(hi * 3600000000) AS hour,
          |  coalesce(n_events, 0) AS n_events, sv IS NULL AS filled,
          |  CAST(sv AS DOUBLE) AS sum_value,
          |  CAST(last_value(sv IGNORE NULLS) OVER (PARTITION BY user_id
          |    ORDER BY hi ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS ffill_value
          |FROM j ORDER BY user_id, hour""".stripMargin),
      doc = "hourly gap fill + forward fill: integer-hour grid, keyed windows, DECIMAL carry"),

    // As-of with a staleness bound (pandas merge_asof tolerance): the
    // latest prior click still wins, but matches older than 1 h null out
    // together — same one-shuffle merge shape plus a row-local exact
    // micros comparison. Left rows are always preserved.
    "t_asof_tolerance" -> Q(
      fn = (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        graft.operators.Temporal.asOfJoinTolerance(purchases, clicks,
          key = "user_id", ts = "ts", tiebreak = "event_id",
          payloadCols = Seq("event_id", "ts"), toleranceSeconds = 3600L)
          .orderBy(col("event_id"))
      },
      oracle = Some(
        """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          |           FROM events WHERE event_type = 'purchase'),
          |c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          |      FROM events WHERE event_type = 'click'),
          |m AS (SELECT p.event_id, p.user_id, p.ts,
          |  (SELECT c.event_id FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
          |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS a_id,
          |  (SELECT c.ts FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
          |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS a_ts
          |  FROM p)
          |SELECT event_id, user_id, ts,
          |  CASE WHEN a_ts IS NOT NULL
          |        AND epoch_us(ts) - epoch_us(a_ts) <= 3600000000
          |       THEN a_id END AS asof_event_id,
          |  CASE WHEN a_ts IS NOT NULL
          |        AND epoch_us(ts) - epoch_us(a_ts) <= 3600000000
          |       THEN a_ts END AS asof_ts
          |FROM m ORDER BY event_id""".stripMargin),
      doc = "as-of join with staleness tolerance: latest prior match, nulled when stale"),

    // The SAME as-of semantics through the native Catalyst seam
    // (plans/AsOfJoinPlan.scala): custom LogicalPlan + planner strategy +
    // merge-scan SparkPlan holding ONE candidate row per key, key filters
    // pushed through the node by a custom optimizer rule. Graded against
    // the IDENTICAL oracle as t_asof_join — result-invariance between the
    // composed and native formulations, the text_perplexity_tiered pattern.
    "t_asof_join_native" -> Q(
      fn = (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        graft.plans.AsOfJoinPlan.asof(purchases, clicks,
          key = "user_id", ts = "ts", tiebreak = "event_id",
          payloadCols = Seq("event_id", "ts"))
          .orderBy(col("event_id"))
      },
      oracle = Some(
        """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          |           FROM events WHERE event_type = 'purchase'),
          |c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          |      FROM events WHERE event_type = 'click')
          |SELECT p.event_id, p.user_id, p.ts,
          |  (SELECT c.event_id FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
          |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS asof_event_id,
          |  (SELECT c.ts FROM c WHERE c.user_id = p.user_id AND c.ts <= p.ts
          |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS asof_ts
          |FROM p ORDER BY p.event_id""".stripMargin),
      doc = "native as-of join exec: custom plan node, merge scan, O(1) state"),

    // Bounded range join: clicks in the hour before each purchase, same
    // user. Join key is (user, time bucket) — two bucket probes per left
    // row, candidates bounded by the window length; no cross join exists
    // in the plan at any scale.
    "t_range_join" -> Q(
      fn = (s, dir) => {
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"))
        graft.operators.Temporal.rangeJoinCount(purchases, clicks,
          key = "user_id", ts = "ts", windowSeconds = 3600L, leftId = "event_id")
          .select(col("event_id"), col("user_id"), col("n_in_window"))
          .orderBy(col("event_id"))
      },
      oracle = Some(
        """WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
          |           FROM events WHERE event_type = 'purchase'),
          |c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
          |      FROM events WHERE event_type = 'click')
          |SELECT p.event_id, p.user_id,
          |  (SELECT count(*) FROM c WHERE c.user_id = p.user_id
          |     AND c.ts <= p.ts AND c.ts > p.ts - INTERVAL 3600 SECONDS) AS n_in_window
          |FROM p ORDER BY p.event_id""".stripMargin),
      doc = "bounded range join: per-event trailing-window count (time-bucket equi-join)"),

    // Skew-proof exact top-k per key (Skew.topKPerKey): partial top-k per
    // (key, salt) → merge — reducer state O(salts·k) on any hot key. The
    // oracle is the window/row_number formulation the salted plan must equal.
    // Output is exploded to scalar (event_type, rnk, value) rows — the merged
    // array posexplodes — because the driver's pandas canonicalization cannot
    // hash array cells (the round-3 red row). Deterministic under value ties:
    // the sorted top-k VALUE at each rank is a fixed multiset element even
    // though row_number's tiebreak is arbitrary.
    "skew_topk_per_key" -> Q(
      fn = (s, dir) =>
        graft.operators.Skew.topKPerKey(Tables.events(s, dir),
          col("event_type"), col("value"), 3)
          .select(col("key").as("event_type"), posexplode(col("top_k")))
          .select(col("event_type"), (col("pos") + 1).cast("long").as("rnk"),
            col("col").as("value"))
          .orderBy(col("event_type"), col("rnk")),
      oracle = Some(
        """WITH r AS (SELECT event_type, value,
          |  row_number() OVER (PARTITION BY event_type ORDER BY value DESC) AS rn
          |  FROM events)
          |SELECT event_type, rn AS rnk, value FROM r WHERE rn <= 3
          |ORDER BY event_type, rnk""".stripMargin),
      doc = "skew-proof per-key top-k (salted partial merge == window top-k)"),

    // Keyed sliding-window analytics: per-user rolling 4-row sum + previous
    // value. ONE shuffle on user_id, then a sequential frame scan per key —
    // no global window (PlanAudit-clean by construction). The frame sum runs
    // over DECIMAL so Spark's running accumulation and DuckDB's segment-tree
    // window aggregation (different association orders!) are both exact.
    // Total order inside each key: (ts, event_id) — event_id is unique.
    "e_user_rolling" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val wf = w.rowsBetween(-3, 0)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("value"),
            row_number().over(w).as("rn"),
            lag(col("value"), 1).over(w).as("prev_value"),
            sum(col("value").cast(DecimalType(18, 4))).over(wf).cast("double")
              .as("roll_sum4"),
            count(lit(1)).over(wf).as("roll_n"))
          .orderBy(col("event_id"))
      },
      oracle = Some(
        """SELECT user_id, event_id, value,
          |  row_number() OVER w AS rn,
          |  lag(value, 1) OVER w AS prev_value,
          |  CAST(sum(CAST(value AS DECIMAL(18,4)))
          |    OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_sum4,
          |  count(*) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS roll_n
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
          |ORDER BY event_id""".stripMargin),
      doc = "per-key sliding frame: rolling decimal sum + lag, keyed window only"),

    // Keyed RANGE-frame window: per-user trailing-1-hour event count and
    // DECIMAL value sum by VALUE RANGE over event-time micros (not row
    // count) — the time-windowed feature the ROWS-frame e_user_rolling
    // cannot express. Range frames include all peers of the boundary
    // instant in both engines (SQL standard), so ties need no tiebreak for
    // the aggregate to be deterministic; output order still totals on
    // (event_id). The batch cousin of t_range_join, stated as one window.
    "e_user_timewindow" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600L * 1000000L, 0L)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            count(lit(1)).over(w).as("n_trailing_1h"),
            sum(col("value").cast(DecimalType(18, 4))).over(w).cast("double")
              .as("sum_trailing_1h"))
          .orderBy(col("event_id"))
      },
      oracle = Some(
        """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
          |  count(*) OVER w AS n_trailing_1h,
          |  CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
          |    AS sum_trailing_1h
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
          |  RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
          |ORDER BY event_id""".stripMargin),
      doc = "keyed RANGE frame: trailing-1h count + decimal sum by event-time range"),

    // Cohort retention: users bucketed by first-seen week, activity counted
    // per (cohort_week, week_offset). Two keyed aggregations — first-seen is
    // a groupBy(user) min, cohorts join back on user_id (co-partitioned at
    // scale, AQE-broadcast at small SF), then a two-level distinct so
    // reducer keys are (cohort, offset, user), never raw events. Week index
    // is integer day-arithmetic from a fixed epoch — no date_trunc
    // semantics risk across engines.
    "events_retention" -> Q(
      fn = (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"),
            floor(datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")) / 7)
              .cast("int").as("week"))
        val cohorts = ev.groupBy(col("user_id"))
          .agg(min(col("week")).as("cohort_week"))
        ev.join(cohorts, Seq("user_id"))
          .groupBy(col("cohort_week"),
            (col("week") - col("cohort_week")).as("week_offset"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .groupBy(col("cohort_week"), col("week_offset"))
          .agg(count(lit(1)).as("n_users"),
            sum(col("n_events")).as("n_events"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      oracle = Some(
        """WITH ev AS (SELECT user_id,
          |    CAST(floor(date_diff('day', DATE '2024-01-01',
          |      CAST(CAST(ts AS TIMESTAMP) AS DATE)) / 7) AS INT) AS week
          |  FROM events),
          |c AS (SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY 1),
          |pu AS (SELECT cohort_week, week - cohort_week AS week_offset,
          |    ev.user_id, count(*) AS n_events
          |  FROM ev JOIN c ON ev.user_id = c.user_id GROUP BY 1, 2, 3)
          |SELECT cohort_week, week_offset, count(*) AS n_users,
          |  CAST(sum(n_events) AS BIGINT) AS n_events
          |FROM pu GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "cohort retention census: first-seen week x offset, two-level distinct"),

    // Incremental materialized-view refresh: the stored aggregate is a
    // table of PARTIAL (count, decimal-sum) states; a new batch merges by
    // union + re-reduce — batch-only scan, group-sized merge. The oracle
    // recomputes from ALL rows, so the hash match IS the proof that the
    // algebraic merge equals a full recompute.
    "mv_incremental_refresh" -> Q(
      fn = (s, dir) => {
        import graft.operators.Incremental
        val ev = Tables.events(s, dir)
        val cutoff = lit("2024-01-20 00:00:00").cast("timestamp")
        val stored = Incremental.partialAgg(
          ev.filter(col("ts") < cutoff), Seq("user_id"), "value")
        val batch = Incremental.partialAgg(
          ev.filter(col("ts") >= cutoff), Seq("user_id"), "value")
        Incremental.mvRefresh(stored, batch, Seq("user_id"))
          .select(col("user_id"), col("n").as("n_events"),
            col("s").cast("double").as("sum_value"))
          .orderBy(col("user_id"))
      },
      oracle = Some(
        """SELECT user_id, count(*) AS n_events,
          |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      doc = "incremental MV refresh: partial-state union + re-reduce == full recompute"),

    // SCD2 history reconstruction from the append-only event log: per key
    // each entry is valid [its ts, next ts) with the last open-ended — one
    // keyed lead() window, O(1) state, the warehouse dimension-history
    // shape.
    "scd2_intervals" -> Q(
      fn = (s, dir) =>
        graft.operators.Incremental.scd2FromLog(
          Tables.events(s, dir)
            .select(col("user_id"), col("event_id"), col("event_type"), col("ts")),
          key = "user_id", ts = "ts", tiebreak = "event_id")
          .select(col("user_id"), col("event_id"), col("event_type"),
            col("valid_from"), col("valid_to"), col("is_current"))
          .orderBy(col("user_id"), col("valid_from"), col("event_id")),
      oracle = Some(
        """SELECT user_id, event_id, event_type,
          |  CAST(ts AS TIMESTAMP) AS valid_from,
          |  lead(CAST(ts AS TIMESTAMP)) OVER w AS valid_to,
          |  lead(CAST(ts AS TIMESTAMP)) OVER w IS NULL AS is_current
          |FROM events
          |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
          |ORDER BY user_id, valid_from, event_id""".stripMargin),
      doc = "SCD2 validity intervals from a change log (keyed lead window)"),

    // Time-travel read: per-key state AS OF a timestamp. NOT a filter over
    // materialized SCD2 history — the scale form: time predicate pushed to
    // the scan + one partial-agg'd max(struct) per key (last event ≤ T),
    // O(1) reducer state however long each key's history. Oracle takes the
    // SCD2 interval route (row_number over the filtered log) — agreement
    // proves the aggregation formulation == the interval semantics.
    "scd2_time_travel" -> Q(
      fn = (s, dir) =>
        graft.operators.Incremental.stateAt(
          Tables.events(s, dir)
            .select(col("user_id"), col("event_id"), col("event_type"), col("ts")),
          key = "user_id", ts = "ts", tiebreak = "event_id",
          at = to_timestamp(lit("2024-01-20 00:00:00")),
          payload = Seq("event_type"))
          .orderBy(col("user_id")),
      oracle = Some(
        """SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
          |FROM (SELECT user_id, ts, event_id, event_type, row_number() OVER (
          |    PARTITION BY user_id
          |    ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
          |  FROM events WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-20')
          |WHERE rn = 1 ORDER BY user_id""".stripMargin),
      doc = "time-travel point read: pushed time predicate + keyed max(struct), no history window"),

    // Marketing-style first/last-touch attribution: for each converting
    // user, the earliest and latest touch (click/view) strictly before
    // their FIRST purchase. Both sides are keyed min/max(struct) — one
    // shuffle on user_id, O(1) reducer state per user (no event-list
    // collection, no per-user sort). Lexicographic struct comparison gives
    // a total order (event_id breaks ts ties) so first/last are unique.
    "events_attribution" -> Q(
      fn = (s, dir) => {
        val e = Tables.events(s, dir)
        val firstPurchase = e.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(min(struct(col("ts"), col("event_id"))).as("p"))
        e.filter(col("event_type").isin("click", "view"))
          .join(firstPurchase, Seq("user_id"))
          .filter(struct(col("ts"), col("event_id")) < col("p"))
          .groupBy(col("user_id"))
          .agg(
            min(struct(col("ts"), col("event_id"), col("event_type"))).as("ft"),
            max(struct(col("ts"), col("event_id"), col("event_type"))).as("lt"))
          .groupBy(col("ft.event_type").as("first_touch"),
            col("lt.event_type").as("last_touch"))
          .agg(count(lit(1)).as("n_users"), sum(col("user_id")).as("user_id_sum"))
          .orderBy(col("first_touch"), col("last_touch"))
      },
      oracle = Some(
        """WITH p AS (SELECT user_id,
          |    min(struct_pack(ts := CAST(ts AS TIMESTAMP), event_id := event_id)) AS p
          |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
          |t AS (SELECT e.user_id, CAST(e.ts AS TIMESTAMP) AS ts, e.event_id, e.event_type
          |      FROM events e JOIN p USING (user_id)
          |      WHERE e.event_type IN ('click', 'view')
          |        AND struct_pack(ts := CAST(e.ts AS TIMESTAMP), event_id := e.event_id) < p.p),
          |a AS (SELECT user_id,
          |    min(struct_pack(ts := ts, event_id := event_id, et := event_type)) AS ft,
          |    max(struct_pack(ts := ts, event_id := event_id, et := event_type)) AS lt
          |  FROM t GROUP BY user_id)
          |SELECT struct_extract(ft, 'et') AS first_touch,
          |       struct_extract(lt, 'et') AS last_touch,
          |       count(*) AS n_users, CAST(sum(user_id) AS BIGINT) AS user_id_sum
          |FROM a GROUP BY 1, 2 ORDER BY first_touch, last_touch""".stripMargin),
      doc = "first/last-touch conversion attribution: keyed min/max(struct), no event-list state"),

    // Rate-spike anomaly census: hourly counts per event type vs the
    // trailing-24h baseline (RANGE frame on the integer hour index, current
    // hour excluded). Graded as the TOP-50 hours by spike ratio
    // n·prev_hours/prev_n (round-9 double of exact int64 products — both
    // factors ≪ 2^53) rather than a fixed ×3 gate: the smooth synthetic
    // stream never crosses 3× (r8 bench timed a zero-row line), while the
    // ranked census exercises the identical trailing window and always
    // emits rows. Frames with under 12 baseline hours abstain. Window is
    // keyed by event_type, so hot streams parallelize and nothing
    // single-partitions; the top-50 is a TakeOrdered, not a global sort.
    "events_rate_spike" -> Q(
      fn = (s, dir) => {
        val hours = Tables.events(s, dir)
          .groupBy(col("event_type"),
            // integer `div`, not `/`: double division has a 2^53 ceiling and
            // truncates differently for pre-1970 (negative-epoch) instants
            expr("unix_micros(ts) div 3600000000").as("hour_idx"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("hour_idx"))
          .rangeBetween(-24, -1)
        hours
          .withColumn("prev_n", sum(col("n")).over(w))
          .withColumn("prev_hours", count(lit(1)).over(w))
          .filter(col("prev_hours") >= 12)
          .select(col("event_type"), col("hour_idx"), col("n"),
            col("prev_hours"), col("prev_n"),
            round((col("n") * col("prev_hours")).cast("double") /
              col("prev_n").cast("double"), 9).as("rate_ratio"))
          .orderBy(col("rate_ratio").desc, col("event_type"), col("hour_idx"))
          .limit(50)
      },
      oracle = Some(
        """WITH h AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS hour_idx,
          |    count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |w AS (SELECT event_type, hour_idx, n,
          |    CAST(sum(n) OVER tr AS BIGINT) AS prev_n,
          |    count(*) OVER tr AS prev_hours
          |  FROM h WINDOW tr AS (PARTITION BY event_type ORDER BY hour_idx
          |    RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING))
          |SELECT event_type, hour_idx, n, prev_hours, prev_n,
          |  round(CAST(n * prev_hours AS DOUBLE) / CAST(prev_n AS DOUBLE), 9)
          |    AS rate_ratio
          |FROM w WHERE prev_hours >= 12
          |ORDER BY rate_ratio DESC, event_type, hour_idx LIMIT 50""".stripMargin),
      doc = "trailing-baseline rate-spike census: keyed RANGE frame, exact int ratio factors, round-9 top-50"),

    // Full CUBE over (event_type, hour-of-day): all four grouping sets in
    // ONE Expand pass (rows fan out ×4 map-side, then one combinable
    // aggregation — never four scans). grouping_id disambiguates NULL
    // group values from NULL data; DECIMAL-cast value sums per invariant.
    "events_cube" -> Q(
      // hour-of-day from integer epoch math, NOT hour(ts): Spark's hour() is
      // session-timezone-dependent and the grading SparkSession (the
      // driver's) does not promise UTC. Epoch microseconds are TZ-free.
      fn = (s, dir) => Tables.events(s, dir)
        .withColumn("hour_of_day",
          // integer `div` + pmod (not float `/`): exact at any epoch magnitude
          expr("pmod(unix_micros(ts) div 3600000000, 24)"))
        .cube(col("event_type"), col("hour_of_day"))
        // DECIMAL keeps the sum order-free/exact; the EMITTED column is
        // DOUBLE (k/1e6, k ≪ 2^53 — identical round-to-nearest on both
        // engines) per the graded-output rule from the r7 verdict
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(30, 6))).cast(DecimalType(30, 6))
            .cast("double").as("total_value"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("event_type"), col("hour_of_day")),
      oracle = Some(
        """SELECT event_type,
          |  epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 % 24 AS hour_of_day,
          |  count(*) AS n,
          |  CAST(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DECIMAL(30,6))
          |    AS DOUBLE) AS total_value,
          |  CAST(grouping(event_type) * 2
          |    + grouping(epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 % 24)
          |    AS BIGINT) AS gid
          |FROM events
          |GROUP BY CUBE (event_type, epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 % 24)
          |ORDER BY gid, event_type, hour_of_day""".stripMargin),
      doc = "CUBE grouping sets: one Expand pass, grouping_id-tagged, DECIMAL sums"),




    // Exponentially-decayed activity leaderboard with INTEGER decay:
    // weight = 2^(16 - min(age_days, 16)) — halve per day of age, floor at
    // 1 — so the ranking is exact at any scale (float decay drifts under
    // reassociation; bit shifts cannot). Reference time is the stream's
    // own max(ts), so the query is rerun-stable.
    "events_decay_leaderboard" -> Q(
      fn = (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("user_id"), expr("unix_micros(ts)").as("us"))
        val mx = e.agg(max(col("us")).as("mxus"))
        e.crossJoin(mx)
          .withColumn("halvings",
            least(expr("(mxus - us) div 86400000000"), lit(16L)))
          .withColumn("w", expr("shiftleft(cast(1 as bigint), cast(16 - halvings as int))"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), sum(col("w")).as("score"))
          .orderBy(col("score").desc, col("user_id"))
          .limit(10)
      },
      oracle = Some(
        """WITH e AS (SELECT user_id,
          |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
          |mx AS (SELECT max(us) AS mxus FROM e),
          |w AS (SELECT user_id,
          |    (1::BIGINT << CAST(16 - least((mxus - us) // 86400000000, 16) AS INT)) AS w
          |  FROM e CROSS JOIN mx)
          |SELECT user_id, count(*) AS n_events, CAST(sum(w) AS BIGINT) AS score
          |FROM w GROUP BY user_id
          |ORDER BY score DESC, user_id LIMIT 10""".stripMargin),
      doc = "decayed leaderboard: integer halving decay (bit shifts, reassociation-proof), top-10 by score"),

    // Watermark-lateness census: for each event (in event_id arrival
    // order), how far behind the running high-water mark its event time
    // sits — the measurement that tunes withWatermark() delay. The running
    // max is the two-pass prefix operator (no global window); lateness
    // tiers are exact integer µs.
    "events_watermark_lateness" -> Q(
      fn = (s, dir) => {
        // arrival model: event time + deterministic 0-2h delivery delay
        // (md5 of event_id) — the realistic mostly-ordered stream whose
        // stragglers a watermark has to absorb
        val e = Tables.events(s, dir)
          .select(col("event_id"), expr("unix_micros(ts)").as("us"))
          .withColumn("arr", col("us") +
            expr("cast(conv(substring(md5(cast(event_id as string)), 1, 15), 16, 10) as bigint) % 7200000000"))
        val late = graft.operators.Prefix
          .withRunningMaxExcl(e, Seq(col("arr"), col("event_id")), col("us"), 32)
          .select(greatest(lit(0L),
            coalesce(col("run_max_excl") - col("us"), lit(0L))).as("late_us"))
        late.select(
          when(col("late_us") === 0, "a_ontime")
            .when(col("late_us") <= 60000000L, "b_le_1min")
            .when(col("late_us") <= 600000000L, "c_le_10min")
            .when(col("late_us") <= 3600000000L, "d_le_1h")
            .otherwise("e_gt_1h").as("tier"),
          col("late_us"))
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n"), max(col("late_us")).as("max_late_us"))
          .orderBy(col("tier"))
      },
      oracle = Some(
        """WITH e AS (SELECT event_id,
          |    epoch_us(CAST(ts AS TIMESTAMP)) AS us,
          |    epoch_us(CAST(ts AS TIMESTAMP))
          |      + CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT)
          |        % 7200000000 AS arr FROM events),
          |r AS (SELECT us, max(us) OVER (ORDER BY arr, event_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm FROM e),
          |l AS (SELECT greatest(0, coalesce(rm - us, 0)) AS late_us FROM r),
          |t AS (SELECT CASE WHEN late_us = 0 THEN 'a_ontime'
          |    WHEN late_us <= 60000000 THEN 'b_le_1min'
          |    WHEN late_us <= 600000000 THEN 'c_le_10min'
          |    WHEN late_us <= 3600000000 THEN 'd_le_1h'
          |    ELSE 'e_gt_1h' END AS tier, late_us FROM l)
          |SELECT tier, count(*) AS n, max(late_us) AS max_late_us
          |FROM t GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "watermark-lateness census: two-pass running high-water mark, integer-µs tiers"),

    // 15-minute OHLC bars per event type — the time-series resampling
    // verb. open/close are exact arg-min/arg-max by an in-bar integer key
    // (µs offset × 1e7 + event_id: unique, so zero tie surface); high/low
    // plain min/max; no double is ever summed. One map-side-combined
    // groupBy; the bar relation is (type × time)-bounded at any volume.
    "t_resample_ohlc" -> Q(
      fn = (s, dir) =>
        Tables.events(s, dir)
          .select(col("event_type"), col("value"),
            expr("unix_micros(ts) div 900000000").as("bar"),
            (expr("unix_micros(ts) % 900000000") * 10000000L + col("event_id")).as("k"))
          .groupBy(col("event_type"), col("bar"))
          .agg(min_by(col("value"), col("k")).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max_by(col("value"), col("k")).as("close"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type"), col("bar")),
      oracle = Some(
        """WITH e AS (SELECT event_type, event_id, value,
          |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
          |b AS (SELECT event_type, us // 900000000 AS bar,
          |    (us % 900000000) * 10000000 + event_id AS k, value FROM e)
          |SELECT event_type, bar, arg_min(value, k) AS open, max(value) AS high,
          |  min(value) AS low, arg_max(value, k) AS close, count(*) AS n
          |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "time-series resampling: 15-min OHLC bars with exact integer-keyed open/close"),

    // Interval-OVERLAP join — the interval×interval sibling of t_range_join
    // (point-in-range): which user activity windows [first event, last
    // event] of each day overlapped each incident window, and for how long.
    // Spark has no native interval join; the scale shape here is
    // bucketization: activity intervals explode to the hour buckets they
    // span (bounded by interval length — ≤ 25 per day-window), incidents
    // are intra-hour so each lives in EXACTLY ONE bucket — which makes the
    // bucket equi-join emit every overlapping pair exactly once with NO
    // distinct pass (the usual dedup step of bucketed interval joins falls
    // away when one side is bucket-bounded). Incident side broadcasts
    // (bounded by distinct hours); overlap µs is exact integer arithmetic.
    // The oracle proves the bucketed form ≡ a naive theta join.
    "t_interval_join" -> Q(
      fn = (s, dir) => {
        val ev = Tables.events(s, dir)
        val act = ev.groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
          .agg(min(col("ts")).as("a_start"), max(col("ts")).as("a_end"),
            count(lit(1)).as("n_ev"))
          .filter(col("n_ev") >= 2)
        val inc = ev.select(date_trunc("hour", col("ts")).as("h")).distinct()
          .filter(expr("cast(conv(substring(md5(concat('inc|', " +
            "cast(unix_micros(h) div 3600000000 as string))), 1, 4), 16, 10) " +
            "as bigint) % 5 = 0"))
          .select(col("h").as("bucket"),
            (col("h") + expr("INTERVAL 10 MINUTES")).as("i_start"),
            (col("h") + expr("INTERVAL 40 MINUTES")).as("i_end"))
        val exploded = act.withColumn("bucket",
          explode(sequence(date_trunc("hour", col("a_start")),
            date_trunc("hour", col("a_end")), expr("INTERVAL 1 HOUR"))))
        val raw = expr("least(unix_micros(a_end), unix_micros(i_end)) - " +
          "greatest(unix_micros(a_start), unix_micros(i_start))")
        exploded.join(broadcast(inc), Seq("bucket"))
          .filter(col("a_start") < col("i_end") && col("a_end") >= col("i_start"))
          .groupBy(col("i_start"))
          .agg(count(lit(1)).as("n_windows"),
            countDistinct(col("user_id")).as("n_users"),
            sum(greatest(raw, lit(0L))).as("total_overlap_us"),
            max(greatest(raw, lit(0L))).as("max_overlap_us"))
          .orderBy(col("i_start"))
      },
      oracle = Some(
        """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
          |act AS (SELECT user_id, min(ts) AS a_start, max(ts) AS a_end
          |  FROM (SELECT user_id, ts, date_trunc('day', ts) AS day FROM e)
          |  GROUP BY user_id, day HAVING count(*) >= 2),
          |inc AS (SELECT h + INTERVAL 10 MINUTE AS i_start, h + INTERVAL 40 MINUTE AS i_end
          |  FROM (SELECT DISTINCT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h FROM events)
          |  WHERE CAST(('0x' || substr(md5('inc|' ||
          |    CAST(epoch_us(h) // 3600000000 AS VARCHAR)), 1, 4)) AS BIGINT) % 5 = 0),
          |ov AS (SELECT i.i_start, a.user_id,
          |    least(epoch_us(a.a_end), epoch_us(i.i_end))
          |      - greatest(epoch_us(a.a_start), epoch_us(i.i_start)) AS raw
          |  FROM act a JOIN inc i ON a.a_start < i.i_end AND a.a_end >= i.i_start)
          |SELECT i_start, count(*) AS n_windows, count(DISTINCT user_id) AS n_users,
          |  CAST(sum(greatest(raw, 0)) AS BIGINT) AS total_overlap_us,
          |  CAST(max(greatest(raw, 0)) AS BIGINT) AS max_overlap_us
          |FROM ov GROUP BY i_start ORDER BY i_start""".stripMargin),
      doc = "interval-overlap join via hour bucketization (dedup-free: incidents are intra-hour), broadcast incident side"),

    // CUSUM changepoint census over hourly counts — the classical
    // sequential detector S_i = max(0, S_{i-1} + (x_i - k)) looks
    // inherently recursive, but it has a closed windowed form:
    //   S_i = P_i - min_{j<=i} P_j   where P is the prefix sum of (x_i - k).
    // That identity (spec-pinned in StatsSpec against the literal fold)
    // turns the detector into two keyed running windows — fully parallel
    // across event types, shuffle-free past the hourly pre-aggregation.
    // All arithmetic is scaled-integer: with k = mean = total/n, work in
    // units of 1/n (n·x_i - total), so P and S are exact BIGINTs — no
    // float mean, no reassociation drift. The alarm gate S > 2·mean
    // becomes cusum_scaled > 2·total in the same units.
    "events_cusum_changepoint" -> Q(
      fn = (s, dir) => {
        val hours = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("h"))
          .agg(count(lit(1)).as("x"))
        val tot = hours.groupBy(col("event_type"))
          .agg(sum(col("x")).as("total"), count(lit(1)).as("n"))
        val wOrd = Window.partitionBy(col("event_type")).orderBy(col("h"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val c = hours.join(broadcast(tot), "event_type")
          .withColumn("pref", sum(col("n") * col("x")).over(wRun) -
            row_number().over(wOrd).cast("long") * col("total"))
          // min over j<=i must INCLUDE the empty prefix P_0 = 0 (S_0 = 0):
          // a series that opens above the mean has all P_j > 0 and the
          // unclamped min would over-subtract. Hence least(min, 0).
          .withColumn("cusum",
            col("pref") - least(min(col("pref")).over(wRun), lit(0L)))
        c.withColumn("mx",
            max(col("cusum")).over(Window.partitionBy(col("event_type"))))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"),
            max(col("cusum")).as("max_cusum_scaled"),
            min(when(col("cusum") === col("mx"), col("h"))).as("argmax_hour"),
            sum(when(col("cusum") > lit(2L) * col("total"), 1L).otherwise(0L))
              .as("n_alarm_hours"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH hc AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h, count(*) AS x
          |  FROM events GROUP BY 1, 2),
          |tot AS (SELECT event_type, sum(x) AS total, count(*) AS n
          |  FROM hc GROUP BY 1),
          |p AS (SELECT hc.event_type, h, total,
          |    sum(n * x) OVER (PARTITION BY hc.event_type ORDER BY h
          |      ROWS UNBOUNDED PRECEDING)
          |      - row_number() OVER (PARTITION BY hc.event_type ORDER BY h)
          |        * total AS pref
          |  FROM hc JOIN tot USING (event_type)),
          |c AS (SELECT event_type, h, total,
          |    pref - least(min(pref) OVER (PARTITION BY event_type ORDER BY h
          |      ROWS UNBOUNDED PRECEDING), 0) AS cusum
          |  FROM p),
          |c2 AS (SELECT *, max(cusum) OVER (PARTITION BY event_type) AS mx FROM c)
          |SELECT event_type, count(*) AS n_hours,
          |  CAST(max(cusum) AS BIGINT) AS max_cusum_scaled,
          |  CAST(min(h) FILTER (WHERE cusum = mx) AS BIGINT) AS argmax_hour,
          |  CAST(count(*) FILTER (WHERE cusum > 2 * total) AS BIGINT)
          |    AS n_alarm_hours
          |FROM c2 GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "CUSUM changepoint via the prefix-sum/running-min identity: scaled-integer units, two keyed windows, no recursion"),

    // First-order Markov transition matrix over per-user event streams —
    // the session-model census behind next-action prediction and bot
    // detection (a user whose transition row is a delta function is a
    // script). One keyed lag window (user_id partitions parallelize the
    // sequence reconstruction), integer bigram counts, and transition
    // probabilities as one exact int division rounded 1e-9. The matrix
    // itself is |event types|² rows — driver-safe at any corpus size.
    "events_markov_transition" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val b = Tables.events(s, dir)
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev"), col("event_type").as("nxt"))
          .agg(count(lit(1)).as("n"))
        val r = b.groupBy(col("prev")).agg(sum(col("n")).as("row_n"))
        b.join(broadcast(r), "prev")
          .select(col("prev"), col("nxt"), col("n"), col("row_n"),
            round(col("n").cast("double") / col("row_n").cast("double"), 9)
              .as("p"))
          .orderBy(col("prev"), col("nxt"))
      },
      oracle = Some(
        """WITH o AS (SELECT user_id, event_type,
          |    lag(event_type) OVER (PARTITION BY user_id
          |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
          |  FROM events),
          |b AS (SELECT prev, event_type AS nxt, count(*) AS n
          |  FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
          |r AS (SELECT prev, sum(n) AS row_n FROM b GROUP BY 1)
          |SELECT prev, nxt, n, CAST(row_n AS BIGINT) AS row_n,
          |  round(CAST(n AS DOUBLE) / row_n, 9) AS p
          |FROM b JOIN r USING (prev) ORDER BY prev, nxt""".stripMargin),
      doc = "first-order Markov transition matrix: keyed lag window, integer bigram counts, round-9 row-normalized probabilities"),

    // Per-type linear trend forecast over hourly counts — ordinary least
    // squares from INTEGER sufficient statistics (n, Σx, Σy, Σxy, Σx²),
    // the classic combinable-aggregate shape: every statistic map-side
    // combines, so the fit costs one keyed aggregation at any history
    // length. x is re-based per type (hours since first activity) to keep
    // the moments small; slope/intercept are the only doubles, derived
    // from exact integers in one fixed expression and rounded 1e-9.
    "events_forecast_linreg" -> Q(
      fn = (s, dir) => {
        val h = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("t"))
          .agg(count(lit(1)).as("y"))
        val z = h.withColumn("x",
          col("t") - min(col("t")).over(Window.partitionBy(col("event_type"))))
        val st = z.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
        val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
        val den = col("n") * col("sxx") - col("sx") * col("sx")
        st.select(col("event_type"), col("n").as("n_hours"),
            col("sx").as("sum_x"), col("sy").as("sum_y"),
            col("sxy").as("sum_xy"), col("sxx").as("sum_xx"),
            round(num / den, 9).as("slope"),
            round((col("sy").cast("double") - (num / den) * col("sx")) /
              col("n"), 9).as("intercept"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH h AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS t, count(*) AS y
          |  FROM events GROUP BY 1, 2),
          |z AS (SELECT event_type,
          |    t - min(t) OVER (PARTITION BY event_type) AS x, y FROM h),
          |s AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
          |    sum(x * y) AS sxy, sum(x * x) AS sxx FROM z GROUP BY 1)
          |SELECT event_type, CAST(n AS BIGINT) AS n_hours,
          |  CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
          |  CAST(sxy AS BIGINT) AS sum_xy, CAST(sxx AS BIGINT) AS sum_xx,
          |  round(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx), 9)
          |    AS slope,
          |  round((CAST(sy AS DOUBLE)
          |    - (CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)) * sx)
          |    / n, 9) AS intercept
          |FROM s ORDER BY event_type""".stripMargin),
      doc = "OLS trend per event type: integer sufficient statistics (combinable), re-based hour axis, round-9 slope/intercept"),

    // Exponentially-weighted moving average — the one statistic in this
    // family that genuinely IS sequential (every prefix value feeds the
    // next; no windowed identity exists). The portable-exactness trick:
    // both engines fold the SAME doubles in the SAME order — collect the
    // per-type hourly series as a sorted array and run the recurrence as
    // an ordered higher-order aggregate (Spark `aggregate`, DuckDB
    // `list_reduce`). IEEE ops are deterministic, so identical op
    // sequences give bit-identical results; round-9 is belt-and-braces.
    // Per-key state is bounded by the hourly history length (~10³ rows
    // per type-year), and types parallelize — the collect is keyed,
    // never global.
    "events_ewma" -> Q(
      fn = (s, dir) => {
        val h = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("t"))
          .agg(count(lit(1)).as("y"))
        h.groupBy(col("event_type"))
          .agg(sort_array(collect_list(struct(col("t"), col("y")))).as("tys"))
          .withColumn("ys", transform(col("tys"), x => x.getField("y").cast("double")))
          .select(col("event_type"),
            size(col("ys")).cast("long").as("n_hours"),
            element_at(col("ys"), -1).cast("long").as("last_y"),
            round(aggregate(
              slice(col("ys"), lit(2), greatest(size(col("ys")) - 1, lit(0))),
              element_at(col("ys"), 1),
              (acc, y) => (acc + y) / lit(2.0)), 9).as("ewma_half"),
            round(aggregate(
              slice(col("ys"), lit(2), greatest(size(col("ys")) - 1, lit(0))),
              element_at(col("ys"), 1),
              (acc, y) => lit(0.75) * acc + lit(0.25) * y), 9).as("ewma_quarter"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH h AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS t, count(*) AS y
          |  FROM events GROUP BY 1, 2),
          |l AS (SELECT event_type, list(y ORDER BY t) AS ys FROM h GROUP BY 1)
          |SELECT event_type, CAST(len(ys) AS BIGINT) AS n_hours,
          |  CAST(ys[len(ys)] AS BIGINT) AS last_y,
          |  round(list_reduce(list_transform(ys, y -> CAST(y AS DOUBLE)),
          |    (acc, y) -> (acc + y) / 2.0), 9) AS ewma_half,
          |  round(list_reduce(list_transform(ys, y -> CAST(y AS DOUBLE)),
          |    (acc, y) -> 0.75 * acc + 0.25 * y), 9) AS ewma_quarter
          |FROM l ORDER BY event_type""".stripMargin),
      doc = "EWMA via ordered higher-order fold: identical IEEE op sequence on both engines, keyed collect bounded by history length"),

    // Holt double-exponential smoothing (level + trend) — the forecast the
    // EWMA can't make: it tracks a LINEAR drift instead of flattening it.
    // Same portable-exactness discipline as events_ewma: both engines fold
    // the same doubles in the same order (Spark ordered `aggregate` with a
    // struct state; DuckDB a recursive CTE carrying (l, b) — list_reduce
    // can't hold a two-field state, the recursion can). Init l=y₂,
    // b=y₂−y₁, fold from y₃ with α=1/2, β=1/4 (dyadic — exactly
    // representable); l' = αy+(1−α)(l+b), b' = β(l'−l)+(1−β)b, identical
    // literal op sequence both sides, round-9 only at the end. Keyed
    // collect bounded by hourly-history length, exactly as events_ewma.
    "events_holt_trend" -> Q(
      fn = (s, dir) => {
        val h = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("t"))
          .agg(count(lit(1)).as("y"))
        val lF = col("st").getField("l")
        val bF = col("st").getField("b")
        h.groupBy(col("event_type"))
          .agg(sort_array(collect_list(struct(col("t"), col("y")))).as("tys"))
          .withColumn("ys", transform(col("tys"), x => x.getField("y").cast("double")))
          .filter(size(col("ys")) >= 2)
          .withColumn("st", aggregate(
            slice(col("ys"), lit(3), greatest(size(col("ys")) - 2, lit(0))),
            struct(element_at(col("ys"), 2).as("l"),
              (element_at(col("ys"), 2) - element_at(col("ys"), 1)).as("b")),
            (acc, y) => {
              val l = acc.getField("l")
              val b = acc.getField("b")
              val lNew = lit(0.5) * y + lit(0.5) * (l + b)
              struct(lNew.as("l"),
                (lit(0.25) * (lNew - l) + lit(0.75) * b).as("b"))
            }))
          .select(col("event_type"),
            size(col("ys")).cast("long").as("n_hours"),
            round(lF, 9).as("level"), round(bF, 9).as("trend"),
            round(lF + lit(3.0) * bF, 9).as("forecast_h3"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH RECURSIVE h AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS t, count(*) AS y
          |  FROM events GROUP BY 1, 2),
          |o AS (SELECT event_type, CAST(y AS DOUBLE) AS y,
          |    row_number() OVER (PARTITION BY event_type ORDER BY t) AS i
          |  FROM h),
          |n AS (SELECT event_type, max(i) AS n FROM o GROUP BY 1),
          |hw(event_type, i, l, b) AS (
          |  SELECT a.event_type, CAST(2 AS BIGINT), b2.y, b2.y - a.y
          |  FROM o a JOIN o b2
          |    ON a.event_type = b2.event_type AND a.i = 1 AND b2.i = 2
          |  UNION ALL
          |  SELECT hw.event_type, hw.i + 1,
          |    0.5 * o.y + 0.5 * (hw.l + hw.b),
          |    0.25 * ((0.5 * o.y + 0.5 * (hw.l + hw.b)) - hw.l) + 0.75 * hw.b
          |  FROM hw JOIN o
          |    ON o.event_type = hw.event_type AND o.i = hw.i + 1)
          |SELECT n.event_type, CAST(n.n AS BIGINT) AS n_hours,
          |  round(hw.l, 9) AS level, round(hw.b, 9) AS trend,
          |  round(hw.l + 3.0 * hw.b, 9) AS forecast_h3
          |FROM hw JOIN n ON hw.event_type = n.event_type AND hw.i = n.n
          |WHERE n.n >= 2 ORDER BY n.event_type""".stripMargin),
      doc = "Holt level+trend smoothing: dyadic α/β, identical IEEE fold both engines, 3-hour-ahead forecast"),

    // Classical additive seasonal decomposition (the moving-average
    // y = trend + seasonal + residual split, period 7 on daily counts) —
    // the other face of the Holt-Winters coin: HW smooths forward for
    // forecasting, decomposition explains the history. Kept EXACT by
    // working in 7×-scaled integer space end to end: trend7 = Σ of the
    // centered 7-day window (integer), detrended7 = 7·y − trend7 (integer),
    // and the per-day-of-week seasonal index only divides at the very end
    // (two integer-ratio divisions, fixed order — deterministic IEEE both
    // engines; round-6 is cosmetic). Centering subtracts the grand
    // detrended mean, so the count-weighted seasonal indices sum to zero.
    // One groupBy + one partitioned window + one tiny reduce — scan-linear,
    // state bounded by days×types at any corpus size.
    "events_classical_decompose" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("d"))
          .agg(count(lit(1)).as("y"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
          .rowsBetween(-3, 3)
        val det = daily
          .withColumn("t7", sum(col("y")).over(w))
          .withColumn("nw", count(col("y")).over(w))
          .filter(col("nw") === 7) // full centered window only
          .withColumn("dow", pmod(col("d"), lit(7)))
          .withColumn("det7", lit(7L) * col("y") - col("t7"))
        val g = det.groupBy(col("event_type"))
          .agg(sum(col("det7")).as("gs"), count(lit(1)).as("gn"))
        det.groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("n_obs"), sum(col("det7")).as("det7_sum"))
          .join(g, Seq("event_type"))
          .select(col("event_type"), col("dow"), col("n_obs"), col("det7_sum"),
            (round(col("det7_sum").cast("double") / (lit(7.0) * col("n_obs")), 6) + 0.0)
              .as("seasonal_mean"),
            (round(col("det7_sum").cast("double") / (lit(7.0) * col("n_obs"))
              - col("gs").cast("double") / (lit(7.0) * col("gn")), 6) + 0.0)
              .as("seasonal_centered"))
          .orderBy(col("event_type"), col("dow"))
      },
      oracle = Some(
        """WITH dly AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS d, count(*) AS y
          |  FROM events GROUP BY 1, 2),
          |w AS (SELECT event_type, d, y,
          |    sum(y) OVER (PARTITION BY event_type ORDER BY d
          |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS t7,
          |    count(y) OVER (PARTITION BY event_type ORDER BY d
          |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS nw
          |  FROM dly),
          |det AS (SELECT event_type, d % 7 AS dow, 7 * y - t7 AS det7
          |  FROM w WHERE nw = 7),
          |g AS (SELECT event_type, CAST(sum(det7) AS BIGINT) AS gs, count(*) AS gn
          |  FROM det GROUP BY 1)
          |SELECT det.event_type, dow, count(*) AS n_obs,
          |  CAST(sum(det7) AS BIGINT) AS det7_sum,
          |  round(CAST(sum(det7) AS DOUBLE) / (7.0 * count(*)), 6) + 0.0 AS seasonal_mean,
          |  round(CAST(sum(det7) AS DOUBLE) / (7.0 * count(*))
          |    - CAST(gs AS DOUBLE) / (7.0 * gn), 6) + 0.0 AS seasonal_centered
          |FROM det JOIN g USING (event_type)
          |GROUP BY det.event_type, dow, gs, gn
          |ORDER BY 1, 2""".stripMargin),
      doc = "classical additive decomposition, period 7: centered-MA trend and day-of-week seasonal indices in exact 7x-scaled integer space"),

    // Holt-Winters ADDITIVE seasonal smoothing (m = 24, the diurnal cycle)
    // — what Holt can't see: traffic that swings by hour-of-day. State is
    // (level, trend, 24-slot seasonal queue); the queue head is always the
    // seasonal factor for the CURRENT step, so update = pop + append —
    // no modular indexing in the fold. Init: l₀ = mean(day 1),
    // b₀ = (mean(day 2) − mean(day 1))/24², sᵢ = yᵢ − l₀; fold from hour 49
    // with dyadic α=1/2, β=1/4, γ=1/2. Exactness discipline is
    // events_holt_trend's: both engines run the IDENTICAL IEEE op sequence —
    // Spark an ordered `aggregate` with a struct{l, b, s: array} state,
    // DuckDB a recursive CTE carrying a LIST column — so every double
    // matches bit-for-bit and round-9 is cosmetic. After the final step
    // s[h] is the factor for hour n+h, so forecast_h3 = l + 3b + s[3].
    // Keyed collect bounded by hourly history (~10³/type-year); types
    // parallelize; at 100 TB the fold state is O(m) per key, constant.
    "events_holt_winters" -> Q(
      fn = (s, dir) => {
        val h = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("t"))
          .agg(count(lit(1)).as("y"))
        val lF = col("st").getField("l")
        val bF = col("st").getField("b")
        val sF = col("st").getField("s")
        h.groupBy(col("event_type"))
          .agg(sort_array(collect_list(struct(col("t"), col("y")))).as("tys"))
          .withColumn("ys", transform(col("tys"), x => x.getField("y").cast("double")))
          .filter(size(col("ys")) >= 49)
          .withColumn("a1", aggregate(slice(col("ys"), 1, 24),
            lit(0.0), (a, v) => a + v))
          .withColumn("a2", aggregate(slice(col("ys"), 25, 24),
            lit(0.0), (a, v) => a + v))
          .withColumn("st", aggregate(
            slice(col("ys"), lit(49), size(col("ys")) - 48),
            struct((col("a1") / lit(24.0)).as("l"),
              ((col("a2") - col("a1")) / lit(576.0)).as("b"),
              transform(slice(col("ys"), 1, 24),
                y => y - col("a1") / lit(24.0)).as("s")),
            (acc, y) => {
              val l = acc.getField("l")
              val b = acc.getField("b")
              val sArr = acc.getField("s")
              val sOld = element_at(sArr, 1)
              val lNew = lit(0.5) * (y - sOld) + lit(0.5) * (l + b)
              val bNew = lit(0.25) * (lNew - l) + lit(0.75) * b
              val sNew = lit(0.5) * (y - lNew) + lit(0.5) * sOld
              struct(lNew.as("l"), bNew.as("b"),
                concat(slice(sArr, 2, 23), array(sNew)).as("s"))
            }))
          .select(col("event_type"),
            size(col("ys")).cast("long").as("n_hours"),
            round(lF, 9).as("level"),
            (round(bF, 9) + 0.0).as("trend"),
            (round(element_at(sF, 3), 9) + 0.0).as("s_h3"),
            (round(array_max(sF) - array_min(sF), 9) + 0.0).as("seasonal_amp"),
            (round(lF + lit(3.0) * bF + element_at(sF, 3), 9) + 0.0)
              .as("forecast_h3"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH RECURSIVE h AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS t, count(*) AS y
          |  FROM events GROUP BY 1, 2),
          |o AS (SELECT event_type, CAST(y AS DOUBLE) AS y,
          |    row_number() OVER (PARTITION BY event_type ORDER BY t) AS i
          |  FROM h),
          |n AS (SELECT event_type, max(i) AS n FROM o GROUP BY 1
          |  HAVING max(i) >= 49),
          |ini AS (SELECT o.event_type, list(y ORDER BY i) AS ys
          |  FROM o JOIN n ON o.event_type = n.event_type AND o.i <= 48
          |  GROUP BY 1),
          |i2 AS (SELECT event_type,
          |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ys[1:24]),
          |      (a, v) -> a + v) AS a1,
          |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), ys[25:48]),
          |      (a, v) -> a + v) AS a2, ys
          |  FROM ini),
          |hw(event_type, i, l, b, s) AS (
          |  SELECT event_type, CAST(48 AS BIGINT), a1 / 24.0,
          |    (a2 - a1) / 576.0,
          |    list_transform(ys[1:24], y -> y - a1 / 24.0)
          |  FROM i2
          |  UNION ALL
          |  SELECT hw.event_type, hw.i + 1,
          |    0.5 * (o.y - s[1]) + 0.5 * (hw.l + hw.b),
          |    0.25 * ((0.5 * (o.y - s[1]) + 0.5 * (hw.l + hw.b)) - hw.l)
          |      + 0.75 * hw.b,
          |    list_append(s[2:24],
          |      0.5 * (o.y - (0.5 * (o.y - s[1]) + 0.5 * (hw.l + hw.b)))
          |        + 0.5 * s[1])
          |  FROM hw JOIN o
          |    ON o.event_type = hw.event_type AND o.i = hw.i + 1)
          |SELECT n.event_type, CAST(n.n AS BIGINT) AS n_hours,
          |  round(hw.l, 9) AS level,
          |  round(hw.b, 9) + 0.0 AS trend,
          |  round(hw.s[3], 9) + 0.0 AS s_h3,
          |  round(list_aggregate(hw.s, 'max') - list_aggregate(hw.s, 'min'), 9)
          |    + 0.0 AS seasonal_amp,
          |  round(hw.l + 3.0 * hw.b + hw.s[3], 9) + 0.0 AS forecast_h3
          |FROM hw JOIN n ON hw.event_type = n.event_type AND hw.i = n.n
          |ORDER BY n.event_type""".stripMargin),
      doc = "Holt-Winters additive m=24: (level, trend, seasonal-queue) fold, dyadic coefficients, identical IEEE chain both engines"),

    // 1-D Kalman filter over the hourly rate (local-level model): state
    // (x̂, P, K, Σinnov²), dyadic process noise q=1/4 and observation noise
    // r=4, so each step is: P⁻ = P + q; K = P⁻/(P⁻ + r); x̂ += K·(y − x̂);
    // P = (1−K)·P⁻. Unlike the EWMA family the gain ADAPTS — it starts
    // high (trust the data while P is large) and converges to the
    // steady-state Riccati fixed point; Σinnov² is the goodness-of-fit
    // the anomaly queries threshold on. One division per step, otherwise
    // +/·: every op correctly rounded, both engines run the IDENTICAL
    // sequence (Spark ordered `aggregate` with a 4-field struct state,
    // DuckDB a recursive CTE), so round-9 is cosmetic. Keyed collect
    // bounded by hourly history; state O(1) per key at any scale.
    "events_kalman_1d" -> Q(
      fn = (s, dir) => {
        val h = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("t"))
          .agg(count(lit(1)).as("y"))
        val xF = col("st").getField("x")
        val pF = col("st").getField("p")
        val kF = col("st").getField("k")
        val ssiF = col("st").getField("ssi")
        h.groupBy(col("event_type"))
          .agg(sort_array(collect_list(struct(col("t"), col("y")))).as("tys"))
          .withColumn("ys", transform(col("tys"), x => x.getField("y").cast("double")))
          .filter(size(col("ys")) >= 2)
          .withColumn("st", aggregate(
            slice(col("ys"), lit(2), size(col("ys")) - 1),
            struct(element_at(col("ys"), 1).as("x"), lit(1.0).as("p"),
              lit(0.0).as("k"), lit(0.0).as("ssi")),
            (acc, y) => {
              val x = acc.getField("x")
              val p = acc.getField("p")
              val pp = p + lit(0.25)
              val k = pp / (pp + lit(4.0))
              val innov = y - x
              struct((x + k * innov).as("x"),
                ((lit(1.0) - k) * pp).as("p"), k.as("k"),
                (acc.getField("ssi") + innov * innov).as("ssi"))
            }))
          .select(col("event_type"),
            size(col("ys")).cast("long").as("n_hours"),
            round(xF, 9).as("x_hat"),
            (round(pF, 9) + 0.0).as("p_cov"),
            (round(kF, 9) + 0.0).as("gain"),
            (round(ssiF, 9) + 0.0).as("ssi"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH RECURSIVE h AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS t, count(*) AS y
          |  FROM events GROUP BY 1, 2),
          |o AS (SELECT event_type, CAST(y AS DOUBLE) AS y,
          |    row_number() OVER (PARTITION BY event_type ORDER BY t) AS i
          |  FROM h),
          |n AS (SELECT event_type, max(i) AS n FROM o GROUP BY 1),
          |kal(event_type, i, x, p, k, ssi) AS (
          |  SELECT event_type, CAST(1 AS BIGINT), y, CAST(1.0 AS DOUBLE),
          |    CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
          |  FROM o WHERE i = 1
          |  UNION ALL
          |  SELECT kal.event_type, kal.i + 1,
          |    kal.x + ((kal.p + 0.25) / ((kal.p + 0.25) + 4.0)) * (o.y - kal.x),
          |    (1.0 - ((kal.p + 0.25) / ((kal.p + 0.25) + 4.0))) * (kal.p + 0.25),
          |    ((kal.p + 0.25) / ((kal.p + 0.25) + 4.0)),
          |    kal.ssi + (o.y - kal.x) * (o.y - kal.x)
          |  FROM kal JOIN o
          |    ON o.event_type = kal.event_type AND o.i = kal.i + 1)
          |SELECT n.event_type, CAST(n.n AS BIGINT) AS n_hours,
          |  round(kal.x, 9) AS x_hat,
          |  round(kal.p, 9) + 0.0 AS p_cov,
          |  round(kal.k, 9) + 0.0 AS gain,
          |  round(kal.ssi, 9) + 0.0 AS ssi
          |FROM kal JOIN n ON kal.event_type = n.event_type AND kal.i = n.n
          |WHERE n.n >= 2 ORDER BY n.event_type""".stripMargin),
      doc = "1-D Kalman filter (local-level): adaptive gain to the Riccati fixed point, innovation energy graded, identical IEEE chain both engines"),

    // Theta-method forecast (Assimakopoulos & Nikolopoulos 2000 — the M3
    // competition winner, still the hardest-to-beat classical baseline):
    // Theta(0,2) combination = ½·(OLS trendline extrapolation) + ½·(SES
    // over the θ=2 line z_t = 2y_t − (a + b·t)). The OLS (a, b) comes from
    // INTEGER sufficient statistics (n, Σi, Σy, Σiy, Σi² — combinable,
    // map-side aggregable) with exactly two divisions; the SES fold
    // (α = 1/2 dyadic) then runs the identical IEEE op sequence on both
    // engines — Spark an ordered `aggregate` with an (i, ses) struct
    // state, DuckDB a recursive CTE. Keyed collect bounded by hourly
    // history; state O(1) per key.
    "events_theta_forecast" -> Q(
      fn = (s, dir) => {
        val wT = Window.partitionBy(col("event_type"))
          .orderBy(col("t"))
        val h = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("t"))
          .agg(count(lit(1)).as("y"))
          .withColumn("i", row_number().over(wT).cast("long"))
        val sums = h.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("i")).as("si"),
            sum(col("y")).as("sy"), sum(col("i") * col("y")).as("siy"),
            sum(col("i") * col("i")).as("sii"))
          .filter(col("n") >= 3)
        val arr = h.groupBy(col("event_type"))
          .agg(sort_array(collect_list(struct(col("i"), col("y")))).as("iys"))
        val b = (col("n") * col("siy") - col("si") * col("sy")).cast("double") /
          (col("n") * col("sii") - col("si") * col("si"))
        val a = (col("sy").cast("double") - b * col("si").cast("double")) /
          col("n").cast("double")
        val iF = col("st").getField("i")
        val sesF = col("st").getField("ses")
        sums.join(arr, Seq("event_type"))
          .withColumn("ys", transform(col("iys"), x => x.getField("y").cast("double")))
          .withColumn("a", a).withColumn("b", b)
          .withColumn("st", aggregate(
            slice(col("ys"), lit(2), size(col("ys")) - 1),
            struct(lit(1L).as("i"),
              (lit(2.0) * element_at(col("ys"), 1)
                - (col("a") + col("b") * lit(1.0))).as("ses")),
            (acc, y) => {
              val i2 = acc.getField("i") + lit(1L)
              val z = lit(2.0) * y -
                (col("a") + col("b") * i2.cast("double"))
              struct(i2.as("i"),
                (lit(0.5) * z + lit(0.5) * acc.getField("ses")).as("ses"))
            }))
          .select(col("event_type"), col("n").as("n_hours"),
            (round(col("b"), 9) + 0.0).as("slope"),
            (round(col("a"), 9) + 0.0).as("intercept"),
            (round(sesF, 9) + 0.0).as("theta2_ses"),
            (round(lit(0.5) * sesF + lit(0.5) *
              (col("a") + col("b") * (col("n") + 3).cast("double")), 9) + 0.0)
              .as("forecast_h3"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH RECURSIVE h AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS t, count(*) AS y
          |  FROM events GROUP BY 1, 2),
          |o AS (SELECT event_type, CAST(y AS DOUBLE) AS y,
          |    row_number() OVER (PARTITION BY event_type ORDER BY t) AS i
          |  FROM h),
          |sums AS (SELECT event_type, count(*) AS n, sum(i) AS si,
          |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(i * y) AS BIGINT) AS siy,
          |    sum(i * i) AS sii
          |  FROM o GROUP BY 1 HAVING count(*) >= 3),
          |ab AS (SELECT event_type, n,
          |    CAST(n * siy - si * sy AS DOUBLE) / (n * sii - si * si) AS b,
          |    (CAST(sy AS DOUBLE)
          |      - (CAST(n * siy - si * sy AS DOUBLE) / (n * sii - si * si))
          |        * CAST(si AS DOUBLE)) / CAST(n AS DOUBLE) AS a
          |  FROM sums),
          |th(event_type, i, ses) AS (
          |  SELECT ab.event_type, CAST(1 AS BIGINT),
          |    2.0 * o.y - (ab.a + ab.b * 1.0)
          |  FROM ab JOIN o ON o.event_type = ab.event_type AND o.i = 1
          |  UNION ALL
          |  SELECT th.event_type, th.i + 1,
          |    0.5 * (2.0 * o.y
          |      - (ab.a + ab.b * CAST(th.i + 1 AS DOUBLE)))
          |      + 0.5 * th.ses
          |  FROM th JOIN ab ON ab.event_type = th.event_type
          |    JOIN o ON o.event_type = th.event_type AND o.i = th.i + 1)
          |SELECT ab.event_type, CAST(ab.n AS BIGINT) AS n_hours,
          |  round(ab.b, 9) + 0.0 AS slope,
          |  round(ab.a, 9) + 0.0 AS intercept,
          |  round(th.ses, 9) + 0.0 AS theta2_ses,
          |  round(0.5 * th.ses
          |    + 0.5 * (ab.a + ab.b * CAST(ab.n + 3 AS DOUBLE)), 9) + 0.0
          |    AS forecast_h3
          |FROM th JOIN ab ON th.event_type = ab.event_type AND th.i = ab.n
          |ORDER BY ab.event_type""".stripMargin),
      doc = "Theta(0,2) forecast: integer OLS sufficient statistics + dyadic SES over the theta-2 line, identical IEEE chain both engines"),

    // Croston's method (1972) — the intermittent-demand forecaster the
    // EWMA family can't replace: when a series has gaps, smoothing the
    // rate directly biases toward zero. Croston keeps TWO coupled SES
    // states updated only at observations: demand size ẑ and
    // inter-observation interval p̂ (hours between successive observed
    // buckets — the natural intermittency, no gap-fill materialization);
    // the forecast rate is ẑ/p̂ with ONE division at the end. Dyadic
    // α = 1/4 both states; (t_prev, ẑ, p̂) struct fold, identical IEEE
    // chain both engines. State O(1) per key.
    "events_croston" -> Q(
      fn = (s, dir) => {
        val h = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("t"))
          .agg(count(lit(1)).as("y"))
        val zF = col("st").getField("z")
        val pF = col("st").getField("p")
        h.groupBy(col("event_type"))
          .agg(sort_array(collect_list(struct(col("t"), col("y")))).as("tys"))
          .filter(size(col("tys")) >= 2)
          .withColumn("st", aggregate(
            slice(col("tys"), lit(2), size(col("tys")) - 1),
            struct(element_at(col("tys"), 1).getField("t").as("tp"),
              element_at(col("tys"), 1).getField("y").cast("double").as("z"),
              lit(1.0).as("p")),
            (acc, e) => {
              val q = (e.getField("t") - acc.getField("tp")).cast("double")
              struct(e.getField("t").as("tp"),
                (lit(0.75) * acc.getField("z")
                  + lit(0.25) * e.getField("y").cast("double")).as("z"),
                (lit(0.75) * acc.getField("p") + lit(0.25) * q).as("p"))
            }))
          .select(col("event_type"),
            size(col("tys")).cast("long").as("n_obs"),
            (round(zF, 9) + 0.0).as("demand_size"),
            (round(pF, 9) + 0.0).as("interval"),
            (round(zF / pF, 9) + 0.0).as("demand_rate"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH RECURSIVE h AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS t, count(*) AS y
          |  FROM events GROUP BY 1, 2),
          |o AS (SELECT event_type, t, CAST(y AS DOUBLE) AS y,
          |    row_number() OVER (PARTITION BY event_type ORDER BY t) AS i
          |  FROM h),
          |n AS (SELECT event_type, max(i) AS n FROM o GROUP BY 1
          |  HAVING max(i) >= 2),
          |cr(event_type, i, tp, z, p) AS (
          |  SELECT event_type, CAST(1 AS BIGINT), t, y, CAST(1.0 AS DOUBLE)
          |  FROM o WHERE i = 1
          |  UNION ALL
          |  SELECT cr.event_type, cr.i + 1, o.t,
          |    0.75 * cr.z + 0.25 * o.y,
          |    0.75 * cr.p + 0.25 * CAST(o.t - cr.tp AS DOUBLE)
          |  FROM cr JOIN o
          |    ON o.event_type = cr.event_type AND o.i = cr.i + 1)
          |SELECT n.event_type, CAST(n.n AS BIGINT) AS n_obs,
          |  round(cr.z, 9) + 0.0 AS demand_size,
          |  round(cr.p, 9) + 0.0 AS interval,
          |  round(cr.z / cr.p, 9) + 0.0 AS demand_rate
          |FROM cr JOIN n ON cr.event_type = n.event_type AND cr.i = n.n
          |ORDER BY n.event_type""".stripMargin),
      doc = "Croston intermittent-demand forecast: coupled size/interval SES updated per observation, one division at the end"),

    // Robust outlier census: median absolute deviation on hourly counts.
    // Medians of integers are half-integers, so EVERYTHING is exact in
    // doubled units: med2 = 2·median(x) (exact percentile, not approx),
    // dev2 = |2x − med2|, mad4 = 2·median(dev2). The Hampel gate
    // |x − med| > 3·MAD becomes 2·dev2 > 3·mad4 — pure int64. Unlike the
    // mean/stddev census (profile_outliers), one wild hour cannot drag
    // the threshold: the breakdown point is 50%.
    "events_anomaly_mad" -> Q(
      fn = (s, dir) => {
        val h = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("t"))
          .agg(count(lit(1)).as("x"))
        val m = h.groupBy(col("event_type"))
          .agg((expr("percentile(x, 0.5)") * 2).cast("long").as("med2"))
        val d = h.join(broadcast(m), "event_type")
          .withColumn("dev2", abs(lit(2L) * col("x") - col("med2")))
        val md = d.groupBy(col("event_type"))
          .agg((expr("percentile(dev2, 0.5)") * 2).cast("long").as("mad4"))
        d.join(broadcast(md), "event_type")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_hours"),
            max(col("med2")).as("med2"), max(col("mad4")).as("mad4"),
            sum(when(lit(2L) * col("dev2") > lit(3L) * col("mad4"), 1L)
              .otherwise(0L)).as("n_outliers"),
            max(col("dev2")).as("max_dev2"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH h AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS t, count(*) AS x
          |  FROM events GROUP BY 1, 2),
          |m AS (SELECT event_type, CAST(2 * median(x) AS BIGINT) AS med2
          |  FROM h GROUP BY 1),
          |d AS (SELECT h.event_type, t, x, med2, abs(2 * x - med2) AS dev2
          |  FROM h JOIN m USING (event_type)),
          |md AS (SELECT event_type, CAST(2 * median(dev2) AS BIGINT) AS mad4
          |  FROM d GROUP BY 1)
          |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n_hours,
          |  CAST(max(d.med2) AS BIGINT) AS med2, CAST(max(mad4) AS BIGINT) AS mad4,
          |  CAST(count(*) FILTER (WHERE 2 * dev2 > 3 * mad4) AS BIGINT)
          |    AS n_outliers,
          |  CAST(max(dev2) AS BIGINT) AS max_dev2
          |FROM d JOIN md USING (event_type) GROUP BY d.event_type
          |ORDER BY d.event_type""".stripMargin),
      doc = "MAD outlier census in doubled integer units: exact medians, Hampel gate 2*dev2 > 3*mad4, 50% breakdown point"),

    // Shewhart 3σ control chart (SPC) over hourly counts — the classic
    // mean±σ complement to events_anomaly_mad's robust gate. The alarm
    // predicate |x − μ| > 3σ is CROSS-MULTIPLIED to the exact integer
    // inequality (n·x − S)²·(n−1) > 9·n·(n·Q − S²) (S = Σx, Q = Σx², n =
    // hours), so no float boundary exists anywhere — a count exactly at
    // 3σ classifies identically on both engines. SAFE RANGE (r9 ADVICE):
    // the DECIMAL(38,0) products dev2·(n−1) and 9n(nQ−S²) bound the gate
    // to n·x ≲ 10¹⁸ (e.g. 10⁶ hourly buckets of 10¹² events each) — far
    // beyond any real telemetry but NOT "any magnitude": past 38 digits
    // Spark's precision-loss mode nulls where DuckDB HUGEINT errors.
    // Squares ride DECIMAL(38,0); the worst hour per type is the
    // keyed-window argmax of the exact deviation square, digit-string graded.
    "events_anomaly_spc" -> Q(
      fn = (s, dir) => {
        val dec = org.apache.spark.sql.types.DecimalType(38, 0)
        val h = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("t"))
          .agg(count(lit(1)).as("x"))
        val m = h.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("x").cast(dec) * col("x")).as("q"))
        val d = h.join(broadcast(m), "event_type")
          .filter(col("n") >= 2L)
          .withColumn("dev2",
            (col("n").cast(dec) * col("x") - col("sx"))
              * (col("n").cast(dec) * col("x") - col("sx")))
          .withColumn("alarm",
            col("dev2") * (col("n") - 1L) >
              col("n").cast(dec) * lit(9L)
                * (col("n").cast(dec) * col("q")
                  - col("sx").cast(dec) * col("sx")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))
          .orderBy(col("dev2").desc, col("t"))
        d.withColumn("rn", row_number().over(w))
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n_hours"),
            sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarms"),
            max(when(col("rn") === 1, col("t"))).as("worst_hour"),
            max(when(col("rn") === 1, col("x"))).as("worst_count"),
            max(when(col("rn") === 1, col("dev2"))).cast("string")
              .as("worst_dev2"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH h AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS t, count(*) AS x
          |  FROM events GROUP BY 1, 2),
          |m AS (SELECT event_type, count(*) AS n, sum(x) AS sx,
          |    sum(CAST(x AS HUGEINT) * x) AS q
          |  FROM h GROUP BY 1),
          |d AS (SELECT h.event_type, t, x, n, sx, q,
          |    (CAST(n AS HUGEINT) * x - sx) * (CAST(n AS HUGEINT) * x - sx)
          |      AS dev2,
          |    (CAST(n AS HUGEINT) * x - sx) * (CAST(n AS HUGEINT) * x - sx)
          |      * (n - 1) >
          |      CAST(n AS HUGEINT) * 9
          |        * (CAST(n AS HUGEINT) * q - CAST(sx AS HUGEINT) * sx)
          |      AS alarm
          |  FROM h JOIN m USING (event_type) WHERE n >= 2),
          |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
          |    ORDER BY dev2 DESC, t) AS rn FROM d)
          |SELECT event_type, CAST(max(n) AS BIGINT) AS n_hours,
          |  CAST(count(*) FILTER (WHERE alarm) AS BIGINT) AS n_alarms,
          |  CAST(max(CASE WHEN rn = 1 THEN t END) AS BIGINT) AS worst_hour,
          |  CAST(max(CASE WHEN rn = 1 THEN x END) AS BIGINT) AS worst_count,
          |  CAST(max(CASE WHEN rn = 1 THEN dev2 END) AS VARCHAR) AS worst_dev2
          |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin),
      doc = "Shewhart 3σ SPC census: exact cross-multiplied integer gate (no float boundary), keyed-window argmax of the deviation square"),

    // Peak-concurrency census: the classic interval sweep (+1 at session
    // start, −1 just after session end) made ORDER-FREE by aggregating
    // deltas per distinct timestamp BEFORE the running sum — with unique
    // (type, ts) keys there is no tie ordering to disagree on, and the
    // running sum is an exact integer at every step. Sessions are the
    // t_sessionize semantics (30-min idle gap per user). The cross-time
    // scan is keyed by event_type so types parallelize; at unbounded
    // per-type history the two-pass segmented-scan form
    // (Prefix.withRunningMaxExcl, see events_watermark_lateness) replaces
    // the keyed window — same algebra, one extra shuffle.
    "events_peak_concurrency" -> Q(
      fn = (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"), col("user_id"),
          expr("unix_micros(ts)").as("tu"))
        val wu = Window.partitionBy(col("event_type"), col("user_id"))
          .orderBy(col("tu"))
        val sess = ev
          .withColumn("gap", when(
            col("tu") - lag(col("tu"), 1).over(wu) > 1800000000L || lag(col("tu"), 1).over(wu).isNull, 1L).otherwise(0L))
          .withColumn("sid", sum(col("gap")).over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("event_type"), col("user_id"), col("sid"))
          .agg(min(col("tu")).as("t0"), max(col("tu")).as("t1"))
        val deltas = sess.select(col("event_type"), col("t0").as("dts"), lit(1L).as("d"))
          .unionByName(sess.select(col("event_type"),
            (col("t1") + 1L).as("dts"), lit(-1L).as("d")))
          .groupBy(col("event_type"), col("dts")).agg(sum(col("d")).as("net"))
        val wt = Window.partitionBy(col("event_type")).orderBy(col("dts"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val run = deltas.withColumn("conc", sum(col("net")).over(wt))
        run.withColumn("mx", max(col("conc")).over(
            Window.partitionBy(col("event_type"))))
          .groupBy(col("event_type"))
          .agg(max(col("conc")).as("peak"),
            min(when(col("conc") === col("mx"), col("dts"))).as("peak_at_us"))
          .join(sess.groupBy(col("event_type"))
            .agg(count(lit(1)).as("n_sessions")), "event_type")
          .select(col("event_type"), col("n_sessions"), col("peak"),
            col("peak_at_us"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH ev AS (SELECT event_type, user_id,
          |    epoch_us(CAST(ts AS TIMESTAMP)) AS tu FROM events),
          |g AS (SELECT event_type, user_id, tu,
          |    CASE WHEN lag(tu) OVER w IS NULL
          |      OR tu - lag(tu) OVER w > 1800000000 THEN 1 ELSE 0 END AS gap
          |  FROM ev WINDOW w AS (PARTITION BY event_type, user_id ORDER BY tu)),
          |sg AS (SELECT event_type, user_id, tu,
          |    sum(gap) OVER (PARTITION BY event_type, user_id ORDER BY tu
          |      ROWS UNBOUNDED PRECEDING) AS sid FROM g),
          |sess AS (SELECT event_type, user_id, sid, min(tu) AS t0, max(tu) AS t1
          |  FROM sg GROUP BY 1, 2, 3),
          |del AS (SELECT event_type, dts, CAST(sum(d) AS BIGINT) AS net FROM (
          |    SELECT event_type, t0 AS dts, 1 AS d FROM sess
          |    UNION ALL SELECT event_type, t1 + 1, -1 FROM sess)
          |  GROUP BY 1, 2),
          |run AS (SELECT event_type, dts,
          |    sum(net) OVER (PARTITION BY event_type ORDER BY dts
          |      ROWS UNBOUNDED PRECEDING) AS conc FROM del),
          |rm AS (SELECT *, max(conc) OVER (PARTITION BY event_type) AS mx FROM run),
          |pk AS (SELECT event_type, CAST(max(conc) AS BIGINT) AS peak,
          |    CAST(min(dts) FILTER (WHERE conc = mx) AS BIGINT) AS peak_at_us
          |  FROM rm GROUP BY 1),
          |ns AS (SELECT event_type, count(*) AS n_sessions FROM sess GROUP BY 1)
          |SELECT event_type, n_sessions, peak, peak_at_us
          |FROM pk JOIN ns USING (event_type) ORDER BY event_type""".stripMargin),
      doc = "peak session concurrency: order-free interval sweep (per-timestamp aggregated deltas), exact integer running sum"),

    // DAU/WAU/MAU + stickiness — rolling DISTINCT actives, the product
    // headline metric. Rolling distinct has no combinable sketch-free
    // windowed form; the exact scalable shape is the BOUNDED explode:
    // each (user, active-day) row contributes to the 7 / 30 target days
    // it covers, then distinct + count per target day. Work is ≤ 30× the
    // user-day relation — linear, shuffle-partitioned by (user, day),
    // no window at all (a per-day window over users would single-key on
    // the calendar). Target days restricted to observed days so the
    // census never manufactures empty rows.
    "events_dau_wau_mau" -> Q(
      fn = (s, dir) => {
        val ud = Tables.events(s, dir)
          .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
        val days = ud.select(col("day")).distinct()
        def rolling(span: Int, name: String) = ud
          .select(col("user_id"),
            explode(sequence(col("day"), col("day") + (span - 1))).as("day"))
          .join(days, "day")
          .distinct()
          .groupBy(col("day")).agg(count(lit(1)).as(name))
        val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
        dau.join(rolling(7, "wau"), "day").join(rolling(30, "mau"), "day")
          .select(col("day"), col("dau"), col("wau"), col("mau"),
            round(col("dau").cast("double") / col("mau").cast("double"), 9)
              .as("stickiness"))
          .orderBy(col("day"))
      },
      oracle = Some(
        """WITH ud AS (SELECT DISTINCT user_id,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day FROM events),
          |days AS (SELECT DISTINCT day FROM ud),
          |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
          |w AS (SELECT DISTINCT u.user_id, d.day
          |  FROM ud u JOIN days d ON d.day BETWEEN u.day AND u.day + 6),
          |wau AS (SELECT day, count(*) AS wau FROM w GROUP BY 1),
          |m AS (SELECT DISTINCT u.user_id, d.day
          |  FROM ud u JOIN days d ON d.day BETWEEN u.day AND u.day + 29),
          |mau AS (SELECT day, count(*) AS mau FROM m GROUP BY 1)
          |SELECT day, dau, wau, mau,
          |  round(CAST(dau AS DOUBLE) / mau, 9) AS stickiness
          |FROM dau JOIN wau USING (day) JOIN mau USING (day)
          |ORDER BY day""".stripMargin),
      doc = "DAU/WAU/MAU + stickiness: exact rolling distinct via bounded 7x/30x explode, no calendar-keyed window"),

    // Cohort LTV triangle: users keyed by first-activity day, purchase
    // value accumulated per (cohort, age-week) with a running cumulative
    // per cohort — the matrix every retention-revenue model trains on.
    // Value sums are DECIMAL(30,6) end-to-end (the repo invariant: raw
    // double summation reassociates; DECIMAL is exact and combinable),
    // ages are integer day arithmetic, and the cumulative is a keyed
    // window over age-week cardinality (≤ history/7 rows per cohort).
    "events_cohort_ltv" -> Q(
      fn = (s, dir) => {
        val ev = Tables.events(s, dir)
          .withColumn("day", expr("unix_micros(ts) div 86400000000"))
        val f = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
        val cell = ev.filter(col("event_type") === "purchase")
          .join(broadcast(f), "user_id")
          .groupBy(col("cohort"),
            expr("(day - cohort) div 7").as("age_week"))
          .agg(count(lit(1)).as("n_purch"),
            sum(col("value").cast(DecimalType(30, 6)))
              .cast(DecimalType(30, 6)).as("val"))
        val w = Window.partitionBy(col("cohort")).orderBy(col("age_week"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // the cumulative runs over the EXACT decimal cells; both emitted
        // value columns cast to DOUBLE at the end (k/1e6, k ≪ 2^53) per
        // the graded-output rule from the r7 verdict
        cell.withColumn("cum_val",
            sum(col("val")).over(w).cast(DecimalType(30, 6)))
          .withColumn("val", col("val").cast("double"))
          .withColumn("cum_val", col("cum_val").cast("double"))
          .orderBy(col("cohort"), col("age_week"))
      },
      oracle = Some(
        """WITH f AS (SELECT user_id,
          |    min(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000) AS cohort
          |  FROM events GROUP BY 1),
          |ev AS (SELECT e.user_id, f.cohort,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 - f.cohort AS age,
          |    CAST(value AS DECIMAL(30,6)) AS v
          |  FROM events e JOIN f USING (user_id) WHERE event_type = 'purchase'),
          |cell AS (SELECT cohort, age // 7 AS age_week, count(*) AS n_purch,
          |    CAST(sum(v) AS DECIMAL(30,6)) AS val FROM ev GROUP BY 1, 2)
          |SELECT cohort, age_week, n_purch, CAST(val AS DOUBLE) AS val,
          |  CAST(CAST(sum(val) OVER (PARTITION BY cohort ORDER BY age_week
          |    ROWS UNBOUNDED PRECEDING) AS DECIMAL(30,6)) AS DOUBLE) AS cum_val
          |FROM cell ORDER BY cohort, age_week""".stripMargin),
      doc = "cohort LTV triangle: first-activity cohorts, DECIMAL-exact value cells, keyed cumulative over age weeks"),

    // Hour-of-week seasonality with a chi-square uniformity statistic —
    // "is this stream actually periodic, or is the heatmap pareidolia?"
    // The χ² against uniform is an EXACT RATIONAL: with T events over 168
    // cells, (o − T/168)²/(T/168) telescopes to (168·o − T)²/(168·T), so
    // numerator and denominator are graded as exact BIGINTs and the
    // round-9 ratio rides along. One keyed agg over ≤168 cells per type.
    "events_seasonality_chi2" -> Q(
      fn = (s, dir) => {
        val c = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("pmod(unix_micros(ts) div 3600000000, 168)").as("how"))
          .agg(count(lit(1)).as("o"))
        val t = c.groupBy(col("event_type"))
          .agg(sum(col("o")).as("total"), count(lit(1)).as("n_cells"))
        // dev^2 overflows int64 past ~1e9 events/type (dev ~ 168·T):
        // route the sum through DECIMAL(38,0) and grade it as an exact
        // digit string. chi2_den = 168·T stays < 2^53 at any real scale.
        val dev = (lit(168L) * col("o") - col("total")).cast(DecimalType(38, 0))
        c.join(broadcast(t), "event_type")
          .groupBy(col("event_type"), col("total"), col("n_cells"))
          .agg(sum(dev * dev).cast(DecimalType(38, 0)).as("chi2_num"))
          .select(col("event_type"), col("total"), col("n_cells"),
            col("chi2_num").cast("string").as("chi2_num"),
            (lit(168L) * col("total")).as("chi2_den"),
            round(col("chi2_num").cast("double") /
              (lit(168L) * col("total")).cast("double"), 9).as("chi2"))
          .orderBy(col("event_type"))
      },
      oracle = Some(
        """WITH c AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 % 168 AS how,
          |    count(*) AS o
          |  FROM events GROUP BY 1, 2),
          |t AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS total,
          |    count(*) AS n_cells FROM c GROUP BY 1)
          |SELECT c.event_type, total, n_cells,
          |  CAST(CAST(sum(CAST(168 * o - total AS HUGEINT)
          |      * (168 * o - total)) AS DECIMAL(38,0)) AS VARCHAR)
          |    AS chi2_num,
          |  CAST(168 * total AS BIGINT) AS chi2_den,
          |  round(CAST(sum(CAST(168 * o - total AS HUGEINT)
          |      * (168 * o - total)) AS DOUBLE)
          |    / (168 * total), 9) AS chi2
          |FROM c JOIN t USING (event_type) GROUP BY c.event_type, total, n_cells
          |ORDER BY c.event_type""".stripMargin),
      doc = "hour-of-week chi-square uniformity: exact rational (168*o - T)^2 / (168*T), BIGINT-graded num/den"),

    // Bot-likeness census — the abuse-detection composite that gates a
    // training corpus's behavioral slice: a scripted client shows (a)
    // round-the-clock activity (≥20 distinct hours-of-day), (b) short,
    // regular gaps (exact integer median in doubled units — the MAD
    // trick), (c) a self-looping action stream (>1/3 repeated types).
    // Every gate is exact integer arithmetic; the score is their sum.
    // Per-user windows partition by user_id, so the census parallelizes
    // over the user population; output is top-20 under a total order.
    "events_bot_score" -> Q(
      fn = (s, dir) => {
        val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
          col("event_type"), expr("unix_micros(ts)").as("tu"))
        val wu = Window.partitionBy(col("user_id"))
          .orderBy(col("tu"), col("event_id"))
        val g = ev
          .withColumn("gap", col("tu") - lag(col("tu"), 1).over(wu))
          .withColumn("self_tr",
            when(col("event_type") === lag(col("event_type"), 1).over(wu), 1L)
              .otherwise(0L))
          .filter(col("gap").isNotNull)
        val per = g.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            (expr("percentile(gap, 0.5)") * 2).cast("long").as("med_gap2x"),
            sum(col("self_tr")).as("n_self"))
        val hrs = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(countDistinct(expr("pmod(unix_micros(ts) div 3600000000, 24)"))
            .as("n_hours"))
        per.join(hrs, "user_id")
          .filter(col("n_events") >= 20)
          .select(col("user_id"), col("n_events"), col("med_gap2x"),
            col("n_self"), col("n_hours"),
            (when(col("n_hours") >= 20, 1L).otherwise(0L) +
              when(col("med_gap2x") < 2L * 3600000000L, 1L).otherwise(0L) +
              when(lit(3L) * col("n_self") > col("n_events"), 1L).otherwise(0L))
              .as("bot_score"))
          .orderBy(col("bot_score").desc, col("n_events").desc, col("user_id"))
          .limit(20)
      },
      oracle = Some(
        """WITH ev AS (SELECT user_id, event_id, event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) AS tu FROM events),
          |g AS (SELECT user_id,
          |    tu - lag(tu) OVER w AS gap,
          |    CASE WHEN event_type = lag(event_type) OVER w THEN 1 ELSE 0 END
          |      AS self_tr
          |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)),
          |per AS (SELECT user_id, count(*) AS n_events,
          |    CAST(2 * median(gap) AS BIGINT) AS med_gap2x,
          |    CAST(sum(self_tr) AS BIGINT) AS n_self
          |  FROM g WHERE gap IS NOT NULL GROUP BY 1),
          |hrs AS (SELECT user_id, count(DISTINCT
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 % 24) AS n_hours
          |  FROM events GROUP BY 1)
          |SELECT p.user_id, n_events, med_gap2x, n_self, n_hours,
          |  (CASE WHEN n_hours >= 20 THEN 1 ELSE 0 END
          |   + CASE WHEN med_gap2x < 2 * 3600000000 THEN 1 ELSE 0 END
          |   + CASE WHEN 3 * n_self > n_events THEN 1 ELSE 0 END) AS bot_score
          |FROM per p JOIN hrs USING (user_id)
          |WHERE n_events >= 20
          |ORDER BY bot_score DESC, n_events DESC, user_id LIMIT 20""".stripMargin),
      doc = "bot-likeness composite: 24/7-activity + short-regular-gap (exact median) + self-loop gates, all integer"),

    // A/B experiment evaluation as a 2×2 contingency chi-square — the
    // deterministic-assignment eval every data pipeline runs (arm =
    // md5(user) parity: rerun-stable, no RNG state; conversion = an
    // integer engagement gate). χ² = N(ad − bc)²/((a+b)(c+d)(a+c)(b+d))
    // stays EXACT as DECIMAL(38,0) numerator/denominator — counts can
    // reach 10⁹ users before the products need more than 38 digits —
    // and the round-9 ratio is one division of those exact values. One
    // keyed user rollup + one global agg; nothing scales past the
    // user count.
    "events_ab_contingency" -> Q(
      fn = (s, dir) => {
        val u = Tables.events(s, dir).groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("np"))
          .select(
            expr("cast(conv(substring(md5(concat('ab|', " +
              "cast(user_id as string))), 1, 4), 16, 10) as bigint) % 2")
              .as("arm"),
            when(col("np") >= 15, 1L).otherwise(0L).as("conv"))
        val c = u.agg(
          sum(when(col("arm") === 0 && col("conv") === 1, 1L).otherwise(0L)).as("a"),
          sum(when(col("arm") === 0 && col("conv") === 0, 1L).otherwise(0L)).as("b"),
          sum(when(col("arm") === 1 && col("conv") === 1, 1L).otherwise(0L)).as("c"),
          sum(when(col("arm") === 1 && col("conv") === 0, 1L).otherwise(0L)).as("d"))
        val n = col("a") + col("b") + col("c") + col("d")
        val delta = col("a") * col("d") - col("b") * col("c")
        val num = (n.cast(DecimalType(38, 0)) * delta * delta)
          .cast(DecimalType(38, 0))
        val den = ((col("a") + col("b")).cast(DecimalType(38, 0)) *
          (col("c") + col("d")) * (col("a") + col("c")) * (col("b") + col("d")))
          .cast(DecimalType(38, 0))
        // chi2_num/chi2_den can exceed 2^53 at scale (den ~ N^4): grade the
        // exact DECIMAL(38,0) values as strings so neither engine rounds.
        c.select(col("a"), col("b"), col("c"), col("d"), n.as("n"),
          num.cast("string").as("chi2_num"), den.cast("string").as("chi2_den"),
          round(num.cast("double") / den.cast("double"), 9).as("chi2"))
      },
      oracle = Some(
        """WITH u AS (SELECT user_id,
          |    CAST(('0x' || substr(md5('ab|' || CAST(user_id AS VARCHAR)), 1, 4))
          |      AS BIGINT) % 2 AS arm,
          |    CASE WHEN count(*) FILTER (WHERE event_type = 'purchase') >= 15
          |      THEN 1 ELSE 0 END AS converted
          |  FROM events GROUP BY 1),
          |c AS (SELECT
          |    count(*) FILTER (WHERE arm = 0 AND converted = 1) AS a,
          |    count(*) FILTER (WHERE arm = 0 AND converted = 0) AS b,
          |    count(*) FILTER (WHERE arm = 1 AND converted = 1) AS c,
          |    count(*) FILTER (WHERE arm = 1 AND converted = 0) AS d
          |  FROM u)
          |SELECT a, b, c, d, a + b + c + d AS n,
          |  CAST(CAST(CAST(a + b + c + d AS DECIMAL(38,0)) * (a*d - b*c) * (a*d - b*c)
          |    AS DECIMAL(38,0)) AS VARCHAR) AS chi2_num,
          |  CAST(CAST(CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d)
          |    AS DECIMAL(38,0)) AS VARCHAR) AS chi2_den,
          |  round(CAST(CAST(a + b + c + d AS DECIMAL(38,0)) * (a*d - b*c)
          |      * (a*d - b*c) AS DOUBLE)
          |    / CAST(CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d)
          |      AS DOUBLE), 9) AS chi2
          |FROM c""".stripMargin),
      doc = "A/B 2x2 contingency chi-square: md5-parity arms, DECIMAL(38,0)-exact N(ad-bc)^2 over margin products, round-9 ratio"),

    // M4 time-series downsampling (Jugel et al., VLDB 2014): per series
    // (event_type) and pixel bucket, keep min/max/first/last — the exact
    // four points a pixel-perfect line render needs, reducing any series
    // to 4·B points with ZERO error in the rendered image. Bucketing is
    // exact integer µs math off one 2-value global reduce; first/last are
    // min_by/max_by over the unique (us, event_id) total order, so every
    // graded double is a SELECTED value, never arithmetic. One keyed
    // shuffle; B·|series| output rows at any input size.
    "t_downsample_m4" -> Q(
      fn = (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"),
          col("event_id"), expr("unix_micros(ts)").as("us"), col("value"))
        val rng = ev.agg(min(col("us")).as("t0"), max(col("us")).as("t1"))
        ev.crossJoin(rng)
          .select(col("event_type"),
            expr("((us - t0) * 16) div (t1 - t0 + 1)").as("px"),
            col("us"), col("event_id"), col("value"))
          .groupBy(col("event_type"), col("px"))
          .agg(count(lit(1)).as("n"),
            min(col("us")).as("us_min"), max(col("us")).as("us_max"),
            min(col("value")).as("v_min"), max(col("value")).as("v_max"),
            min_by(col("value"), struct(col("us"), col("event_id")))
              .as("v_first"),
            max_by(col("value"), struct(col("us"), col("event_id")))
              .as("v_last"))
          .orderBy(col("event_type"), col("px"))
      },
      oracle = Some(
        """WITH ev AS (SELECT event_type, event_id,
          |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, value FROM events),
          |rng AS (SELECT min(us) AS t0, max(us) AS t1 FROM ev),
          |b AS (SELECT event_type, ((us - t0) * 16) // (t1 - t0 + 1) AS px,
          |    us, event_id, value,
          |    lpad(CAST(us AS VARCHAR), 20, '0') || '|' ||
          |      lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord
          |  FROM ev CROSS JOIN rng)
          |SELECT event_type, px, count(*) AS n,
          |  min(us) AS us_min, max(us) AS us_max,
          |  min(value) AS v_min, max(value) AS v_max,
          |  arg_min(value, ord) AS v_first, arg_max(value, ord) AS v_last
          |FROM b GROUP BY 1, 2 ORDER BY event_type, px""".stripMargin),
      doc = "M4 downsampling: min/max/first/last per (series, pixel bucket), exact integer bucketing, selection-only doubles"),

    // Sequential pattern mining: the top-20 3-step event-type paths over
    // per-user event order — the "what do users do next" census behind
    // funnels and next-action recommendation. Two keyed leads over the
    // unique (ts, event_id) order (partition = user, never global), one
    // path rollup; path cardinality is |types|³-bounded so the final agg
    // is tiny at any input size. Counts exact, total-ordered top-20.
    "events_path_mining" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("e2", lead(col("event_type"), 1).over(w))
          .withColumn("e3", lead(col("event_type"), 2).over(w))
          .filter(col("e3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
            .as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path")).limit(20)
      },
      oracle = Some(
        """WITH s AS (SELECT event_type AS e1,
          |    lead(event_type, 1) OVER w AS e2,
          |    lead(event_type, 2) OVER w AS e3
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id
          |               ORDER BY CAST(ts AS TIMESTAMP), event_id))
          |SELECT e1 || '>' || e2 || '>' || e3 AS path, count(*) AS n
          |FROM s WHERE e3 IS NOT NULL
          |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin),
      doc = "top-20 3-step event-type paths: keyed leads over unique (ts,event_id) order, |types|^3-bounded rollup"),

    // Behavioral-diversity census: Shannon entropy of each user's
    // event-type distribution, top-20 most-diverse users — the feature
    // behind "explorer vs single-purpose" segmentation and the bot gate's
    // natural complement (scripted accounts have near-zero entropy).
    // Float discipline follows text_perplexity: ln() is the one libm op
    // (engines may differ in the last ulp), so each term is rounded to 9
    // BEFORE the DECIMAL(18,9) sum — the sum is then exact and
    // order-free — and only the final display cast rounds again. Counts
    // are one keyed agg; the per-user window is keyed (never global).
    "events_user_entropy" -> Q(
      fn = (s, dir) => {
        val c = Tables.events(s, dir)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy(col("user_id"))
        val t = c.withColumn("n", sum(col("c")).over(w))
          .withColumn("term",
            round((col("c").cast("double") / col("n").cast("double")) *
              log(col("n").cast("double") / col("c").cast("double")), 9)
              .cast(DecimalType(18, 9)))
        t.groupBy(col("user_id"))
          .agg(max(col("n")).as("n_events"), count(lit(1)).as("n_types"),
            round(sum(col("term")).cast("double"), 9).as("entropy"))
          .orderBy(col("entropy").desc, col("user_id")).limit(20)
      },
      oracle = Some(
        """WITH c AS (SELECT user_id, event_type, count(*) AS c
          |  FROM events GROUP BY 1, 2),
          |t AS (SELECT user_id, c, sum(c) OVER (PARTITION BY user_id) AS n
          |  FROM c)
          |SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
          |  count(*) AS n_types,
          |  round(CAST(sum(CAST(round((c / CAST(n AS DOUBLE))
          |      * ln(n / CAST(c AS DOUBLE)), 9) AS DECIMAL(18,9))) AS DOUBLE), 9)
          |    AS entropy
          |FROM t GROUP BY user_id
          |ORDER BY entropy DESC, user_id LIMIT 20""".stripMargin),
      doc = "per-user event-type Shannon entropy: round-9 terms before exact DECIMAL sum (perplexity discipline), top-20"),

    // Kaplan-Meier survival: days from each user's first event to their
    // first 'purchase', right-censored at the corpus horizon — the
    // time-to-conversion curve behind activation dashboards. The risk set
    // and the log-survival accumulate through TWO Prefix passes (the
    // distributed two-pass prefix sum — no global window anywhere in the
    // engine plan; the day table is tiny but the operator is the
    // any-size-safe shape). Float discipline: each hazard term enters the
    // running sum as floor(ln(1−d/n)·1e9) — an exact BIGINT — so the
    // accumulation is order-free; exp() reconstructs survival per row and
    // round-9 absorbs its last-ulp libm spread. d = n_risk (everyone
    // exits) can only occur on the final row; survival pins to 0 there.
    "events_survival_km" -> Q(
      fn = (s, dir) => {
        val ev = Tables.events(s, dir)
        val t0 = ev.groupBy(col("user_id")).agg(
          min(col("ts")).as("t0"),
          min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
        val h = ev.agg(max(col("ts")).as("hmax"))
        val u = t0.crossJoin(h).select(col("user_id"),
          when(col("tp").isNotNull, 1L).otherwise(0L).as("evf"),
          when(col("tp").isNotNull,
            expr("(unix_micros(tp) - unix_micros(t0)) div 86400000000"))
            .otherwise(expr("(unix_micros(hmax) - unix_micros(t0)) div 86400000000"))
            .as("day"))
        val dt = u.groupBy(col("day"))
          .agg(sum(col("evf")).as("d"), sum(lit(1L) - col("evf")).as("c"))
        val nu = u.agg(count(lit(1)).as("nu"))
        val r = graft.operators.Prefix.withRankAndCumSum(
            dt.crossJoin(nu), Seq(col("day")), col("d") + col("c"), 8)
          .withColumn("n_risk", col("nu") - col("cum") + col("d") + col("c"))
          .select(col("day"), col("d"), col("c"), col("n_risk"))
          .withColumn("t9", when(col("d") < col("n_risk"),
            floor(log(lit(1.0) -
              col("d").cast("double") / col("n_risk").cast("double")) * lit(1e9))
              .cast("long")).otherwise(lit(0L)))
        graft.operators.Prefix.withRankAndCumSum(
            r, Seq(col("day")), col("t9"), 8)
          .select(col("day"), col("n_risk"), col("d"), col("c"),
            when(col("d") === col("n_risk"), lit(0.0))
              .otherwise(round(exp(col("cum").cast("double") / lit(1e9)), 9))
              .as("surv"))
          .orderBy(col("day"))
      },
      oracle = Some(
        """WITH t0 AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t0,
          |    min(CASE WHEN event_type = 'purchase'
          |        THEN CAST(ts AS TIMESTAMP) END) AS tp
          |  FROM events GROUP BY 1),
          |h AS (SELECT max(CAST(ts AS TIMESTAMP)) AS hmax FROM events),
          |u AS (SELECT user_id,
          |    CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS evf,
          |    CASE WHEN tp IS NOT NULL
          |      THEN (epoch_us(tp) - epoch_us(t0)) // 86400000000
          |      ELSE (epoch_us(hmax) - epoch_us(t0)) // 86400000000 END AS day
          |  FROM t0 CROSS JOIN h),
          |dt AS (SELECT day, CAST(sum(evf) AS BIGINT) AS d,
          |    CAST(sum(1 - evf) AS BIGINT) AS c FROM u GROUP BY 1),
          |n AS (SELECT count(*) AS nu FROM u),
          |r AS (SELECT day, d, c,
          |    CAST(nu - (sum(d + c) OVER (ORDER BY day)) + d + c AS BIGINT)
          |      AS n_risk
          |  FROM dt CROSS JOIN n),
          |l AS (SELECT day, d, c, n_risk,
          |    CASE WHEN d < n_risk
          |      THEN CAST(floor(ln(1 - d / CAST(n_risk AS DOUBLE)) * 1e9) AS BIGINT)
          |      ELSE 0 END AS t9
          |  FROM r),
          |sv AS (SELECT day, n_risk, d, c,
          |    sum(t9) OVER (ORDER BY day) AS cum FROM l)
          |SELECT day, n_risk, d, c,
          |  CASE WHEN d = n_risk THEN 0.0
          |       ELSE round(exp(CAST(cum AS DOUBLE) / 1e9), 9) END AS surv
          |FROM sv ORDER BY day""".stripMargin),
      doc = "Kaplan-Meier time-to-purchase: two-pass prefix risk set, scaled-integer log-hazard accumulation, round-9 survival"),

    // Autocorrelation of the hourly event-count series at calendar lags
    // (1h, 2h, 3h, 6h, 12h, 24h) per event type — the quantitative
    // companion of the chi-square seasonality verdict (a daily cycle
    // shows as an acf_24 peak). Everything before the final division is
    // EXACT integer arithmetic in n-scaled units: centering by the mean
    // becomes (n·x_t − S), so no float ever enters the sums; products
    // route through DECIMAL(38,0) (n·x can pass 2^31·counts at corpus
    // scale). Lags pair by CALENDAR hour (t+k), so series gaps simply
    // contribute no pair — no imputation. The lag join is an equi-join
    // on (type, hour), bounded by |lags|·|hours|.
    "events_autocorrelation" -> Q(
      fn = (s, dir) => {
        val h = Tables.events(s, dir)
          .groupBy(col("event_type"),
            expr("unix_micros(ts) div 3600000000").as("t"))
          .agg(count(lit(1)).as("x"))
        graft.operators.CacheOnce.pin(h); h.count() // feeds stats AND both sides of the lag join
        val st = h.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        val hd = h.join(st, "event_type")
          .select(col("event_type"), col("t"),
            (col("n").cast(DecimalType(38, 0)) * col("x") -
              col("sx").cast(DecimalType(38, 0))).cast(DecimalType(38, 0))
              .as("dev"))
        val den = hd.groupBy(col("event_type"))
          .agg(sum(col("dev") * col("dev")).cast(DecimalType(38, 0)).as("den"))
        val lagged = hd.withColumn("lag", explode(array(
          lit(1L), lit(2L), lit(3L), lit(6L), lit(12L), lit(24L))))
        val pr = lagged.alias("a").join(hd.alias("b"),
            col("a.event_type") === col("b.event_type") &&
              col("b.t") === col("a.t") + col("a.lag"))
          .select(col("a.event_type").as("event_type"), col("a.lag").as("lag"),
            (col("a.dev") * col("b.dev")).as("dd"))
          .groupBy(col("event_type"), col("lag"))
          .agg(count(lit(1)).as("m_pairs"),
            sum(col("dd")).cast(DecimalType(38, 0)).as("num"))
        // num/den are DECIMAL(38,0) sums of dev^2-scale products that pass
        // 2^53 well below corpus scale: grade them as exact digit strings.
        pr.join(den, "event_type").join(st, "event_type")
          .select(col("event_type"), col("lag"), col("n"), col("m_pairs"),
            col("num").cast("string").as("num"),
            col("den").cast("string").as("den"),
            round(col("num").cast("double") / col("den").cast("double"), 9)
              .as("acf"))
          .orderBy(col("event_type"), col("lag"))
      },
      oracle = Some(
        """WITH h AS (SELECT event_type,
          |    epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS t, count(*) AS x
          |  FROM events GROUP BY 1, 2),
          |st AS (SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx
          |  FROM h GROUP BY 1),
          |hd AS (SELECT h.event_type, t,
          |    CAST(n AS HUGEINT) * x - sx AS dev
          |  FROM h JOIN st USING (event_type)),
          |den AS (SELECT event_type, CAST(sum(dev * dev) AS DECIMAL(38,0)) AS den
          |  FROM hd GROUP BY 1),
          |pr AS (SELECT a.event_type, lag, count(*) AS m_pairs,
          |    CAST(sum(a.dev * b.dev) AS DECIMAL(38,0)) AS num
          |  FROM hd a CROSS JOIN (SELECT unnest([1, 2, 3, 6, 12, 24]) AS lag) l
          |  JOIN hd b ON a.event_type = b.event_type AND b.t = a.t + lag
          |  GROUP BY 1, 2)
          |SELECT pr.event_type, CAST(lag AS BIGINT) AS lag, st.n, m_pairs,
          |  CAST(num AS VARCHAR) AS num, CAST(den.den AS VARCHAR) AS den,
          |  round(CAST(num AS DOUBLE) / CAST(den.den AS DOUBLE), 9) AS acf
          |FROM pr JOIN den USING (event_type) JOIN st USING (event_type)
          |ORDER BY event_type, lag""".stripMargin),
      doc = "hourly-count autocorrelation at calendar lags: n-scaled integer centering, DECIMAL(38,0)-exact moments, round-9 acf"))
}
