package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for — as-of and bounded
  * range — built from the shapes that DO scale on a cluster: one union +
  * one keyed window for as-of (the sorted-merge formulation), and a
  * time-bucket equi-join for range (candidates bounded by the window
  * length, never a cross join). Event sessionization, feature lookup
  * ("latest state at event time"), and windowed-context extraction are
  * the training-pipeline consumers.
  */
object Temporal {

  /** As-of join: every left row picks the LATEST right row with
    * `right.ts <= left.ts` for the same key — "most recent state at event
    * time". Among right ties on ts, the greatest `tiebreak` wins, making
    * the result total-order deterministic.
    *
    * Scale shape: NOT a per-row lookup — the two relations UNION (right
    * rows sort before left rows on equal ts via the source tag) and ONE
    * window per key carries the last-seen right payload forward
    * (`last(ignoreNulls)` over rows-unbounded-preceding). One shuffle on
    * the key, one sort — the distributed merge-join formulation of as-of;
    * per-key state during the scan is a single payload struct. Skew note:
    * a hot key serializes its own timeline (inherent to as-of semantics);
    * the window carries O(1) state so the hot task is scan-bound, not
    * memory-bound. Returns every left row + `<prefix><col>` for each
    * right payload column (NULL when no right row precedes). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               tiebreak: String, payloadCols: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    val payT = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType)))
    val rowT = org.apache.spark.sql.types.StructType(
      left.schema.fields.map(f =>
        org.apache.spark.sql.types.StructField(f.name, f.dataType)))
    val r = right.select(col(key).as("_k"), col(ts).as("_ts"),
      col(tiebreak).as("_tb"), lit(0).as("_src"),
      struct(payloadCols.map(col): _*).as("_pay"),
      lit(null).cast(rowT).as("_row"))
    val l = left.select(col(key).as("_k"), col(ts).as("_ts"),
      col(tiebreak).as("_tb"), lit(1).as("_src"),
      lit(null).cast(payT).as("_pay"),
      struct(left.columns.map(col): _*).as("_row"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_src"), col("_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = r.unionByName(l)
      .withColumn("_asof", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_src") === 1)
    joined.select(
      left.columns.map(c => col("_row").getField(c).as(c)) ++
        payloadCols.map(c => col("_asof").getField(c).as(prefix + c)): _*)
  }

  /** Hourly gap filling + forward fill — the `time_bucket_gapfill` verb
    * every time-series warehouse grows: each key's observed span becomes a
    * dense hourly grid (missing buckets appear with n_events = 0 and a
    * `filled` flag), and the last observed sum carries forward. The grid
    * is INTEGER hour indexes (`sequence` over longs, reconstructed with
    * timestamp_micros) — no interval parsing, exact in any engine. Scale:
    * the per-key explode is bounded by the key's time span, the join is a
    * keyed equi-join against the already-aggregated hourly relation, and
    * the forward fill is a keyed window (O(1) state; value sums go through
    * DECIMAL so the carried value is bit-stable). */
  def gapFillHourly(df: DataFrame, key: String, ts: String,
                    valueCol: String): DataFrame = {
    val micros = 3600000000L
    val hourly = df.select(col(key).as("k"),
        (unix_micros(date_trunc("hour", col(ts))) / micros).cast("long").as("hi"),
        col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 4)).as("v"))
      .groupBy(col("k"), col("hi"))
      .agg(count(lit(1)).as("n_events"), sum(col("v")).as("sv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    hourly.count() // pin: grid bounds + the fill join
    val grid = hourly.groupBy(col("k"))
      .agg(min(col("hi")).as("mn"), max(col("hi")).as("mx"))
      .select(col("k"), explode(sequence(col("mn"), col("mx"))).as("hi"))
    val w = Window.partitionBy(col("k")).orderBy(col("hi"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = grid.join(hourly, Seq("k", "hi"), "left")
      .withColumn("ffill", last(col("sv"), ignoreNulls = true).over(w))
      .select(col("k").as(key), timestamp_micros(col("hi") * micros).as("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("sv").isNull.as("filled"),
        col("sv").cast("double").as("sum_value"),
        col("ffill").cast("double").as("ffill_value"))
      .orderBy(col(key), col("hour"))
      // (key × hour-grid)-sized — eager cut, release the pin (r9 ADVICE)
      .localCheckpoint()
    hourly.unpersist()
    out
  }

  /** As-of join with a MATCH TOLERANCE (pandas `merge_asof(tolerance=…)`,
    * kdb `wj` window bound): the latest prior right row still wins, but a
    * match older than `toleranceSeconds` reports as NO match — "state at
    * event time, unless the state is stale". Because the as-of pick is
    * already the closest-in-time candidate, gating it afterward is exactly
    * "latest match within the window": no second formulation needed, the
    * same one-shuffle merge shape as [[asOfJoin]] plus a row-local micros
    * comparison (integer arithmetic — no interval parsing, per the house
    * invariant). Payload columns null out together, preserving left rows. */
  def asOfJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        ts: String, tiebreak: String, payloadCols: Seq[String],
                        toleranceSeconds: Long,
                        prefix: String = "asof_"): DataFrame = {
    require(toleranceSeconds >= 0, s"tolerance must be >= 0, got $toleranceSeconds")
    val needTs = !payloadCols.contains(ts)
    val cols = if (needTs) payloadCols :+ ts else payloadCols
    val j = asOfJoin(left, right, key, ts, tiebreak, cols, prefix)
    val ok = col(prefix + ts).isNotNull &&
      (unix_micros(col(ts)) - unix_micros(col(prefix + ts)) <=
        toleranceSeconds * 1000000L)
    val gated = payloadCols.foldLeft(j) { (df, c) =>
      df.withColumn(prefix + c, when(ok, col(prefix + c)))
    }
    if (needTs) gated.drop(prefix + ts) else gated
  }

  /** Bounded range join: for every left row, aggregate the right rows in
    * `(left.ts - window, left.ts]` for the same key — "how much happened
    * just before this event". `agg` maps the right-payload column to the
    * aggregate expressions evaluated over each left row's matches.
    *
    * Scale shape: the join key is (key, time bucket) with bucket length =
    * the window length — each left row probes exactly TWO buckets
    * (its own + the previous), so candidates are bounded by per-bucket
    * density and the exact range predicate filters locally. No cross
    * join, no unbounded window state, and the shuffle key (key × bucket)
    * is finer than the key alone — time-bucketing is itself the skew
    * mitigation for hot keys. Left rows with no match keep count 0 via
    * the left join. */
  def rangeJoinCount(left: DataFrame, right: DataFrame, key: String, ts: String,
                     windowSeconds: Long, leftId: String): DataFrame =
    rangeJoinAgg(left, right, key, ts, windowSeconds, leftId,
      payload = Seq.empty, aggs = Seq(count(lit(1)).as("n_in_window")),
      fill = Map("n_in_window" -> lit(0L)))

  /** Event sessionization: split each key's timeline into sessions at
    * inactivity gaps > `gapSeconds` — the event-stream structuring step
    * before per-session features (and the batch twin of Structured
    * Streaming's session windows). A session is numbered by its ordinal
    * within the key (1-based, time order).
    *
    * Scale shape: ONE shuffle on the key and a keyed window — `lag(ts)`
    * marks session starts, a running sum of start flags numbers them;
    * both windows carry O(1) state, so a hot key is scan-bound like
    * [[asOfJoin]]. Gap comparison is epoch-micros long arithmetic.
    * Returns the input rows plus `session_no`. */
  def sessionize(df: DataFrame, key: String, ts: String,
                 gapSeconds: Long): DataFrame = {
    // deterministic at ties without a tiebreak column: rows with equal ts
    // can order either way, but at most ONE of a tie group opens a session
    // (the others see gap 0), so the running session count — and therefore
    // every row's session_no — is identical under any tie order
    val prev = lag(unix_micros(col(ts)), 1).over(
      Window.partitionBy(col(key)).orderBy(col(ts)))
    df.withColumn("_new", when(
        prev.isNull || unix_micros(col(ts)) - prev > gapSeconds * 1000000L, 1L)
        .otherwise(0L))
      .withColumn("session_no", sum(col("_new")).over(
        Window.partitionBy(col(key)).orderBy(col(ts))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new")
  }

  /** Per-session census over [[sessionize]]: events, span, bounds — the
    * aggregate consumers (session length features, engagement stats)
    * read. One additional groupBy((key, session_no)) — combinable
    * aggregates only, skew-immune. */
  def sessionStats(df: DataFrame, key: String, ts: String,
                   gapSeconds: Long): DataFrame =
    sessionize(df, key, ts, gapSeconds)
      .groupBy(col(key), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        min(col(ts)).as("session_start"),
        max(col(ts)).as("session_end"),
        ((unix_micros(max(col(ts))) - unix_micros(min(col(ts)))) / 1000000L)
          .cast("long").as("span_sec"))

  /** General form of [[rangeJoinCount]]: any aggregates over the right rows
    * in `(left.ts - window, left.ts]` — sums, collects, min/max — not just
    * the count. `payload` names the right columns the aggregates read (kept
    * under their own names in the match relation); `aggs` are standard
    * aggregate Columns over those names (each MUST be aliased — the alias
    * becomes the output column); `fill` supplies the no-match value per
    * output (unfilled outputs stay NULL, which IS the right answer for
    * min/max/collect).
    *
    * Same scale shape as the count form: (key, time-bucket) equi-join with
    * bucket length = window length, two probes per left row, exact range
    * predicate applied locally — candidates bounded by per-bucket density,
    * never a cross join. The window bound compares epoch micros (typed
    * arithmetic, no per-plan INTERVAL parse). */
  def rangeJoinAgg(left: DataFrame, right: DataFrame, key: String, ts: String,
                   windowSeconds: Long, leftId: String,
                   payload: Seq[String], aggs: Seq[Column],
                   fill: Map[String, Column] = Map.empty): DataFrame = {
    val winMicros = windowSeconds * 1000000L
    val bucket: Column => Column = t => floor(unix_micros(t) / winMicros).cast("long")
    val l = left.select(col(leftId).as("_lid"), col(key).as("_k"),
        unix_micros(col(ts)).as("_lus"), bucket(col(ts)).as("_b"))
      .withColumn("_probe", explode(array(col("_b"), col("_b") - 1)))
    val r = right.select(Seq(col(key).as("_k"), unix_micros(col(ts)).as("_rus"),
      bucket(col(ts)).as("_probe")) ++ payload.map(col): _*)
    val matches = l.join(r, Seq("_k", "_probe"))
      .filter(col("_rus") <= col("_lus") && col("_rus") > col("_lus") - winMicros)
      .groupBy(col("_lid")).agg(aggs.head, aggs.tail: _*)
    val joined = left.join(matches.withColumnRenamed("_lid", leftId), Seq(leftId), "left")
    fill.foldLeft(joined) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), v))
    }
  }
}
