package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._

/** As-of and bounded-range join semantics: tie handling, empty lookback,
  * window boundary inclusivity, and agreement with a brute-force recompute.
  */
class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin picks latest prior right row; ties resolve by tiebreak; no-match is NULL") {
    val left = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")),
      (11L, 1L, ts("2024-01-01 12:00:00")),
      (12L, 2L, ts("2024-01-01 09:00:00"))) // user 2 has no prior click
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, 1L, ts("2024-01-01 09:00:00")),
      (2L, 1L, ts("2024-01-01 10:00:00")), // equal to left@10:00 → "at or before" includes it
      (3L, 1L, ts("2024-01-01 10:00:00")), // same ts: greater event_id wins the tie
      (4L, 2L, ts("2024-01-01 23:00:00"))) // after left@09:00 → ignored
      .toDF("event_id", "user_id", "ts")
    val got = Temporal.asOfJoin(left, right, "user_id", "ts", "event_id",
        Seq("event_id", "ts"))
      .orderBy(col("event_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == Seq((10L, 3L), (11L, 3L), (12L, -1L)))
  }

  test("asOfJoinTolerance: stale matches null out together, boundary inclusive") {
    val left = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")), // match at 09:30 → 30 min, fresh
      (11L, 1L, ts("2024-01-01 12:00:00")), // latest is 09:30 → 2.5 h, stale
      (12L, 2L, ts("2024-01-01 11:00:00"))) // match exactly 1 h old → boundary keeps
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, 1L, ts("2024-01-01 09:30:00")),
      (2L, 2L, ts("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val got = Temporal.asOfJoinTolerance(left, right, "user_id", "ts",
        "event_id", Seq("event_id"), toleranceSeconds = 3600L)
      .orderBy(col("event_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    // stale row 11 keeps its LEFT row but loses the payload (left-preserving)
    assert(got == Seq((10L, 1L), (11L, -1L), (12L, 2L)))
    // tolerance 0: only exact-timestamp matches survive
    val strict = Temporal.asOfJoinTolerance(left,
        right.unionByName(Seq((5L, 1L, ts("2024-01-01 10:00:00")))
          .toDF("event_id", "user_id", "ts")),
        "user_id", "ts", "event_id", Seq("event_id"), toleranceSeconds = 0L)
      .orderBy(col("event_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(strict == Seq((10L, 5L), (11L, -1L), (12L, -1L)))
  }

  test("gapFillHourly: dense grid, gap flags, forward fill carries the last sum") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:15:00"), 2.5),
      (1L, ts("2024-01-01 10:45:00"), 1.5), // 10:00 bucket: n=2, sum=4.0
      (1L, ts("2024-01-01 13:05:00"), 7.0), // 11:00, 12:00 are gaps
      (2L, ts("2024-01-01 09:00:00"), 1.0)) // single-bucket key
      .toDF("user_id", "ts", "value")
    val r = graft.operators.Temporal.gapFillHourly(ev, "user_id", "ts", "value")
      .collect()
    val k1 = r.filter(_.getLong(0) == 1L)
    assert(k1.length == 4, "10:00 through 13:00 inclusive")
    assert(k1.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 0L, 0L, 1L))
    assert(k1.map(_.getAs[Boolean]("filled")).toSeq ==
      Seq(false, true, true, false))
    // gaps carry the last observed sum; observed buckets carry their own
    assert(k1.map(_.getAs[Double]("ffill_value")).toSeq ==
      Seq(4.0, 4.0, 4.0, 7.0))
    assert(k1(1).isNullAt(k1(1).fieldIndex("sum_value")))
    val k2 = r.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && !k2.head.getAs[Boolean]("filled"))
  }

  test("rangeJoinCount: boundary inclusivity (ts], exclusive lower, zero for no match") {
    val left = Seq((10L, 1L, ts("2024-01-01 12:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 12:00:00")), // == left ts → counted
      (1L, ts("2024-01-01 11:00:00")), // exactly window start → EXCLUDED (open lower bound)
      (1L, ts("2024-01-01 11:00:01")), // inside
      (1L, ts("2024-01-01 12:00:01")), // after → excluded
      (2L, ts("2024-01-01 11:59:59"))) // other key
      .toDF("user_id", "ts")
    val got = Temporal.rangeJoinCount(left, right, "user_id", "ts", 3600L, "event_id")
      .select(col("event_id"), col("n_in_window")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((10L, 2L)))
  }

  test("asOfJoin agrees with brute-force argmax on the events fixture") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val got = Temporal.asOfJoin(purchases, clicks, "user_id", "ts", "event_id",
        Seq("event_id"))
      .select(col("event_id"), col("asof_event_id"))
      .orderBy(col("event_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    val brute = purchases.as("p").join(clicks.as("c"),
        col("c.user_id") === col("p.user_id") && col("c.ts") <= col("p.ts"), "left")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(max_by(col("c.event_id"), struct(col("c.ts"), col("c.event_id"))).as("asof"))
      .orderBy(col("event_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(got.nonEmpty && got == brute)
  }

  test("rangeJoinAgg: sum/max/collect over the lookback window; NULL vs filled no-match") {
    val left = Seq(
      (10L, 1L, ts("2024-01-01 12:00:00")),
      (11L, 2L, ts("2024-01-01 12:00:00"))) // key 2: no right rows at all
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, ts("2024-01-01 12:00:00"), 5L),
      (1L, ts("2024-01-01 11:00:00"), 100L), // window start → excluded
      (1L, ts("2024-01-01 11:30:00"), 7L),
      (3L, ts("2024-01-01 11:59:00"), 9L)) // other key
      .toDF("user_id", "ts", "amount")
    val got = Temporal.rangeJoinAgg(left, right, "user_id", "ts", 3600L, "event_id",
        payload = Seq("amount"),
        aggs = Seq(sum(col("amount")).as("amt_sum"), max(col("amount")).as("amt_max"),
          sort_array(collect_list(col("amount"))).as("amts")),
        fill = Map("amt_sum" -> lit(0L)))
      .orderBy(col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) Nil else r.getSeq[Long](5).toList)).toSeq
    // no-match row: unfilled aggregates stay NULL (read back as Nil/-1 here)
    assert(got == Seq((10L, 12L, 7L, List(5L, 7L)), (11L, 0L, -1L, Nil)))
  }

  test("rangeJoinAgg sum agrees with brute-force on the events fixture") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val got = Temporal.rangeJoinAgg(purchases, clicks, "user_id", "ts", 3600L,
        "event_id", payload = Seq("event_id"),
        aggs = Seq(sum(col("event_id")).as("s"), count(lit(1)).as("n")),
        fill = Map("s" -> lit(0L), "n" -> lit(0L)))
      .select(col("event_id"), col("s"), col("n"))
      .orderBy(col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val brute = purchases.as("p").join(clicks.as("c"),
        col("c.user_id") === col("p.user_id") &&
          col("c.ts") <= col("p.ts") &&
          col("c.ts") > col("p.ts") - expr("INTERVAL 3600 SECONDS"), "left")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(coalesce(sum(col("c.event_id")), lit(0L)).as("s"),
        sum(when(col("c.user_id").isNotNull, 1L).otherwise(0L)).as("n"))
      .orderBy(col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty && got == brute)
  }

  test("sessionize: gap splits, boundary inclusivity, tie safety, census") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:20:00")), // 20 min — same session (<= 30 min)
      (1L, ts("2024-01-01 10:50:00")), // exactly 30 min — same session (> is strict)
      (1L, ts("2024-01-01 11:50:01")), // 3601 s — NEW session
      (1L, ts("2024-01-01 11:50:01")), // duplicate ts — same session whatever the tie order
      (2L, ts("2024-01-01 09:00:00"))) // other key: its own session 1
      .toDF("user_id", "ts")
    val got = Temporal.sessionStats(df, "user_id", "ts", 1800L)
      .orderBy(col("user_id"), col("session_no"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5))).toSeq
    assert(got == Seq(
      (1L, 1L, 3L, 3000L), // 10:00→10:50
      (1L, 2L, 2L, 0L),
      (2L, 1L, 1L, 0L)))
  }

  test("rangeJoinCount agrees with brute-force on the events fixture") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    val got = Temporal.rangeJoinCount(purchases, clicks, "user_id", "ts", 3600L, "event_id")
      .select(col("event_id"), col("n_in_window"))
      .orderBy(col("event_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val brute = purchases.as("p").join(clicks.as("c"),
        col("c.user_id") === col("p.user_id") &&
          col("c.ts") <= col("p.ts") &&
          col("c.ts") > col("p.ts") - expr("INTERVAL 3600 SECONDS"), "left")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(sum(when(col("c.user_id").isNotNull, 1L).otherwise(0L)).as("n"))
      .orderBy(col("event_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got == brute)
  }

  test("funnel: strict in-order progression, stage skipping forbidden") {
    val ev = Seq(
      // u1 completes the funnel in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // u2: click at EXACTLY first-view ts (strict > fails); later purchase
      // cannot advance past the missing click stage
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 13:00:00")),
      // u3: purchase before any view — stage 1 only once the view lands
      (3L, "purchase", ts("2024-01-01 09:00:00")),
      (3L, "view", ts("2024-01-01 10:00:00")),
      // u4: view then click, no purchase
      (4L, "view", ts("2024-01-01 10:00:00")),
      (4L, "click", ts("2024-01-01 14:00:00")))
      .toDF("user_id", "event_type", "ts")
    val got = graft.operators.Funnel.census(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy(col("stage_no"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))
  }
}
