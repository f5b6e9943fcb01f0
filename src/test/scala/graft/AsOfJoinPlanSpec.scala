package graft

import graft.plans.{AsOfJoinExec, AsOfJoinPlan}
import graft.operators.Temporal
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** The native as-of join plan: result parity with the composed
  * (union + keyed window) formulation, correct no-match nulls and
  * tie-breaking, the key-filter pushdown rule, and the plan shape
  * (AsOfJoinExec present, one exchange per side like a sort-merge join). */
class AsOfJoinPlanSpec extends SparkTestBase {
  import spark.implicits._

  private def eventsFixture = {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    (purchases, clicks)
  }

  test("native exec matches the composed union+window formulation") {
    val (purchases, clicks) = eventsFixture
    val native = AsOfJoinPlan.asof(purchases, clicks, "user_id", "ts",
        "event_id", Seq("event_id", "ts"))
      .orderBy(col("event_id")).collect()
    val composed = Temporal.asOfJoin(purchases, clicks, "user_id", "ts",
        "event_id", Seq("event_id", "ts"))
      .orderBy(col("event_id")).collect()
    assert(native.length == composed.length && native.nonEmpty)
    native.zip(composed).foreach { case (n, c) => assert(n == c) }
  }

  test("ties on time resolve to the max tiebreak; no prior row gives null") {
    val left = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 100L, 12L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 100L, 1L, "a"), (1L, 100L, 2L, "b"), (1L, 60L, 3L, "c"),
      (2L, 101L, 4L, "d")).toDF("k", "t", "rid", "v")
    val got = AsOfJoinPlan.asof(left, right, "k", "t", "rid", Seq("v"))
      .orderBy(col("lid")).collect()
      .map(r => r.getLong(2) -> Option(r.getString(3))).toMap
    assert(got(10L) == Some("b"), "equal-time tie must take max tiebreak")
    assert(got(11L) == None, "no right row at or before t=50")
    assert(got(12L) == None, "key 2's only right row is later")
  }

  test("null keys/times match nothing and never bind to key 0") {
    val left = Seq((Option(0L), Option(100L), 1L), (Option.empty[Long], Option(100L), 2L),
      (Option(0L), Option.empty[Long], 3L)).toDF("k", "t", "lid")
    val right = Seq((Option.empty[Long], Option(40L), 11L, "nullkey"),
      (Option(0L), Option(50L), 10L, "z")).toDF("k", "t", "rid", "v")
    val got = AsOfJoinPlan.asof(left, right, "k", "t", "rid", Seq("v"))
      .orderBy(col("lid")).collect()
      .map(r => r.getLong(2) -> Option(r.getString(3))).toMap
    assert(got(1L) == Some("z"), "a GENUINE key-0 probe still matches key-0 rows")
    assert(got(2L) == None, "null key must not unbox to 0 and steal key-0 matches")
    assert(got(3L) == None, "null time must not unbox to time 0")
  }

  test("key predicates push through the node to BOTH children") {
    val (purchases, clicks) = eventsFixture
    val q = AsOfJoinPlan.asof(purchases, clicks, "user_id", "ts",
        "event_id", Seq("event_id"))
      .filter(col("user_id") === 3)
    // the optimized plan must show the key filter below the as-of node on
    // each side (left as-is, right with the key attribute substituted)
    val optimized = q.queryExecution.optimizedPlan
    val node = optimized.collectFirst { case j: graft.plans.AsOfJoin => j }.get
    def hasKeyFilter(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
                     key: String): Boolean = p.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.references.map(_.name).toSet == Set(key) => f
    }.nonEmpty
    assert(hasKeyFilter(node.left, "user_id"), "left child missing pushed key filter")
    assert(hasKeyFilter(node.right, "_bk"), "right child missing mirrored key filter")
    // and the pushed plan still computes the right answer
    val expect = Temporal.asOfJoin(purchases, clicks, "user_id", "ts",
        "event_id", Seq("event_id"))
      .filter(col("user_id") === 3).orderBy(col("event_id")).collect()
    assert(q.orderBy(col("event_id")).collect().toSeq == expect.toSeq)
  }

  test("bucketed inputs plan with ZERO exchanges — the stored-layout contract") {
    // the declared ClusteredDistribution lets a bucketed table satisfy the
    // join's requirement straight off the scan: both sides read the SAME
    // user_id-bucketed table (filters preserve partitioning), so
    // EnsureRequirements inserts no shuffle at all — only local sorts.
    // This is the capability the union+window formulation can never have.
    spark.sql("DROP TABLE IF EXISTS asof_events_bucketed")
    // warehouse dir comes back as a file: URI — strip the scheme or the
    // stale-location cleanup silently misses and the CTAS fails on rerun
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file://").stripPrefix("file:")
    val loc = new java.io.File(wh, "asof_events_bucketed")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    if (loc.exists()) rm(loc)
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .write.format("parquet").bucketBy(8, "user_id")
      .sortBy("user_id", "ts").saveAsTable("asof_events_bucketed")
    val t = spark.table("asof_events_bucketed")
    val purchases = t.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = t.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = AsOfJoinPlan.asof(purchases, clicks, "user_id", "ts",
        "event_id", Seq("event_id"))
      val plan = q.queryExecution.executedPlan
      assert(plan.collectFirst { case e: AsOfJoinExec => e }.nonEmpty)
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.isEmpty,
        s"bucketed inputs must add no exchange, got ${exchanges.size}")
      // and the exchange-free plan still computes the right rows
      val expect = Temporal.asOfJoin(purchases, clicks, "user_id", "ts",
          "event_id", Seq("event_id"))
        .orderBy(col("event_id")).collect()
      assert(q.orderBy(col("event_id")).collect().toSeq == expect.toSeq)
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("plan shape: AsOfJoinExec with one exchange per side (SMJ contract)") {
    val (purchases, clicks) = eventsFixture
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = AsOfJoinPlan.asof(purchases, clicks, "user_id", "ts",
        "event_id", Seq("event_id"))
      val plan = q.queryExecution.executedPlan
      assert(plan.collectFirst { case e: AsOfJoinExec => e }.nonEmpty,
        "AsOfJoinExec must plan the node")
      val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.size == 2,
        s"expected exactly one clustered exchange per side, got ${exchanges.size}")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }
}
