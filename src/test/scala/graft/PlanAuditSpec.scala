package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the r12 PlanAudit finding: AdaptiveSparkPlanExec is a LEAF node, so
  * a plain `plan.collect` sees NOTHING under an AQE-wrapped root — the
  * r9-r11 window/cartesian audits were blind on every wrapped plan. The
  * audit must go through [[PlanAudit.allNodes]], which descends the wrapper
  * (and subqueries); this spec fails if either the wrapper stops being a
  * leaf (collect suddenly sees inside — the workaround could be retired) or
  * allNodes stops seeing inside (the audit went blind again).
  */
class PlanAuditSpec extends SparkTestBase {

  test("allNodes sees through the AQE wrapper where plain collect is blind") {
    val df = spark.range(100).toDF("id")
      .repartition(4, col("id")) // an exchange, so AQE wraps the plan
      .withColumn("rn", row_number().over(Window.orderBy(col("id"))))
    val plan = df.queryExecution.executedPlan
    assert(plan.isInstanceOf[AdaptiveSparkPlanExec],
      s"fixture no longer AQE-wrapped: ${plan.getClass}")
    assert(plan.collect { case w: WindowExec => w }.isEmpty,
      "plain collect now descends the AQE wrapper — allNodes may be retirable")
    val seen = PlanAudit.allNodes(plan)
    assert(seen.exists(_.isInstanceOf[WindowExec]),
      s"allNodes missed the global window under AQE (saw ${seen.size} nodes)")
  }
}
