package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Plan-evidence tool for the Louvain loop INTERNALS (r13 verdict item 2):
  * the registry query's own explain ends at a checkpoint leaf, so the
  * per-round join shape — the whole point of the r13 `tot.localCheckpoint()`
  * fix — is invisible to `graft.Explain`. This runs the graded
  * graph_louvain_sync input through `Graph.louvainSync` with the
  * `roundPlanHook` wired to print round 1's pre-checkpoint plan, both the
  * initial plan and (after a noop-sink execution, guide §1.4) the final
  * AQE-decided plan.
  *
  * Usage: runMain graft.ExplainLouvainRound [sfDir] — defaults to sf0.1,
  * the same scale the committed round1_before plan was captured at.
  */
object ExplainLouvainRound {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = Tuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables.coPurchaseAdjacency(spark, sfDir)
      .select(col("src"), col("dst"))
    var captured: Option[DataFrame] = None
    graft.operators.Graph.louvainSync(e, 2, assumeDistinct = true,
      roundPlanHook = (round, cNew) => if (round == 1) {
        println(s"\n========== graph_louvain_sync round $round " +
          "(pre-checkpoint argmax relation) — initial plan ==========")
        cNew.explain("formatted")
        captured = Some(cNew)
      }).count()
    captured.foreach { df =>
      // re-execute the round-1 relation through the noop sink so the
      // AdaptiveSparkPlan prints its runtime-decided final plan
      df.write.format("noop").mode("overwrite").save()
      println("\n========== graph_louvain_sync round 1 — final plan " +
        "(post noop-sink execution) ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    spark.stop()
    Warehouse.cleanup()
  }
}
