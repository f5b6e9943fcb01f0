package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Registry-wide plan linter: flags the two 100 TB anti-patterns that can
  * hide behind a green correctness row — windows with an empty partition
  * spec ("Moving all data to a single partition") and cartesian products.
  * `runMain graft.PlanAudit <sfDir>` prints one line per offending query;
  * exits 0 when clean. Globals over PROVABLY bounded relations (driver-side
  * literals etc.) are listed too — the point is that every one must be
  * explainable, and the count should only ever go down.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    Registry.all.toSeq.sortBy(_._1).foreach { case (name, q) =>
      try {
        val plan = q.fn(spark, sfDir).queryExecution.executedPlan
        val globalWindows = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        val cartesians = plan.collect { case c: CartesianProductExec => c }
        if (globalWindows.nonEmpty || cartesians.nonEmpty) {
          flagged += 1
          println(s"FLAG $name: ${globalWindows.size} global window(s), " +
            s"${cartesians.size} cartesian product(s)")
        }
      } catch {
        case e: Throwable =>
          flagged += 1
          println(s"FLAG $name: plan build failed: ${e.getMessage}")
      }
    }
    println(s"audit: $flagged flagged of ${Registry.all.size}")
    spark.stop()
    Warehouse.cleanup()
    if (flagged > 0) sys.exit(1)
  }
}
