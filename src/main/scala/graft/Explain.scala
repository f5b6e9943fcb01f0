package graft

import org.apache.spark.sql.SparkSession

/** Plan review tool: `runMain graft.Explain <sfDir> <query>[,<query>...]`
  * prints the formatted physical plan of each named registry query (all of
  * them if none named) — the SURVEY §4 feedback loop for checking pushed
  * filters, ReadSchema pruning, broadcast vs sort-merge joins, and
  * WholeStageCodegen spans.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 1) args(1).split(",").toSeq else Registry.all.keys.toSeq.sorted
    val spark = Tuning(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      Registry.all(n).fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
