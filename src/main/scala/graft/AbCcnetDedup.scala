package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B of the two ccnet first-occurrence line-dedup
  * SHAPES (r14): the row_number-window form that shipped vs the old
  * argmin-rejoin (groupBy(line).min(key) then equi-join back on line).
  * Same rationale as [[AbConf]]: back-to-back BenchOne runs on this
  * sandbox swing ±30% with host load waves; interleaving hits both arms
  * with the same ambient speed. The line relation is localCheckpointed
  * first so both arms time ONLY the dedup stage, not the corpus scan.
  * usage: runMain graft.AbCcnetDedup <sfDir> [reps]
  */
object AbCcnetDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lines = graft.operators.TextAnalysis
      .docLines(Tables.documents(spark, sfDir), "doc_id", "text", 4)
      .localCheckpoint()
    val key = col("id") * 4294967296L + col("line_no")
    def armWindow() = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("line")).orderBy(key.asc)
      lines.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).select(col("id"), col("line"))
    }
    def armRejoin() = {
      val winners = lines.groupBy(col("line")).agg(min(key).as("keep_key"))
      lines.join(winners, Seq("line")).filter(key === col("keep_key"))
        .select(col("id"), col("line"))
    }
    val arms = Seq("window" -> (() => armWindow()), "rejoin" -> (() => armRejoin()))
    for ((name, f) <- arms) {
      val n = f().count()
      println(s"ABSHAPE warmup $name rows=$n")
    }
    for (r <- 1 to reps; (name, f) <- arms) {
      val t0 = System.nanoTime()
      f().count()
      println(f"ABSHAPE $name rep=$r sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
    Warehouse.cleanup()
  }
}
