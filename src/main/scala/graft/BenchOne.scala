package graft
import org.apache.spark.sql.SparkSession

/** Developer loop: time a subset of registry queries.
  * usage: runMain graft.BenchOne <sfDir> <queryName>[,<queryName>...] [reps]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq(Tables.objects(spark, sfDir), Tables.s3Keys(spark, sfDir),
      Tables.multipartParts(spark, sfDir)).foreach(_.count())
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"BENCHONE $n rep=$r rows=$cnt sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
