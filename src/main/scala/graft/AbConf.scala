package graft
import org.apache.spark.sql.SparkSession

/** Interleaved same-JVM A/B of one runtime SQL conf across registry queries
  * — host load waves hit both arms equally, unlike back-to-back BenchOne
  * runs (r13: sequential A/Bs on this sandbox swung ±30% between laps).
  * usage: runMain graft.AbConf <sfDir> <q1,q2,...> <confKey> <valA> <valB> [reps]
  */
object AbConf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val (confKey, valA, valB) = (args(2), args(3), args(4))
    val reps = if (args.length > 5) args(5).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq(Tables.objects(spark, sfDir), Tables.s3Keys(spark, sfDir),
      Tables.multipartParts(spark, sfDir)).foreach(_.count())
    // warmup lap (both arms once, untimed)
    for (v <- Seq(valA, valB); n <- names) {
      spark.conf.set(confKey, v); SparkEntry.queries(n)(spark, sfDir).count()
    }
    for (r <- 1 to reps; (v, arm) <- Seq((valA, "A"), (valB, "B")); n <- names) {
      spark.conf.set(confKey, v)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"ABCONF $arm $n rep=$r sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
    Warehouse.cleanup()
  }
}
