package graft
import org.apache.spark.sql.SparkSession

/** Developer loop: time a subset of registry queries.
  * usage: runMain graft.BenchOne <sfDir> <queryName>[,<queryName>...] [reps] [resident]
  *
  * NOTE (cross-round comparability): BenchOne does NOT run Bench's untimed
  * warmup lap or fixture-build phase, so rep 1 lands fixture builds + JIT
  * and graph/indexed lines read higher than the gate bench; steady state is
  * reps 3+. Passing `resident` as the 4th arg additionally pins the stored
  * co-purchase/kNN-graph/embedding relations first (Bench's resident-lap
  * contract) — the pinned-index serving model. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    // `all` = the full registry in sorted order (lap parity with Bench) —
    // used for whole-registry sweeps like the WARN-flood census
    val names = if (args(1) == "all") SparkEntry.queries.keys.toSeq.sorted
                else args(1).split(',').toSeq
    val reps = if (args.length > 2) args(2).toInt else 1
    // fail fast on a typo'd mode flag (same silent-failure class the
    // ScaleProbe kernel-name validation guards): a misspelled "resident"
    // would silently time the COLD path and poison the A/B
    val resident = args.length > 3 && {
      require(args(3) == "resident",
        s"unknown 4th arg '${args(3)}'; the only mode is 'resident'")
      true
    }
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
    if (resident) {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      graft.operators.Vectors.ensureKnnGraph(spark, emb, "vec_id", "v",
        Warehouse.knnGraphPath(sfDir))
      Warehouse.residentPins(spark, sfDir).foreach { df =>
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        df.count()
      }
    }
    for (r <- 1 to reps; n <- names) {
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"BENCHONE $n rep=$r rows=$cnt sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
    Warehouse.cleanup()
  }
}
