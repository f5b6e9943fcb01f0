package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe: time representative kernels at 1×/4×/16×
  * synthetic corpus multipliers and report the slope — measured evidence
  * for the SCALE.md linearity claims instead of asserted plan-shape
  * arguments.
  *
  * Inputs scale by DISJOINT replication (ids offset per replica; document
  * words salted per replica so replicas are not near-duplicates of each
  * other — otherwise the LSH probe would measure the synthetic corpus's
  * pathology, m× copies in every bucket, not the engine). Within a replica
  * the duplicate/community/session structure is the real sf0.1 data's, so
  * per-replica work is constant and total work should scale ~linearly in m
  * for every kernel probed here.
  *
  * usage: runMain graft.ScaleProbe <sfDir> [mults] [kernels]
  *        mults   comma list, default 1,4,16
  *        kernels comma list, default all
  * Prints one line per (kernel, mult): SCALEPROBE kernel=… mult=… rows_in=… sec=…
  */
object ScaleProbe {
  private val OFF = 10000000L

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val mults = (if (args.length > 1) args(1) else "1,4,16")
      .split(",").map(_.trim.toInt).toSeq
    val all = Seq("dedup_exact", "dedup_minhash_lsh", "text_wordpiece",
      "graph_louvain", "t_sessionize", "e_hourly_agg")
    val kernels = if (args.length > 2) args(2).split(",").toSeq else all
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", Warehouse.dir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // replica-disjoint scaled inputs; the m=1 path applies the SAME
    // transforms so the slope compares like against like
    def docsX(m: Int): DataFrame = {
      val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      (0 until m).map { i =>
        base.select((col("doc_id") + lit(i * OFF)).as("doc_id"),
          array_join(transform(split(col("text"), " "),
            w => concat(w, lit(s"_$i"))), " ").as("text"))
      }.reduce(_ unionByName _)
    }
    def edgesX(m: Int): DataFrame = {
      val base = Tables.coPurchaseEdges(spark, sfDir)
      (0 until m).map { i =>
        base.select((col("src") + lit(i * OFF)).as("src"),
          (col("dst") + lit(i * OFF)).as("dst"))
      }.reduce(_ unionByName _)
    }
    def eventsX(m: Int): DataFrame = {
      val base = Tables.events(spark, sfDir)
        .select(col("user_id"), col("ts"), col("event_type"))
      (0 until m).map { i =>
        base.select((col("user_id") + lit(i * OFF)).as("user_id"),
          col("ts"), col("event_type"))
      }.reduce(_ unionByName _)
    }

    // each kernel returns (rows_in, result-materializing thunk)
    def run(kernel: String, m: Int): (Long, () => Long) = kernel match {
      case "dedup_exact" =>
        val d = docsX(m); (d.count(), () =>
          graft.operators.Dedup.exactDedup(d, "doc_id", "text").count())
      case "dedup_minhash_lsh" =>
        val d = docsX(m); (d.count(), () =>
          graft.operators.Dedup.minhashLshPairs(d, "doc_id", "text").count())
      case "text_wordpiece" =>
        val d = docsX(m); (d.count(), () =>
          graft.operators.TextAnalysis.wordpieceSegment(d, "text").count())
      case "graph_louvain" =>
        val e = edgesX(m); (e.count(), () =>
          graft.operators.Graph.louvainSync(e, 2, assumeDistinct = true).count())
      case "t_sessionize" =>
        val ev = eventsX(m); (ev.count(), () =>
          graft.operators.Temporal.sessionStats(ev, "user_id", "ts", 1800L).count())
      case "e_hourly_agg" =>
        val ev = eventsX(m); (ev.count(), () =>
          ev.groupBy(col("event_type"),
              expr("unix_micros(ts) div 3600000000").as("h"))
            .agg(count(lit(1)).as("n"),
              approx_count_distinct(col("user_id")).as("users"))
            .count())
    }

    // untimed warmup at the smallest mult: codegen + C2 for every probed
    // plan family lands here, not on the first timed line
    kernels.foreach { k =>
      val (_, thunk) = run(k, mults.min); thunk(); ()
      spark.catalog.clearCache()
    }
    for (m <- mults; k <- kernels) {
      val (nIn, thunk) = run(k, m)
      val t0 = System.nanoTime()
      val out = thunk()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"SCALEPROBE kernel=$k mult=$m rows_in=$nIn rows_out=$out sec=$sec%.3f")
    }
    spark.stop()
    Warehouse.cleanup()
  }
}
