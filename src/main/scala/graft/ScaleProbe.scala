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
      "graph_louvain", "t_sessionize", "e_hourly_agg",
      "knn_graph_build", "knn_graph_build_wide", "beam_query",
      "beam_query_cold_flat", "beam_query_cold_bucketed",
      "hop_cold_flat", "hop_cold_bucketed",
      "dbscan_hot_1p", "dbscan_hot_2p")
    val kernels = if (args.length > 2) args(2).split(",").map(_.trim).toSeq else all
    // validate BEFORE the session spins up: a typo'd kernel name used to
    // surface as a bare MatchError after ~10 s of Spark startup
    val unknown = kernels.filterNot(all.contains)
    require(unknown.isEmpty,
      s"unknown kernel(s) ${unknown.mkString(", ")}; valid: ${all.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = Tuning(SparkSession.builder())
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

    // Disjoint embedding replicas under a per-replica diagonal ±1 orthogonal
    // transform: within a replica every pairwise cosine is EXACTLY preserved
    // (sign flips are an isometry), while cross-replica similarities are
    // scrambled to ~orthogonal — so the kNN structure stays per-replica and
    // per-replica work is the real sf's.
    def embX(m: Int): DataFrame = {
      val base = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      (0 until m).map { i =>
        base.select((col("vec_id") + lit(i * OFF)).as("vec_id"),
          transform(col("v"), (x, j) =>
            when(pmod(j * 1103515245L + lit(i * 12345L + 7L), lit(97)) < 48, -x)
              .otherwise(x)).as("v"))
      }.reduce(_ unionByName _)
    }
    // Hot-annulus corpus: n points on one ring of radius 5 around the
    // origin — ALL at the same distance from a pivot at the origin, the
    // worst case for single-pivot annulus pruning (every pair is a
    // candidate). Golden-angle spacing keeps the layout deterministic and
    // near-uniform; eps = 0.05 against ~0.01 point spacing keeps the TRUE
    // neighbor graph sparse, so the 1-pivot candidate blowup is pure
    // pruning failure, not real density.
    def ringPts(n: Int): DataFrame =
      spark.range(n.toLong).select(col("id"),
        array((lit(5.0) * cos(col("id") * lit(2.0 * math.Pi * 0.6180339887))),
          (lit(5.0) * sin(col("id") * lit(2.0 * math.Pi * 0.6180339887))))
          .as("v"))
    val ringPivotA = Seq(0.0, 0.0)       // ring center: one hot annulus
    val ringPivotB = Seq(7.0, 0.0)       // off-center: ~100 annuli across the ring

    // shared beam-search fixture: m×-grown corpus + resident graph, a FIXED
    // query set (base-replica ids only), LSH-entry ∪ min-id-fallback seeds —
    // setup is untimed in every beam kernel
    def beamFixtures(m: Int): (Long, DataFrame, DataFrame, DataFrame, DataFrame) = {
      val e = embX(m).persist(); val nIn = e.count()
      val nPlanes = 4 + (31 - Integer.numberOfLeadingZeros(math.max(m, 1)))
      val g = graft.operators.Vectors.nnDescentKnnGraph(e, "vec_id", "v",
        k = 5, nPlanes = nPlanes).persist()
      g.count()
      val qs = e.filter(col("vec_id") % 41 === 0 && col("vec_id") < OFF)
        .select(col("vec_id").as("q"), col("v").as("qv")).persist()
      qs.count()
      val b1 = graft.operators.Vectors.lshBuckets(e, "v", 64,
          nPlanes = nPlanes, seed = 42L)
        .select(col("vec_id").as("id"), col("lsh_bucket").as("bk"))
      val entry = g.agg(min(col("a")).as("id"))
      val seeds = qs.select(col("q"))
        .join(b1.select(col("id").as("q"), col("bk")), Seq("q"))
        .join(b1, Seq("bk")).filter(col("id") =!= col("q"))
        .select(col("q"), col("id"))
        .union(qs.select(col("q")).crossJoin(broadcast(entry))
          .filter(col("id") =!= col("q")))
        .distinct().localCheckpoint()
      (nIn, e, g, qs, seeds)
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
      // NN-Descent graph build with LSH occupancy held constant
      // (nPlanes = 4 + log2 m): the linear-build regime the 100 TB design
      // requires — at FIXED nPlanes the seed self-join is quadratic
      // (documented on nnDescentKnnGraph).
      case "knn_graph_build" =>
        val e = embX(m)
        val nPlanes = 4 + (31 - Integer.numberOfLeadingZeros(math.max(m, 1)))
        (e.count(), () =>
          graft.operators.Vectors.nnDescentKnnGraph(e, "vec_id", "v",
            k = 5, nPlanes = nPlanes).count())
      // Beam-search serving path at a FIXED query set against an m×-grown
      // resident graph+corpus: graph build, residency pin, and seed
      // construction are setup (untimed); the thunk times only the
      // 4-round beam probe — the corpus-independence claim under test.
      case "beam_query" =>
        val (nIn, e, g, qs, seeds) = beamFixtures(m)
        (nIn, () => graft.operators.Vectors.beamSearch(
          g, e.select(col("vec_id"), col("v")), qs, seeds,
          ef = 10, rounds = 4).count())
      // Cold-probe A/B for the r12 stored-adjacency layout: the SAME graph
      // rows written flat vs the bucketed layout (writeKnnGraphBucketed), read UNPERSISTED each
      // probe, so the timed thunk includes the per-round adjacency scan the
      // resident beam_query kernel deliberately pins away. Their ratio is
      // the measured value of graphHops' dynamic partition pruning at this
      // SF (at 100 TB the adjacency cannot be resident per executor and
      // this cold path IS the serving path).
      case "beam_query_cold_flat" | "beam_query_cold_bucketed" =>
        val bucketed = kernel.endsWith("bucketed")
        val (nIn, e, g, qs, seeds) = beamFixtures(m)
        val path = Warehouse.dir + s"/scaleprobe_knng_${m}_" +
          (if (bucketed) "bkt" else "flat")
        if (bucketed)
          graft.operators.Vectors.writeKnnGraphBucketed(g, path)
        else
          g.sortWithinPartitions(col("a")).write.mode("overwrite").parquet(path)
        g.unpersist()
        (nIn, () => graft.operators.Vectors.beamSearch(
          spark.read.parquet(path), e.select(col("vec_id"), col("v")), qs,
          seeds, ef = 10, rounds = 4).count())
      // Shuffle-partition isolation twin of knn_graph_build (r12 verdict
      // item 5): IDENTICAL kernel, but spark.sql.shuffle.partitions scales
      // with the multiple (cpus·m, capped 512) so per-task shuffle input
      // stays ~constant instead of the fixed-32 tasks growing m× heavier —
      // the wall-clock delta between this and knn_graph_build at the same
      // m is pure CONFIGURATION growth, the residual is algorithmic.
      case "knn_graph_build_wide" =>
        val e = embX(m)
        val nPlanes = 4 + (31 - Integer.numberOfLeadingZeros(math.max(m, 1)))
        (e.count(), () => {
          val prev = spark.conf.get("spark.sql.shuffle.partitions")
          spark.conf.set("spark.sql.shuffle.partitions",
            math.min(512, cpus.toInt * m))
          try graft.operators.Vectors.nnDescentKnnGraph(e, "vec_id", "v",
            k = 5, nPlanes = nPlanes).count()
          finally spark.conf.set("spark.sql.shuffle.partitions", prev)
        })
      // The DECISIVE bucketed-layout A/B (r12 verdict item 2): the
      // beam_query_cold pair tops out at MB-scale adjacency where the DPP
      // subquery overhead (~0.9 s measured) drowns the bytes it skips —
      // two r12 repetitions disagreed on the growth ordering and the claim
      // was withdrawn. This pair isolates the question: a SYNTHETIC
      // K-regular adjacency (8 pseudo-random neighbors per node, 100k·m
      // nodes — no NN-Descent build, so 64×/256× are reachable), written
      // flat vs bucketed under the PRODUCTION bucket rule (B grows with
      // the data, ~50 MB/bucket at the top sizes: B = max(16, m/4)), then
      // a single-query serving probe — 10 seed nodes, 4 chained cold hop
      // joins through Vectors.graphHops, next hop = 10 smallest distinct
      // neighbors (the beam contract without the scoring noise). The flat
      // arm scans all B buckets per hop; the bucketed arm DPP-prunes to
      // ≤10 — the crossover multiple is where bytes-skipped beats the DPP
      // subquery + small-files overhead.
      case "hop_cold_flat" | "hop_cold_bucketed" =>
        val bucketed = kernel.endsWith("bucketed")
        val K = 8
        val n = 100000L * m
        val buckets = math.max(16, m / 4)
        val edges = spark.range(n * K).select(
          (col("id") % n).as("a"),
          pmod(col("id") * 2654435761L + 12345L, lit(n)).as("b"))
        val path = Warehouse.dir + s"/scaleprobe_hop_${m}_" +
          (if (bucketed) s"bkt$buckets" else "flat")
        if (!new java.io.File(s"$path/_SUCCESS").exists()) {
          if (bucketed)
            graft.operators.Vectors.writeKnnGraphBucketed(edges, path, buckets)
          else
            edges.sortWithinPartitions(col("a")).write.mode("overwrite").parquet(path)
        }
        val g = spark.read.parquet(path)
        (n * K, () => {
          var probe = spark.range(10)
            .select(lit(1L).as("q"), (col("id") * (n / 10) + 1L).as("a"))
            .localCheckpoint()
          var out = 0L
          for (_ <- 1 to 4) {
            val nxt = graft.operators.Vectors.graphHops(g, probe)
              .select(col("q"), col("b")).distinct()
              .orderBy(col("b")).limit(10)
              .select(col("q"), col("b").as("a")).localCheckpoint()
            out = nxt.count()
            probe = nxt
          }
          out
        })
      // Hot-annulus candidate census: rows_out = candidate pairs the
      // annulus equi-join admits BEFORE the exact ε² check. 1p puts the
      // whole ring in one annulus (≈ n²/2 candidates); 2p intersects a
      // second pivot's partition of it — the multi-pivot composition
      // dbscan documents, measured.
      case "dbscan_hot_1p" =>
        val p = ringPts(3000 * m); (p.count(), () =>
          graft.operators.Vectors.annulusCandidatePairs(
            p, "id", "v", 0.05, Seq(ringPivotA)).count())
      case "dbscan_hot_2p" =>
        val p = ringPts(3000 * m); (p.count(), () =>
          graft.operators.Vectors.annulusCandidatePairs(
            p, "id", "v", 0.05, Seq(ringPivotA, ringPivotB)).count())
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
