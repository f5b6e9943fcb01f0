package graft

import graft.operators.Layout
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The Z-order layout: Morton interleave correctness, and the pruning
  * contract — a box query's executed scan must read only the files under
  * the intersecting z buckets' directories, with results equal to the
  * plain filter over the unclustered relation. */
class ZorderLayoutSpec extends SparkTestBase {

  test("quantize maps a degenerate (constant) dimension to cell 0, no NaN") {
    import spark.implicits._
    assert(Layout.quantizeDouble(5.0, 5.0, 5.0) == 0L)
    assert(Layout.quantizeDouble(-3.0, 7.0, 7.0) == 0L)
    val cells = Seq(1.0, 7.0, 9.5).toDF("v")
      .select(Layout.quantize(col("v"), 7.0, 7.0).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(cells == Seq(0L, 0L, 0L),
      "hi == lo must not divide by zero / float NaN through the clamp")
  }

  test("Morton interleave puts x bits at odd, y bits at even positions") {
    // x=3 (011), y=5 (101) → z bits {1,3} ∪ {0,4} = 0b11011 = 27
    assert(Layout.interleaveLong(3, 5) == 27L)
    assert(Layout.interleaveLong(0, 0) == 0L)
    assert(Layout.interleaveLong(31, 31) == 1023L)
    // column twin agrees with the driver twin across the full grid
    val grid = for { x <- 0 until 32; y <- 0 until 32 } yield (x.toLong, y.toLong)
    import spark.implicits._
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"), Layout.interleave(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) == Layout.interleaveLong(x, y))
    }
  }

  test("box query prunes to intersecting buckets and matches the plain filter") {
    val ev = Tables.events(spark, sfDir)
    val path = java.nio.file.Files.createTempDirectory("zorder").toString + "/events"
    val b = Layout.writeZordered(ev, col("user_id"), unix_micros(col("ts")), path)

    val (yLo, yHi) = (1704672000e6, 1705363200e6) // Jan 8 .. Jan 16 2024, µs
    val residual = col("user_id").between(3, 9) &&
      col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
      col("ts") < lit("2024-01-16 00:00:00").cast("timestamp")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (df, got) =
      try {
        val q = Layout.boxQuery(spark, path, b, 3.0, 9.0, yLo, yHi, residual)
          .select(col("event_id")).orderBy(col("event_id"))
        (q, q.collect().map(_.getLong(0)).toSeq)
      } finally spark.conf.unset("spark.sql.adaptive.enabled")

    val expect = ev.filter(residual).select(col("event_id"))
      .orderBy(col("event_id")).collect().map(_.getLong(0)).toSeq
    assert(got == expect && got.nonEmpty, s"box rows: ${got.size}")

    // pruning: numFiles == files under the intersecting buckets alone
    val buckets = Layout.boxBuckets(b, 3.0, 9.0, yLo, yHi).toSet
    def parquetFiles(d: java.io.File): Int =
      Option(d.listFiles()).toSeq.flatten.count(_.getName.endsWith(".parquet"))
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("zbucket=")).toSeq
    assert(dirs.length > buckets.size, s"${dirs.length} dirs vs ${buckets.size} buckets")
    val expectedFiles = dirs
      .filter(d => buckets.contains(d.getName.stripPrefix("zbucket=").toLong))
      .map(parquetFiles).sum
    val scan = df.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }.head
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead == expectedFiles,
      s"scan read $filesRead files; intersecting buckets hold $expectedFiles")
    assert(filesRead < dirs.map(parquetFiles).sum,
      "pruning must skip at least one bucket directory")
  }

  test("compactionPlan: bins are name-contiguous, target-bounded, complete") {
    import spark.implicits._
    val files = (1 to 200).map(i =>
      (if (i % 2 == 0) "bkt_a" else "bkt_b", f"dir${i % 3}/f$i%04d.dat",
        (i % 7 + 1) * 1000L)).toDF("bucket_id", "name", "size")
    val plan = Layout.compactionPlan(files, sizeThreshold = 10000L,
      targetBytes = 8000L).collect()
    // completeness: every sub-threshold file lands in exactly one bin
    assert(plan.map(_.getAs[Long]("n_files")).sum == 200L)
    // each (bucket, folder) group's bins: contiguous, first<=last,
    // and every bin except possibly the last holds >= targetBytes only by
    // its straddling file (next-fit: bin bytes < target + max file size)
    plan.groupBy(r => (r.getString(0), r.getString(1))).foreach {
      case (_, rows) =>
        val bins = rows.map(_.getAs[Long]("bin")).sorted
        assert(bins.toSeq == (0L until bins.length).toSeq,
          "bin ids must be dense from 0")
        rows.foreach { r =>
          assert(r.getAs[String]("first_name") <= r.getAs[String]("last_name"))
          assert(r.getAs[Long]("total_bytes") < 8000L + 7000L)
        }
        // name ranges of consecutive bins must not interleave
        val ordered = rows.sortBy(_.getAs[Long]("bin"))
        ordered.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getAs[String]("last_name") < b.getAs[String]("first_name"))
          case _ =>
        }
    }
    // oversized files are excluded from the plan
    val withBig = files.unionByName(
      Seq(("bkt_a", "dir0/huge.dat", 99999L)).toDF("bucket_id", "name", "size"))
    val plan2 = Layout.compactionPlan(withBig, 10000L, 8000L).collect()
    assert(plan2.map(_.getAs[Long]("n_files")).sum == 200L)
  }
}
