package graft

import graft.operators.{Listing, Locks, PrefixIndex, Tus}
import org.apache.spark.sql.functions._

/** The batch forms of the reference's concurrency/trigger machinery
  * (SURVEY §2.12 D8/D9/D10/D12 + §2.5 W2) — semantics the oracle queries
  * can't pin alone: the skip-scan LOOP vs its declarative twin, the DJB2
  * hash kernel vs a reference-computed constant, cascade fixed points, and
  * the TUS poisoned-stream rule.
  */
class DmlOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ── W2: the reference seek loop ≡ the one-shuffle relation ──

  test("skipScanFolders (seek loop) enumerates exactly foldersPeek's folders") {
    val objects = Tables.objects(spark, sfDir)
    val loop = Listing.skipScanFolders(objects, "F", "R/", maxFolders = 10000)
    val rel = Listing.foldersPeek(objects, "F", "R/")
      .select(col("folder"), col("first_key"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(loop.nonEmpty)
    assert(loop == rel.toSeq, "loop and relation must agree in order and content")
  }

  test("skipScanFolders skips leaf files and honors maxFolders") {
    val objects = Seq(
      ("F", "top.dat"), ("F", "a/x.dat"), ("F", "a/y.dat"),
      ("F", "b/z.dat"), ("F", "c.dat"), ("F", "d/w.dat"), ("O", "e/q.dat"))
      .toDF("bucket_id", "name")
    val all = Listing.skipScanFolders(objects, "F", "")
    assert(all.map(_._1) == Seq("a/", "b/", "d/"))
    assert(all.map(_._2) == Seq("a/x.dat", "b/z.dat", "d/w.dat"))
    assert(Listing.skipScanFolders(objects, "F", "", maxFolders = 2).size == 2)
  }

  test("skip-scan peek pushes bucket partition filter and name seek into the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val objects = Tables.objects(spark, sfDir) // stored partitioned by bucket_id
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val peek = objects.filter(col("bucket_id") === "F" && col("name") > "R/2")
        .orderBy(col("name")).limit(1)
      peek.collect()
      val scan = peek.queryExecution.executedPlan
        .collect { case f: FileSourceScanExec => f }.head
      // bucket_id is a partition column of the stored layout: the seek must
      // prune at directory level, not post-filter
      assert(scan.partitionFilters.exists(_.toString.contains("bucket_id")),
        s"no partition filter in ${scan.partitionFilters}")
      // the name lower bound must reach parquet (row-group min/max skipping
      // on the name-sorted files — each peek touches ~1 row group)
      assert(scan.metadata("PushedFilters").contains("GreaterThan(name"),
        s"name seek not pushed: ${scan.metadata("PushedFilters")}")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  // ── D8: hash kernel + FIFO schedule ──

  test("hashStringToInt matches the reference DJB2-uint32 kernel") {
    // expected values computed independently from string-to-int.ts:1-9
    // semantics (ToInt32 wrap + xor, folded >>> 0)
    val got = Seq("F/R/123", "bkt/a.dat").toDF("s")
      .select(Locks.hashStringToInt(col("s"))).as[Long].collect()
    assert(got.toSeq == Seq(77854593L, 953562857L))
  }

  test("lock schedule: FIFO per key, try succeeds only at the head") {
    val reqs = Seq(
      ("b/k1", "2024-01-01 00:00:01", "u1", 1),
      ("b/k1", "2024-01-01 00:00:02", "u2", 2),
      ("b/k1", "2024-01-01 00:00:03", "u3", 3),
      ("b/k2", "2024-01-01 00:00:05", "u4", 1))
      .toDF("key_str", "ts0", "requester", "seq")
      .withColumn("ts", to_timestamp(col("ts0")))
    val out = Locks.schedule(reqs, Seq(col("seq")))
      .orderBy(col("key_str"), col("grant_order"))
      .select(col("requester"), col("grant_order"), col("try_acquired"), col("wait_ahead"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getBoolean(2), r.getInt(3)))
    assert(out.toSeq == Seq(("u1", 1, true, 0), ("u2", 2, false, 1),
      ("u3", 3, false, 2), ("u4", 1, true, 0)))
  }

  // ── D10: cascade fixed point ──

  test("prefixDelta removes emptied folders upward and adds new trees") {
    val before = Seq(("F", "a/b/x.dat"), ("F", "a/c.dat")).toDF("bucket_id", "name")
    // deleting a/b/x.dat empties a/b (cascade removes it) but a survives
    // via a/c.dat; inserting z/n/q.dat creates z and z/n
    val after = Seq(("F", "a/c.dat"), ("F", "z/n/q.dat")).toDF("bucket_id", "name")
    val delta = PrefixIndex.prefixDelta(before, after)
      .orderBy(col("op"), col("prefix"))
      .collect().map(r => (r.getAs[String]("op"), r.getAs[String]("prefix"),
        r.getAs[Long]("level")))
    assert(delta.toSeq == Seq(
      ("delete", "a/b", 2L), ("insert", "z", 1L), ("insert", "z/n", 2L)))
  }

  test("derivePrefixes ignores root-level names (no sequence(1,0) artifact)") {
    val objs = Seq(("F", "root.dat"), ("F", "a/x.dat")).toDF("bucket_id", "name")
    val p = PrefixIndex.derivePrefixes(objs).collect()
    assert(p.map(_.getAs[String]("prefix")).toSeq == Seq("a"))
  }

  // ── D12: poisoned-stream replay ──

  test("TUS replay: first offset mismatch 409s the rest of the stream") {
    val appends = Seq(
      // upload A: clean, completes
      ("A", 1, 0L, 10L, 30L), ("A", 2, 10L, 10L, 30L), ("A", 3, 20L, 10L, 30L),
      // upload B: append 2 declares a wrong offset -> it and append 3 reject
      ("B", 1, 0L, 10L, 30L), ("B", 2, 17L, 10L, 30L), ("B", 3, 20L, 10L, 30L),
      // upload C: clean but short -> active (resumable)
      ("C", 1, 0L, 10L, 25L))
      .toDF("upload_id", "seq", "declared_offset", "size", "upload_length")
    val out = Tus.replay(appends).orderBy(col("upload_id"))
      .select(col("upload_id"), col("committed_offset"), col("n_rejected"), col("status"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      ("A", 30L, 0L, "complete"), ("B", 10L, 2L, "conflict"), ("C", 10L, 0L, "active")))
  }

  test("upload-id codec round-trips keys containing slashes") {
    val id = Tus.encodeUploadId("t1", "bkt", "a/b/c.dat", "v9")
    assert(Tus.decodeUploadId(id) == (("t1", "bkt", "a/b/c.dat", "v9")))
  }
}
