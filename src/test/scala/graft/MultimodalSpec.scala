package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, per-partition feature extraction, and —
  * critically for 100 TB — column pruning: metadata-only queries must not
  * read the binary payload.
  */
class MultimodalSpec extends SparkTestBase {

  test("synthetic media has the typed schema and deterministic payloads") {
    val m = Multimodal.syntheticMedia(spark, sfDir)
    assert(m.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "mime", "width", "height", "duration_ms", "bytes"))
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("extractFeatures runs per-partition and is deterministic") {
    val m = Multimodal.syntheticMedia(spark, sfDir).limit(20)
    val f1 = Multimodal.extractFeatures(m, 8).orderBy("media_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](2)))
    val f2 = Multimodal.extractFeatures(m.repartition(7), 8).orderBy("media_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](2)))
    assert(f1.length == 20 && f1.forall(_._2.length == 8))
    assert(f1.toSeq == f2.toSeq, "features must not depend on partitioning")
  }

  test("stub kernel output matches a local recompute exactly (mm_extract_features check)") {
    // the decode stub is deterministic: per-bin md5-derived dyadic floats —
    // recompute it here from the same source bytes and demand bit-equality,
    // which pins the full mapPartitions pipeline (row order, encoders,
    // batch boundaries) not just "some rows came back"
    def localStub(bytes: Array[Byte], featDim: Int): Array[Float] = {
      def md5hex(b: Array[Byte]): String =
        java.security.MessageDigest.getInstance("MD5").digest(b)
          .map("%02x".format(_)).mkString
      val hex = md5hex(bytes)
      Array.tabulate(featDim) { j =>
        Integer.parseInt(
          md5hex((hex + "|" + j).getBytes("UTF-8")).substring(0, 4), 16) / 65536.0f
      }
    }
    val docs = Tables.documents(spark, sfDir).limit(5)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val media = Multimodal.syntheticMedia(spark, sfDir)
      .filter(col("media_id").isin(docs.keys.toSeq: _*))
    val got = Multimodal.extractFeatures(media, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2).toSeq).toMap
    assert(got.keySet == docs.keySet)
    docs.foreach { case (id, text) =>
      assert(got(id) == localStub(text.getBytes("UTF-8"), 16).toSeq,
        s"feature mismatch for media $id")
    }
  }

  test("metadata-only aggregation prunes the binary column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    Multimodal.syntheticMedia(spark, sfDir).write.mode("overwrite").parquet(dir)
    val stats = Multimodal.mediaStats(spark.read.parquet(dir))
    val plan = stats.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("bytes"), s"binary column must be pruned:\n$plan")
    assert(stats.count() == 3)
  }

  test("frame sampling emits bounded per-media frame indexes") {
    val got = Multimodal.sampleFrameIndexes(
      Multimodal.syntheticMedia(spark, sfDir).limit(5), 1000L, 4)
      .collect().map(_.getSeq[Long](1))
    assert(got.forall(f => f.nonEmpty && f.length <= 4))
    assert(got.forall(_.headOption.contains(0L)))
  }

  test("phash: re-encoded twin stays within Hamming 6 of its original; originals differ") {
    val h = Multimodal.phashBlocks(Multimodal.imagesWithReencodes(spark, sfDir))
      .collect().map(r => r.getLong(0) ->
        Seq(r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    def ham(a: Seq[Int], b: Seq[Int]) =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val twins = h.keys.filter(_ >= 1000000L).toSeq
    assert(twins.nonEmpty)
    twins.foreach { t =>
      assert(ham(h(t), h(t - 1000000L)) <= 6,
        s"twin $t drifted beyond the verify threshold")
    }
    // two distinct originals should be far apart (unrelated ≈ 32 bits);
    // exact-duplicate docs exist in the fixture, so compare via a sampled
    // minimum over DIFFERENT-text pairs rather than asserting every pair
    val origs = h.keys.filter(_ < 1000000L).toSeq.sorted.take(20)
    val dists = for (a <- origs; b <- origs if a < b) yield ham(h(a), h(b))
    assert(dists.max > 20, "unrelated images should be far in Hamming space")
  }

  test("phash blocking is complete for Hamming <= 3 (pigeonhole over 4 blocks)") {
    // any pair within Hamming 3 differs in at most 3 of the 4 blocks, so at
    // least one block matches exactly — the banded join cannot miss it
    val h = Multimodal.phashBlocks(Multimodal.imagesWithReencodes(spark, sfDir))
      .collect().map(r => r.getLong(0) ->
        Seq(r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    def ham(a: Seq[Int], b: Seq[Int]) =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val close = for {
      a <- h.keys.toSeq; b <- h.keys.toSeq
      if a < b && ham(h(a), h(b)) <= 3
    } yield (a, b)
    close.foreach { case (a, b) =>
      assert(h(a).zip(h(b)).exists { case (x, y) => x == y },
        s"pair ($a,$b) within Hamming 3 must share a block")
    }
  }

  test("sceneCuts census is partitioning-invariant and internally consistent") {
    val vids = Multimodal.syntheticMedia(spark, sfDir)
      .filter(col("kind") === "video").limit(30)
    val c1 = Multimodal.sceneCuts(vids).orderBy("media_id").collect()
    val c2 = Multimodal.sceneCuts(vids.repartition(7)).orderBy("media_id").collect()
    assert(c1.toSeq == c2.toSeq, "census must not depend on partitioning")
    c1.foreach { r =>
      val (n, cuts, scenes, longest) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(scenes == cuts + 1)
      assert(longest >= 1 && longest <= n)
      assert(scenes <= n)
    }
  }

  test("constellationHashes: twins share most landmarks, unrelated audios few") {
    val h = Multimodal.constellationHashes(
        Multimodal.audioWithReencodes(spark, sfDir))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    val twins = h.keys.filter(id => id >= 2000000L && h.contains(id - 2000000L))
    assert(twins.nonEmpty, "fixture must plant re-encode twins")
    twins.foreach { t =>
      val orig = h(t - 2000000L)
      // a twin differs in <=3 frames of >=n-3 shared ones: when the clip is
      // long enough to carry >=6 landmarks, at least half must survive
      if (orig.size >= 6)
        assert((orig & h(t)).size * 2 >= orig.size,
          s"twin $t shares too few landmarks")
    }
    // landmark determinism across partitioning
    val h2 = Multimodal.constellationHashes(
        Multimodal.audioWithReencodes(spark, sfDir).repartition(5))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(h == h2, "fingerprints must not depend on partitioning")
  }

  test("pipeline_multimodal_curation partitions every kind and rejects all twins") {
    val rows = Registry.all("pipeline_multimodal_curation").fn(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_rejected"),
          r.getAs[Long]("n_admitted"))).toMap
    assert(rows.keySet === Set("image", "audio", "video"))
    rows.values.foreach { case (t, r, a) => assert(a + r === t && r >= 0) }
    // every planted image twin is a later near-dup copy -> rejected
    val twins = Multimodal.imagesWithReencodes(spark, sfDir)
      .filter(col("reencode")).count()
    assert(rows("image")._2 >= twins,
      "curation must reject at least the planted re-encode twins")
  }
}
