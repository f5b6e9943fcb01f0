package graft

import graft.operators.{BmpCodec, Multimodal}
import org.apache.spark.sql.functions._

/** The real pure-JVM BMP codec (image sibling of WavCodecSpec): encoder
  * byte layout, pixel-offset-seeking parser with row-order normalization,
  * round-trip identity across all four container variants, rejection of
  * malformed containers, and the graded rows' twin-invariance property
  * (byte-different re-encodes decode to identical pixels, hence identical
  * perceptual hashes).
  */
class BmpCodecSpec extends SparkTestBase {

  private def rngPixels(seed: Long, n: Int): Array[Int] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextInt(1 << 24))
  }

  test("round-trip identity across row orders, header sizes, and pad widths") {
    for (w <- Seq(1, 3, 4, 5, 16, 33); h <- Seq(1, 2, 7);
         topDown <- Seq(false, true); hdr <- Seq(40, 108)) {
      val pix = rngPixels(w * 1000L + h, w * h)
      val img = BmpCodec.decodeRgb24(
        BmpCodec.encodeRgb24(w, h, pix, topDown, hdr))
      assert(img.width == w && img.height == h)
      assert(img.topDown == topDown)
      assert(img.pixels.toSeq == pix.toSeq,
        s"pixel round-trip mismatch at w=$w h=$h topDown=$topDown hdr=$hdr")
    }
  }

  test("encoder byte layout: canonical headers, BGR order, bottom-up rows, pad") {
    // 2x2, distinct channels: (0,0)=red, (1,0)=green, (0,1)=blue, (1,1)=white
    val pix = Array(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val b = BmpCodec.encodeRgb24(2, 2, pix)
    // stride(2) = 8 (6 pixel bytes + 2 pad); file = 14 + 40 + 16
    assert(b.length == 70)
    assert(b(0) == 'B'.toByte && b(1) == 'M'.toByte)
    def u32(off: Int): Long = (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    assert(u32(2) == 70L) // fileSize
    assert(u32(10) == 54L) // pixel offset
    assert(u32(14) == 40L) // DIB header size
    assert(u32(18) == 2L && u32(22) == 2L) // width, +height (bottom-up)
    assert((b(28) & 0xff) == 24) // bitCount
    assert(u32(30) == 0L) // BI_RGB
    // bottom-up: file row 0 is image row y=1 -> blue then white, B,G,R
    assert((b(54) & 0xff) == 0xff && (b(55) & 0xff) == 0x00 && (b(56) & 0xff) == 0x00)
    assert((b(57) & 0xff) == 0xff && (b(58) & 0xff) == 0xff && (b(59) & 0xff) == 0xff)
    assert(b(60) == 0 && b(61) == 0) // row pad
    // file row 1 is image row y=0 -> red then green
    assert((b(62) & 0xff) == 0x00 && (b(63) & 0xff) == 0x00 && (b(64) & 0xff) == 0xff)
    assert((b(65) & 0xff) == 0x00 && (b(66) & 0xff) == 0xff && (b(67) & 0xff) == 0x00)
  }

  test("V4 header and top-down variants change bytes, not decoded pixels") {
    val pix = rngPixels(42, 5 * 3)
    val variants = for (td <- Seq(false, true); hdr <- Seq(40, 108))
      yield BmpCodec.encodeRgb24(5, 3, pix, td, hdr)
    // all four containers are pairwise byte-different
    for (Seq(a, b) <- variants.combinations(2))
      assert(!java.util.Arrays.equals(a, b), "containers should differ")
    // and all four decode to the same normalized pixel array
    for (v <- variants)
      assert(BmpCodec.decodeRgb24(v).pixels.toSeq == pix.toSeq)
    // V4 container really is 68 bytes longer with pixel offset 122
    assert(variants(1).length == variants(0).length + 68)
  }

  test("malformed containers are rejected with precise errors") {
    val good = BmpCodec.encodeRgb24(4, 3, rngPixels(1, 12))
    def failsWith(bytes: Array[Byte], fragment: String): Unit = {
      val e = intercept[IllegalArgumentException](BmpCodec.decodeRgb24(bytes))
      assert(e.getMessage.contains(fragment),
        s"expected '$fragment' in: ${e.getMessage}")
    }
    failsWith(Array[Byte](1, 2, 3), "too short")
    failsWith("XX".getBytes("US-ASCII") ++ good.drop(2), "bad magic")
    // inconsistent declared size: bytes shorter than the header claims
    failsWith(good.take(good.length - 4), "exceeds payload")
    // truncate mid-pixel-array WITH a consistent fileSize field: the
    // stride arithmetic itself must catch the overrun
    val trunc = good.take(good.length - 4)
    val newLen = trunc.length
    trunc(2) = (newLen & 0xff).toByte; trunc(3) = ((newLen >> 8) & 0xff).toByte
    trunc(4) = 0; trunc(5) = 0
    failsWith(trunc, "overruns")
    // 8bpp palette bitmap rejected
    val bpp8 = good.clone(); bpp8(28) = 8
    failsWith(bpp8, "unsupported bit depth")
    // RLE compression rejected
    val rle = good.clone(); rle(30) = 1
    failsWith(rle, "unsupported compression")
    // pixel offset pointing inside the headers
    val badOff = good.clone(); badOff(10) = 20; badOff(11) = 0
    failsWith(badOff, "inside the headers")
    // zero height
    val zeroH = good.clone()
    zeroH(22) = 0; zeroH(23) = 0; zeroH(24) = 0; zeroH(25) = 0
    failsWith(zeroH, "bad height")
  }

  test("bmpMedia payloads decode and extractBmpFeatures matches a local model") {
    val feats = Multimodal.extractBmpFeatures(
      Multimodal.bmpMedia(spark, sfDir).limit(60))
      .orderBy("media_id").collect()
    assert(feats.nonEmpty)
    feats.foreach { r =>
      val id = r.getLong(0)
      val w = (3 + (id / 3) % 14).toInt
      val h = (2 + id % 7).toInt
      val luma = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        77L * ((id + 3 * x + 7 * y) % 256) +
          150L * ((2 * id + 5 * x + y) % 256) +
          29L * ((3 * id + x + 11 * y) % 256)
      }
      assert(r.getInt(2) == w && r.getInt(3) == h, s"dims id=$id")
      val hdr = if (id % 5 == 0) 108 else 40
      assert(r.getLong(1) == 14L + hdr + BmpCodec.stride(w).toLong * h,
        s"payload_bytes id=$id")
      assert(r.getLong(4) == luma.sum, s"sum_luma id=$id")
      assert(r.getLong(5) == luma.max, s"max_luma id=$id")
      assert(r.getLong(6) == luma.take(w * (h / 2)).sum, s"top_luma id=$id")
      assert(r.getLong(7) == luma.count(_ >= 32768L).toLong, s"n_bright id=$id")
    }
  }

  test("re-encoded twins are byte-different but hash identical") {
    val media = Multimodal.bmpWithReencodes(spark, sfDir)
    val twins = media.filter(col("reencode")).count()
    assert(twins > 0, "fixture should contain re-encoded twins")
    // byte-level difference: join twin to original on source id (twin id
    // is -(src + 1) — collision-free with genuine non-negative doc ids)
    val byId = media.collect().map(r =>
      r.getLong(0) -> (r.getBoolean(1), r.getAs[Array[Byte]](2))).toMap
    byId.keys.filter(_ < 0L).foreach { tid =>
      val (_, tb) = byId(tid)
      val (_, ob) = byId(-tid - 1L)
      assert(!java.util.Arrays.equals(tb, ob), s"twin $tid should differ in bytes")
    }
    // hash identity over the normalized decode
    val blocks = Multimodal.bmpPhashBlocks(media).collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
      .toMap
    val twinIds = blocks.keys.filter(_ < 0L)
    assert(twinIds.nonEmpty)
    twinIds.foreach { tid =>
      assert(blocks(tid) == blocks(-tid - 1L),
        s"twin $tid phash should equal its original's")
    }
  }

  test("extractBmpFeatures is partitioning-independent") {
    val media = Multimodal.bmpMedia(spark, sfDir).limit(40)
    val a = Multimodal.extractBmpFeatures(media).orderBy("media_id")
      .collect().map(_.toSeq)
    val b = Multimodal.extractBmpFeatures(media.repartition(7))
      .orderBy("media_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
