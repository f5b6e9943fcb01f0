package graft

import graft.functions.{PathFns, TokenCodec, VectorExprs}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (SURVEY §5): Spark expressions vs naive Scala
  * models over seeded random inputs. Each property evaluates the whole
  * sample batch in ONE Spark job (scalacheck generates the data; the
  * assertion compares the full result vector).
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long = 42L): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  private val segGen: Gen[String] = for {
    len <- Gen.choose(1, 8)
    cs <- Gen.listOfN(len, Gen.frequency(
      8 -> Gen.alphaNumChar, 1 -> Gen.oneOf('-', '_', '.', '!', '~'),
      1 -> Gen.oneOf('é', 'ß', '中', '€')))
  } yield cs.mkString

  private val keyGen: Gen[String] = for {
    depth <- Gen.choose(1, 4)
    segs <- Gen.listOfN(depth, segGen)
  } yield segs.mkString("/")

  // ── F7 commonPrefix vs naive spec (0050:31-44) ──

  test("commonPrefix matches the naive model for random keys and prefixes") {
    def model(key: String, prefix: String, d: String): Option[String] = {
      val rest = key.drop(prefix.length)
      val pos = rest.indexOf(d)
      if (pos >= 0) Some(key.take(prefix.length + pos + d.length)) else None
    }
    val keys = sample(keyGen, 500).distinct
    for (prefix <- Seq("", "a", keys.head.take(2), keys.head + "/")) {
      val applicable = keys.filter(_.startsWith(prefix))
      val got = applicable.toDF("name")
        .select(col("name"), PathFns.commonPrefix(col("name"), prefix).as("cp"))
        .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
      applicable.foreach { k =>
        assert(got(k) == model(k, prefix, "/"), s"key=$k prefix=$prefix")
      }
    }
  }

  // ── URL canonicalization is idempotent (fixed point of cleanup) ──

  test("canonicalizeUrl is idempotent over random messy URLs") {
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http://", "https://", "HTTP://", "HTTPS://")
      www <- Gen.oneOf("", "www.", "WWW.")
      host <- Gen.oneOf("ex.com", "Sub.Ex.COM", "a-b.org")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/a", "/a/b/", "/a//")
      params <- Gen.someOf(Seq("a=1", "b=2", "utm_source=x", "fbclid=z", "z=9"))
      frag <- Gen.oneOf("", "#frag", "#a/b?c=1")
    } yield {
      val q = if (params.isEmpty) "" else "?" + params.mkString("&")
      s"$scheme$www$host$port$path$q$frag"
    }
    val urls = sample(urlGen, 400)
    val once = urls.toDF("u").select(PathFns.canonicalizeUrl(col("u")))
      .collect().map(_.getString(0)).toSeq
    val twice = once.toDF("u").select(PathFns.canonicalizeUrl(col("u")))
      .collect().map(_.getString(0)).toSeq
    assert(once == twice, "canonical form must be a fixed point")
    // and no canonical URL retains the noise the cleanup removes
    once.foreach { u =>
      assert(!u.contains("#") && !u.contains("utm_") && !u.contains("fbclid"))
      assert(!u.startsWith("https://www.") && !u.startsWith("http://www."))
    }
  }

  // ── byte ordering: Spark orderBy == COLLATE "C" (SURVEY §1.2) ──

  test("Spark string ordering is UTF-8 byte order (COLLATE \"C\" parity)") {
    val keys = sample(keyGen, 400).distinct
    val sparkOrder = keys.toDF("name").orderBy(col("name"))
      .collect().map(_.getString(0)).toSeq
    val byteOrder = keys.sortWith { (a, b) =>
      val x = a.getBytes("UTF-8")
      val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n && x(i) == y(i)) i += 1
      if (i < n) (x(i) & 0xff) < (y(i) & 0xff) else x.length < y.length
    }
    assert(sparkOrder == byteOrder)
  }

  // ── F15 successor bounds every string with that prefix (0050:210-216) ──

  test("successor(p) is an exclusive upper bound for keys with prefix p (ASCII ranges)") {
    val asciiSeg = Gen.listOfN(5, Gen.alphaNumChar).map(_.mkString)
    val ps = sample(asciiSeg, 50).distinct
    val keys = sample(keyGen, 300)
    val df = ps.toDF("p").crossJoin(keys.toDF("k"))
      .withColumn("succ", PathFns.successor(col("p")))
      .filter(col("k").startsWith(col("p")))
    val bad = df.filter(!(col("k") < col("succ"))).count()
    assert(bad == 0)
  }

  // ── O5/F14 token codec round-trip (object.ts:635-712) ──

  test("continuation-token codec round-trips arbitrary cursors") {
    val cursorGen = for {
      sa <- Gen.asciiPrintableStr
      sc <- Gen.oneOf("name", "created_at", "updated_at")
      so <- Gen.oneOf("asc", "desc")
      sca <- Gen.option(Gen.asciiPrintableStr)
    } yield TokenCodec.Cursor(sa, sc, so, sca)
    sample(cursorGen, 300, seed = 7L).foreach { c =>
      assert(TokenCodec.decode(TokenCodec.encode(c)) == c)
    }
    // unicode keys survive the base64(JSON) trip
    sample(keyGen, 100, seed = 11L).foreach { k =>
      assert(TokenCodec.decode(TokenCodec.encode(TokenCodec.Cursor(k))).startAfter == k)
    }
  }

  // ── P5 keyset predicate == tuple comparison (0039:43-52) ──

  test("keysetAfter equals ROW(truncMs(ts), name) > ROW(after, token)") {
    val tsGen = Gen.choose(0L, 2000000000000L) // epoch millis + sub-ms noise
    val rows = sample(Gen.zip(tsGen, keyGen, Gen.choose(0, 999)), 400)
      .map { case (ms, k, us) => (new java.sql.Timestamp(ms), k, us) }
    val (afterMs, token) = (1000000000000L, rows.head._2)
    val df = rows.toDF("ts", "name", "us")
      // micros beyond the ms boundary exercise the truncation
      .withColumn("ts",
        timestamp_micros(unix_micros(col("ts")) + col("us").cast("long")))
    val got = df.filter(PathFns.keysetAfter(col("ts"), col("name"),
        timestamp_millis(lit(afterMs)), lit(token)))
      .select("name").collect().map(_.getString(0)).toSeq.sorted
    val want = df.select(
        (unix_millis(date_trunc("millisecond", col("ts"))) * 1000).as("tm"),
        col("name")).collect()
      .filter { r =>
        val tm = r.getLong(0) / 1000
        tm > afterMs || (tm == afterMs && r.getString(1) > token)
      }.map(_.getString(1)).toSeq.sorted
    assert(got == want)
  }

  // ── ShingleHashes == distinct string shingles (collision-free at test scale) ──

  test("shingleHashes cardinality equals distinct string-shingle count") {
    val textGen = for {
      n <- Gen.choose(1, 40)
      ws <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
    } yield ws.mkString(" ")
    val texts = sample(textGen, 300)
    def modelCount(t: String, n: Int): Int = {
      val w = t.trim.toLowerCase.split("\\s+").toSeq
      val m = math.max(w.length - n + 1, 1)
      (0 until m).map(i => w.slice(i, math.min(i + n, w.length)).mkString(" ")).distinct.size
    }
    val got = texts.toDF("text")
      .select(size(VectorExprs.shingleHashes(
        split(lower(trim(col("text"))), "\\s+"), 3)).as("n"))
      .collect().map(_.getInt(0)).toSeq
    assert(got == texts.map(modelCount(_, 3)))
  }

  // ── df-cap preserves the above-threshold Jaccard pair set on the fixture ──

  test("jaccard df-cap(8) leaves the >=0.5 pair set unchanged on the fixture") {
    val d = Tables.documents(spark, sfDir)
    val corpus = d.select(col("doc_id"), col("text"))
      .unionByName(d.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(col("text"), lit(" quality data pipeline tail marker")).as("text")))
    def pairs(maxDf: Int) =
      graft.operators.Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.5, maxDf)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(0)
    val capped = pairs(8)
    assert(uncapped.nonEmpty)
    assert(capped == uncapped,
      s"df-cap changed the pair set: lost=${uncapped -- capped} gained=${capped -- uncapped}")
  }

  // ── portable row-local kernels == their SQL-expressible formulations ──

  test("MinHashMd5Sig matches the md5-substring double-hash formulation") {
    val texts = Seq("alpha beta gamma delta", "one two", "x",
      "alpha beta gamma delta epsilon zeta").toDF("text")
    val words = split(lower(trim(col("text"))), "\\s+")
    val kernel = texts.select(VectorExprs.minhashMd5Sig(words, 3, 8).as("sig"))
      .collect().map(_.getSeq[Long](0).toSeq)
    // model: the md5-hex-substring double-hash formulation, recomputed locally
    val local = Seq("alpha beta gamma delta", "one two", "x",
      "alpha beta gamma delta epsilon zeta").map { t =>
      val w = t.trim.toLowerCase.split("\\s+").toSeq
      val m = math.max(w.length - 2, 1)
      val shingles = (0 until m).map(i => w.slice(i, math.min(i + 3, w.length)).mkString(" "))
      val md = java.security.MessageDigest.getInstance("MD5")
      val hs = shingles.map { s =>
        val d = md.digest(s.getBytes("UTF-8"))
        def be(off: Int) = (0 until 8).foldLeft(0L)((v, i) => (v << 8) | (d(off + i) & 0xffL))
        (be(0) >>> 4, be(8) >>> 4)
      }
      (0 until 8).map(i =>
        hs.map { case (h1, h2) => (h1 + i * h2) & ((1L << 60) - 1) }.min)
    }
    assert(kernel.toSeq == local)
  }

  test("mergePairGreedy equals the sequential greedy fold on random symbol runs") {
    import spark.implicits._
    // local reference: Sennrich's greedy left-to-right non-overlapping merge
    def localMerge(syms: Vector[String], p1: String, p2: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == p1 && syms(i + 1) == p2) {
          out += (p1 + p2); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val rnd = new scala.util.Random(42L)
    val alphabet = Vector("a", "b", "ab")
    val pairs = Seq(("a", "a"), ("a", "b"), ("b", "a"), ("ab", "b"))
    for ((p1, p2) <- pairs) {
      // 60 random symbol sequences per pair, run-heavy by construction —
      // one Spark job per pair (cases ride as rows, not separate queries)
      val cases = (0 until 60).map { i =>
        val n = rnd.nextInt(13)
        (i.toLong, Vector.fill(n)(alphabet(rnd.nextInt(3))))
      }
      val got = cases.toDF("id", "syms")
        .select(col("id"), graft.operators.TextAnalysis
          .mergePairGreedy(col("syms"), p1, p2).as("m"))
        .orderBy(col("id")).collect()
        .map(r => r.getSeq[String](1).toVector)
      val want = cases.map { case (_, syms) => localMerge(syms, p1, p2) }
      assert(got.toSeq == want, s"pair ($p1, $p2)")
    }
  }
  // ── codegen hash kernels vs independent models ──

  test("Djb2Uint32 matches the JS int32-wrap model on random keys (incl. non-ASCII)") {
    // independent model in the SIGNED int32 domain: Scala Int multiply wraps
    // exactly like JS ToInt32 (the float64 product is exact below 2^53),
    // xor on Int, final >>> 0 — string-to-int.ts:1-9 verbatim
    def jsModel(s: String): Long = {
      var h = 5381
      s.foreach(ch => h = (h * 33) ^ ch.toInt)
      h.toLong & 0xffffffffL
    }
    val keys = sample(keyGen, 400).distinct
    val got = keys.toDF("s")
      .select(col("s"), VectorExprs.djb2Uint32(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keys.foreach { k =>
      assert(got(k) == jsModel(k), s"key '$k'")
      assert(got(k) >= 0L && got(k) <= 0xffffffffL, s"uint32 range, key '$k'")
    }
  }

  test("Md5Top60 equals conv(substring(md5(s),1,15),16,10) on random keys") {
    val keys = sample(keyGen, 400).distinct
    val rows = keys.toDF("s")
      .select(VectorExprs.md5Top60(col("s")).as("fast"),
        expr("cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)").as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("quantizedCos9 equals the interpreted HOF aggregate form bit-for-bit") {
    // the r11 codegen swap's exact claim: VecDot sums strictly left-to-right
    // from 0.0, same as aggregate(zip_with(...)) — so the d9 key is
    // bit-identical, not approximately equal
    val pairGen: Gen[(List[Double], List[Double])] = for {
      len <- Gen.choose(3, 48)
      a <- Gen.listOfN(len, Gen.chooseNum(-2.0, 2.0))
      b <- Gen.listOfN(len, Gen.chooseNum(-2.0, 2.0))
    } yield (a.map(x => if (math.abs(x) < 0.05) 0.1 else x), // keep norms > 0
             b.map(x => if (math.abs(x) < 0.05) 0.1 else x))
    val pairs = sample(pairGen, 300, seed = 7L)
    val rows = pairs.toDF("a", "b")
      .select(graft.operators.Vectors.quantizedCos9(col("a"), col("b")).as("fast"),
        floor((lit(1.0) -
          expr("aggregate(zip_with(a, b, (p, q) -> p * q), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)") /
          (sqrt(expr("aggregate(a, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v)")) *
           sqrt(expr("aggregate(b, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v)"))))
          * lit(1000000000.0)).cast("long").as("ref"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("withRunningMaxExcl equals the single-window running max on random data") {
    val xs = sample(Gen.chooseNum(0L, 1000000L), 500)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("k", "v")
    val got = graft.operators.Prefix
      .withRunningMaxExcl(df.repartition(7), Seq(col("k")), col("v"), 5)
      .select(col("k"), col("run_max_excl")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
      .toMap
    var acc = Option.empty[Long]
    xs.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) == acc, s"row $i")
      acc = Some(acc.fold(v)(math.max(_, v)))
    }
  }
}
