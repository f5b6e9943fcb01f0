package graft

import graft.operators.SigV4
import org.apache.spark.sql.functions._

/** SigV4 string algebra + the round-10 stream-parity census rows. */
class SigV4Spec extends SparkTestBase {
  import spark.implicits._

  test("rfc3986: unreserved pass through, AWS extras percent-encode uppercase") {
    val out = Seq("a b(c)*!x", "A-Z_0.9~", "u+k/p:q,r")
      .toDF("s").select(SigV4.rfc3986(col("s")).as("e"))
      .collect().map(_.getString(0))
    assert(out(0) == "a%20b%28c%29%2A%21x")
    assert(out(1) == "A-Z_0.9~") // unreserved untouched
    assert(out(2) == "u%2Bk%2Fp%3Aq%2Cr")
  }

  test("canonicalQueryString: sorts by key, drops X-Amz-Signature, encodes k=v") {
    val row = Seq(1).toDF("x").select(SigV4.canonicalQueryString(
      lit("prefix") -> lit("a b"),
      lit("X-Amz-Signature") -> lit("dead"),
      lit("X-Amz-Date") -> lit("20240101T000000Z"),
      lit("delimiter") -> lit("/")).as("cqs")).collect()(0).getString(0)
    // ASCII sort: uppercase X before lowercase d/p; signature dropped
    assert(row == "X-Amz-Date=20240101T000000Z&delimiter=%2F&prefix=a%20b")
  }

  test("hostHeader: forwarded precedence, port append vs splice, fallback") {
    val df = Seq(
      ("direct.example.com", null.asInstanceOf[String], null.asInstanceOf[String]),
      ("d", "CDN.example.com", "8443"),     // no ':' in xfh -> append, lowered
      ("d", "t.example.com:9000", "7443"),  // has ':' -> splice trailing port
      ("d", "t.example.com:9000", "443")    // standard port -> untouched
    ).toDF("h", "xfh", "xfp")
      .select(SigV4.hostHeader(col("h"), col("xfh"), col("xfp")).as("o"))
      .collect().map(_.getString(0))
    assert(df(0) == "host:direct.example.com")
    assert(df(1) == "host:cdn.example.com:8443")
    assert(df(2) == "host:t.example.com:7443")
    assert(df(3) == "host:t.example.com:9000")
  }

  test("canonicalRequest + stringToSign assemble the exact AWS layout") {
    val cr = Seq(1).toDF("x").select(SigV4.canonicalRequest(
      lit("GET"), lit("/b/k.bin"), lit("a=1"),
      Seq(lit("host:h"), lit("x-amz-date:D")),
      Seq("x-amz-date", "host"), // unsorted on purpose
      lit("UNSIGNED-PAYLOAD")).as("cr")).collect()(0).getString(0)
    assert(cr ==
      "GET\n/b/k.bin\na=1\nhost:h\nx-amz-date:D\n\nhost;x-amz-date\nUNSIGNED-PAYLOAD")
    val sts = Seq(1).toDF("x").select(SigV4.stringToSign(
      lit("20240101T000000Z"), lit("20240101/us-east-1/s3/aws4_request"),
      lit(cr)).as("s")).collect()(0).getString(0)
    val parts = sts.split("\n")
    assert(parts(0) == "AWS4-HMAC-SHA256" && parts(1) == "20240101T000000Z")
    assert(parts(3).matches("[0-9a-f]{64}")) // hex sha256 of the canonical request
  }

  test("s3_sigv4_canonical row is deterministic and class-complete") {
    val r = Registry.all("s3_sigv4_canonical").fn(spark, sfDir).collect()
    assert(r.nonEmpty)
    val methods = r.map(_.getString(1)).toSet
    assert(methods.subsetOf(Set("GET", "PUT", "POST")))
    // presigned GETs carry UNSIGNED-PAYLOAD, all hashes are 64-hex
    r.foreach { row =>
      assert(row.getString(6).matches("[0-9a-f]{64}"))
      assert(row.getString(7).matches("[0-9a-f]{64}"))
    }
  }

  test("e7/e8: sealed+open partitions are exhaustive") {
    val e7 = Registry.all("e7_windowed_counts_sealed").fn(spark, sfDir).collect()
    val total = Tables.events(spark, sfDir).count()
    assert(e7.map(r => r.getLong(2) + r.getLong(4)).sum == total,
      "sealed+open event counts must cover every event")
    val e8 = Registry.all("e8_session_seal_census").fn(spark, sfDir).collect()
    val nSessEvents = e8.map(r => r.getLong(1) * r.getLong(2)).sum
    assert(nSessEvents == total, "session census must cover every event")
  }

  test("e9: as-of emission census is bounded by query counts") {
    Registry.all("e9_asof_emit_census").fn(spark, sfDir).collect().foreach { r =>
      val (nq, ne, nm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ne <= nq && nm <= ne)
    }
  }

  test("rfc3986 column fold equals a plain-Scala model over random inputs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // model: JS encodeURIComponent + the !'()* extras (signature-v4.ts:468)
    def model(s: String): String = s.flatMap { c =>
      if (c.isLetterOrDigit && c < 128 || "-_.~".contains(c)) c.toString
      else f"%%${c.toInt}%02X"
    }
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('-', '_', '.', '~'),
      4 -> Gen.oneOf(' ', '!', '"', '#', '$', '&', '\'', '(', ')', '*',
        '+', ',', '/', ':', ';', '=', '?', '@'))
    val strGen = for {
      n <- Gen.choose(0, 24)
      cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString
    val inputs = Gen.listOfN(200, strGen)
      .pureApply(Gen.Parameters.default, Seed(7L))
    val got = inputs.toDF("s").select(col("s"), SigV4.rfc3986(col("s")).as("e"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    inputs.foreach { s =>
      assert(got(s) == model(s), s"encode mismatch for '$s'")
    }
  }

  test("canonicalQueryString equals a plain-Scala sort-encode-join model") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def enc(s: String): String = s.flatMap { c =>
      if (c.isLetterOrDigit && c < 128 || "-_.~".contains(c)) c.toString
      else f"%%${c.toInt}%02X"
    }
    val keyGen = for {
      n <- Gen.choose(1, 10)
      cs <- Gen.listOfN(n, Gen.frequency(8 -> Gen.alphaNumChar,
        2 -> Gen.const('-')))
    } yield cs.mkString
    val valGen = for {
      n <- Gen.choose(0, 12)
      cs <- Gen.listOfN(n, Gen.frequency(6 -> Gen.alphaNumChar,
        4 -> Gen.oneOf(' ', '(', ')', '*', '!', '/', '+', '#')))
    } yield cs.mkString
    val paramsGen = for {
      n <- Gen.choose(1, 6)
      ks <- Gen.listOfN(n, keyGen)
      vs <- Gen.listOfN(n, valGen)
    } yield ks.distinct.zip(vs) :+ ("X-Amz-Signature" -> "sig")
    val cases = Gen.listOfN(60, paramsGen)
      .pureApply(Gen.Parameters.default, Seed(13L))
    cases.zipWithIndex.foreach { case (params, i) =>
      val expected = params.filter(_._1 != "X-Amz-Signature")
        .sortBy(_._1).map { case (k, v) => s"${enc(k)}=${enc(v)}" }
        .mkString("&")
      val got = Seq(1).toDF("x").select(SigV4.canonicalQueryString(
        params.map { case (k, v) => (lit(k), lit(v)) }: _*).as("c"))
        .collect()(0).getString(0)
      assert(got == expected, s"case $i: $params")
    }
  }

  test("v3_graph_beam_search: beam census invariants hold") {
    val rows = Registry.all("v3_graph_beam_search").fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= 5L)             // n_beam <= k
      assert(r.getLong(3) <= r.getLong(1))   // recall5 <= n_beam <= 5
      assert(r.getLong(2) >= 0L)             // cosine d9 sums non-negative
    }
  }
}
