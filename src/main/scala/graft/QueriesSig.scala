package graft

import graft.operators.SigV4
import org.apache.spark.sql.functions._

/** SigV4 request-verification string algebra over a synthesized request log
  * (reference: src/storage/protocols/s3/signature-v4.ts — the one ≥500-LoC
  * module with no analytics counterpart until now). Everything up to the
  * final HMAC is deterministic: the graded row replays canonical-request
  * construction, host-header resolution, payload-hash selection, region
  * fallback, and the string-to-sign for four request classes, certifying
  * every byte via SHA-256 columns (DuckDB `sha256` ≡ Spark `sha2(·,256)`).
  */
object QueriesSig {

  def queries: Map[String, Q] = Map(

    // Four request classes, one per o_orderkey % 4, each exercising a
    // distinct branch set of signature-v4.ts:
    //   m0 presigned GET  — X-Amz-Signature filtered from the query string
    //                       (ts:476-478), UNSIGNED-PAYLOAD (ts:415-417),
    //                       direct host header.
    //   m1 PUT with body  — mount prefix stripped into the URI (ts:84-90),
    //                       body SHA-256 payload hash (ts:430-435),
    //                       x-forwarded-host + non-standard port appended
    //                       (ts:550-556), RFC3986 '+','/' in uploadId.
    //   m2 plain GET      — empty-body hash (ts:425-427), accept-encoding
    //                       replaced by x-original-accept-encoding
    //                       (ts:507-512), port SPLICED over an existing
    //                       `:port` (ts:553-555), user-agent signed but
    //                       dropped from canonical headers (ts:61-76) while
    //                       staying in the signed-headers list (ts:457),
    //                       region falling back to the server's (ts:575-584).
    //   m3 POST contentSha — client-provided content hash wins (ts:420-422),
    //                       empty content-length defaulting to '0' (ts:502-505).
    // The graded sha256 of the string-to-sign certifies the whole chain;
    // cqs/uri/scope are also graded raw for debuggability. Scale: row-local
    // projections only — no shuffle but the output sort.
    "s3_sigv4_canonical" -> Q(
      fn = (s, dir) => {
        val k = col("o_orderkey")
        val m = k % 4
        val req = Tables.orders(s, dir).filter(k % 97 === 0)
        val longDate = date_format(col("o_orderdate"), "yyyyMMdd'T'HHmmss'Z'")
        val shortDate = date_format(col("o_orderdate"), "yyyyMMdd")
        // getSelectedRegion (ts:575-584), enforceRegion=false, server region
        // eu-west-2: auto/us-east-1/'' keep the client's region, anything
        // else resolves to the server's.
        val clientRegion = when(k % 3 === 0, "us-east-1")
          .when(k % 3 === 1, "auto").otherwise("ap-south-1")
        val region = when(clientRegion.isin("auto", "us-east-1", "eu-west-2", ""),
          clientRegion).otherwise("eu-west-2")
        val scope = concat(shortDate, lit("/"), region, lit("/s3/aws4_request"))
        val path = concat(lit("/bkt-"), k % 5, lit("/data/o-"), k, lit(".bin"))
        val method = when(m === 0, "GET").when(m === 1, "PUT")
          .when(m === 2, "GET").otherwise("POST")
        // canonicalUri (ts:84-90): mount prefix '/s3//' trims trailing
        // slashes then prepends — only the PUT class is mounted.
        val uri = when(m === 1, concat(lit("/s3"), path)).otherwise(path)
        val body = concat(lit("body-"), k, lit("-"), col("o_orderstatus"))
        val contentSha = sha2(concat(lit("csha-"), k), 256)
        val cqs = when(m === 0, SigV4.canonicalQueryString(
            lit("X-Amz-Algorithm") -> lit("AWS4-HMAC-SHA256"),
            lit("X-Amz-Date") -> longDate,
            lit("X-Amz-Expires") -> lit("900"),
            lit("X-Amz-Signature") -> lit("deadbeef"),
            lit("prefix") -> concat(lit("dir ("), col("o_orderpriority"), lit(")*!"))))
          .when(m === 1, SigV4.canonicalQueryString(
            lit("uploadId") -> concat(lit("u+"), k, lit("/part")),
            lit("partNumber") -> (k % 10).cast("string")))
          .when(m === 2, SigV4.canonicalQueryString(
            lit("delimiter") -> lit("/"),
            lit("list-type") -> lit("2"),
            lit("prefix") -> concat(lit("R/"), col("o_orderpriority"),
              lit(" #"), k % 9)))
          .otherwise(SigV4.canonicalQueryString(lit("uploads") -> lit("")))
        // Host resolution per class (ts:521-562).
        val host0 = concat(lit("host:proj-"), k % 7, lit(".storage.example.com"))
        val host1 = SigV4.hostHeader(lit("origin.internal"),
          concat(lit("cdn-"), k % 3, lit(".example.com")), lit("8443"))
        val host2 = SigV4.hostHeader(lit("origin.internal"),
          concat(lit("tenant-"), k % 4, lit(".example.com:9000")), lit("7443"))
        val host3 = lit("host:api.example.com")
        val payload = when(m === 0, "UNSIGNED-PAYLOAD") // ts:415-417
          .when(m === 1, sha2(body, 256))               // ts:430-435
          .when(m === 2, // EMPTY_SHA256_HASH (ts:425-427, constant ts:82)
            "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
          .otherwise(contentSha)                        // ts:420-422
        val canon = when(m === 0, SigV4.canonicalRequest(method, uri, cqs,
            Seq(host0), Seq("host"), payload))
          .when(m === 1, SigV4.canonicalRequest(method, uri, cqs,
            Seq(concat(lit("content-length:"), length(body)), host1,
              concat(lit("x-amz-date:"), longDate)),
            Seq("content-length", "host", "x-amz-date"), payload))
          .when(m === 2, SigV4.canonicalRequest(method, uri, cqs,
            // x-original-accept-encoding overrides (ts:507-512); user-agent
            // is in signedHeaders but ALWAYS_UNSIGNABLE (ts:61-76) so it has
            // no header line.
            Seq(lit("accept-encoding:gzip, br"), host2,
              concat(lit("x-amz-date:"), longDate)),
            Seq("accept-encoding", "host", "user-agent", "x-amz-date"), payload))
          .otherwise(SigV4.canonicalRequest(method, uri, cqs,
            // content-length header present-but-empty defaults to '0' (ts:502-505)
            Seq(lit("content-length:0"), host3,
              concat(lit("x-amz-date:"), longDate)),
            Seq("content-length", "host", "x-amz-date"), payload))
        val sts = SigV4.stringToSign(longDate, scope, canon)
        req.select(k.as("req_id"), method.as("method"), uri.as("uri"),
            cqs.as("cqs"), scope.as("scope"), payload.as("payload_hash"),
            sha2(canon, 256).as("canonical_sha256"),
            sha2(sts, 256).as("sts_sha256"))
          .orderBy(col("req_id"))
      },
      oracle = Some {
        val longDate = "strftime(o_orderdate, '%Y%m%dT%H%M%SZ')"
        val shortDate = "strftime(o_orderdate, '%Y%m%d')"
        val cqs0 = SigV4.canonicalQueryStringSql(
          "'X-Amz-Algorithm'" -> "'AWS4-HMAC-SHA256'",
          "'X-Amz-Date'" -> "ld",
          "'X-Amz-Expires'" -> "'900'",
          "'X-Amz-Signature'" -> "'deadbeef'",
          "'prefix'" -> "'dir (' || o_orderpriority || ')*!'")
        val cqs1 = SigV4.canonicalQueryStringSql(
          "'uploadId'" -> "'u+' || k || '/part'",
          "'partNumber'" -> "CAST(k % 10 AS VARCHAR)")
        val cqs2 = SigV4.canonicalQueryStringSql(
          "'delimiter'" -> "'/'",
          "'list-type'" -> "'2'",
          "'prefix'" -> "'R/' || o_orderpriority || ' #' || (k % 9)")
        val cqs3 = SigV4.canonicalQueryStringSql("'uploads'" -> "''")
        val host1 = SigV4.hostHeaderSql("'origin.internal'",
          "'cdn-' || (k % 3) || '.example.com'", "'8443'")
        val host2 = SigV4.hostHeaderSql("'origin.internal'",
          "'tenant-' || (k % 4) || '.example.com:9000'", "'7443'")
        s"""WITH req AS (SELECT o_orderkey AS k, o_orderkey % 4 AS m,
           |    o_orderdate, o_orderstatus, o_orderpriority,
           |    $longDate AS ld, $shortDate AS sd
           |  FROM orders WHERE o_orderkey % 97 = 0),
           |base AS (SELECT k, m, ld,
           |  CASE WHEN m = 0 THEN 'GET' WHEN m = 1 THEN 'PUT'
           |       WHEN m = 2 THEN 'GET' ELSE 'POST' END AS method,
           |  CASE WHEN m = 1 THEN '/s3' ELSE '' END
           |    || '/bkt-' || (k % 5) || '/data/o-' || k || '.bin' AS uri,
           |  sd || '/' ||
           |    CASE WHEN (CASE WHEN k % 3 = 0 THEN 'us-east-1'
           |                    WHEN k % 3 = 1 THEN 'auto'
           |                    ELSE 'ap-south-1' END)
           |           IN ('auto', 'us-east-1', 'eu-west-2', '')
           |      THEN (CASE WHEN k % 3 = 0 THEN 'us-east-1'
           |                 WHEN k % 3 = 1 THEN 'auto' ELSE 'ap-south-1' END)
           |      ELSE 'eu-west-2' END
           |    || '/s3/aws4_request' AS scope,
           |  CASE WHEN m = 0 THEN $cqs0 WHEN m = 1 THEN $cqs1
           |       WHEN m = 2 THEN $cqs2 ELSE $cqs3 END AS cqs,
           |  'body-' || k || '-' || o_orderstatus AS body,
           |  CASE WHEN m = 0 THEN 'UNSIGNED-PAYLOAD'
           |       WHEN m = 1 THEN sha256('body-' || k || '-' || o_orderstatus)
           |       WHEN m = 2 THEN
           |         'e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855'
           |       ELSE sha256('csha-' || k) END AS payload_hash,
           |  CASE WHEN m = 0 THEN
           |      'host:proj-' || (k % 7) || '.storage.example.com' || chr(10)
           |    WHEN m = 1 THEN
           |      'content-length:' || length('body-' || k || '-' || o_orderstatus)
           |        || chr(10) || $host1 || chr(10) || 'x-amz-date:' || ld || chr(10)
           |    WHEN m = 2 THEN
           |      'accept-encoding:gzip, br' || chr(10) || $host2 || chr(10)
           |        || 'x-amz-date:' || ld || chr(10)
           |    ELSE 'content-length:0' || chr(10) || 'host:api.example.com'
           |        || chr(10) || 'x-amz-date:' || ld || chr(10) END AS chdr,
           |  CASE WHEN m = 0 THEN 'host' WHEN m = 2 THEN
           |      'accept-encoding;host;user-agent;x-amz-date'
           |    ELSE 'content-length;host;x-amz-date' END AS shs
           |  FROM req),
           |canon AS (SELECT *,
           |    method || chr(10) || uri || chr(10) || cqs || chr(10)
           |      || chdr || chr(10) || shs || chr(10) || payload_hash AS cr
           |  FROM base)
           |SELECT k AS req_id, method, uri, cqs, scope, payload_hash,
           |  sha256(cr) AS canonical_sha256,
           |  sha256('AWS4-HMAC-SHA256' || chr(10) || ld || chr(10) || scope
           |    || chr(10) || sha256(cr)) AS sts_sha256
           |FROM canon ORDER BY req_id""".stripMargin
      },
      doc = "SigV4 canonical request + string-to-sign replay over a request log: RFC3986 query canonicalization, forwarded-host resolution, payload-hash selection, region fallback (signature-v4.ts:452-603)"),

    // aws-chunked (STREAMING-AWS4-HMAC-SHA256-PAYLOAD) per-chunk signature
    // chain (signature-v4-stream.ts:1-546, string-to-sign construction
    // signature-v4.ts:325-355): every chunk's string-to-sign is
    //   AWS4-HMAC-SHA256-PAYLOAD \n longDate \n scope \n prevSignature \n
    //   SHA256("") \n SHA256(chunkData)
    // where prevSignature is the PREVIOUS chunk's signature (the request's
    // seed signature for chunk 0, signature-v4.ts:329), and the stream ends
    // with a mandatory 0-byte final chunk whose payload hash is SHA256("")
    // (signature-v4-stream.ts:330 'Missing final chunk'). The real
    // per-chunk signature is HMAC(signingKey, stringToSign) — the secret is
    // out of analytic scope, so the graded chain substitutes the
    // deterministic surrogate sig_i = SHA256(stringToSign_i), preserving
    // exactly the property under test: each chunk COMMITS to the previous
    // chunk's signature, so the fold is inherently sequential PER REQUEST
    // and any reordered/dropped/duplicated chunk changes every later
    // signature. Chunk log: one request per orders row (k % 199), one data
    // chunk per lineitem row ordered by l_linenumber (one request has zero
    // data chunks — final-chunk-only edge). Spark side: requests fan out in
    // parallel and the per-request fold is a row-local aggregate() over the
    // collected chunk-hash array (chunk count is wire-bounded — 8 MB chunks
    // — so the array is small by protocol, not by luck); the oracle replays
    // the chain as a recursive CTE. Graded: the final signature (commits to
    // the whole chain) plus SHA256 over all intermediate signatures.
    "s3_sigv4_chunk_chain" -> Q(
      fn = (s, dir) => {
        val EMPTY =
          "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
        val k = col("o_orderkey")
        val reqs = Tables.orders(s, dir).filter(k % 199 === 0)
          .select(k.as("k"),
            date_format(col("o_orderdate"), "yyyyMMdd'T'HHmmss'Z'").as("ld"),
            concat(date_format(col("o_orderdate"), "yyyyMMdd"),
              lit("/eu-west-2/s3/aws4_request")).as("scope"),
            sha2(concat(lit("seed-"), k), 256).as("seed"))
        // order ties broken by the chunk hash itself: the synthetic lineitem
        // has duplicate (l_orderkey, l_linenumber) pairs (Tables.uniqCol
        // note), and the chain is order-SENSITIVE — (l_linenumber, ph) is a
        // total order up to hash equality, and equal-hash chunks commute in
        // the chain, so the fold is deterministic on both engines
        val wk = org.apache.spark.sql.expressions.Window
          .partitionBy(col("k")).orderBy(col("l_linenumber"), col("ph"))
        val chunks = Tables.lineitem(s, dir)
          .filter(col("l_orderkey") % 199 === 0)
          .select(col("l_orderkey").as("k"), col("l_linenumber"),
            sha2(concat(lit("chunk-"), col("l_orderkey"), lit("-"),
              col("l_linenumber"), lit("-"), col("l_partkey")), 256).as("ph"))
          .withColumn("idx", row_number().over(wk))
        val arrs = chunks.groupBy(col("k"))
          .agg(count(lit(1)).as("n_chunks"),
            sort_array(collect_list(struct(col("idx"), col("ph")))).as("phs"))
        reqs.join(arrs, Seq("k"), "left")
          .withColumn("n_chunks", coalesce(col("n_chunks"), lit(0L)))
          // data-chunk hashes in order, then the 0-byte final chunk
          .withColumn("all_ph", concat(
            coalesce(transform(col("phs"), p => p.getField("ph")),
              array().cast("array<string>")),
            array(lit(EMPTY))))
          .withColumn("res", aggregate(col("all_ph"),
            struct(col("seed").as("prev"), lit("").as("cat")),
            (acc, ph) => {
              val sig = sha2(concat_ws("\n",
                lit("AWS4-HMAC-SHA256-PAYLOAD"), col("ld"), col("scope"),
                acc.getField("prev"), lit(EMPTY), ph), 256)
              struct(sig.as("prev"),
                concat(acc.getField("cat"), sig).as("cat"))
            }))
          .select(col("k").as("req_id"), col("n_chunks"),
            col("res.prev").as("final_sig"),
            sha2(col("res.cat"), 256).as("chain_sha256"))
          .orderBy(col("req_id"))
      },
      oracle = Some(
        """WITH RECURSIVE
          |reqs AS (SELECT o_orderkey AS k,
          |    strftime(o_orderdate, '%Y%m%dT%H%M%SZ') AS ld,
          |    strftime(o_orderdate, '%Y%m%d') || '/eu-west-2/s3/aws4_request' AS scope,
          |    sha256('seed-' || o_orderkey) AS seed
          |  FROM orders WHERE o_orderkey % 199 = 0),
          |ch0 AS (SELECT l_orderkey AS k, l_linenumber,
          |    sha256('chunk-' || l_orderkey || '-' || l_linenumber || '-'
          |      || l_partkey) AS ph
          |  FROM lineitem WHERE l_orderkey % 199 = 0),
          |ch AS (SELECT k, ph, row_number() OVER (
          |    PARTITION BY k ORDER BY l_linenumber, ph) AS idx FROM ch0),
          |n AS (SELECT r.k, count(ch.k) AS cnt
          |  FROM reqs r LEFT JOIN ch ON ch.k = r.k GROUP BY r.k),
          |chain AS (
          |  SELECT r.k, 0 AS i, r.seed AS sig, '' AS cat FROM reqs r
          |  UNION ALL
          |  SELECT c.k, c.i + 1,
          |    sha256('AWS4-HMAC-SHA256-PAYLOAD' || chr(10) || r.ld || chr(10)
          |      || r.scope || chr(10) || c.sig || chr(10)
          |      || 'e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855'
          |      || chr(10) || coalesce(x.ph,
          |        'e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855')),
          |    c.cat || sha256('AWS4-HMAC-SHA256-PAYLOAD' || chr(10) || r.ld
          |      || chr(10) || r.scope || chr(10) || c.sig || chr(10)
          |      || 'e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855'
          |      || chr(10) || coalesce(x.ph,
          |        'e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855'))
          |  FROM chain c
          |  JOIN reqs r ON r.k = c.k
          |  JOIN n ON n.k = c.k
          |  LEFT JOIN ch x ON x.k = c.k AND x.idx = c.i + 1
          |  WHERE c.i <= n.cnt)
          |SELECT c.k AS req_id, CAST(n.cnt AS BIGINT) AS n_chunks,
          |  c.sig AS final_sig, sha256(c.cat) AS chain_sha256
          |FROM chain c JOIN n ON n.k = c.k
          |WHERE c.i = n.cnt + 1
          |ORDER BY req_id""".stripMargin),
      doc = "aws-chunked SigV4 per-chunk signature chain: sequential per-request fold where each chunk's string-to-sign commits to the previous chunk's signature, 0-byte final chunk (signature-v4-stream.ts:252-254,330, signature-v4.ts:325-355)"))
}
