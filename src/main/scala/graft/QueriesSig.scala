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
      doc = "SigV4 canonical request + string-to-sign replay over a request log: RFC3986 query canonicalization, forwarded-host resolution, payload-hash selection, region fallback (signature-v4.ts:452-603)"))
}
