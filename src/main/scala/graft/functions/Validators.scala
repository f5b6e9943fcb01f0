package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Input validators and pure range math (SURVEY §2.2 P9/P10, §2.1 S4). */
object Validators {

  /** P9: S3-safe object key (reference src/storage/limits.ts:93-118): no
    * control chars, not '.'/'..', length bounds, valid UTF-8 charset. */
  private val keyRegex = "^[^\\x00-\\x1f]{1,1024}$"

  def isValidKey(name: Column): Column =
    name.isNotNull && name =!= "." && name =!= ".." &&
      regexp_like(name, lit(keyRegex)) && !name.startsWith("/") &&
      !name.contains("//")

  def isValidKey(name: String): Boolean =
    name != null && name != "." && name != ".." && name.nonEmpty &&
      name.length <= 1024 && !name.exists(_ < ' ') &&
      !name.startsWith("/") && !name.contains("//")

  /** P9: bucket name < 101 chars, S3-safe charset (limits.ts:103-118). */
  def isValidBucketName(name: String): Boolean =
    name != null && name.nonEmpty && name.length <= 100 &&
      name.matches("[a-zA-Z0-9_\\-.]+")

  // P10: MIME validation incl. type-level wildcards like "image/" + "*"
  // (uploader.ts:305-332). Note: the wildcard spelled out would nest a
  // block comment — Scala comments nest.
  def mimeAllowed(mime: String, allowed: Seq[String]): Boolean =
    allowed.isEmpty || allowed.contains("*/*") || allowed.exists { pat =>
      if (pat.endsWith("/*")) mime.takeWhile(_ != '/') == pat.dropRight(2)
      else mime == pat
    }

  /** P10 as a column predicate (for bulk upload validation joins). */
  def mimeAllowedCol(mime: Column, allowed: Column): Column =
    size(allowed) === 0 || array_contains(allowed, "*/*") ||
      array_contains(allowed, mime) ||
      array_contains(allowed, concat(split(mime, "/").getItem(0), lit("/*")))

  /** S4 range math (reference src/storage/range.ts:9-56): parse an HTTP
    * `bytes=a-b` / `bytes=a-` / `bytes=-suffix` header against a known size →
    * (start, end) inclusive, or None when unsatisfiable. */
  def parseRangeHeader(header: String, size: Long): Option[(Long, Long)] = {
    val m = "^bytes=(\\d*)-(\\d*)$".r.findFirstMatchIn(header.trim)
    m.flatMap { g =>
      (g.group(1), g.group(2)) match {
        case ("", "") => None
        case ("", suf) => // suffix range: last N bytes
          val n = suf.toLong
          if (n == 0) None else Some((math.max(size - n, 0L), size - 1))
        case (s, "") =>
          val start = s.toLong
          if (start >= size) None else Some((start, size - 1))
        case (s, e) =>
          val (start, end) = (s.toLong, e.toLong)
          if (start > end || start >= size) None
          else Some((start, math.min(end, size - 1)))
      }
    }
  }
}
