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

  /** V2 putVectors metadata caps (vector-store.ts:46-48): ≤50 keys, ≤40 KiB
    * total JSON, ≤2 KiB filterable JSON (entries not in the index's
    * nonFilterableMetadataKeys, vector-store.ts:94-125). Returns the first
    * violation message (reference error text) or None when valid. */
  val MaxMetadataKeys = 50
  val MaxTotalMetadataBytes = 40 * 1024
  val MaxFilterableMetadataBytes = 2048

  def validateVectorMetadata(key: String, metadataJson: String,
                             nonFilterableKeys: Set[String] = Set.empty): Option[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(metadataJson)
    if (node == null || !node.isObject) None // non-object metadata: only the filterable check applies, and it reads 0 bytes
    else {
      if (node.size() > MaxMetadataKeys)
        Some(s"Invalid record for key '$key': Metadata must have at most $MaxMetadataKeys keys")
      else if (mapper.writeValueAsString(node).getBytes("UTF-8").length > MaxTotalMetadataBytes)
        Some(s"Invalid record for key '$key': Total metadata must have at most $MaxTotalMetadataBytes bytes")
      else {
        val filterable = node.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
        nonFilterableKeys.foreach(filterable.remove)
        if (mapper.writeValueAsString(filterable).getBytes("UTF-8").length > MaxFilterableMetadataBytes)
          Some(s"Invalid record for key '$key': Filterable metadata must have at most $MaxFilterableMetadataBytes bytes")
        else None
      }
    }
  }

  /** Batch (column) form of the V2 caps for upsert pipelines: key-count and
    * total-byte checks pushed into the scan (the filterable-bytes check needs
    * key-wise re-serialization → scalar path / a pre-serialized filterable
    * column). Assumes `m` holds the canonical serialized metadata — the form
    * the engine stores. */
  def vectorMetadataWithinCaps(m: Column): Column =
    m.isNull || (size(json_object_keys(m)) <= MaxMetadataKeys &&
      octet_length(m) <= MaxTotalMetadataBytes)

  /** Bucket `file_size_limit` strings (limits.ts:146-170): "<number><unit>",
    * units gb/mb/kb/b case-insensitive with DECIMAL multipliers, and the
    * value keeps 3 significant digits (the reference's `toPrecision(3)` —
    * so "1024b" parses to 1020). None ⇔ the reference's
    * InvalidFileSizeLimit. */
  def parseFileSizeToBytes(valueWithUnit: String): Option[Double] = {
    val re = "(?i)^([0-9]+(?:\\.[0-9]+)?)(gb|mb|kb|b)$".r
    Option(valueWithUnit).collect {
      case re(v, unit) =>
        val value = BigDecimal(v).round(new java.math.MathContext(3)).toDouble
        val mult = unit.toLowerCase match {
          case "gb" => 1e9
          case "mb" => 1e6
          case "kb" => 1000.0
          case "b"  => 1.0
        }
        value * mult
    }
  }

  /** S3Vectors request limits (vector/limits.ts:4-11) — validated BEFORE any
    * query executes, exactly as the reference store does (pgvector-adapter
    * tests assert the executor is never called on invalid input). */
  val MinVectorDimensions = 1
  val MaxQueryTopK = 100
  val MaxListResults = 1000
  val MaxSegmentCount = 16
  val MaxPutVectors = 500
  val MaxGetVectorKeys = 100
  val MaxDeleteVectorKeys = 500
  val MaxVectorKeyLength = 1024
  val DefaultListPageSize = 500

  /** limits.ts:13-19: 1..1024 characters. */
  def validateVectorKey(key: String, parameterName: String = "key"): Option[String] =
    if (key == null || key.isEmpty || key.length > MaxVectorKeyLength)
      Some(s"$parameterName must be between 1 and $MaxVectorKeyLength characters")
    else None

  /** limits.ts:21-33: 1..max entries, each key length-valid. */
  def validateVectorKeys(keys: Seq[String], max: Int): Option[String] =
    if (keys == null || keys.isEmpty || keys.length > max)
      Some(s"keys must contain between 1 and $max entries")
    else keys.iterator.map(validateVectorKey(_, "keys")).collectFirst {
      case Some(err) => err
    }

  /** listVectors maxResults ∈ [1, 1000], default 500 (the S3Vectors page
    * size — the adapter queries default+1 for hasMore). */
  def validateListMaxResults(maxResults: Option[Int]): Either[String, Int] =
    maxResults match {
      case None => Right(DefaultListPageSize)
      case Some(m) if m >= 1 && m <= MaxListResults => Right(m)
      case Some(_) =>
        Left(s"maxResults must be between 1 and $MaxListResults")
    }

  /** vector-store.ts validatePutVectors + metadata shape rules: 1..500
    * vectors, no duplicate keys, every key length-valid, and metadata values
    * limited to scalars or flat scalar lists — nested objects and nested
    * arrays are rejected (pgvector-adapter tests), list values allowed. */
  def validatePutVectorsBatch(vectors: Seq[(String, String)]): Option[String] = {
    if (vectors == null || vectors.isEmpty || vectors.length > MaxPutVectors)
      return Some(s"vectors must contain between 1 and $MaxPutVectors entries")
    val dup = vectors.groupBy(_._1).collectFirst { case (k, vs) if vs.size > 1 => k }
    if (dup.isDefined)
      return Some(s"Duplicate vector key '${dup.get}' in request")
    vectors.iterator.map { case (k, meta) =>
      validateVectorKey(k, "key").orElse(
        Option(meta).flatMap(m => validateMetadataShape(k, m)))
    }.collectFirst { case Some(err) => err }
  }

  /** Metadata shape: top-level values must be scalars or arrays of scalars. */
  def validateMetadataShape(key: String, metadataJson: String): Option[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(metadataJson)
    if (node == null || !node.isObject) None
    else {
      val it = node.properties().iterator()
      var err: Option[String] = None
      while (it.hasNext && err.isEmpty) {
        val e = it.next()
        val v = e.getValue
        if (v.isObject)
          err = Some(s"Invalid record for key '$key': Metadata values must not be nested objects")
        else if (v.isArray) {
          val elems = v.elements()
          while (elems.hasNext && err.isEmpty) {
            val el = elems.next()
            if (el.isObject || el.isArray)
              err = Some(s"Invalid record for key '$key': Metadata lists must contain only scalar values")
          }
        }
      }
      err
    }
  }

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
