package graft.functions

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import java.nio.charset.StandardCharsets
import java.util.Base64

/** Continuation-token codec (SURVEY §2.6 O5 / §2.8 F14, reference
  * src/storage/object.ts:635-712): tokens are base64(JSON) carrying the
  * keyset cursor. Pure Scala glue — the predicates it feeds are P4/P5.
  */
object TokenCodec {

  final case class Cursor(
      startAfter: String,
      sortColumn: String = "name",
      sortOrder: String = "asc",
      sortColumnAfter: Option[String] = None)

  private val mapper = new ObjectMapper()

  def encode(c: Cursor): String = {
    val node = mapper.createObjectNode()
    node.put("startAfter", c.startAfter)
    node.put("sortColumn", c.sortColumn)
    node.put("sortOrder", c.sortOrder)
    c.sortColumnAfter.foreach(node.put("sortColumnAfter", _))
    Base64.getEncoder.encodeToString(
      mapper.writeValueAsString(node).getBytes(StandardCharsets.UTF_8))
  }

  def decode(token: String): Cursor = {
    val node = mapper.readTree(
      new String(Base64.getDecoder.decode(token), StandardCharsets.UTF_8))
      .asInstanceOf[ObjectNode]
    Cursor(
      startAfter = Option(node.get("startAfter")).map(_.asText).getOrElse(""),
      sortColumn = Option(node.get("sortColumn")).map(_.asText).getOrElse("name"),
      sortOrder = Option(node.get("sortOrder")).map(_.asText).getOrElse("asc"),
      sortColumnAfter = Option(node.get("sortColumnAfter")).map(_.asText))
  }

  /** N+1 truncation (object.ts:676-712): fetch k+1 rows, split into the page
    * and the isTruncated/nextToken pair. */
  def paginate[T](rows: Seq[T], limit: Int, tokenOf: T => String): (Seq[T], Option[String]) =
    if (rows.length > limit) {
      val page = rows.take(limit)
      (page, Some(encode(Cursor(tokenOf(page.last)))))
    } else (rows, None)
}
