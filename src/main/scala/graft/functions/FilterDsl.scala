package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

import scala.jdk.CollectionConverters._

/** S3Vectors metadata filter DSL → `Column` translator (SURVEY §2.2 P8).
  *
  * Mirrors the reference's JSON-filter-to-SQL translator
  * (src/storage/protocols/vector/adapter/pgvector/filter.ts:152-308):
  *   - operators `$eq $ne $gt $gte $lt $lte $in $nin $exists` plus `$and`/`$or`
  *   - scalar-or-array equality: `field = v OR array_contains(field, v)`
  *   - numeric comparisons guarded by value type (jsonb_typeof = 'number' in
  *     the reference → `try_cast` to double here: non-numeric fields collapse
  *     to NULL and the predicate is false)
  *   - `$ne`/`$nin` over arrays = NOT contains, and (matching the reference's
  *     SQL null semantics) a missing field never matches
  *
  * The metadata column is a JSON string; field access is `get_json_object`,
  * which stays inside whole-stage codegen. Implicit top-level maps mean
  * `{"a": 1, "b": 2}` ≡ `{"$and":[{"a":1},{"b":2}]}` and a bare scalar value
  * means `$eq` — same shorthand as the reference.
  */
object FilterDsl {

  private val mapper = new ObjectMapper()

  /** Parse a JSON filter document and translate it into a predicate over the
    * given JSON-string metadata column. */
  def filter(metadata: Column, filterJson: String): Column =
    translate(metadata, mapper.readTree(filterJson))

  private def translate(m: Column, node: JsonNode): Column = {
    require(node.isObject, s"filter node must be an object: $node")
    val conds = node.fields.asScala.map { e =>
      (e.getKey, e.getValue) match {
        case ("$and", v) => v.elements.asScala.map(translate(m, _))
          .reduceOption(_ && _).getOrElse(lit(true))
        case ("$or", v) => v.elements.asScala.map(translate(m, _))
          .reduceOption(_ || _).getOrElse(lit(false))
        case (field, v) if v.isObject =>
          v.fields.asScala.map { op => condition(m, field, op.getKey, op.getValue) }
            .reduceOption(_ && _).getOrElse(lit(true))
        case (field, v) => condition(m, field, "$eq", v) // bare scalar = $eq
      }
    }
    conds.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Extract field as JSON text (NULL when missing). */
  private def fieldText(m: Column, field: String): Column =
    get_json_object(m, s"$$.$field")

  private def scalarLit(v: JsonNode): Column =
    if (v.isNumber) lit(v.asDouble) else if (v.isBoolean) lit(v.asBoolean.toString)
    else lit(v.asText)

  /** Scalar equality with the array-contains bridge (filter.ts:94-120). */
  private def eqExpr(m: Column, field: String, v: JsonNode): Column = {
    val f = fieldText(m, field)
    val scalarEq =
      if (v.isNumber) f.try_cast(DoubleType) === v.asDouble
      else f === scalarLit(v)
    val arrEq =
      if (v.isNumber)
        array_contains(from_json(f, ArrayType(DoubleType)), v.asDouble)
      else
        array_contains(from_json(f, ArrayType(StringType)), scalarLit(v))
    coalesce(scalarEq, lit(false)) || coalesce(arrEq, lit(false))
  }

  private def condition(m: Column, field: String, op: String, v: JsonNode): Column = {
    val f = fieldText(m, field)
    def num = f.try_cast(DoubleType)
    // numeric comparisons go through try_cast: non-numeric → NULL → filtered
    // out, same as the reference's jsonb_typeof = 'number' guard
    def cmp(c: Column => Column): Column = if (v.isNumber) c(num) else c(f)
    op match {
      case "$eq" => eqExpr(m, field, v)
      case "$ne" => f.isNotNull && !eqExpr(m, field, v)
      case "$gt" => cmp(_ > scalarLit(v))
      case "$gte" => cmp(_ >= scalarLit(v))
      case "$lt" => cmp(_ < scalarLit(v))
      case "$lte" => cmp(_ <= scalarLit(v))
      case "$exists" =>
        if (v.asBoolean) f.isNotNull else f.isNull
      case "$in" =>
        val vs = v.elements.asScala.toSeq
        if (vs.forall(_.isNumber)) num.isin(vs.map(_.asDouble): _*)
        else f.isin(vs.map(_.asText): _*)
      case "$nin" =>
        val vs = v.elements.asScala.toSeq
        val in =
          if (vs.forall(_.isNumber)) num.isin(vs.map(_.asDouble): _*)
          else f.isin(vs.map(_.asText): _*)
        f.isNotNull && !coalesce(in, lit(false))
      case other => throw new IllegalArgumentException(s"unknown operator $other")
    }
  }
}
