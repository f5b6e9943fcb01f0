package graft

import graft.functions.FilterDsl
import org.apache.spark.sql.functions.col

/** Filter-DSL semantics, mirroring the reference's translator corpus
  * (src/storage/protocols/vector/adapter/pgvector/filter.test.ts — the
  * closest thing the reference has to an operator-semantics spec).
  */
class FilterDslSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    (1L, """{"genre": "rock", "year": 1990, "tags": ["live", "remix"]}"""),
    (2L, """{"genre": "pop", "year": 2001, "tags": ["studio"]}"""),
    (3L, """{"genre": "rock", "year": 2010}"""),
    (4L, """{"year": "not-a-number"}"""),
    (5L, """{"genre": ["rock", "indie"], "year": 1985}"""))

  private def ids(filterJson: String): Seq[Long] =
    rows.toDF("id", "m")
      .filter(FilterDsl.filter(col("m"), filterJson))
      .select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("$eq scalar") { assert(ids("""{"genre": {"$eq": "pop"}}""") == Seq(2L)) }

  test("bare scalar is implicit $eq") { assert(ids("""{"genre": "pop"}""") == Seq(2L)) }

  test("$eq matches inside array values (scalar-or-array semantics)") {
    assert(ids("""{"genre": "rock"}""") == Seq(1L, 3L, 5L))
  }

  test("$ne excludes missing fields (SQL null semantics)") {
    assert(ids("""{"genre": {"$ne": "rock"}}""") == Seq(2L))
  }

  test("numeric comparisons guarded by type: non-numbers never match") {
    assert(ids("""{"year": {"$gte": 1990}}""") == Seq(1L, 2L, 3L))
    assert(ids("""{"year": {"$lt": 2000}}""") == Seq(1L, 5L))
  }

  test("$in / $nin") {
    assert(ids("""{"genre": {"$in": ["pop", "indie"]}}""") == Seq(2L))
    assert(ids("""{"genre": {"$nin": ["rock"]}}""") == Seq(2L, 5L))
  }

  test("$exists") {
    assert(ids("""{"genre": {"$exists": true}}""") == Seq(1L, 2L, 3L, 5L))
    assert(ids("""{"genre": {"$exists": false}}""") == Seq(4L))
  }

  test("$and / $or / implicit top-level AND") {
    assert(ids("""{"$and": [{"genre": "rock"}, {"year": {"$gte": 2000}}]}""") == Seq(3L))
    assert(ids("""{"$or": [{"genre": "pop"}, {"year": {"$lte": 1985}}]}""") == Seq(2L, 5L))
    assert(ids("""{"genre": "rock", "year": {"$lt": 2000}}""") == Seq(1L, 5L))
  }

  test("range on the same field combines as AND") {
    assert(ids("""{"year": {"$gt": 1985, "$lt": 2005}}""") == Seq(1L, 2L))
  }

  test("unknown operator rejected") {
    intercept[IllegalArgumentException](ids("""{"a": {"$regex": "x"}}"""))
  }
}
