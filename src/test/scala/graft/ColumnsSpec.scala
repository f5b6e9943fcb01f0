package graft

import graft.functions.Columns
import graft.functions.Columns.{Named, Policy, Star, SyntheticType}
import graft.functions.PathFns
import org.apache.spark.sql.functions.col

/** P1 selectColumns compiler, mirrored test-for-test from the reference's
  * columns.test.ts, plus F13 escapeLike literal-search semantics.
  */
class ColumnsSpec extends SparkTestBase {
  import spark.implicits._

  test("compiles column lists: trim, drop empties, default id, star") {
    assert(Columns.compile("id,version,metadata")
      == Seq(Named("id"), Named("version"), Named("metadata")))
    assert(Columns.compile(" id, version, , metadata ")
      == Seq(Named("id"), Named("version"), Named("metadata")))
    assert(Columns.compile("") == Seq(Named("id")))
    assert(Columns.compile(" , ") == Seq(Named("id")))
    assert(Columns.compile("*,id") == Seq(Star, Named("id")))
  }

  test("policy filters: user_metadata / multipart metadata / both") {
    val cols = "id,user_metadata,metadata"
    assert(Columns.compile(cols)
      == Seq(Named("id"), Named("user_metadata"), Named("metadata")))
    assert(Columns.compile(cols, Policy.objectWithoutUserMetadata)
      == Seq(Named("id"), Named("metadata")))
    assert(Columns.compile(cols, Policy.multipartWithoutUserOrMultipartMetadata)
      == Seq(Named("id")))
    assert(Columns.compile(cols, Policy.multipartWithoutMetadata)
      == Seq(Named("id"), Named("user_metadata")))
  }

  test("falls back to id when every requested bucket column is unavailable") {
    assert(Columns.compile("type", Policy.bucketWithoutType) == Seq(Named("id")))
  }

  test("synthetic bucket type lands at the end of the projection") {
    assert(Columns.compile("type,id,name", Policy.syntheticBucket)
      == Seq(Named("id"), Named("name"), SyntheticType))
    assert(Columns.compile("type", Policy.syntheticBucket) == Seq(SyntheticType))
    assert(Columns.compile("type,", Policy.syntheticBucket)
      == Seq(Named("id"), SyntheticType))
  }

  test("rejects invalid identifiers") {
    intercept[IllegalArgumentException](Columns.compile("id,metadata->>key"))
  }

  test("project applies the compiled list to a DataFrame") {
    val df = Seq(("b1", "n1", "u")).toDF("id", "name", "user_metadata")
    val got = Columns.project(df, "type,id,name", Policy.syntheticBucket)
    assert(got.columns.toSeq == Seq("id", "name", "type"))
    assert(got.head.getString(2) == "STANDARD")
  }

  test("F13: search terms with LIKE metacharacters match literally") {
    assert(PathFns.escapeLike("50%_off\\x") == "50\\%\\_off\\\\x")
    val buckets = Seq("sales-50%_off", "sales-500off", "archive")
      .toDF("name")
    val got = buckets.filter(PathFns.ilikeContains(col("name"), "50%_OFF"))
      .collect().map(_.getString(0)).toSeq
    // '%' and '_' match literally — '500off' must NOT match
    assert(got == Seq("sales-50%_off"))
  }
}
