package graft

import graft.functions.Validators
import graft.operators.Vectors
import org.scalatest.funsuite.AnyFunSuite

/** Test-for-test port of the reference's S3Vectors request-validation battery
  * (/root/reference/src/test/pgvector-adapter.test.ts:228-530): every invalid
  * request is rejected BEFORE any query executes; limits from
  * vector/limits.ts:4-11. */
class VectorLimitsSpec extends AnyFunSuite {

  test("maxResults: 0 and 1001 rejected, omitted defaults to the 500 page size") {
    assert(Validators.validateListMaxResults(Some(0)).isLeft)
    assert(Validators.validateListMaxResults(Some(1001)).isLeft)
    assert(Validators.validateListMaxResults(None) == Right(500))
    assert(Validators.validateListMaxResults(Some(1000)) == Right(1000))
  }

  test("GetVectors: key count above 100 and over-length keys rejected") {
    val tooMany = (0 until 101).map(i => s"key-$i")
    assert(Validators.validateVectorKeys(tooMany, Validators.MaxGetVectorKeys)
      .contains("keys must contain between 1 and 100 entries"))
    val longKey = Seq("a" * 1025)
    assert(Validators.validateVectorKeys(longKey, Validators.MaxGetVectorKeys)
      .contains("keys must be between 1 and 1024 characters"))
    assert(Validators.validateVectorKeys(Seq("ok"), Validators.MaxGetVectorKeys).isEmpty)
  }

  test("DeleteVectors: key count above 500 and over-length keys rejected") {
    val tooMany = (0 until 501).map(i => s"key-$i")
    assert(Validators.validateVectorKeys(tooMany, Validators.MaxDeleteVectorKeys)
      .contains("keys must contain between 1 and 500 entries"))
    assert(Validators.validateVectorKeys(Seq(""), Validators.MaxDeleteVectorKeys).isDefined)
  }

  test("PutVectors: count bound, duplicate keys, over-length key rejected") {
    val tooMany = (0 until 501).map(i => s"k$i" -> "{}")
    assert(Validators.validatePutVectorsBatch(tooMany)
      .contains("vectors must contain between 1 and 500 entries"))
    assert(Validators.validatePutVectorsBatch(Seq("dup" -> "{}", "dup" -> "{}"))
      .contains("Duplicate vector key 'dup' in request"))
    assert(Validators.validatePutVectorsBatch(Seq(("a" * 1025) -> "{}")).isDefined)
    assert(Validators.validatePutVectorsBatch(Seq("a" -> "{}", "b" -> "{}")).isEmpty)
  }

  test("metadata shape: nested objects and nested arrays rejected, scalar lists allowed") {
    assert(Validators.validateMetadataShape("k", """{"genre":{"nested":true}}""")
      .exists(_.contains("must not be nested objects")))
    assert(Validators.validateMetadataShape("k", """{"tags":[["a"]]}""")
      .exists(_.contains("only scalar values")))
    assert(Validators.validateMetadataShape("k", """{"tags":["a","b"],"n":3}""").isEmpty)
    assert(Validators.validateMetadataShape("k", """{"s":"x","b":true}""").isEmpty)
    // batch path surfaces the same shape errors
    assert(Validators.validatePutVectorsBatch(
      Seq("k" -> """{"m":{"x":1}}""")).isDefined)
  }

  test("operators reject over-limit key lists instead of truncating") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val df = (1L to 10L).map(i => (i, i)).toDF("vec_id", "label")
    intercept[IllegalArgumentException] {
      Vectors.getByKeys(df, "vec_id", (1L to 101L).toSeq)
    }
    intercept[IllegalArgumentException] {
      Vectors.deleteByKeys(df, "vec_id", (1L to 501L).toSeq)
    }
    assert(Vectors.getByKeys(df, "vec_id", Seq(1L, 2L)).count() == 2)
  }
}
