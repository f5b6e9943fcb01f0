package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Distributed classifier training/eval: profile statistics are exact and
  * bounded, the Rocchio argmax is the exact rational maximum with the
  * smaller-label tiebreak, and prediction is partitioning-independent. */
class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private val train = Seq(
    (1L, "apple banana apple", "fruit"),
    (2L, "banana apple apple apple", "fruit"),
    (3L, "carrot potato carrot", "veg"),
    (4L, "potato carrot", "veg")).toDF("id", "text", "lab")

  test("classProfiles: integer counts, df, and the L×B bound") {
    val prof = TextAnalysis.classProfiles(train, "id", "text", "lab", 256)
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getLong(2), r.getLong(3)))
    // total token mass per label is preserved exactly
    assert(prof.filter(_._1 == "fruit").map(_._3).sum == 7L)
    assert(prof.filter(_._1 == "veg").map(_._3).sum == 5L)
    // df never exceeds the label's doc count
    assert(prof.forall(_._4 <= 2L))
    // the model is bounded by labels × buckets regardless of input rows
    assert(prof.length <= 2 * 256)
  }

  test("rocchioPredict: obvious centroids win; unseen-vocab doc falls to smallest label") {
    val test = Seq(
      (10L, "apple apple banana", "fruit"),
      (11L, "carrot potato potato", "veg"),
      (12L, "zebra quark xylophone", "fruit")).toDF("id", "text", "lab")
    val out = TextAnalysis.rocchioPredict(train, test, "id", "text", "lab", 256)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out(10L) == "fruit")
    assert(out(11L) == "veg")
    // no profile bucket matches → all scores 0 → tie → smallest label
    assert(out(12L) == "fruit")
    assert(out.size == 3, "exactly one prediction per test doc")
  }

  test("prediction is partitioning-independent") {
    val test = Seq((10L, "apple carrot carrot", "x"),
      (11L, "banana apple", "x")).toDF("id", "text", "lab")
    val a = TextAnalysis.rocchioPredict(train, test, "id", "text", "lab", 64)
      .orderBy("id").collect().toSeq
    val b = TextAnalysis.rocchioPredict(
      train.repartition(7, col("text")), test.repartition(5), "id", "text", "lab", 64)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
