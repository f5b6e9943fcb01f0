package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** vocabCoverage's cumulative sum must be the DISTRIBUTED two-pass prefix
  * sum: at web scale the raw-token vocabulary runs to 10⁸–10⁹ rows and a
  * global `Window.orderBy` (empty partitionSpec → "Moving all data to a
  * single partition") is a scale-killer (r4 verdict item 4). The plan
  * assertion mirrors BucketedLayoutSpec: the property is proven on the live
  * executed plan, not by code inspection.
  */
class VocabCoverageSpec extends SparkTestBase {

  private def docs = Tables.documents(spark, sfDir)

  test("no empty-partitionSpec WindowExec in the vocabCoverage plan") {
    val df = TextAnalysis.vocabCoverage(docs, "text", Seq(50, 90, 99))
    df.collect() // executedPlan of the materialized run
    val bare = df.queryExecution.executedPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(bare.isEmpty,
      s"found ${bare.size} global (single-partition) window(s) in the plan")
  }

  test("distributed prefix sum matches the single-window formulation") {
    val got = TextAnalysis.vocabCoverage(docs, "text", Seq(50, 90, 99))
      .orderBy(col("threshold_pct"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // reference formulation: one global window (fine at test scale)
    val lm = docs.select(explode(TextAnalysis.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val n = lm.agg(sum(col("c"))).head().getLong(0)
    val w = Window.orderBy(col("c").desc, col("w"))
    val cum = lm.withColumn("rnk", row_number().over(w))
      .withColumn("cum", sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    val want = Seq(50, 90, 99).map { t =>
      val r = cum.filter(col("cum") * 100 >= lit(n) * t)
        .agg(min(col("rnk")).cast("long"), min_by(col("cum"), col("rnk")))
        .head()
      (t, r.getLong(0), r.getLong(1), n)
    }
    assert(got.toSeq == want)
  }
}
