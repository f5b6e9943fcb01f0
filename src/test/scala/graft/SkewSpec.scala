package graft

import graft.operators.Skew
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hierarchical (salted) per-key top-k vs the window formulation: identical
  * results, but the salted plan bounds per-reducer state at O(salts·k) on a
  * hot key instead of the whole group. */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("salted topKPerKey equals window row_number top-k on skewed data") {
    // one hot key with 10k values, many cold keys
    val hot = (1 to 10000).map(i => ("hot", i.toLong))
    val cold = (1 to 50).flatMap(g => (1 to 5).map(i => (s"cold-$g", i.toLong * g)))
    val df = (hot ++ cold).toDF("key", "v")

    val salted = Skew.topKPerKey(df, col("key"), col("v"), 3)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap

    val w = Window.partitionBy("key").orderBy(col("v").desc)
    val direct = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .groupBy("key").agg(sort_array(collect_list("v"), asc = false).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap

    assert(salted == direct)
    assert(salted("hot") == List(10000L, 9999L, 9998L))
  }
}
