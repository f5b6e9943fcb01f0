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

  test("single-value hot key: result exact and rows spread across salts") {
    // the worst case for a value-derived salt: the hot key's flood is ONE
    // repeated value, which hash(value) would send to a single reducer.
    val df = ((1 to 20000).map(_ => ("hot", 7L)) ++
      Seq(("hot", 9L), ("hot", 8L), ("cold", 1L))).toDF("key", "v")

    val salted = Skew.topKPerKey(df, col("key"), col("v"), 3)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toList).toMap
    assert(salted("hot") == List(9L, 8L, 7L))
    assert(salted("cold") == List(1L))

    // the row-unique salt must spread the single-value flood: mirror of the
    // internal salt expression (Skew.topKPerKey) over the same data
    val spread = df.filter(col("key") === "hot")
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(16)))
      .groupBy("_salt").count().collect()
    assert(spread.length == 16, "all 16 salts should receive rows")
    assert(spread.map(_.getLong(1)).max < 20002L / 4,
      "no salt should concentrate the hot key's rows")
  }
}
