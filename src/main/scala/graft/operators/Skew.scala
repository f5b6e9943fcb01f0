package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §4 / the 100 TB design brief).
  *
  * Two cases need nothing here: combinable aggregates (sum/count/min/max)
  * are already immune — Spark's partial aggregation emits one row per key
  * per mapper before the shuffle — and skewed sort-merge JOINs are split at
  * runtime by AQE (`spark.sql.adaptive.skewJoin`). What does break on a hot
  * key is a NON-combinable per-key computation: collect_list, exact per-key
  * top-k via `Window.partitionBy(hotKey)` — one reducer receives the whole
  * hot group. The fix is hierarchical: salt the key, compute a bounded
  * partial per (key, salt), then merge partials per key. State after the
  * first shuffle is O(salts · k) per key regardless of group size.
  */
object Skew {

  /** Exact top-k values per key, skew-proof: partial top-k per (key, salt) →
    * merged top-k per key. Result-identical to the window/row_number
    * formulation because max-k of a union = max-k of per-part max-k's.
    *
    * The salt must be ROW-unique, not value-derived: a hot key flooded with
    * one repeated value would send its whole group to a single salt under
    * `hash(value)`. `monotonically_increasing_id` spreads rows evenly and is
    * safe here because partial top-k is order- and placement-insensitive —
    * any row-to-salt assignment yields the same merged result. */
  def topKPerKey(df: DataFrame, key: Column, value: Column,
                 k: Int, salts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(slice(sort_array(collect_list(value), asc = false), 1, k).as("_part"))
    partial
      .groupBy(col("key"))
      .agg(slice(sort_array(flatten(collect_list(col("_part"))), asc = false), 1, k)
        .as("top_k"))
  }
}
