package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-placed bridge to the `private[sql]` Dataset constructor — the
  * standard seam third-party plan extensions use to materialize a custom
  * [[LogicalPlan]] node (here: graft.plans.AsOfJoin) as a DataFrame.
  * Nothing else from the private surface is touched. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)

  /** True iff the session's DataFrame-level cache registry is empty — the
    * observable CacheHygieneSpec asserts after each bounded-output operator
    * returns (df.persist registers here and is held by a strong reference
    * until unpersist; RDD-level localCheckpoint blocks are cleaner-managed
    * and deliberately NOT counted). */
  def cacheRegistryEmpty(spark: SparkSession): Boolean =
    spark.sharedState.cacheManager.isEmpty
}
