package org.apache.spark.sql.classic

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-placed bridge to the `private[sql]` Dataset constructor — the
  * standard seam third-party plan extensions use to materialize a custom
  * [[LogicalPlan]] node (here: graft.plans.AsOfJoin) as a DataFrame.
  * Nothing else from the private surface is touched. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)
}
