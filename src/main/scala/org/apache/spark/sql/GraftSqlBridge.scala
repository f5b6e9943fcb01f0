package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Catalyst Expression bridge for graft's custom codegen expressions
  * (`ExpressionUtils` is `private[sql]`, so the wrap lives in this package).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
