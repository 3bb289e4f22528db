package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` surface for custom Catalyst
  * expressions (the sanctioned extension point for operators the public
  * API can't express efficiently — see graft.functions.DotProduct).
  * Nothing else in the repo reaches into Spark internals.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
