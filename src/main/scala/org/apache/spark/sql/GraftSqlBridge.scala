package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Expression ↔ Column converters —
  * the one place the engine steps inside Spark's package, needed to
  * expose the custom codegen vector expressions
  * (graft.functions.VectorExpressions) as plain `Column` functions.
  * Everything else in graft.* uses only public API. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
