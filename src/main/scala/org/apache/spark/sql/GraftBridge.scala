package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column ⇄ Expression converters —
  * the standard pattern for third-party Catalyst extensions (Spark 4 wraps
  * Column around ColumnNode; `classic.ExpressionUtils` is the supported
  * internal conversion point). Kept to exactly two forwarders. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
