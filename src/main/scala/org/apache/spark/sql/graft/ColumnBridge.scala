package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ catalyst Expression
  * converters (org.apache.spark.sql.classic.ExpressionUtils). Spark
  * offers no public constructor for a Column over a custom catalyst
  * Expression short of per-session function registration; placing this
  * one-liner inside the sql package is the established extension
  * technique for session-independent native expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
