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

  /** Register a function builder on a LIVE session (the builder-time
    * `withExtensions` path can't reach sessions that already exist; the
    * registry itself is `private[sql]`).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
                       ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
                       info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
