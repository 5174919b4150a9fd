package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column <-> Expression conversions (Spark 4
  * moved `Column` off a direct Expression wrapper; `classic.ExpressionUtils`
  * is the sanctioned internal converter). Standard ecosystem pattern for
  * libraries that ship custom Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
