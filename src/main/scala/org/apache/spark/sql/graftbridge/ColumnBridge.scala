package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column connect-agnostic and hid the catalyst bridge
  * behind `private[sql]`. Extension libraries adding native Expressions
  * need exactly two conversions; exposing them from an `org.apache.
  * spark.sql` subpackage is the established pattern for that.
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
