package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column <-> catalyst Expression
  * converters (Spark 4 moved Column onto ColumnNode; classic conversions
  * live behind package-private ExpressionUtils). Living in an
  * org.apache.spark.sql subpackage is the standard pattern for Spark
  * extension libraries that ship custom Expressions. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
