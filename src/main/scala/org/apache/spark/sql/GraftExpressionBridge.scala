package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column <-> Expression conversions of
  * Spark 4 (classic.ExpressionUtils), used by graft's native Catalyst
  * expressions. Lives in the org.apache.spark.sql package scope for
  * access; contains no logic. */
object GraftExpressionBridge {
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
}
