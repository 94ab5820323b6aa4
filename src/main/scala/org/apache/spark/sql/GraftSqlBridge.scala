package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 moved the Column<->catalyst-Expression bridge behind
  * `private[sql]` (`classic.ExpressionUtils`); custom native expressions
  * still need it, so expose the two conversions from inside the package. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
