package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made `Column` implementation-agnostic and hid the classic
  * Expression⇄Column bridge behind `private[sql]`. Custom-expression
  * libraries need exactly two hooks; this object re-exports them. Same
  * pattern used by third-party Spark extension libraries.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
