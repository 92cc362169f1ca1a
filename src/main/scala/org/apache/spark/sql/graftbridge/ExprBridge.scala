package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column↔Expression conversions.
  *
  * The unified Column API (Spark 4) removed the public `.expr`; the classic
  * conversions live in `org.apache.spark.sql.classic.ExpressionUtils`,
  * which is `private[sql]` — so this one-file bridge sits inside the
  * `org.apache.spark.sql` package tree (the standard extension-library
  * pattern) and re-exports exactly the two conversions custom Catalyst
  * expressions need.
  */
object ExprBridge {
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
  def col(e: Expression): Column = ExpressionUtils.column(e)
}
