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

  /** Imperative function registration into a live session's registry
    * (`sessionState` is `private[sql]`, hence bridged here). Overwrites on
    * re-registration — idempotent by name. */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(ident, info, builder)
}
