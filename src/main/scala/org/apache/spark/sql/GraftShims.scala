package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst expressions and the public Column
  * API. `ExpressionUtils` is `private[sql]` in Spark 4's classic module, so
  * the (two-line) conversion lives in this package — the standard pattern
  * for Spark extension libraries that ship their own `Expression`s. */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
