package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark 4's `private[sql]` Column ↔ Expression conversion
  * (`org.apache.spark.sql.classic.ExpressionUtils`) so graft's custom
  * Catalyst expressions can surface as ordinary `Column`s — the same
  * technique every Spark extension library uses to expose native
  * expressions through the public DataFrame API.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
