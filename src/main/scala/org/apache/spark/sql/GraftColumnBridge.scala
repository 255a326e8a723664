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

/** Bridge into `private[sql]` Dataset/LogicalPlan plumbing so graft's
  * custom logical operators (e.g. the native as-of join node) can be
  * wrapped back into the public DataFrame API — the standard extension
  * technique for libraries that add whole operators rather than just
  * expressions.
  */
object GraftPlanBridge {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
