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
  import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Statistics}
  import org.apache.spark.sql.execution.LogicalRDD

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Cap the origin statistics a local-checkpointed Dataset carries.
    *
    * `Dataset.localCheckpoint` snapshots the child plan's estimated
    * `Statistics` into the resulting [[LogicalRDD]] so downstream
    * planning keeps size information. In an ITERATIVE loop that is a
    * feedback cycle: `SizeInBytesOnlyStatsPlanVisitor.visitJoin`
    * estimates a join as the PRODUCT of its children's sizeInBytes, so
    * round N's carried BigInt has the digit count of round N−1's
    * SQUARED when the loop body joins the carried relation twice
    * (doubled digits per round), or multiplied by a constant factor
    * with one join (digits grow linearly). Either way the driver ends
    * up in `BigInteger.multiplyToomCook3` inside stats estimation —
    * measured r19 (jstack of a PageRank round): 88 s of a 90 s round
    * was one BigInt product over ~2^20-digit numbers, with executor
    * task time flat at 25 ms.
    *
    * Capping sizeInBytes at Long.MaxValue at every checkpoint bounds
    * the products forever (a round's plan multiplies a handful of
    * ≤2^63 leaves — a few hundred bits) while keeping SMALL estimates
    * honest, so auto-broadcast decisions over checkpointed relations
    * are unchanged: any value a broadcast threshold could accept is
    * far below the cap. */
  def capCheckpointStats[T](ds: Dataset[T]): Dataset[T] = {
    val c = ds.asInstanceOf[classic.Dataset[T]]
    val plan = c.queryExecution.analyzed
    val capMax = BigInt(Long.MaxValue)
    val capped = plan.transformUp {
      case lr: LogicalRDD =>
        val st = lr.computeStats()
        if (st.sizeInBytes <= capMax &&
          st.rowCount.forall(_ <= capMax)) lr
        else new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, lr.isStreaming, lr.stream)(
          c.sparkSession,
          Some(Statistics(
            sizeInBytes = st.sizeInBytes.min(capMax),
            rowCount = st.rowCount.map(_.min(capMax)),
            attributeStats = st.attributeStats,
            isRuntime = st.isRuntime)),
          Some(lr.constraints))
    }
    if (capped eq plan) ds
    else new classic.Dataset[T](c.sparkSession, capped, c.encoder)
  }
}
