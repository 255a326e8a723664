package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The as-of join as a FIRST-CLASS operator: a custom logical node, a
  * planner strategy, and a physical sorted-merge execution node —
  * rung (c) of the extension ladder (whole-operator semantics that
  * composition can express but not with the plan you'd want).
  *
  * Why a physical operator when [[graft.operators.AsOfJoin]] already
  * composes the same semantics from union + window: the composed plan
  * materializes |L|+|R| unioned rows padded to the widest schema, runs
  * a running-`last` window over them, and filters half back out. The
  * native plan instead asks the planner for exactly what the merge
  * needs — both children hash-clustered on the key and sorted by
  * (key, time) — and then streams ONE forward pass per partition:
  * no union, no padding, no window buffer, no post-filter. Per
  * partition it holds O(1) state (the current candidate right row),
  * so a key's entire history never needs to fit anywhere.
  *
  * Scale: one shuffle per side (the same cost the composed form pays),
  * sorts that at 100 TB are the standard spillable externals, and the
  * merge itself is memory-oblivious. Skewed keys cost sort time, not
  * state: the candidate is a single row however hot the key.
  *
  * Semantics (identical to the composed operator and the DuckDB
  * `ASOF LEFT JOIN` oracle): for each left row, the latest right row
  * of the same key with `right.time <= left.time`; ties at equal time
  * match; NULL keys and NULL times never match on either side; left
  * rows without a match keep NULL right values.
  */
object AsOfJoinNative {

  /** Logical as-of join node. `rightVals` are the right-side columns
    * to carry; output = left.output ++ rightVals (nullable). */
  case class AsOfJoinNode(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKey: Attribute,
      leftTime: Attribute,
      rightKey: Attribute,
      rightTime: Attribute,
      rightVals: Seq[Attribute])
    extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ rightVals.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  /** Plans [[AsOfJoinNode]] into [[AsOfJoinExec]]. Injected via
    * [[GraftExtensions]] (SQL-configured sessions) and lazily through
    * `spark.experimental.extraStrategies` by [[asof]] (any session). */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, lt, rk, rt, rv) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, rv) :: Nil
      case _ => Nil
    }
  }

  /** Physical sorted-merge as-of join.
    *
    * `requiredChildDistribution` co-clusters both children on the join
    * key and `requiredChildOrdering` demands (key, time) sort order, so
    * `EnsureRequirements` inserts exactly the exchanges/sorts the merge
    * needs and AQE still owns their sizing. `doExecute` then zips
    * co-partitions and runs the single-pass merge.
    */
  case class AsOfJoinExec(
      left: SparkPlan,
      right: SparkPlan,
      leftKey: Attribute,
      leftTime: Attribute,
      rightKey: Attribute,
      rightTime: Attribute,
      rightVals: Seq[Attribute])
    extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ rightVals.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

    // The merge emits left rows in their sorted order and never
    // re-partitions — downstream operators can reuse both properties.
    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = left.outputOrdering

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lKeyTime = Seq(leftKey, leftTime)
      val rKeyTime = Seq(rightKey, rightTime)
      val keyType = leftKey.dataType
      val timeType = leftTime.dataType
      val lOut = left.output
      val rOut = right.output
      val rv = rightVals
      val out = output
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        // per-partition projections/orderings (NOT serialized closures)
        val lktProj = UnsafeProjection.create(lKeyTime, lOut)
        val rktProj = UnsafeProjection.create(rKeyTime, rOut)
        val rvProj = UnsafeProjection.create(rv, rOut)
        val ktOrd = RowOrdering.createNaturalAscendingOrdering(
          Seq(keyType, timeType))
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
        val resultProj = UnsafeProjection.create(out, out)
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rv.length)

        new Iterator[InternalRow] {
          // lookahead right row, held as (key,time) + carried-vals copies
          private var rKt: InternalRow = _
          private var rVals: InternalRow = _
          // current candidate (last consumed right row) — O(1) state
          private var candKey: InternalRow = _
          private var candVals: InternalRow = _

          private def advanceRight(): Unit = {
            rKt = null; rVals = null
            while (rKt == null && rIter.hasNext) {
              val r = rIter.next()
              val kt = rktProj(r)
              // NULL key or NULL time can never match any left row —
              // skip here so it can't become a candidate
              if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
                rKt = kt.copy()
                rVals = rvProj(r).copy()
              }
            }
          }

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lkt = lktProj(l)
            if (lkt.isNullAt(0) || lkt.isNullAt(1))
              return resultProj(joined(l, nullRight))
            // consume every right row positioned at or before (lk, lt);
            // the LAST consumed one is the candidate (rows are sorted)
            var continue = true
            while (continue) {
              if (rKt == null && rIter.hasNext) advanceRight()
              if (rKt != null && ktOrd.compare(rKt, lkt) <= 0) {
                candKey = rKt; candVals = rVals
                rKt = null; rVals = null
              } else continue = false
            }
            // the candidate may be left over from an earlier key — it
            // matches only if its key equals this left row's key
            if (candKey != null && keyOrd.compare(candKey, lkt) == 0)
              resultProj(joined(l, candVals))
            else resultProj(joined(l, nullRight))
          }
        }
      }
    }
  }

  /** Public API: as-of join `left` with `right` on `key`, aligning each
    * left row to the latest right row with `right.time <= left.time`,
    * carrying `rightVals`. Column-name contract matches
    * [[graft.operators.AsOfJoin.asof]]: carried columns surface as
    * `r_<name>`. `right` must be unique per (key, time). */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightVals: Seq[String]): DataFrame = {
    val spark: SparkSession = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = GraftPlanBridge.analyzed(left)
    // restrict the right side to (key, time, vals) BEFORE planning: the
    // sort+shuffle then move only carried bytes, and output attrs stay
    // unambiguous when left and right share column names
    val rAnalyzed = GraftPlanBridge.analyzed(
      right.select((Seq(key, time) ++ rightVals).distinct.map(right.col): _*))
    // Self-join hygiene: when left and right derive from the SAME
    // relation they share exprIds, and the analyzer's relation dedup
    // cannot rewrite this node's right-side references (the old ids
    // stay "valid" via the left child — they'd silently rebind there
    // and the planner would prune key/time off the right child).
    // Fresh top-level aliases give every right-side reference a unique
    // id, so the dedup rewrite stays unambiguous.
    val rPlan = Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not found among ${plan.output.map(_.name).mkString(", ")}"))
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, time),
      attr(rPlan, key), attr(rPlan, time),
      rightVals.map(attr(rPlan, _)))
    val df = GraftPlanBridge.ofRows(spark, node)
    // r_-prefix the carried columns (the composed operator's contract)
    val renamed = left.columns.toSeq ++ rightVals.map(v => s"r_$v")
    df.toDF(renamed: _*)
  }
}
