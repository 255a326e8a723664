package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The rollup must answer range queries from partial aggregates alone:
  * additive measures exactly, distinct users within sketch tolerance —
  * and a single-day rebuild must be idempotent and leave other
  * partitions untouched.
  */
class SketchRollupSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.001"

  test("rollup range summary matches the direct query: exact adds, ~2% distinct") {
    val out = tmpDir("rollup")
    val ev = Tables(spark, Dir, "events")
    SketchRollup.buildDaily(ev, out)

    val got = SketchRollup.summary(spark, out, "2020-01-01", "2030-01-01")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2), r.getLong(3))).toMap

    val want = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"),
        countDistinct("user_id").as("users"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2), r.getLong(3))).toMap

    assert(got.keySet == want.keySet)
    want.foreach { case (et, (n, s, users)) =>
      val (gn, gs, gu) = got(et)
      assert(gn == n, s"$et: count must merge exactly")
      assert(gs.compareTo(s) == 0, s"$et: decimal sum must merge exactly")
      assert(math.abs(gu - users) <= math.max(2L, (users * 0.05).toLong),
        s"$et: sketch estimate $gu too far from exact $users")
    }
  }

  test("a sub-range summary only reads its partitions and still merges correctly") {
    val out = tmpDir("rollup_range")
    val ev = Tables(spark, Dir, "events")
    SketchRollup.buildDaily(ev, out)
    val days = ev.select(to_date(col("ts")).as("d")).distinct()
      .orderBy("d").collect().map(_.getDate(0).toString)
    assume(days.length >= 2, "need at least 2 days of events")
    val firstDay = days.head

    val got = SketchRollup.summary(spark, out, firstDay, firstDay)
    // partition pruning visible in the plan
    val plan = got.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters"), s"day filter must prune partitions:\n$plan")

    val direct = ev.where(to_date(col("ts")) === lit(firstDay).cast("date"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotN = got.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotN == direct)
  }

  test("rebuilding one day is idempotent and leaves other partitions untouched") {
    val out = tmpDir("rollup_rebuild")
    val ev = Tables(spark, Dir, "events")
    SketchRollup.buildDaily(ev, out)
    val before = SketchRollup.summary(spark, out, "2020-01-01", "2030-01-01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet

    // rebuild ONLY the first day from the same source rows
    val firstDay = ev.select(min(to_date(col("ts")))).head().getDate(0).toString
    SketchRollup.buildDaily(
      ev.where(to_date(col("ts")) === lit(firstDay).cast("date")), out)

    val after = SketchRollup.summary(spark, out, "2020-01-01", "2030-01-01")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(after == before, "single-day rebuild must not change any answer")
  }
}
