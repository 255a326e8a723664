package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitoring — the live counterpart of the
  * batch PSI audit (q103, `operators/AuditQueries`): population
  * stability index per (event-time window, event_type) against a
  * reference histogram, emitted as windows finalize. A feed whose value
  * distribution walks away from the baseline raises `drifted` within
  * one watermark delay of the window closing — no nightly batch job in
  * the loop.
  *
  * Design, Spark-first:
  *  - ONE streaming aggregation produces the whole current histogram:
  *    the [[Bins]] per-bin counts are conditional-sum aggregate columns
  *    of a single `groupBy(window, event_type)`, not rows. Chained
  *    streaming aggregations (count per bin, then PSI over bins) are
  *    restricted in append mode — and unnecessary: a histogram with a
  *    FIXED bin count is a row, not a relation.
  *  - The reference is a static relation (built by [[referenceHistogram]]
  *    over any batch baseline); joining it after the aggregation is a
  *    stateless stream-static broadcast join, and the PSI itself is pure
  *    column math over the joined row — fixed term order, deterministic.
  *  - Watermarked append mode: a (window, type) row emits exactly once,
  *    when the watermark passes the window end — the alarm fires on
  *    FINALIZED distributions, not provisional prefixes.
  *
  * Scale shape: streaming state is one row of [[Bins]]+1 longs per open
  * (window, type) — bounded by |types| × open windows, independent of
  * event volume; the shuffle keys by (window, type), uniform at IoT
  * cardinalities. The reference broadcast is |types| rows. Identical
  * configuration serves one executor or a thousand.
  */
object DriftMonitor {

  /** Same histogram geometry as the batch audit (q103). */
  val Bins = 10
  val BinWidth = 100.0
  val Eps = 1e-6

  /** Industry-standard "investigate" threshold. */
  val DefaultThreshold = 0.25

  private def binOf(value: Column): Column =
    least(greatest(floor(value / lit(BinWidth)), lit(0L)), lit(Bins - 1L))

  /** Reference histogram from a batch baseline: one row per event_type
    * with `n` and the [[Bins]] bin shares `q0..q9`. Feed it yesterday's
    * silver partition, a curated golden window, or the training-set
    * distribution — anything the live feed is supposed to look like. */
  def referenceHistogram(baseline: DataFrame): DataFrame = {
    val binAggs = (0 until Bins).map { b =>
      sum(when(binOf(col("value")) === b, 1L).otherwise(0L)).as(s"c$b")
    }
    baseline.where(col("value").isNotNull)
      .groupBy("event_type")
      .agg(binAggs.head, binAggs.tail: _*)
      .select(col("event_type") +:
        (0 until Bins).map(b =>
          (col(s"c$b").cast("double") /
            (0 until Bins).map(i => col(s"c$i")).reduce(_ + _).cast("double"))
            .as(s"q$b")): _*)
  }

  /** PSI per finalized (window, event_type) over a value stream.
    *
    * @param events     streaming DataFrame with `ts` (timestamp),
    *                   `event_type`, `value`
    * @param reference  [[referenceHistogram]] output (static)
    * @param windowSize event-time tumbling window, e.g. "10 minutes"
    * @param watermark  max lateness before a window finalizes
    * @param threshold  PSI above which `drifted` is set
    */
  def psiStream(events: DataFrame, reference: DataFrame,
      windowSize: String = "10 minutes", watermark: String = "10 minutes",
      threshold: Double = DefaultThreshold): DataFrame = {
    val binAggs = (0 until Bins).map { b =>
      sum(when(binOf(col("value")) === b, 1L).otherwise(0L)).as(s"c$b")
    }
    val cur = events.where(col("value").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowSize), col("event_type"))
      .agg(count(lit(1)).as("n"), binAggs: _*)
    val terms = (0 until Bins).map { b =>
      val p = greatest(col(s"c$b").cast("double") / col("n").cast("double"), lit(Eps))
      val q = greatest(col(s"q$b"), lit(Eps))
      (p - q) * log(p / q)
    }
    cur.join(broadcast(reference), "event_type")
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n"),
        round(terms.reduce(_ + _), 6).as("psi"))
      .withColumn("drifted", col("psi") > lit(threshold))
  }
}
