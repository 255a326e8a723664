package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming domain-mixture drift monitoring — the live counterpart of
  * the batch mixture report (q170, `operators/MixtureQueries`): per
  * event-time window, the ingest stream's per-domain char-mass shares
  * against a trained target mixture, emitted as windows finalize. A
  * crawl whose domain composition walks away from the plan (one
  * source floods, one dries up) raises `skewed` within one watermark
  * delay — before a day of mis-mixed data lands in silver and q181's
  * batch report finds out after the fact.
  *
  * Design, [[DriftMonitor]]'s moves applied to domains:
  *  - ONE streaming aggregation produces the window's whole
  *    composition: the target's domains are known at wiring time (the
  *    target is a trained artifact), so per-domain masses are
  *    conditional-sum COLUMNS of a single `groupBy(window)` — no
  *    chained aggregation, no second shuffle. Mass in a domain the
  *    target doesn't know lands in an `other` column whose target
  *    share is 0: unknown domains are drift by definition, never
  *    silently dropped.
  *  - The drift statistic is half the L1 distance between the live
  *    share vector and the target (total-variation distance: 0 =
  *    exact match, 1 = disjoint) — pure column math over one row,
  *    fixed term order, deterministic.
  *  - Watermarked append mode: one row per window, emitted exactly
  *    once when the watermark passes the window end.
  *
  * Scale shape: streaming state is one row of |domains|+2 longs per
  * open window — independent of event volume; the shuffle keys by
  * window only, and the target is a driver-side literal (K domains).
  */
object MixtureMonitor {

  /** Total-variation "investigate" threshold: 0.1 = 10% of the char
    * mass is in the wrong domain relative to the plan. */
  val DefaultThreshold = 0.1

  /** Train the target from a reference corpus: its per-domain natural
    * char-mass shares (the same `p_nat` q170 starts from), as driver
    * rows. Feed it the curated corpus the mixture was planned on. */
  def train(reference: DataFrame): Seq[(String, Double)] = {
    val rows = reference.groupBy("lang")
      .agg(sum("n_chars").cast("double").as("mass"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val tot = rows.map(_._2).sum
    rows.map { case (l, m) => (l, m / tot) }.sortBy(_._1).toSeq
  }

  /** Mixture drift per finalized window over a document stream.
    *
    * @param docs       streaming DataFrame with `ts` (timestamp),
    *                   `lang`, `n_chars`
    * @param target     [[train]] output
    * @param windowSize event-time tumbling window
    * @param watermark  max lateness before a window finalizes
    * @param threshold  total-variation distance above which `skewed`
    */
  def driftStream(docs: DataFrame, target: Seq[(String, Double)],
      windowSize: String = "10 minutes", watermark: String = "10 minutes",
      threshold: Double = DefaultThreshold): DataFrame = {
    val known = target.map(_._1)
    // Mass columns are POSITIONAL (m_0 … m_K in target order, m_K =
    // unknown-domain mass), never derived from the lang value: a domain
    // literally named "other" must not collide with the unknown-mass
    // column, and a lang containing '.' or spaces must not break
    // column resolution at wiring time. The lang value appears only
    // inside the `when` predicate, where any string is safe.
    val massAggs = known.zipWithIndex.map { case (l, i) =>
      sum(when(col("lang") === l, col("n_chars")).otherwise(0L)).as(s"m_$i")
    } :+ sum(when(!col("lang").isin(known: _*), col("n_chars"))
      .otherwise(0L)).as(s"m_${known.size}")
    val cur = docs
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowSize))
      .agg(sum("n_chars").as("n_chars"), massAggs: _*)
    def share(c: Column): Column = c.cast("double") / col("n_chars")
    val tv = (target.zipWithIndex.map { case ((_, q), i) =>
      abs(share(col(s"m_$i")) - lit(q))
    } :+ abs(share(col(s"m_${known.size}")))).reduce(_ + _) / 2.0
    cur.select(
      col("window.start").as("window_start"),
      col("window.end").as("window_end"),
      col("n_chars"),
      round(tv, 6).as("tv_dist"))
      .withColumn("skewed", col("tv_dist") > lit(threshold))
  }
}
