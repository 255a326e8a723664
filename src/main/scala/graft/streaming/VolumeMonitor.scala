package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming volume anomalies — q104's seasonality-aware z-score audit
  * (`operators/AuditQueries.seasonalAnomaly`) run live: each finalized
  * hourly (window, event_type) count is scored against the batch
  * history's baseline for the SAME (day-of-week, hour-of-day) slot, so
  * 3 AM Sunday quiet never pages anyone and a silent Monday-morning
  * feed does — within one watermark delay of the window closing.
  *
  * Same construction as [[DriftMonitor]] (the two are the live
  * monitoring pair): ONE windowed streaming aggregation (a count),
  * a stateless stream-static broadcast join against the baseline, pure
  * column math for the score, watermarked append mode for
  * exactly-once finalized alarms. The baseline's mean/σ come from
  * exact integer moments (q104's determinism argument); degenerate
  * slots (σ = 0 or a 1-observation history) yield NULL z and never
  * flag.
  *
  * Scale shape: streaming state is one count per open (window, type);
  * the baseline broadcast is ≤ 7·24·|types| rows. Event volume touches
  * only the map side of the count.
  */
object VolumeMonitor {

  /** |z| past which a window is flagged (q104's threshold). */
  val AnomalyZ = 2.0

  /** Window/slot geometry — part of the contract: the baseline is
    * keyed by (dow, hour), so the stream must window hourly. */
  val WindowSize = "1 hour"

  /** Per-(event_type, dow, hour) baseline from batch history: the
    * mean/σ of that slot's hourly event counts. Feed it the same
    * silver relation q104 audits. */
  def baseline(history: DataFrame): DataFrame = {
    val slotted = history
      .groupBy(col("event_type"), to_date(col("ts")).as("day"),
        hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow", dayofweek(col("day")).cast("long"))
    val n = col("n_slots").cast("double")
    val mu = col("s1").cast("double") / n
    val variance = (col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / n) / (n - lit(1.0))
    slotted.groupBy("event_type", "dow", "hod")
      .agg(count(lit(1)).as("n_slots"),
        sum("cnt").as("s1"), sum(col("cnt") * col("cnt")).as("s2"))
      .select(col("event_type"), col("dow"), col("hod"), col("n_slots"),
        mu.as("mu"),
        when(col("n_slots") > 1, sqrt(greatest(variance, lit(0.0)))).as("sigma"))
  }

  /** Hourly live counts scored against [[baseline]]; emits one row per
    * finalized (window, event_type) with (n, mu, sigma, z, is_anomaly). */
  def zStream(events: DataFrame, base: DataFrame,
      watermark: String = "30 minutes", threshold: Double = AnomalyZ): DataFrame = {
    val cur = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), WindowSize), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"), col("n"))
      .withColumn("dow", dayofweek(col("window_start")).cast("long"))
      .withColumn("hod", hour(col("window_start")))
    val z = when(col("sigma") > 0,
      (col("n").cast("double") - col("mu")) / col("sigma"))
    cur.join(broadcast(base), Seq("event_type", "dow", "hod"))
      .select(col("window_start"), col("window_end"), col("event_type"), col("n"),
        round(col("mu"), 6).as("mu"), round(col("sigma"), 6).as("sigma"),
        round(z, 6).as("z"),
        coalesce(abs(round(z, 6)) > lit(threshold), lit(false)).as("is_anomaly"))
  }
}
