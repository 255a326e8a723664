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
    * finalized (window, event_type) with (n, mu, sigma, z, is_anomaly).
    *
    * **Structural gap — zero-count windows:** a windowed streaming
    * groupBy emits no row at all for a (window, type) with NO events,
    * so the headline silent-feed case (baseline says busy, feed says
    * nothing) can never surface here: there is no row to score. Pair
    * this stream with [[silentSlots]] — a batch watchdog over the
    * sink that flags exactly those absent windows. */
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

  /** The absence watchdog [[zStream]] structurally needs: flags every
    * hourly (window, event_type) slot in `[from, until)` whose baseline
    * says a zero count is itself anomalous (µ/σ > threshold — the z a
    * count of 0 would score) but for which the stream's sink holds NO
    * finalized row. Run it on a schedule (foreachBatch epilogue, or an
    * hourly job over the sink table), with `until` clamped to windows
    * the watermark has already closed — an open window's absence is
    * just lag, not silence.
    *
    * Emits the same (window, type, n, mu, sigma, z, is_anomaly) shape
    * as [[zStream]] with n = 0 and is_anomaly = true, so the two
    * relations union into one alarm feed.
    *
    * Scale shape: the expected grid is hours × |baseline| (generated,
    * never scanned), the baseline join is a broadcast, and the only
    * look at real data is one anti-join against the sink's
    * (window_start, event_type) — a relation that grows by |types|
    * rows per hour, trivially prunable by the `[from, until)` window. */
  def silentSlots(emitted: DataFrame, base: DataFrame,
      from: java.sql.Timestamp, until: java.sql.Timestamp,
      threshold: Double = AnomalyZ): DataFrame = {
    val spark = emitted.sparkSession
    val grid = spark.range(1)
      .select(explode(sequence(lit(from), lit(until), expr("INTERVAL 1 HOUR")))
        .as("window_start"))
      .where(col("window_start") < lit(until))
      .withColumn("dow", dayofweek(col("window_start")).cast("long"))
      .withColumn("hod", hour(col("window_start")))
    val zAtZero = (lit(0.0) - col("mu")) / col("sigma")
    grid.join(broadcast(base), Seq("dow", "hod"))
      .where(col("sigma") > 0 && abs(col("mu") / col("sigma")) > lit(threshold))
      .join(emitted.select(col("window_start"), col("event_type")),
        Seq("window_start", "event_type"), "left_anti")
      .select(col("window_start"),
        (col("window_start") + expr("INTERVAL 1 HOUR")).as("window_end"),
        col("event_type"), lit(0L).as("n"),
        round(col("mu"), 6).as("mu"), round(col("sigma"), 6).as("sigma"),
        round(zAtZero, 6).as("z"), lit(true).as("is_anomaly"))
  }
}
