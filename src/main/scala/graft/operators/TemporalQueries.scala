package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Time-series regularization — turning an irregular event stream into
  * the dense, gap-free series that feature pipelines and dashboards
  * consume.
  */
object TemporalQueries {

  /** Sparse series count: `user_id mod SeriesBuckets` groups purchases
    * into series thin enough that daily gaps exist at every scale
    * factor — the operator's whole point is filling them. */
  val SeriesBuckets = 50

  // ------------------------------------------------------ q69 gapfill
  /** Q69: calendar spine + zero-fill + LOCF. Purchases collapse to
    * per-(series, day) revenue; the corpus-wide [min_day, max_day]
    * range becomes an exploded calendar spine cross-joined with the
    * observed series set; missing days left-join to NULL and emit both
    * conventions a consumer wants: `revenue` zero-filled, and
    * `revenue_locf` carrying the last observed value forward (NULL
    * before a series' first observation — fabricating data there would
    * be wrong).
    *
    * Scale: the spine is |series| × |days| — it grows with the
    * CALENDAR, not the event count, so the explode is tiny next to the
    * aggregation; the LOCF window partitions per series (bounded rows
    * per partition = days in range). The global min/max arrives as a
    * broadcast 1-row aggregate, never a driver collect. */
  def q69GapFill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    // Persisted: the spine's distinct-series scan and the join-back both
    // read this |series|x|days|-bounded relation -- one corpus scan.
    val daily = graft.core.Caches.persistTracked(
      e.where(col("event_type") === "purchase")
        .groupBy(pmod(col("user_id"), lit(SeriesBuckets.toLong)).as("series_id"),
          to_date(col("ts")).as("day"))
        .agg(CoreQueries.decSum(col("value")).as("obs_revenue")))
    val range = e.agg(to_date(min("ts")).as("d0"), to_date(max("ts")).as("d1"))
    val spine = daily.select(col("series_id")).distinct()
      .crossJoin(broadcast(range))
      .select(col("series_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val wl = Window.partitionBy("series_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("series_id", "day"), "left")
      .select(col("series_id"), col("day"),
        coalesce(col("obs_revenue"), lit(0.0)).as("revenue"),
        last(col("obs_revenue"), ignoreNulls = true).over(wl).as("revenue_locf"))
  }

  val q69Sql: String =
    s"""WITH daily AS (SELECT user_id % $SeriesBuckets AS series_id, CAST(ts AS DATE) AS day,
       |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS obs_revenue
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       |r AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events),
       |spine AS (SELECT series_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM (SELECT DISTINCT series_id FROM daily) CROSS JOIN r)
       |SELECT s.series_id, s.day,
       |  coalesce(obs_revenue, 0.0) AS revenue,
       |  last_value(obs_revenue IGNORE NULLS) OVER (PARTITION BY s.series_id ORDER BY s.day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue_locf
       |FROM spine s LEFT JOIN daily d ON s.series_id = d.series_id AND s.day = d.day""".stripMargin

  // -------------------------------------------- q83 interval coalesce
  /** Interval length in seconds derived deterministically from the
    * event id: 60..299 s — long enough that per-user intervals overlap
    * at every scale factor, short enough that distinct islands exist. */
  val MaxExtraSecs = 240
  val MinSecs = 60

  /** Q83: coalesce overlapping intervals into islands — the
    * sessionize-by-overlap operator (device uptime windows, lease
    * ranges, validity periods). Each event opens an interval
    * [ts, ts + dur); intervals of the same user that overlap or touch
    * merge transitively. The classic island trick makes this one
    * window pass instead of an iterative self-join: a row starts a new
    * island iff its start strictly exceeds the running max of all
    * PRIOR ends (frame ... AND 1 PRECEDING), and the island id is the
    * running sum of those start flags.
    *
    * Scale: both windows and the final aggregation partition by
    * user_id — uniform keys, one shuffle reused across all three (same
    * partitioning → Catalyst reuses the exchange); per-user row counts
    * are bounded, and nothing ever sorts or joins corpus-wide. */
  def q83Intervals(spark: SparkSession, dir: String): DataFrame =
    q83IntervalsOn(Tables(spark, dir, "events"))

  private[operators] def q83IntervalsOn(events: DataFrame): DataFrame = {
    val e = events
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("ts") + make_dt_interval(lit(0), lit(0), lit(0),
          (pmod(col("event_id"), lit(MaxExtraSecs.toLong)) + MinSecs)
            .cast("double"))).as("end_ts"))
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prevMax = max(col("end_ts"))
      .over(order.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = e.withColumn("new_island",
      when(prevMax.isNull || col("ts") > prevMax, 1L).otherwise(0L))
    flagged
      .withColumn("island",
        sum(col("new_island")).over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "island")
      .agg(min(col("ts")).as("start_ts"), max(col("end_ts")).as("last_end"),
        count(lit(1)).as("n_events"))
  }

  val q83Sql: String =
    s"""WITH e AS (SELECT user_id, event_id, ts,
       |    ts + INTERVAL ((event_id % $MaxExtraSecs) + $MinSecs) SECOND AS end_ts
       |  FROM events),
       |f AS (SELECT user_id, event_id, ts, end_ts,
       |    CASE WHEN ts > max(end_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      OR max(end_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |      THEN 1 ELSE 0 END AS new_island
       |  FROM e),
       |i AS (SELECT user_id, ts, end_ts,
       |    sum(new_island) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM f)
       |SELECT user_id, CAST(island AS BIGINT) AS island,
       |  min(ts) AS start_ts, max(end_ts) AS last_end, count(*) AS n_events
       |FROM i GROUP BY 1, 2""".stripMargin

  // --------------------------------------- q89 sliding distinct users
  /** Trailing window width in days. */
  val SlideDays = 7

  /** Q89: trailing 7-day distinct users per day — the rolling-actives
    * metric (WAU) that naive plans compute as a per-day set union over
    * a sliding window (quadratic in window width, unmergeable state).
    * The scalable shape inverts it: collapse events to DISTINCT
    * (user, day) pairs first (the corpus-sized shrink), then each pair
    * CONTRIBUTES itself to the [[SlideDays]] window-end days it falls
    * inside — a bounded 7× explode of the already-collapsed relation —
    * and a plain count-distinct per day finishes it. Every stage is a
    * uniform-key hash aggregation; the 1-row corpus max-day bound
    * broadcasts. Days before the first full window keep their partial
    * (growing) window — the convention dashboards expect. */
  def q89SlidingDistinct(spark: SparkSession, dir: String): DataFrame =
    q89SlidingDistinctOn(Tables(spark, dir, "events"))

  private[operators] def q89SlidingDistinctOn(events: DataFrame): DataFrame = {
    val du = events
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val mx = du.agg(max("day").as("d1"))
    du.select(explode(sequence(col("day"), date_add(col("day"), SlideDays - 1)))
        .as("wday"), col("user_id"))
      .join(broadcast(mx), col("wday") <= col("d1"))
      .groupBy("wday")
      .agg(countDistinct("user_id").as("users_7d"))
      .withColumnRenamed("wday", "day")
  }

  val q89Sql: String =
    s"""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
       |r AS (SELECT max(day) AS d1 FROM du),
       |x AS (SELECT CAST(unnest(generate_series(day, day + INTERVAL ${SlideDays - 1} DAY,
       |    INTERVAL 1 DAY)) AS DATE) AS wday, user_id FROM du)
       |SELECT wday AS day, count(DISTINCT user_id) AS users_7d
       |FROM x, r WHERE wday <= d1 GROUP BY 1""".stripMargin

  // ------------------------------------------------ q91 series trend
  /** Q91: per-series least-squares trend — the drift detector behind
    * "is this sensor/user metric creeping" alerts, as a closed-form
    * slope from exact moments: slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²),
    * with x = epoch seconds and y = the metric. The four moment sums
    * run through DECIMAL (exact, order-independent — the engine's
    * standard determinism pattern), so the doubles entering the final
    * pinned-order IEEE arithmetic are bit-identical in any engine at
    * any partition count. Degenerate series (one event, or all events
    * in the same second) emit a NULL slope rather than ±Inf. Scale:
    * one map-side-combined aggregation on uniform series keys; the
    * slope math is per-group scalar arithmetic. Slope is reported per
    * DAY (per-second slopes round to 0 at 6 digits). */
  def q91Trend(spark: SparkSession, dir: String): DataFrame =
    q91TrendOn(Tables(spark, dir, "events"))

  private[operators] def q91TrendOn(events: DataFrame): DataFrame = {
    val xd = col("x").cast("decimal(19,0)")
    val g = events
      // NTZ has no direct long cast; session tz is UTC, so the TZ
      // round-trip is the identity epoch read.
      .select(col("user_id"), col("ts").cast("timestamp").cast("long").as("x"),
        col("value").as("y"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).cast("double").as("sx"),
        sum(xd * xd).cast("double").as("sxx"),
        sum(col("y").cast("decimal(24,6)")).cast("double").as("sy"),
        sum(xd * col("y").cast("decimal(18,6)")).cast("double").as("sxy"))
    g.select(col("user_id"), col("n").as("n_events"),
      round(col("sy") / col("n"), 6).as("mean_value"),
      when(col("n") * col("sxx") - col("sx") * col("sx") === 0d, lit(null))
        .otherwise(round(
          (col("n") * col("sxy") - col("sx") * col("sy"))
            / (col("n") * col("sxx") - col("sx") * col("sx")) * 86400.0, 6))
        .as("slope_per_day"))
  }

  val q91Sql: String =
    """WITH p AS (SELECT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS x, value AS y FROM events),
      |m AS (SELECT user_id, count(*) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(y AS DECIMAL(24,6))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sxy
      |  FROM p GROUP BY 1)
      |SELECT user_id, n AS n_events, round(sy / n, 6) AS mean_value,
      |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
      |    ELSE round((n * sxy - sx * sy) / (n * sxx - sx * sx) * 86400.0, 6)
      |  END AS slope_per_day
      |FROM m""".stripMargin

  // --------------------------------------------- q93 time-decay score
  /** Decay time constant: one e-fold per day. */
  val DecayTauSecs = 86400.0

  /** Q93: exponential time-decay engagement score per user — the
    * recency-weighted feature (`Σ value·e^{-(now−ts)/τ}`) that feature
    * stores maintain for ranking/churn models. "now" is the corpus max
    * timestamp (deterministic — no wall clock in a verified query).
    *
    * Determinism: the per-event term is double math (exp), but each
    * term is cast to DECIMAL(28,12) BEFORE the sum, so the aggregation
    * is exact and order-independent — partition count and merge order
    * can't change the result (the engine's standard float-agg
    * pattern, see q91). Scale: one map-side-combined aggregation on
    * uniform user keys; the 1-row corpus max broadcasts. */
  def q93DecayScore(spark: SparkSession, dir: String): DataFrame =
    q93DecayScoreOn(Tables(spark, dir, "events"))

  private[operators] def q93DecayScoreOn(events: DataFrame): DataFrame = {
    val p = events.select(col("user_id"),
      col("ts").cast("timestamp").cast("long").as("x"), col("value"))
    val now = p.agg(max("x").as("nw"))
    p.crossJoin(broadcast(now))
      .select(col("user_id"),
        (col("value") * exp((col("x") - col("nw")).cast("double") / lit(DecayTauSecs)))
          .cast("decimal(28,12)").as("term"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("term")).cast("double"), 6).as("decay_score"))
  }

  val q93Sql: String =
    s"""WITH p AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS x, value FROM events),
       |r AS (SELECT max(x) AS nw FROM p)
       |SELECT user_id, count(*) AS n_events,
       |  round(CAST(sum(CAST(value * exp((x - nw) / $DecayTauSecs) AS DECIMAL(28,12))) AS DOUBLE), 6)
       |    AS decay_score
       |FROM p, r GROUP BY 1""".stripMargin

  // ------------------------------------- q95 interval overlap join
  /** Incident half-width (seconds) around each sampled error event. */
  val IncidentPadSecs = 60
  /** Only every [[IncidentSample]]-th error event opens an incident —
    * keeps the incident side a realistic fraction of the corpus. */
  val IncidentSample = 97
  /** Equi-join bin width for the binned overlap join (seconds). */
  val OverlapBinSecs = 3600L

  /** Q95: interval overlap join with NO equi key — "which activity
    * islands overlap which incident windows", the generic
    * interval×interval join (outage attribution, maintenance-window
    * exclusion). The left side is q83's per-user coalesced islands;
    * the right is a ±[[IncidentPadSecs]] s window around every
    * [[IncidentSample]]-th error event, any user — so no join column
    * exists and a naive plan is a cartesian θ-join.
    *
    * Scale shape: the binned overlap join. Each interval explodes to
    * the [[OverlapBinSecs]]-wide epoch bins it covers (bounded
    * duplication: len/bin + 1 rows), the two sides equi-join on the
    * bin, pairs dedupe (an overlap spanning k bins matches k times),
    * and the exact predicate filters residual false bin-mates. Every
    * stage is a uniform-key hash shuffle; nothing is O(n·m). The
    * bin width is the knob: wider bins → fewer duplicates, more
    * false candidates — at 100 TB you size it near the median
    * interval length. */
  def q95IntervalJoin(spark: SparkSession, dir: String): DataFrame =
    q95IntervalJoinOn(Tables(spark, dir, "events"))

  private[operators] def q95IntervalJoinOn(events: DataFrame): DataFrame = {
    def secs(c: Column): Column = c.cast("timestamp").cast("long")
    val islands = q83IntervalsOn(events)
      .select(col("user_id"), col("island"),
        secs(col("start_ts")).as("s0"), secs(col("last_end")).as("s1"))
    val incidents = events
      .where(col("event_type") === "error" &&
        pmod(col("event_id"), lit(IncidentSample.toLong)) === 0)
      .select(col("event_id").as("incident_id"),
        (secs(col("ts")) - IncidentPadSecs).as("i0"),
        (secs(col("ts")) + IncidentPadSecs).as("i1"))
    def bins(a: Column, b: Column): Column =
      explode(sequence(call_function("div", a, lit(OverlapBinSecs)),
        call_function("div", b, lit(OverlapBinSecs))))
    val li = islands.withColumn("bin", bins(col("s0"), col("s1")))
    val ri = incidents.withColumn("bin", bins(col("i0"), col("i1")))
    li.join(ri, "bin")
      .where(col("s0") < col("i1") && col("i0") < col("s1"))
      .select(col("user_id"), col("island"), col("incident_id"),
        (least(col("s1"), col("i1")) - greatest(col("s0"), col("i0"))).as("overlap_secs"))
      .distinct()
  }

  val q95Sql: String =
    s"""WITH e AS (SELECT user_id, event_id, ts,
       |    ts + INTERVAL ((event_id % $MaxExtraSecs) + $MinSecs) SECOND AS end_ts
       |  FROM events),
       |f AS (SELECT user_id, event_id, ts, end_ts,
       |    CASE WHEN ts > max(end_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      OR max(end_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |      THEN 1 ELSE 0 END AS new_island
       |  FROM e),
       |i AS (SELECT user_id, ts, end_ts,
       |    sum(new_island) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM f),
       |isl AS (SELECT user_id, CAST(island AS BIGINT) AS island,
       |    CAST(floor(epoch(min(ts))) AS BIGINT) AS s0,
       |    CAST(floor(epoch(max(end_ts))) AS BIGINT) AS s1
       |  FROM i GROUP BY 1, 2),
       |inc AS (SELECT event_id AS incident_id,
       |    CAST(floor(epoch(ts)) AS BIGINT) - $IncidentPadSecs AS i0,
       |    CAST(floor(epoch(ts)) AS BIGINT) + $IncidentPadSecs AS i1
       |  FROM events WHERE event_type = 'error' AND event_id % $IncidentSample = 0)
       |SELECT user_id, island, incident_id,
       |  least(s1, i1) - greatest(s0, i0) AS overlap_secs
       |FROM isl JOIN inc ON s0 < i1 AND i0 < s1""".stripMargin

  // ------------------------------------- q112 linear interpolation
  /** Q112: linearly-interpolated gap fill — q69's spine with the THIRD
    * fill convention: missing days take the straight line between the
    * surrounding observations (LOCF answers "what was the state?",
    * lerp answers "what was the level?" — the right call for rates and
    * gauges). Days before a series' first observation or after its
    * last stay NULL: extrapolation fabricates trend, and downstream
    * feature code should see the absence.
    *
    * Determinism: observed dailies are DECIMAL-exact sums; the lerp
    * prev + (next−prev)·Δ/Δtotal is a pinned sequence of
    * correctly-rounded IEEE ops over exact inputs, rounded to 6 only
    * for the report.
    *
    * Scale shape: q69's — a calendar-bounded spine, ONE window
    * partitioning per series carrying both directions (the forward
    * last-observation scan and the backward next-observation scan
    * reuse the same exchange; only the frame differs), no self-joins
    * against shifted copies. */
  def q112Lerp(spark: SparkSession, dir: String): DataFrame =
    lerpOn(Tables(spark, dir, "events"))

  private[graft] def lerpOn(e: DataFrame): DataFrame = {
    // Persisted: the spine's distinct-series scan and the join-back both
    // read this |series|x|days|-bounded relation -- one corpus scan.
    val daily = graft.core.Caches.persistTracked(
      e.where(col("event_type") === "purchase")
        .groupBy(pmod(col("user_id"), lit(SeriesBuckets.toLong)).as("series_id"),
          to_date(col("ts")).as("day"))
        .agg(CoreQueries.decSum(col("value")).as("obs_revenue")))
    val range = e.agg(to_date(min("ts")).as("d0"), to_date(max("ts")).as("d1"))
    val spine = daily.select(col("series_id")).distinct()
      .crossJoin(broadcast(range))
      .select(col("series_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val back = Window.partitionBy("series_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("series_id").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("obs_revenue").isNotNull, col("day"))
    val prevVal = last(col("obs_revenue"), ignoreNulls = true).over(back)
    val prevDay = last(obsDay, ignoreNulls = true).over(back)
    val nextVal = first(col("obs_revenue"), ignoreNulls = true).over(fwd)
    val nextDay = first(obsDay, ignoreNulls = true).over(fwd)
    val frac = datediff(col("day"), col("p_day")).cast("double") /
      datediff(col("n_day"), col("p_day")).cast("double")
    spine.join(daily, Seq("series_id", "day"), "left")
      .select(col("series_id"), col("day"), col("obs_revenue"),
        prevVal.as("p_val"), prevDay.as("p_day"),
        nextVal.as("n_val"), nextDay.as("n_day"))
      .select(col("series_id"), col("day"), col("obs_revenue"),
        round(
          when(col("obs_revenue").isNotNull, col("obs_revenue"))
            .otherwise(col("p_val") + (col("n_val") - col("p_val")) * frac),
          6).as("revenue_lerp"))
  }

  val q112Sql: String =
    s"""WITH daily AS (SELECT user_id % $SeriesBuckets AS series_id, CAST(ts AS DATE) AS day,
       |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS obs_revenue
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       |r AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events),
       |spine AS (SELECT series_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM (SELECT DISTINCT series_id FROM daily) CROSS JOIN r),
       |j AS (SELECT s.series_id, s.day, d.obs_revenue FROM spine s
       |  LEFT JOIN daily d ON s.series_id = d.series_id AND s.day = d.day),
       |w AS (SELECT series_id, day, obs_revenue,
       |    last_value(obs_revenue IGNORE NULLS) OVER wb AS p_val,
       |    last_value(CASE WHEN obs_revenue IS NOT NULL THEN day END IGNORE NULLS) OVER wb AS p_day,
       |    first_value(obs_revenue IGNORE NULLS) OVER wf AS n_val,
       |    first_value(CASE WHEN obs_revenue IS NOT NULL THEN day END IGNORE NULLS) OVER wf AS n_day
       |  FROM j
       |  WINDOW wb AS (PARTITION BY series_id ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |    wf AS (PARTITION BY series_id ORDER BY day
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
       |SELECT series_id, day, obs_revenue,
       |  round(CASE WHEN obs_revenue IS NOT NULL THEN obs_revenue
       |    ELSE p_val + (n_val - p_val)
       |      * (CAST(date_diff('day', p_day, day) AS DOUBLE)
       |         / CAST(date_diff('day', p_day, n_day) AS DOUBLE)) END, 6) AS revenue_lerp
       |FROM w""".stripMargin

  // --------------------------------------- q113 rolling median
  /** Trailing window width in days for the rolling median. */
  val MedianDays = 7

  /** Q113: trailing 7-day rolling median of daily revenue per series —
    * the robust smoother dashboards use where a rolling MEAN (q52)
    * chases every spike. Runs over the gap-filled spine (q69's
    * zero-fill convention), so the ROWS frame is genuinely 7 calendar
    * days — on sparse raw dailies a row frame would silently span
    * months. Warm-up days keep their partial (growing) frame.
    *
    * Determinism: frame contents are exact decimal sums read back as
    * doubles; the even-count interpolation is the one unpinnable IEEE
    * step, so the report rounds to 6 decimals (q94's median
    * convention).
    *
    * Scale shape: the spine is calendar-bounded; ONE window
    * partitioning per series serves the frame (per-series sorts only
    * their own days). An exact median over a 7-row frame is O(1) per
    * row — no sketch needed below frame widths of thousands. */
  def q113RollingMedian(spark: SparkSession, dir: String): DataFrame =
    rollingMedianOn(Tables(spark, dir, "events"))

  private[graft] def rollingMedianOn(e: DataFrame): DataFrame = {
    // Persisted: the spine's distinct-series scan and the join-back both
    // read this |series|x|days|-bounded relation -- one corpus scan.
    val daily = graft.core.Caches.persistTracked(
      e.where(col("event_type") === "purchase")
        .groupBy(pmod(col("user_id"), lit(SeriesBuckets.toLong)).as("series_id"),
          to_date(col("ts")).as("day"))
        .agg(CoreQueries.decSum(col("value")).as("obs_revenue")))
    val range = e.agg(to_date(min("ts")).as("d0"), to_date(max("ts")).as("d1"))
    val spine = daily.select(col("series_id")).distinct()
      .crossJoin(broadcast(range))
      .select(col("series_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy("series_id").orderBy("day")
      .rowsBetween(-(MedianDays - 1), Window.currentRow)
    spine.join(daily, Seq("series_id", "day"), "left")
      .select(col("series_id"), col("day"),
        coalesce(col("obs_revenue"), lit(0.0)).as("revenue"))
      .withColumn("median_7d",
        round(percentile(col("revenue"), lit(0.5)).over(w), 6))
  }

  val q113Sql: String =
    s"""WITH daily AS (SELECT user_id % $SeriesBuckets AS series_id, CAST(ts AS DATE) AS day,
       |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS obs_revenue
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       |r AS (SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events),
       |spine AS (SELECT series_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM (SELECT DISTINCT series_id FROM daily) CROSS JOIN r),
       |z AS (SELECT s.series_id, s.day, coalesce(d.obs_revenue, 0.0) AS revenue
       |  FROM spine s LEFT JOIN daily d ON s.series_id = d.series_id AND s.day = d.day)
       |SELECT series_id, day, revenue,
       |  round(median(revenue) OVER (PARTITION BY series_id ORDER BY day
       |    ROWS BETWEEN ${MedianDays - 1} PRECEDING AND CURRENT ROW), 6) AS median_7d
       |FROM z""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q69_gapfill" -> q69GapFill _,
    "q112_lerp" -> q112Lerp _,
    "q113_rolling_median" -> q113RollingMedian _,
    "q83_intervals" -> q83Intervals _,
    "q89_sliding_distinct" -> q89SlidingDistinct _,
    "q91_trend" -> q91Trend _,
    "q93_decay_score" -> q93DecayScore _,
    "q95_interval_join" -> q95IntervalJoin _)

  val oracles: Map[String, String] = Map(
    "q69_gapfill" -> q69Sql,
    "q112_lerp" -> q112Sql,
    "q113_rolling_median" -> q113Sql,
    "q83_intervals" -> q83Sql,
    "q89_sliding_distinct" -> q89Sql,
    "q91_trend" -> q91Sql,
    "q93_decay_score" -> q93Sql,
    "q95_interval_join" -> q95Sql)
}
