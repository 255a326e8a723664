package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Distribution monitoring — the audit layer that tells a pipeline
  * operator the DATA changed before a consumer tells them the model
  * did. The reference ships no monitoring beyond row counts (SURVEY
  * §5's "dbt test" layer is documented but unbuilt); these queries are
  * the two standard production checks over the same events relation:
  * score-distribution drift between time periods (PSI, q103) and
  * seasonality-aware volume anomalies (day-of-week z-scores, q104).
  *
  * Both are engine-portable and deterministic: integer counts all the
  * way to one pinned IEEE division/log at the end, per-term
  * DECIMAL(28,12) casts before any float sum (the q91/q93/q97
  * pattern), and 6-decimal rounding on reported measures.
  */
object AuditQueries {

  /** Equi-width histogram geometry for q103: [[PsiBins]] bins of width
    * [[PsiBinWidth]] over the events `value` domain (0..1000 by the
    * q38 range contract); values outside clamp into the edge bins. */
  val PsiBins = 10
  val PsiBinWidth = 100.0

  /** Zero-share smoothing floor — the standard PSI guard so an empty
    * bin contributes a finite term instead of ln(0). */
  val PsiEps = 1e-6

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")

  // ------------------------------------------------- q103 PSI drift
  /** Q103: population-stability-index drift — per event_type, how far
    * the `value` distribution of the LATER half of the corpus window
    * has moved from the earlier half. PSI = Σ_bins (p−q)·ln(p/q) with
    * p/q the smoothed bin shares; the industry thresholds (&lt;0.1
    * stable, &gt;0.25 drifted) are the consumer's business, the engine
    * reports the measure.
    *
    * The corpus midpoint splits the window: day &lt; d0 + ⌊days/2⌋ is
    * the baseline period, the rest is current. Bins are DENSE — an
    * (event_type, period, bin) spine from the distinct types — so an
    * empty bin yields a smoothed share of [[PsiEps]], not a dropped
    * term; a share is otherwise exact-integer count / period total in
    * one pinned IEEE division.
    *
    * Scale shape: ONE map-side-combined aggregation over
    * (type, period, bin) — the key space is |types| × 2 × [[PsiBins]],
    * bounded regardless of row count — plus a broadcast 1-row min/max
    * aggregate for the split day and a broadcast spine join. Nothing
    * here scales with events volume except the first narrow scan. */
  def psiDrift(spark: SparkSession, dir: String): DataFrame =
    psiDriftOn(events(spark, dir))

  private[graft] def psiDriftOn(ev: DataFrame): DataFrame = {
    val base = ev.where(col("value").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
    val split = base.agg(
      min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(date_add(col("d0"),
        (datediff(col("d1"), col("d0")) / lit(2)).cast("int")).as("split_day"))
    val binCol = least(greatest(
      floor(col("value") / lit(PsiBinWidth)), lit(0L)), lit(PsiBins - 1L))
    // Persisted: the spine, both self-join sides, and the totals all
    // derive from this ≤|types|×2×10-row relation — left lazy, EACH
    // branch re-runs the corpus scan under it (5 scans instead of 1).
    val counts = graft.core.Caches.persistTracked(base.crossJoin(broadcast(split))
      .select(col("event_type"),
        when(col("day") < col("split_day"), lit("base")).otherwise(lit("cur")).as("period"),
        binCol.as("bin"))
      .groupBy("event_type", "period", "bin").agg(count(lit(1)).as("cnt")))
    // Dense (type, period, bin) spine so absent bins smooth instead of vanish.
    val spine = counts.select("event_type").distinct()
      .select(col("event_type"),
        explode(sequence(lit(0L), lit(PsiBins - 1L))).as("bin"))
      .select(col("event_type"), col("bin"),
        explode(array(lit("base"), lit("cur"))).as("period"))
    val dense = spine.join(counts, Seq("event_type", "period", "bin"), "left")
      .select(col("event_type"), col("period"), col("bin"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
    val totals = dense.groupBy("event_type", "period").agg(sum("cnt").as("total"))
    val share = when(col("total") > 0,
      col("cnt").cast("double") / col("total").cast("double")).otherwise(lit(0.0))
    val shares = dense.join(broadcast(totals), Seq("event_type", "period"))
      .select(col("event_type"), col("bin"), col("period"), col("total"),
        greatest(share, lit(PsiEps)).as("p"))
    val p = col("base.p"); val q = col("cur.p")
    shares.where(col("period") === "base").as("base")
      .join(shares.where(col("period") === "cur").as("cur"),
        col("base.event_type") === col("cur.event_type") &&
          col("base.bin") === col("cur.bin"))
      .select(col("base.event_type").as("event_type"),
        col("base.total").as("n_base"), col("cur.total").as("n_cur"),
        ((p - q) * log(p / q)).cast("decimal(28,12)").as("term"))
      .groupBy("event_type", "n_base", "n_cur")
      .agg(round(sum(col("term")).cast("double"), 6).as("psi"))
  }

  val psiDriftSql: String =
    s"""WITH base AS (SELECT event_type, CAST(ts AS DATE) AS day, value
       |    FROM events WHERE value IS NOT NULL),
       |sp AS (SELECT min(day) + CAST(date_diff('day', min(day), max(day)) // 2 AS INTEGER)
       |    AS split_day FROM base),
       |counts AS (SELECT event_type,
       |    CASE WHEN day < split_day THEN 'base' ELSE 'cur' END AS period,
       |    least(greatest(CAST(floor(value / $PsiBinWidth) AS BIGINT), 0), ${PsiBins - 1}) AS bin,
       |    count(*) AS cnt
       |  FROM base CROSS JOIN sp GROUP BY 1, 2, 3),
       |spine AS (SELECT t.event_type, p.period, b.bin
       |  FROM (SELECT DISTINCT event_type FROM counts) t,
       |       (SELECT unnest(range($PsiBins)) AS bin) b,
       |       (SELECT unnest(['base', 'cur']) AS period) p),
       |dense AS (SELECT s.event_type, s.period, s.bin, coalesce(c.cnt, 0) AS cnt
       |  FROM spine s LEFT JOIN counts c
       |    ON s.event_type = c.event_type AND s.period = c.period AND s.bin = c.bin),
       |tot AS (SELECT event_type, period, CAST(sum(cnt) AS BIGINT) AS total
       |  FROM dense GROUP BY 1, 2),
       |sh AS (SELECT d.event_type, d.bin, d.period, t.total,
       |    greatest(CASE WHEN t.total > 0
       |      THEN CAST(d.cnt AS DOUBLE) / CAST(t.total AS DOUBLE) ELSE 0.0 END, $PsiEps) AS p
       |  FROM dense d JOIN tot t ON d.event_type = t.event_type AND d.period = t.period)
       |SELECT b.event_type, b.total AS n_base, c.total AS n_cur,
       |  round(CAST(sum(CAST((b.p - c.p) * ln(b.p / c.p) AS DECIMAL(28,12))) AS DOUBLE), 6) AS psi
       |FROM sh b JOIN sh c ON b.event_type = c.event_type AND b.bin = c.bin
       |WHERE b.period = 'base' AND c.period = 'cur'
       |GROUP BY 1, 2, 3""".stripMargin

  // ------------------------------------- q104 seasonal volume anomaly
  /** |z| threshold above which a day is flagged. */
  val AnomalyZ = 2.0

  /** Q104: seasonality-aware volume anomalies — per (event_type, day),
    * the z-score of that day's event count against the SAME
    * day-of-week's baseline (mean/stddev over the whole window), so a
    * quiet Sunday isn't flagged just for being Sunday. Days where
    * |z| &gt; [[AnomalyZ]] are anomalies; a constant series (σ = 0) or
    * a 1-day baseline yields NULL z and never flags.
    *
    * Determinism: daily counts and the baseline's Σx/Σx² moments are
    * exact integers; mean, variance, sqrt, and the z division are each
    * single correctly-rounded IEEE ops in a pinned order, so Spark and
    * the oracle compute bit-identical doubles (the q58/q91 moments
    * argument), THEN round to 6 decimals for the report.
    *
    * Scale shape: one map-side-combined (type, day) count whose key
    * space is bounded by the calendar, a (type, dow) baseline rollup
    * of ≤ 7×|types| rows, and a broadcast join back. No windows, no
    * per-row state. */
  def seasonalAnomaly(spark: SparkSession, dir: String): DataFrame =
    seasonalAnomalyOn(events(spark, dir))

  private[operators] def seasonalAnomalyOn(ev: DataFrame): DataFrame = {
    // Persisted: the baseline rollup and the join-back both read this
    // calendar-bounded relation — one corpus scan, not two.
    val daily = graft.core.Caches.persistTracked(ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("dow", dayofweek(col("day")).cast("long")))
    val baseline = daily.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days"),
        sum("cnt").as("s1"), sum(col("cnt") * col("cnt")).as("s2"))
    val n = col("n_days").cast("double")
    val mu = col("s1").cast("double") / n
    val variance = (col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / n) / (n - lit(1.0))
    val sigma = when(col("n_days") > 1, sqrt(greatest(variance, lit(0.0))))
    val z = when(sigma > 0, (col("cnt").cast("double") - mu) / sigma)
    daily.join(broadcast(baseline), Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("dow"), col("cnt"),
        round(mu, 6).as("mu"), round(sigma, 6).as("sigma"),
        round(z, 6).as("z"),
        coalesce(abs(round(z, 6)) > lit(AnomalyZ), lit(false)).as("is_anomaly"))
  }

  val seasonalAnomalySql: String =
    s"""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |d AS (SELECT event_type, day, CAST(dayofweek(day) + 1 AS BIGINT) AS dow, cnt FROM daily),
       |b AS (SELECT event_type, dow, count(*) AS n_days,
       |    sum(cnt) AS s1, sum(cnt * cnt) AS s2 FROM d GROUP BY 1, 2),
       |j AS (SELECT d.event_type, d.day, d.dow, d.cnt,
       |    CAST(b.s1 AS DOUBLE) / CAST(b.n_days AS DOUBLE) AS mu,
       |    CASE WHEN b.n_days > 1 THEN sqrt(greatest(
       |      (CAST(b.s2 AS DOUBLE) - CAST(b.s1 AS DOUBLE) * CAST(b.s1 AS DOUBLE)
       |        / CAST(b.n_days AS DOUBLE)) / (CAST(b.n_days AS DOUBLE) - 1.0), 0.0)) END AS sigma
       |  FROM d JOIN b ON d.event_type = b.event_type AND d.dow = b.dow)
       |SELECT event_type, day, dow, cnt, round(mu, 6) AS mu, round(sigma, 6) AS sigma,
       |  round(CASE WHEN sigma > 0 THEN (CAST(cnt AS DOUBLE) - mu) / sigma END, 6) AS z,
       |  coalesce(abs(round(CASE WHEN sigma > 0 THEN (CAST(cnt AS DOUBLE) - mu) / sigma END, 6))
       |    > $AnomalyZ, false) AS is_anomaly
       |FROM j""".stripMargin

  // ---------------------------------------- q121 slot-absence audit
  /** Q121: slot-absence audit — the batch face of
    * [[graft.streaming.VolumeMonitor.silentSlots]]'s silent-feed
    * watchdog, over the same events relation q104 scores. A windowed
    * count (batch or streaming) emits NO row for an hour with zero
    * events, so "the feed went silent" is invisible to every
    * count-scoring audit; this query materializes the full
    * (type, day, hour) calendar grid over the corpus span and flags
    * exactly the absent slots whose (dow, hour) baseline says silence
    * is itself anomalous — µ/σ &gt; [[AnomalyZ]], the z a count of 0
    * would score. Reported z0 = −µ/σ is that hypothetical z. Slots
    * with no baseline at all (the type never fires in that weekday
    * hour) stay quiet: absence there is the norm, not an anomaly.
    *
    * Determinism: hourly counts and the Σx/Σx² moments are exact
    * integers; µ, σ, the µ/σ gate and z0 are pinned single IEEE ops
    * (the q104 argument), THEN 6-decimal rounding.
    *
    * Scale shape: one map-side-combined (type, day, hour) count whose
    * key space is calendar-bounded, a ≤ 7×24×|types| baseline rollup,
    * a GENERATED grid (days × 24 × |types| rows — never a corpus
    * scan), one broadcast join, one anti-join against the bounded slot
    * relation. Row count touches nothing past the first narrow scan. */
  def absenceAudit(spark: SparkSession, dir: String): DataFrame =
    absenceAuditOn(events(spark, dir))

  private[operators] def absenceAuditOn(ev: DataFrame): DataFrame = {
    // Persisted: baseline, span, grid spine, and the anti-join all
    // read this calendar-bounded relation — one corpus scan, not four.
    val slots = graft.core.Caches.persistTracked(ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"),
        hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("cnt")))
    val n = col("n_slots").cast("double")
    val mu = col("s1").cast("double") / n
    val variance = (col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / n) / (n - lit(1.0))
    val sigma = when(col("n_slots") > 1, sqrt(greatest(variance, lit(0.0))))
    val baseline = slots.withColumn("dow", dayofweek(col("day")).cast("long"))
      .groupBy("event_type", "dow", "hod")
      .agg(count(lit(1)).as("n_slots"),
        sum("cnt").as("s1"), sum(col("cnt") * col("cnt")).as("s2"))
      .select(col("event_type"), col("dow"), col("hod"), col("n_slots"),
        mu.as("mu"), sigma.as("sigma"))
    val span = slots.agg(min("day").as("d0"), max("day").as("d1"))
    val grid = slots.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .select(col("event_type"), col("day"),
        explode(sequence(lit(0L), lit(23L))).as("hod"))
      .withColumn("dow", dayofweek(col("day")).cast("long"))
    grid.join(broadcast(baseline), Seq("event_type", "dow", "hod"))
      .where(col("sigma") > 0 && col("mu") / col("sigma") > lit(AnomalyZ))
      .join(slots.select("event_type", "day", "hod"),
        Seq("event_type", "day", "hod"), "left_anti")
      .select(col("event_type"), col("day"), col("hod"), col("n_slots"),
        round(col("mu"), 6).as("mu"), round(col("sigma"), 6).as("sigma"),
        round(-col("mu") / col("sigma"), 6).as("z0"))
  }

  val absenceAuditSql: String =
    s"""WITH sl AS (SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(hour(ts) AS BIGINT) AS hod, count(*) AS cnt
       |  FROM events GROUP BY 1, 2, 3),
       |b AS (SELECT event_type, CAST(dayofweek(day) + 1 AS BIGINT) AS dow, hod,
       |    count(*) AS n_slots, sum(cnt) AS s1, sum(cnt * cnt) AS s2
       |  FROM sl GROUP BY 1, 2, 3),
       |b2 AS (SELECT event_type, dow, hod, n_slots,
       |    CAST(s1 AS DOUBLE) / CAST(n_slots AS DOUBLE) AS mu,
       |    CASE WHEN n_slots > 1 THEN sqrt(greatest(
       |      (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
       |        / CAST(n_slots AS DOUBLE)) / (CAST(n_slots AS DOUBLE) - 1.0), 0.0)) END AS sigma
       |  FROM b),
       |sp AS (SELECT min(day) AS d0, max(day) AS d1 FROM sl),
       |g AS (SELECT t.event_type, d.day, h.hod, CAST(dayofweek(d.day) + 1 AS BIGINT) AS dow
       |  FROM (SELECT DISTINCT event_type FROM sl) t,
       |       (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM sp) d,
       |       (SELECT CAST(unnest(range(24)) AS BIGINT) AS hod) h)
       |SELECT g.event_type, g.day, g.hod, b2.n_slots,
       |  round(mu, 6) AS mu, round(sigma, 6) AS sigma, round(-mu / sigma, 6) AS z0
       |FROM g JOIN b2 ON g.event_type = b2.event_type AND g.dow = b2.dow AND g.hod = b2.hod
       |WHERE sigma > 0 AND mu / sigma > $AnomalyZ
       |  AND NOT EXISTS (SELECT 1 FROM sl
       |    WHERE sl.event_type = g.event_type AND sl.day = g.day AND sl.hod = g.hod)""".stripMargin

  // --------------------------------------- q111 Benford digit audit
  /** Q111: Benford first-digit audit — fabricated or unit-mangled
    * numeric feeds betray themselves in the leading-digit distribution
    * (organic magnitudes follow P(d) = log10(1 + 1/d); a capped RNG or
    * a hand-keyed column doesn't). Per (event_type, digit 1–9):
    * observed count, observed share, the Benford expectation, and the
    * absolute deviation. The digit spine is DENSE — absent digits
    * report 0 observed, full deviation — because "digit 7 never
    * occurs" is precisely the anomaly.
    *
    * The first digit comes from INTEGER arithmetic, not log10 tricks:
    * v6 = round(value·10⁶) (one IEEE multiply + a half-up round — both
    * engines agree on identical doubles), then the first character of
    * v6's decimal string. Values rounding to 0 are excluded with the
    * nulls and negatives (no leading digit to audit).
    *
    * Scale shape: identical to q103 — a narrow scan into a
    * map-side-combined (type, digit) count (≤ 9·|types| keys), a
    * dense-spine broadcast join, broadcast per-type totals. */
  def benford(spark: SparkSession, dir: String): DataFrame =
    benfordOn(events(spark, dir))

  private[operators] def benfordOn(ev: DataFrame): DataFrame = {
    val v6 = round(col("value") * lit(1000000.0)).cast("long")
    // Persisted: spine, dense join, and totals all derive from this
    // <= 9x|types|-row relation -- one corpus scan, not three.
    val counts = graft.core.Caches.persistTracked(ev
      .where(col("value").isNotNull && col("value") > 0)
      .select(col("event_type"), v6.as("v6"))
      .where(col("v6") > 0)
      .select(col("event_type"),
        substring(col("v6").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("event_type", "digit").agg(count(lit(1)).as("n")))
    val spine = counts.select("event_type").distinct()
      .select(col("event_type"), explode(sequence(lit(1L), lit(9L))).as("digit"))
    val dense = spine.join(counts, Seq("event_type", "digit"), "left")
      .select(col("event_type"), col("digit"), coalesce(col("n"), lit(0L)).as("n"))
    val totals = dense.groupBy("event_type").agg(sum("n").as("total"))
    val obs = col("n").cast("double") / col("total").cast("double")
    val expShare = log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
    dense.join(broadcast(totals), "event_type")
      .select(col("event_type"), col("digit"), col("n"),
        round(obs, 6).as("obs_share"),
        round(expShare, 6).as("exp_share"),
        round(abs(obs - expShare), 6).as("abs_dev"))
  }

  val benfordSql: String =
    """WITH v AS (SELECT event_type, CAST(round(value * 1000000.0) AS BIGINT) AS v6
      |  FROM events WHERE value IS NOT NULL AND value > 0),
      |d AS (SELECT event_type,
      |    CAST(substr(CAST(v6 AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM v WHERE v6 > 0),
      |c AS (SELECT event_type, digit, count(*) AS n FROM d GROUP BY 1, 2),
      |spine AS (SELECT t.event_type, g.digit
      |  FROM (SELECT DISTINCT event_type FROM c) t,
      |       (SELECT unnest(range(1, 10)) AS digit) g),
      |dense AS (SELECT s.event_type, s.digit, coalesce(c.n, 0) AS n
      |  FROM spine s LEFT JOIN c ON s.event_type = c.event_type AND s.digit = c.digit),
      |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total FROM dense GROUP BY 1)
      |SELECT d.event_type, d.digit, d.n,
      |  round(CAST(d.n AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS obs_share,
      |  round(log10(1.0 + 1.0 / CAST(d.digit AS DOUBLE)), 6) AS exp_share,
      |  round(abs(CAST(d.n AS DOUBLE) / CAST(t.total AS DOUBLE)
      |    - log10(1.0 + 1.0 / CAST(d.digit AS DOUBLE))), 6) AS abs_dev
      |FROM dense d JOIN tot t USING (event_type)""".stripMargin

  // --------------------------------- q114 chi-square independence
  /** User-bucket fanout for the contingency table. */
  val ChiBuckets = 10

  /** Q114: chi-square independence audit over the (event_type,
    * user-bucket) contingency table — "is behavior independent of the
    * user population slice?" Per cell: observed count, the
    * independence expectation row·col/total, and the cell's χ²
    * contribution (o−e)²/e. A cell whose contribution dominates is
    * WHERE the dependence lives — more actionable than the scalar
    * statistic, which is one `sum` downstream.
    *
    * Determinism: all marginals are exact integers; e and the
    * contribution are pinned IEEE sequences over them (q58's moments
    * argument), rounded to 6 for the report.
    *
    * Scale shape: ONE map-side-combined count over |types|×[[ChiBuckets]]
    * keys; marginals are aggregations OF that bounded relation joined
    * back broadcast. Row count never touches anything after the first
    * narrow scan. */
  def chiSquare(spark: SparkSession, dir: String): DataFrame =
    chiSquareOn(events(spark, dir))

  private[graft] def chiSquareOn(ev: DataFrame): DataFrame = {
    // Persisted: row/col/grand marginals and the final join all read
    // this |types|×[[ChiBuckets]]-row relation — one corpus scan, not four.
    val cells = graft.core.Caches.persistTracked(ev
      .groupBy(col("event_type"),
        pmod(col("user_id"), lit(ChiBuckets.toLong)).as("user_bucket"))
      .agg(count(lit(1)).as("n")))
    val rows = cells.groupBy("event_type").agg(sum("n").as("row_n"))
    val cols = cells.groupBy("user_bucket").agg(sum("n").as("col_n"))
    val total = cells.agg(sum("n").as("total"))
    val e = col("row_n").cast("double") * col("col_n").cast("double") /
      col("total").cast("double")
    val o = col("n").cast("double")
    cells.join(broadcast(rows), "event_type")
      .join(broadcast(cols), "user_bucket")
      .crossJoin(broadcast(total))
      .select(col("event_type"), col("user_bucket"), col("n"),
        round(e, 6).as("expected"),
        round((o - e) * (o - e) / e, 6).as("chi2_contrib"))
  }

  // ((x % N) + N) % N: DuckDB's % is signed (a negative user_id would
  // bucket negative) while the Spark path uses pmod — the double-mod
  // keeps oracle parity over ANY id domain, not just nonnegative ones.
  val chiSquareSql: String =
    s"""WITH cells AS (SELECT event_type,
       |    ((user_id % $ChiBuckets) + $ChiBuckets) % $ChiBuckets AS user_bucket, count(*) AS n
       |  FROM events GROUP BY 1, 2),
       |r AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS row_n FROM cells GROUP BY 1),
       |c AS (SELECT user_bucket, CAST(sum(n) AS BIGINT) AS col_n FROM cells GROUP BY 1),
       |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cells)
       |SELECT cells.event_type, cells.user_bucket, cells.n,
       |  round(CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(total AS DOUBLE), 6)
       |    AS expected,
       |  round((CAST(n AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(total AS DOUBLE))
       |      * (CAST(n AS DOUBLE) - CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(total AS DOUBLE))
       |      / (CAST(row_n AS DOUBLE) * CAST(col_n AS DOUBLE) / CAST(total AS DOUBLE)), 6)
       |    AS chi2_contrib
       |FROM cells JOIN r USING (event_type) JOIN c USING (user_bucket) CROSS JOIN t""".stripMargin

  // ------------------------------------------ q116 Welch t readout
  /** Q116: Welch's t between the corpus window's halves, per event_type
    * — the experiment-readout shape ("did mean value move?") with the
    * unequal-variance statistic, reusing q103's split-day convention so
    * the two audits describe the same periods. Means and variances come
    * from exact DECIMAL moments (Σv, Σv² — the v² multiply is one IEEE
    * op before the exact sum); t = (m₁−m₂)/√(s₁²/n₁+s₂²/n₂) is then a
    * pinned op sequence, rounded to 6. Degenerate sides (n ≤ 1 or both
    * variances 0) yield NULL t rather than a division blow-up.
    *
    * Scale shape: ONE map-side-combined aggregation over
    * (type, period) — |types|×2 keys — after the broadcast split-day
    * join; the t math happens on the tiny joined relation. */
  def welchT(spark: SparkSession, dir: String): DataFrame =
    welchTOn(events(spark, dir))

  private[graft] def welchTOn(ev: DataFrame): DataFrame = {
    val base = ev.where(col("value").isNotNull)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("value"))
    val split = base.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(date_add(col("d0"),
        (datediff(col("d1"), col("d0")) / lit(2)).cast("int")).as("split_day"))
    // Persisted: both self-join sides read this |types|×2-row relation
    // — one corpus scan, not two.
    val moments = graft.core.Caches.persistTracked(base.crossJoin(broadcast(split))
      .select(col("event_type"),
        when(col("day") < col("split_day"), lit("base")).otherwise(lit("cur")).as("period"),
        col("value"))
      .groupBy("event_type", "period")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,12)")).cast("double").as("s1"),
        sum((col("value") * col("value")).cast("decimal(28,12)")).cast("double").as("s2")))
    def m(side: String) = col(s"$side.s1") / col(s"$side.n").cast("double")
    // greatest(_, 0): float dust can push the moment-form variance of a
    // near-constant side slightly negative → sqrt NaN, and NaN > 0 is
    // TRUE in both engines, so without the clamp t_stat would report
    // NaN instead of the intended NULL degenerate-side behavior
    // (mirrors q104's seasonalAnomaly clamp).
    def v(side: String) = greatest((col(s"$side.s2") -
      col(s"$side.s1") * col(s"$side.s1") / col(s"$side.n").cast("double")) /
      (col(s"$side.n").cast("double") - lit(1.0)), lit(0.0))
    val denom = sqrt(v("a") / col("a.n").cast("double") + v("b") / col("b.n").cast("double"))
    moments.where(col("period") === "base").as("a")
      .join(moments.where(col("period") === "cur").as("b"),
        col("a.event_type") === col("b.event_type"))
      .select(col("a.event_type").as("event_type"),
        col("a.n").as("n_base"), col("b.n").as("n_cur"),
        round(m("a"), 6).as("mean_base"), round(m("b"), 6).as("mean_cur"),
        round(when(col("a.n") > 1 && col("b.n") > 1 && denom > 0,
          (m("a") - m("b")) / denom), 6).as("t_stat"))
  }

  val welchTSql: String =
    """WITH base AS (SELECT event_type, CAST(ts AS DATE) AS day, value
      |    FROM events WHERE value IS NOT NULL),
      |sp AS (SELECT min(day) + CAST(date_diff('day', min(day), max(day)) // 2 AS INTEGER)
      |    AS split_day FROM base),
      |mo AS (SELECT event_type,
      |    CASE WHEN day < split_day THEN 'base' ELSE 'cur' END AS period,
      |    count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(28,12))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(value * value AS DECIMAL(28,12))) AS DOUBLE) AS s2
      |  FROM base CROSS JOIN sp GROUP BY 1, 2),
      |j AS (SELECT a.event_type, a.n AS n_base, b.n AS n_cur,
      |    a.s1 / CAST(a.n AS DOUBLE) AS m1, b.s1 / CAST(b.n AS DOUBLE) AS m2,
      |    greatest((a.s2 - a.s1 * a.s1 / CAST(a.n AS DOUBLE)) / (CAST(a.n AS DOUBLE) - 1.0), 0.0) AS v1,
      |    greatest((b.s2 - b.s1 * b.s1 / CAST(b.n AS DOUBLE)) / (CAST(b.n AS DOUBLE) - 1.0), 0.0) AS v2
      |  FROM mo a JOIN mo b ON a.event_type = b.event_type
      |  WHERE a.period = 'base' AND b.period = 'cur')
      |SELECT event_type, n_base, n_cur,
      |  round(m1, 6) AS mean_base, round(m2, 6) AS mean_cur,
      |  round(CASE WHEN n_base > 1 AND n_cur > 1
      |      AND sqrt(v1 / CAST(n_base AS DOUBLE) + v2 / CAST(n_cur AS DOUBLE)) > 0
      |    THEN (m1 - m2) / sqrt(v1 / CAST(n_base AS DOUBLE) + v2 / CAST(n_cur AS DOUBLE))
      |    END, 6) AS t_stat
      |FROM j""".stripMargin

  // ------------------------------------- q135 per-source KL divergence
  /** Q135: KL divergence of each source's unigram distribution from the
    * corpus-wide distribution — the mixture-drift audit for a corpus
    * assembled from many feeds: a source whose KL jumps is emitting
    * text unlike the rest of the mix (scraper breakage, language shift,
    * template flood) and PSI (q103, numeric) can't see it because the
    * signal lives in the token distribution. KL(source ‖ corpus) needs
    * no smoothing by construction: every token a source emits is in the
    * corpus distribution, so q(tok) > 0 wherever p(tok) > 0.
    *
    * Scale: one explode + one (source, token) count — map-side combined,
    * vocabulary-bounded keys — then joins against the three marginals
    * derived from that same persisted relation (per-source totals and
    * the 1-row corpus total broadcast; the per-token marginal a
    * vocab-bounded shuffle join). Each ln term is cast DECIMAL(28,12)
    * before the per-source sum, the q103 portability contract. */
  def q135KlPerSource(spark: SparkSession, dir: String): DataFrame =
    klPerSourceOn(Tables(spark, dir, "documents"))

  private[graft] def klPerSourceOn(docRel: DataFrame): DataFrame = {
    val tok = docRel
      .select(col("source"), explode(graft.functions.TextExprs.tokens(col("text"))).as("tok"))
    // Persisted: the three marginals below all derive from this
    // |sources|×|vocab|-bounded relation — left lazy, each re-explodes
    // the corpus.
    val st = graft.core.Caches.persistTracked(
      tok.groupBy("source", "tok").agg(count(lit(1)).as("c_st")))
    val srcTot = st.groupBy("source").agg(sum("c_st").as("t_s"))
    val tokTot = st.groupBy("tok").agg(sum("c_st").as("c_t"))
    val tot = st.agg(sum("c_st").as("t"))
    val ps = col("c_st").cast("double") / col("t_s").cast("double")
    val pg = col("c_t").cast("double") / col("t").cast("double")
    st.join(broadcast(srcTot), "source")
      .join(tokTot, "tok")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("t_s"),
        (ps * log(ps / pg)).cast("decimal(28,12)").as("term"))
      .groupBy("source", "t_s")
      .agg(round(sum(col("term")).cast("double"), 6).as("kl"))
      .select(col("source"), col("t_s").as("n_tokens"), col("kl"))
  }

  val q135Sql: String =
    """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
      |st AS (SELECT source, tok, count(*) AS c_st FROM tok GROUP BY 1, 2),
      |ts AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS t_s FROM st GROUP BY 1),
      |g AS (SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY 1),
      |tot AS (SELECT CAST(sum(c_st) AS BIGINT) AS t FROM st)
      |SELECT st.source, ts.t_s AS n_tokens,
      |  round(CAST(sum(CAST(
      |      (CAST(c_st AS DOUBLE) / CAST(t_s AS DOUBLE))
      |      * ln((CAST(c_st AS DOUBLE) / CAST(t_s AS DOUBLE))
      |        / (CAST(c_t AS DOUBLE) / CAST(t AS DOUBLE)))
      |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS kl
      |FROM st JOIN ts USING (source) JOIN g USING (tok) CROSS JOIN tot
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------- q140 Cohen's kappa agreement
  /** Q140: chance-corrected agreement (Cohen's kappa) between the q23
    * lang-id heuristic and the labeled truth, binarized en/other — the
    * metric that exposes what raw accuracy hides on an imbalanced
    * corpus: a classifier that always answers the majority class gets
    * high p_o but κ ≈ 0, because p_e (the agreement two independent
    * raters with these marginals would reach by luck) is subtracted
    * out. κ = (p_o − p_e)/(1 − p_e); one row: (n, p_o, p_e, kappa).
    *
    * Scale: the corpus collapses in ONE aggregation to the ≤4-cell
    * confusion relation (persisted; marginals, totals, and the readout
    * all derive from it) — every later step is arithmetic over bounded
    * keys. All numerators stay exact integers until the final
    * correctly-rounded IEEE divisions, so no decimal scaffolding is
    * even needed. */
  def q140Kappa(spark: SparkSession, dir: String): DataFrame =
    kappaOf(TextQueries.langId(spark, dir)
      .select(col("lang_pred").as("pred"),
        when(col("lang") === "en", lit("en")).otherwise(lit("other")).as("truth")))

  /** Cohen's kappa over any (pred, truth) relation. */
  private[graft] def kappaOf(predTruth: DataFrame): DataFrame = {
    val cells = graft.core.Caches.persistTracked(
      predTruth.groupBy("pred", "truth").agg(count(lit(1)).as("c")))
    val predTot = cells.groupBy("pred").agg(sum("c").as("pt"))
      .withColumnRenamed("pred", "cls")
    val truthTot = cells.groupBy("truth").agg(sum("c").as("tt"))
      .withColumnRenamed("truth", "cls")
    val peNum = predTot.join(truthTot, Seq("cls"), "full")
      .agg(sum(coalesce(col("pt"), lit(0L)) * coalesce(col("tt"), lit(0L))).as("pe_num"))
    val tot = cells.agg(sum("c").as("n"),
      sum(when(col("pred") === col("truth"), col("c")).otherwise(lit(0L))).as("agree"))
    val nD = col("n").cast("double")
    val po = col("agree").cast("double") / nD
    val pe = col("pe_num").cast("double") / (nD * nD)
    tot.crossJoin(broadcast(peNum))
      .select(col("n"), round(po, 6).as("p_o"), round(pe, 6).as("p_e"),
        round(when(pe < 1.0, (po - pe) / (lit(1.0) - pe)), 6).as("kappa"))
  }

  val q140Sql: String =
    """WITH b AS (SELECT lang, text, string_split(text, ' ') AS w FROM documents),
      |m AS (SELECT CASE WHEN lang = 'en' THEN 'en' ELSE 'other' END AS truth,
      |    CASE WHEN len(list_filter(w, x -> x IN ('the', 'a'))) * 1.0 / len(w) >= 0.05
      |          AND (len(text) - len(replace(text, ' th', ''))) * 1.0 / len(text) >= 0.01
      |      THEN 'en' ELSE 'other' END AS pred
      |  FROM b),
      |cells AS (SELECT pred, truth, count(*) AS c FROM m GROUP BY 1, 2),
      |pt AS (SELECT pred AS cls, CAST(sum(c) AS BIGINT) AS pt FROM cells GROUP BY 1),
      |tt AS (SELECT truth AS cls, CAST(sum(c) AS BIGINT) AS tt FROM cells GROUP BY 1),
      |pe AS (SELECT CAST(sum(coalesce(pt, 0) * coalesce(tt, 0)) AS BIGINT) AS pe_num
      |  FROM pt FULL JOIN tt USING (cls)),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN pred = truth THEN c ELSE 0 END) AS BIGINT) AS agree
      |  FROM cells)
      |SELECT n,
      |  round(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_o,
      |  round(CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS p_e,
      |  round(CASE WHEN CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0
      |    THEN (CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
      |        - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      |      / (1.0 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) END, 6) AS kappa
      |FROM tot CROSS JOIN pe""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q103_psi_drift" -> psiDrift _,
    "q135_kl_source" -> q135KlPerSource _,
    "q140_kappa" -> q140Kappa _,
    "q104_seasonal_anomaly" -> seasonalAnomaly _,
    "q111_benford" -> benford _,
    "q114_chi_square" -> chiSquare _,
    "q116_welch_t" -> welchT _,
    "q121_absence_audit" -> absenceAudit _)

  val oracles: Map[String, String] = Map(
    "q103_psi_drift" -> psiDriftSql,
    "q135_kl_source" -> q135Sql,
    "q140_kappa" -> q140Sql,
    "q104_seasonal_anomaly" -> seasonalAnomalySql,
    "q111_benford" -> benfordSql,
    "q114_chi_square" -> chiSquareSql,
    "q116_welch_t" -> welchTSql,
    "q121_absence_audit" -> absenceAuditSql)
}
