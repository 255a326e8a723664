package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Ordered-sequence analytics over the event stream — the funnel and
  * cohort-retention queries every product dashboard runs, and the shape
  * the reference's Streamlit panels point toward (event correlation by
  * user and time).
  *
  * Both queries aggregate to per-user milestones FIRST (uniform
  * `user_id` keys, map-side combine) and join/aggregate the small
  * milestone relations after — events are scanned once, nothing
  * user-level ever re-shuffles by event. Timestamps compare as
  * microsecond longs (`unix_micros`), the engine-portable form the
  * oracle parity playbook prescribes.
  */
object FunnelQueries {

  private def ev(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")

  private def us(c: org.apache.spark.sql.Column) =
    unix_micros(c.cast("timestamp"))

  // ------------------------------------------------------- q66 funnel
  /** Q66: strictly-ordered funnel signup → click → purchase. A step
    * counts only if it happens STRICTLY AFTER the user's previous step
    * (first qualifying occurrence each time — the standard "ordered
    * funnel" semantics, not mere set-membership, which would count a
    * purchase that preceded the signup). Output: one row per step with
    * the surviving-user count — monotone non-increasing. */
  def q66Funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    def firstOf(tpe: String) = e.where(col("event_type") === tpe)
      .select(col("user_id"), us(col("ts")).as("t"))
    val s1 = firstOf("signup").groupBy("user_id").agg(min("t").as("t1"))
    val s2 = firstOf("click").join(s1, "user_id").where(col("t") > col("t1"))
      .groupBy("user_id").agg(min("t").as("t2"))
    val s3 = firstOf("purchase").join(s2, "user_id").where(col("t") > col("t2"))
      .groupBy("user_id").agg(min("t").as("t3"))
    val counts = Seq(
      ("1_signup", s1), ("2_click", s2), ("3_purchase", s3)).map { case (name, d) =>
      d.agg(count(lit(1)).as("n_users")).select(lit(name).as("step"), col("n_users"))
    }
    counts.reduce(_ unionByName _)
  }

  val q66Sql: String =
    """WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      |    WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(epoch_us(ts)) AS t2 FROM events e JOIN s1 USING (user_id)
      |    WHERE event_type = 'click' AND epoch_us(ts) > t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(epoch_us(ts)) AS t3 FROM events e JOIN s2 USING (user_id)
      |    WHERE event_type = 'purchase' AND epoch_us(ts) > t2 GROUP BY 1)
      |SELECT '1_signup' AS step, count(*) AS n_users FROM s1
      |UNION ALL SELECT '2_click', count(*) FROM s2
      |UNION ALL SELECT '3_purchase', count(*) FROM s3""".stripMargin

  // ---------------------------------------------------- q67 retention
  /** Q67: cohort retention — users grouped by first-seen day, counted
    * on each later active day as (cohort_day, day_offset, n_users).
    * Two uniform aggregations: per-user first day, then per-user-day
    * activity joined back — the |users| relation shuffles, never raw
    * events twice. */
  def q67Retention(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val activity = e.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohorts = activity.groupBy("user_id").agg(min("day").as("cohort_day"))
    activity.join(cohorts, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  val q67Sql: String =
    """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1)
      |SELECT cohort_day, CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
      |  count(*) AS n_users
      |FROM a JOIN c USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------- q120 time-to-convert
  /** Q120: cohort time-to-convert — for each signup-month cohort, how
    * many signups convert to a purchase (strictly after the signup,
    * q66's ordered-funnel rule) and how LONG conversion takes (exact
    * interpolated p50/p90 of the latency, in seconds). The question
    * product teams actually ask of a funnel: not just "how many", but
    * "how fast, and is it drifting by cohort".
    *
    * Cohorts with zero conversions keep their row (rate 0, NULL
    * latencies) — silently dropping them would hide the worst cohorts.
    *
    * Determinism: latencies are exact microsecond longs; the one
    * interpolated step is `percentile` vs `quantile_cont` (the q35
    * parity pair) followed by one pinned division and 6-decimal
    * rounding.
    *
    * Scale shape: q66's — per-user milestone aggregations on uniform
    * keys, then everything downstream runs on |users|- and
    * |cohorts|-sized relations; events scan twice (signup pass,
    * purchase pass), never re-shuffle. */
  def q120TimeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val e = ev(spark, dir)
    val s1 = e.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min(us(col("ts"))).as("t1"))
      .withColumn("cohort", date_format(timestamp_micros(col("t1")), "yyyy-MM"))
    val sc = s1.groupBy("cohort").agg(count(lit(1)).as("n_signups"))
    val conv = e.where(col("event_type") === "purchase")
      .select(col("user_id"), us(col("ts")).as("t"))
      .join(s1, "user_id").where(col("t") > col("t1"))
      .groupBy("user_id", "t1", "cohort").agg(min("t").as("tp"))
    val cc = conv.withColumn("lat", col("tp") - col("t1"))
      .groupBy("cohort").agg(count(lit(1)).as("n_converted"),
        round(expr("percentile(lat, 0.5)") / lit(1000000.0), 6).as("p50_sec"),
        round(expr("percentile(lat, 0.9)") / lit(1000000.0), 6).as("p90_sec"))
    sc.join(cc, Seq("cohort"), "left")
      .select(col("cohort"), col("n_signups"),
        coalesce(col("n_converted"), lit(0L)).as("n_converted"),
        round(coalesce(col("n_converted"), lit(0L)).cast("double")
          / col("n_signups").cast("double"), 6).as("conv_rate"),
        col("p50_sec"), col("p90_sec"))
  }

  val q120Sql: String =
    """WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      |    WHERE event_type = 'signup' GROUP BY 1),
      |s1c AS (SELECT user_id, t1, strftime(make_timestamp(t1), '%Y-%m') AS cohort FROM s1),
      |sc AS (SELECT cohort, count(*) AS n_signups FROM s1c GROUP BY 1),
      |cv AS (SELECT e.user_id, s.cohort, s.t1, min(epoch_us(e.ts)) AS tp
      |  FROM events e JOIN s1c s USING (user_id)
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.t1
      |  GROUP BY 1, 2, 3),
      |cc AS (SELECT cohort, count(*) AS n_converted,
      |    round(quantile_cont(tp - t1, 0.5) / 1000000.0, 6) AS p50_sec,
      |    round(quantile_cont(tp - t1, 0.9) / 1000000.0, 6) AS p90_sec
      |  FROM cv GROUP BY 1)
      |SELECT sc.cohort, sc.n_signups,
      |  coalesce(cc.n_converted, 0) AS n_converted,
      |  round(CAST(coalesce(cc.n_converted, 0) AS DOUBLE)
      |    / CAST(sc.n_signups AS DOUBLE), 6) AS conv_rate,
      |  cc.p50_sec, cc.p90_sec
      |FROM sc LEFT JOIN cc USING (cohort)""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q120_time_to_convert" -> q120TimeToConvert _,
    "q66_funnel" -> q66Funnel _,
    "q67_retention" -> q67Retention _)

  val oracles: Map[String, String] = Map(
    "q66_funnel" -> q66Sql,
    "q120_time_to_convert" -> q120Sql,
    "q67_retention" -> q67Sql)
}
