package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Sessionization + multi-level aggregation extensions.
  *
  * q28 exercises Spark's native `session_window` (gap-merged event
  * sessions per device — the IoT sessionization shape SURVEY §2.6 points
  * at); the oracle reproduces the same semantics in portable SQL via
  * gaps-and-islands (lag + cumulative flag sum), which is also the
  * proof the two formulations agree. Boundary semantics: Spark merges
  * sessions whose [ts, ts+gap] spans TOUCH — two events exactly 30:00
  * apart are ONE session — so the oracle's island predicate is
  * `<= INTERVAL 30 MINUTE`, inclusive (verified empirically and pinned
  * by SessionSpec's boundary fixture; a strict `<` would be a latent
  * parity break on boundary-aligned data).
  *
  * q29 exercises ROLLUP (multi-level grouped aggregation) — absent from
  * the reference but part of the standard relational surface the
  * extension mandate requires.
  */
object SessionQueries {

  private val GapMinutes = 30

  /** Q28: 30-minute-gap sessions per user over `events`: session start,
    * end (last event + gap), and event count. */
  def q28SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(session_window(col("ts"), s"$GapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").cast("timestamp_ntz").as("session_start"),
        col("session_window.end").cast("timestamp_ntz").as("session_end"),
        col("n_events"))

  val q28Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, ts,
       |    CASE WHEN ts - lag(ts) OVER w <= INTERVAL $GapMinutes MINUTE THEN 0 ELSE 1 END AS new_session
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       |s AS (SELECT user_id, ts,
       |        sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |      FROM e)
       |SELECT user_id, min(ts) AS session_start,
       |  max(ts) + INTERVAL $GapMinutes MINUTE AS session_end,
       |  count(*) AS n_events
       |FROM s GROUP BY user_id, sid""".stripMargin

  /** Q29: rollup over (event_type, user-bucket): per-cell, per-type, and
    * grand-total aggregates in one pass. */
  def q29Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("user_bucket", pmod(col("user_id"), lit(10)))
      .rollup("event_type", "user_bucket")
      .agg(
        count(lit(1)).as("n"),
        CoreQueries.decSum(col("value")).as("sum_value"))

  val q29Sql: String =
    """SELECT event_type, user_id % 10 AS user_bucket, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY ROLLUP (event_type, user_bucket)""".stripMargin

  // -------------------------------------- q110 Markov transitions
  /** Q110: first-order Markov transition matrix over each user's event
    * stream — P(next event_type | current event_type), the behavioral
    * model behind "what do users do after an error?" dashboards and
    * next-event features. Streams order by (ts, event_id) — the unique
    * id breaks timestamp ties, so the pairing is deterministic at any
    * partitioning. Probabilities are per-from-state shares: n /
    * Σ_to n, one pinned IEEE division over exact integer counts.
    *
    * Scale shape: ONE shuffle by user_id for the lag window (per-user
    * partitions sort only their own events), a map-side-combined count
    * whose key space is |types|² (bounded), and a broadcast join of
    * the |types|-row totals. The window never sees a global sort. */
  def q110Transitions(spark: SparkSession, dir: String): DataFrame =
    transitionsOn(Tables(spark, dir, "events"))

  private[graft] def transitionsOn(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // Persisted: the totals rollup and the final join both read this
    // |types|²-row relation — one window+scan pass, not two.
    val counts = graft.core.Caches.persistTracked(ev
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n")))
    val totals = counts.groupBy("from_type").agg(sum("n").as("from_total"))
    counts.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("from_total").cast("double"), 6).as("p"))
  }

  val q110Sql: String =
    """WITH s AS (SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      |  FROM events),
      |c AS (SELECT from_type, event_type AS to_type, count(*) AS n
      |  FROM s WHERE from_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS from_total FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, c.n,
      |  round(CAST(c.n AS DOUBLE) / CAST(t.from_total AS DOUBLE), 6) AS p
      |FROM c JOIN t USING (from_type)""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_session_window" -> q28SessionWindow _,
    "q29_rollup" -> q29Rollup _,
    "q110_transitions" -> q110Transitions _)

  val oracles: Map[String, String] = Map(
    "q28_session_window" -> q28Sql,
    "q110_transitions" -> q110Sql,
    "q29_rollup" -> q29Sql)
}
