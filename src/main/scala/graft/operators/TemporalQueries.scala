package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    val daily = e.where(col("event_type") === "purchase")
      .groupBy(pmod(col("user_id"), lit(SeriesBuckets.toLong)).as("series_id"),
        to_date(col("ts")).as("day"))
      .agg(CoreQueries.decSum(col("value")).as("obs_revenue"))
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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q69_gapfill" -> q69GapFill _)

  val oracles: Map[String, String] = Map(
    "q69_gapfill" -> q69Sql)
}
