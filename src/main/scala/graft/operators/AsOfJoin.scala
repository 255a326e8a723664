package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** As-of join — align each left event with the most recent right event
  * at or before it, per key (SURVEY §2.4's theta/range extension row:
  * "as-of sensor alignment … via window + last(ignoreNulls)").
  *
  * Implementation is the scalable union trick, not a range join: tag
  * both sides, union them, and take `last(right, ignoreNulls)` over a
  * (key, time)-ordered running window. One shuffle on the key, linear
  * in |L|+|R| — a naive `l.ts >= r.ts` theta join is |L|×|R| per key
  * and melts at skewed keys, which is exactly what 500 devices × 1 Hz
  * telemetry produces.
  */
object AsOfJoin {

  /** For every row of `left`, attach `rightVals` from the latest `right`
    * row with `right.time <= left.time` and equal `key`. Left rows
    * without a match keep nulls (left-join semantics).
    *
    * `right` must be unique per (key, time) — pre-deduplicate if not, or
    * the "latest" row at a timestamp is undefined.
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      time: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // The right row travels as ONE struct so the running last() picks a
    // whole row atomically — per-column fills would tear values from
    // different right rows whenever a matched row holds a NULL member.
    // NULL join keys never match (SQL equality semantics): null-key
    // right rows carry a null struct (donate nothing) and null-key left
    // rows are masked after the fill.
    // tag=1 left, tag=0 right: at equal timestamps the right row sorts
    // first, so `l.time >= r.time` includes same-instant matches.
    val rightStruct = when(col(key).isNotNull,
      struct(rightVals.map(col): _*)).otherwise(lit(null))
    val taggedLeft = left
      .withColumn("__tag", lit(1))
      .withColumn("__r", lit(null).cast(right.select(rightVals.map(col): _*).schema))
    val taggedRight = leftCols.foldLeft(
      right
        // A null-TIME right row can never satisfy `right.time <= left.time`
        // (SQL: NULL <= x is never true), but unfiltered it would sort
        // nulls-first and donate its values to EVERY left row of its key.
        // Null-time LEFT rows need no special arm: with these rows gone,
        // nothing precedes them in the nulls-first order, so they keep
        // nulls — exactly the oracle's no-match result.
        .where(col(time).isNotNull)
        .withColumn("__r", rightStruct)
        .select(col(key), col(time), col("__r"))
        .withColumn("__tag", lit(0))) {
      (d, c) => if (d.columns.contains(c)) d else d.withColumn(c, lit(null))
    }

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned.withColumn("__r",
      when(col(key).isNotNull, last(col("__r"), ignoreNulls = true).over(w))
        .otherwise(lit(null)))
    filled.where(col("__tag") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(c => col(s"__r.$c").as(s"r_$c")): _*)
  }

  /** Q27: for each purchase event, the most recent click by the same
    * user at or before it — classic session attribution, and the
    * declared-query reification of the as-of operator. */
  def q27AsOf(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "value")
    // dedupe right to one row per (user, ts) so "latest" is well-defined
    val clickW = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("event_id"))
    val clicks = ev.where(col("event_type") === "click")
      .withColumn("__rn", row_number().over(clickW)).where(col("__rn") === 1)
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"), col("value").as("click_value"))
    asof(purchases, clicks, "user_id", "ts", Seq("click_id", "click_value"))
  }

  val q27Sql: String =
    """WITH p AS (SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase'),
      |c0 AS (SELECT user_id, ts, event_id AS click_id, value AS click_value,
      |         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
      |       FROM events WHERE event_type = 'click'),
      |c AS (SELECT user_id, ts, click_id, click_value FROM c0 WHERE rn = 1)
      |SELECT p.event_id, p.ts, p.user_id, p.value,
      |       c.click_id AS r_click_id, c.click_value AS r_click_value
      |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  /** Q102: q27's exact semantics through the NATIVE as-of operator
    * ([[graft.plans.AsOfJoinNative]] — custom logical node + strategy +
    * sorted-merge SparkPlan) instead of the union+window composition.
    * Same oracle as q27, so the correctness gate pins the two
    * implementations AND DuckDB's `ASOF JOIN` to identical results. */
  def q102AsOfNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "value")
    val clickW = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("event_id"))
    val clicks = ev.where(col("event_type") === "click")
      .withColumn("__rn", row_number().over(clickW)).where(col("__rn") === 1)
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
        col("value").as("click_value"))
    graft.plans.AsOfJoinNative.asof(
      purchases, clicks, "user_id", "ts", Seq("click_id", "click_value"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q27_asof_join" -> q27AsOf _,
    "q102_asof_native" -> q102AsOfNative _)

  val oracles: Map[String, String] = Map(
    "q27_asof_join" -> q27Sql,
    "q102_asof_native" -> q27Sql)
}
