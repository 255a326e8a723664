package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.functions.{CleanExprs, TimeExprs}

/** Declared correctness-contract queries Q1–Q15 (SURVEY.md §2.11).
  *
  * Q1–Q9 reify the reference's own operators (scan/filter/project,
  * epoch normalization, tumbling window, distinct, sentinel cleanup,
  * key parsing, count gates, top-N, partition round-trip); Q10–Q15 cover
  * the standard relational surface (joins, semi/anti, drifted union,
  * grouped agg, analytic window, dedup/distinct).
  *
  * Determinism note: every floating-point aggregate goes through
  * [[decSum]] — sum over `DECIMAL(18,6)` then cast back to double — so
  * the result is independent of partition/merge order and bit-identical
  * to the DuckDB oracle, with no rounding-tolerance hacks.
  */
object CoreQueries {

  /** Order-insensitive exact double aggregation — see
    * [[graft.functions.AggExprs]]. */
  def decSum(c: Column): Column = graft.functions.AggExprs.decSum(c)

  /** Deterministic mean built from the exact sum. */
  def decAvg(c: Column): Column = graft.functions.AggExprs.decAvg(c)

  // ---------------------------------------------------------------- Q1
  /** Partition-prunable scan: narrow projection + IN-list + date equality
    * (reference `streamlit-app.py:79-86`). */
  def q01ScanFilter(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .where(col("event_type").isin("error", "purchase") &&
        to_date(col("ts")) === lit("2024-01-01"))
      .select("event_id", "ts", "user_id", "event_type")

  val q01Sql: String =
    """SELECT event_id, ts, user_id, event_type FROM events
      |WHERE event_type IN ('error','purchase') AND CAST(ts AS DATE) = DATE '2024-01-01'""".stripMargin

  // ---------------------------------------------------------------- Q2
  /** Mixed-precision epoch normalization (reference
    * `gzip-to-parquet-etl.py:228-243`): synthesize s/ms/µs/ns epochs from
    * `events.ts`, normalize back, derive WITA timestamp + partition date. */
  def q02EpochNorm(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts").cast("timestamp")).as("us"))
    val raw = base.withColumn("epoch_raw",
      when(pmod(col("event_id"), lit(4)) === 0, call_function("div", col("us"), lit(1000000L)))
        .when(pmod(col("event_id"), lit(4)) === 1, call_function("div", col("us"), lit(1000L)))
        .when(pmod(col("event_id"), lit(4)) === 2, col("us"))
        .otherwise(col("us") * 1000L))
    val norm = TimeExprs.normalizeEpoch(col("epoch_raw"))
    raw.select(
      col("event_id"),
      col("epoch_raw"),
      norm.cast("timestamp_ntz").as("norm_ts"),
      TimeExprs.toWita(norm).cast("timestamp_ntz").as("datetime_wita"),
      to_date(TimeExprs.toWita(norm)).as("hiveperiod"))
  }

  val q02Sql: String =
    """WITH base AS (SELECT event_id, epoch_us(ts) AS us FROM events),
      |r AS (SELECT event_id,
      |  CASE event_id % 4 WHEN 0 THEN us // 1000000 WHEN 1 THEN us // 1000
      |                    WHEN 2 THEN us ELSE us * 1000 END AS epoch_raw FROM base),
      |n AS (SELECT event_id, epoch_raw,
      |  CASE WHEN epoch_raw < 10000000000 THEN epoch_raw * 1000000
      |       WHEN epoch_raw < 10000000000000 THEN epoch_raw * 1000
      |       WHEN epoch_raw < 10000000000000000 THEN epoch_raw
      |       ELSE epoch_raw // 1000 END AS nus FROM r)
      |SELECT event_id, epoch_raw, make_timestamp(nus) AS norm_ts,
      |  make_timestamp(nus) + INTERVAL 8 HOUR AS datetime_wita,
      |  CAST(make_timestamp(nus) + INTERVAL 8 HOUR AS DATE) AS hiveperiod FROM n""".stripMargin

  // ---------------------------------------------------------------- Q3
  /** The flagship analytic: 1-minute tumbling-window aggregation per unit
    * (reference `streamlit-app.py:155-169` `group_by_dynamic`), with the
    * string-min "any-bad-status-wins" semantics (SURVEY §2.5 A5). */
  def q03WindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy(window(col("ts"), "1 minute"), col("user_id"))
      .agg(
        decAvg(col("value")).as("avg_value"),
        min(col("event_type")).as("min_event_type"),
        count(lit(1)).as("n"))
      .select(col("window.start").cast("timestamp_ntz").as("minute"),
        col("user_id"), col("avg_value"), col("min_event_type"), col("n"))

  val q03Sql: String =
    """SELECT date_trunc('minute', ts) AS minute, user_id,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(value) AS avg_value,
      |  min(event_type) AS min_event_type, count(*) AS n
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- Q4
  /** DISTINCT projection (reference `streamlit-app.py:58-63` unit picker). */
  def q04Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events").select("user_id", "event_type").distinct()

  val q04Sql: String = "SELECT DISTINCT user_id, event_type FROM events"

  // ---------------------------------------------------------------- Q5
  /** Sentinel replacement + conditional status flag (reference
    * `streamlit-app.py:143-149`). */
  def q05Sentinel(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events").select(
      col("event_id"),
      CleanExprs.replaceSentinel(col("value")).as("value_clean"),
      when(col("value") < 50.0, lit("false")).otherwise(lit("true")).as("flag"))

  val q05Sql: String =
    """SELECT event_id, CASE WHEN value = -9999 THEN -1 ELSE value END AS value_clean,
      |  CASE WHEN value < 50 THEN 'false' ELSE 'true' END AS flag FROM events""".stripMargin

  // ---------------------------------------------------------------- Q6
  /** Key parsing: split path into fields, strip `hiveperiod=` prefix,
    * range-filter (reference `data-cleaner.py:127-142`), plus numeric
    * extraction from the raw props payload. */
  def q06SplitParse(spark: SparkSession, dir: String): DataFrame = {
    val keyed = Tables(spark, dir, "events")
      .withColumn("key", concat_ws("/", lit("site1"),
        concat(lit("hiveperiod="), to_date(col("ts")).cast("string")),
        concat(lit("dstrct_code=D"), pmod(col("user_id"), lit(3)).cast("string")),
        concat(col("event_id").cast("string"), lit(".gz"))))
      .withColumn("p", CleanExprs.parseKey(col("key")))
      .withColumn("k", regexp_extract(col("props"), "[0-9]+", 0).cast("long"))
    keyed.select(
      col("event_id"),
      col("p.hiveperiod").as("hiveperiod"),
      col("p.dstrct_code").as("dstrct_code"),
      col("p.filename").as("filename"),
      col("k"))
      .where(col("k").between(10, 50) && col("hiveperiod") >= "2024-01-01")
  }

  val q06Sql: String =
    """WITH k AS (SELECT event_id, props,
      |  'site1/hiveperiod=' || CAST(CAST(ts AS DATE) AS VARCHAR) || '/dstrct_code=D' ||
      |  (user_id % 3) || '/' || event_id || '.gz' AS key FROM events),
      |p AS (SELECT event_id, string_split(key, '/') AS parts,
      |  CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS k FROM k)
      |SELECT event_id, regexp_replace(parts[2], '^hiveperiod=', '') AS hiveperiod,
      |  regexp_replace(parts[3], '^dstrct_code=', '') AS dstrct_code,
      |  parts[4] AS filename, k FROM p
      |WHERE k BETWEEN 10 AND 50 AND regexp_replace(parts[2], '^hiveperiod=', '') >= '2024-01-01'""".stripMargin

  // ---------------------------------------------------------------- Q7
  /** Count gates per group (reference zero-row gate
    * `gzip-to-parquet-etl.py:252-257` generalized to a grouped audit). */
  def q07CountGate(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value") > 100.0, 1L).otherwise(0L)).as("n_high"))

  val q07Sql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- Q8
  /** Top-N most recent with deterministic tie-break (reference
    * `gzip-to-parquet-etl.py:173-181` TOP n ORDER BY date DESC). */
  def q08TopN(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .orderBy(col("ts").desc, col("event_id").asc)
      .limit(100)
      .select("event_id", "ts", "user_id", "value")

  val q08Sql: String =
    """SELECT event_id, ts, user_id, value FROM events
      |ORDER BY ts DESC, event_id LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- Q9
  /** Partitioned-parquet round-trip: write events hive-partitioned by
    * event date (reference K1 `gzip-to-parquet-etl.py:261-277`), re-read
    * with partition discovery, aggregate per partition. Verifies the
    * write path preserves content and partition values exactly. */
  def q09PartitionRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    // Per-call unique dir: a path keyed on dir.hashCode collides across
    // concurrent runs (one run would aggregate another's half-written
    // files) — and math.abs(Int.MinValue) is still negative.
    val out = java.nio.file.Files
      .createTempDirectory("graft_q09_").resolve("out").toString
    Tables(spark, dir, "events")
      .withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(out)
    spark.read.parquet(out)
      .groupBy("event_date")
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("sum_value"))
  }

  val q09Sql: String =
    """SELECT CAST(ts AS DATE) AS event_date, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- Q10
  /** Star-schema join chain with broadcast dimensions (TPC-H Q5-ish):
    * lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, filtered, revenue
    * per nation. Dimensions are broadcast — at 100 TB the fact table
    * never shuffles for them. */
  def q10JoinStar(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders").where(col("o_orderstatus") === "O")
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region").where(col("r_name").isin("ASIA", "EUROPE"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q10Sql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderstatus = 'O' AND r_name IN ('ASIA','EUROPE')
      |GROUP BY n_name""".stripMargin

  // ---------------------------------------------------------------- Q11
  /** Left-semi / left-anti: the claim-pattern "pending vs done" split
    * (reference `s3_datalog_processor.py:54-75` semantics). */
  def q11SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val withLi = o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .withColumn("tag", lit("with"))
    val withoutLi = o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .withColumn("tag", lit("without"))
    withLi.unionByName(withoutLi)
  }

  val q11Sql: String =
    """SELECT o_orderstatus, count(*) AS n, 'with' AS tag FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey) GROUP BY 1
      |UNION ALL
      |SELECT o_orderstatus, count(*) AS n, 'without' AS tag FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey) GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- Q12
  /** Drifted-schema union (`unionByName(allowMissingColumns=true)` —
    * reference `union_by_name` S1 semantics) + left outer join. */
  def q12DriftUnionJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val a = ev.where(pmod(col("event_id"), lit(2)) === 0)
      .select("event_id", "user_id", "value")
    val b = ev.where(pmod(col("event_id"), lit(2)) === 1)
      .select("event_id", "user_id", "event_type")
    val u = a.unionByName(b, allowMissingColumns = true)
    val c = Tables(spark, dir, "customer")
    u.join(c, u("user_id") === c("c_custkey"), "left")
      .select("event_id", "user_id", "value", "event_type", "c_name", "c_mktsegment")
  }

  val q12Sql: String =
    """WITH u AS (
      |  SELECT event_id, user_id, value, CAST(NULL AS VARCHAR) AS event_type
      |  FROM events WHERE event_id % 2 = 0
      |  UNION ALL
      |  SELECT event_id, user_id, CAST(NULL AS DOUBLE) AS value, event_type
      |  FROM events WHERE event_id % 2 = 1)
      |SELECT u.event_id, u.user_id, u.value, u.event_type, c.c_name, c.c_mktsegment
      |FROM u LEFT JOIN customer c ON u.user_id = c.c_custkey""".stripMargin

  // ---------------------------------------------------------------- Q13
  /** Grouped aggregation with HAVING (TPC-H Q1-ish pricing summary). */
  def q13GroupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .where(col("l_shipdate") <= lit("1999-12-01").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base"),
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc"),
        decAvg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("n"))
      .where(col("n") > 10)

  val q13Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base,
      |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(l_quantity) AS avg_qty,
      |  count(*) AS n
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
      |GROUP BY 1, 2 HAVING count(*) > 10""".stripMargin

  // ---------------------------------------------------------------- Q14
  /** Analytic window: row_number + lag gap detection per device stream
    * (SURVEY §2.6 sessionization surface). */
  def q14AnalyticWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts").cast("timestamp"))
    Tables(spark, dir, "events").select(
      col("event_id"), col("user_id"),
      row_number().over(w).cast("long").as("rn"),
      (us - lag(us, 1).over(w)).as("gap_us"))
  }

  val q14Sql: String =
    """SELECT event_id, user_id, row_number() OVER w AS rn,
      |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  // ---------------------------------------------------------------- Q15
  /** Exact dedup + distinct cardinalities (extension surface; the
    * HLL-based approximate variant is a separate rows-only query since
    * Spark's and DuckDB's sketches differ by design). */
  def q15Dedup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val base = ev.agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"))
    val dedup = ev.dropDuplicates("user_id", "event_type")
      .agg(count(lit(1)).as("n_dedup"))
    base.crossJoin(dedup)
  }

  val q15Sql: String =
    """SELECT count(*) AS n_events, count(DISTINCT user_id) AS n_users,
      |  (SELECT count(*) FROM (SELECT DISTINCT user_id, event_type FROM events)) AS n_dedup
      |FROM events""".stripMargin

  /** Approximate distinct via HLL — rows-only check (no oracle: sketch
    * estimates are engine-specific by design; SURVEY §2.11 Q15 note). */
  def q15ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events").agg(
      approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
      approx_count_distinct(col("event_id"), 0.02).as("approx_events"))

  /** Q55: approximate per-type value quantiles via the Greenwald-Khanna
    * sketch (`approx_percentile`) — the mergeable-quantile path for data
    * too big to exact-sort (q35 is the exact counterpart). Rows-only
    * check like q15_approx: sketch outputs are engine-specific by
    * design; a spec pins the accuracy bound against q35's exact
    * percentiles instead. */
  def q55ApproxQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(percentile_approx(col("value"),
        array(lit(0.25), lit(0.5), lit(0.9)), lit(1000)).as("quantiles"))
      .select(col("event_type"),
        element_at(col("quantiles"), 1).as("p25"),
        element_at(col("quantiles"), 2).as("p50"),
        element_at(col("quantiles"), 3).as("p90"))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter" -> q01ScanFilter _,
    "q02_epoch_norm" -> q02EpochNorm _,
    "q03_window_agg" -> q03WindowAgg _,
    "q04_distinct" -> q04Distinct _,
    "q05_sentinel" -> q05Sentinel _,
    "q06_split_parse" -> q06SplitParse _,
    "q07_count_gate" -> q07CountGate _,
    "q08_topn" -> q08TopN _,
    "q09_partition_roundtrip" -> q09PartitionRoundtrip _,
    "q10_join_star" -> q10JoinStar _,
    "q11_semi_anti" -> q11SemiAnti _,
    "q12_drift_union_join" -> q12DriftUnionJoin _,
    "q13_group_agg" -> q13GroupAgg _,
    "q14_analytic_window" -> q14AnalyticWindow _,
    "q15_dedup" -> q15Dedup _,
    "q15_approx_distinct" -> q15ApproxDistinct _,
    "q55_approx_quantiles" -> q55ApproxQuantiles _)

  val oracles: Map[String, String] = Map(
    "q01_scan_filter" -> q01Sql,
    "q02_epoch_norm" -> q02Sql,
    "q03_window_agg" -> q03Sql,
    "q04_distinct" -> q04Sql,
    "q05_sentinel" -> q05Sql,
    "q06_split_parse" -> q06Sql,
    "q07_count_gate" -> q07Sql,
    "q08_topn" -> q08Sql,
    "q09_partition_roundtrip" -> q09Sql,
    "q10_join_star" -> q10Sql,
    "q11_semi_anti" -> q11Sql,
    "q12_drift_union_join" -> q12Sql,
    "q13_group_agg" -> q13Sql,
    "q14_analytic_window" -> q14Sql,
    "q15_dedup" -> q15Sql)
}
