package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Remaining standard-relational surface: pivot, scalar subqueries
  * through the SQL interface, set operators, JSON functions, and array
  * aggregation — none appear in the reference's data plane, all are
  * table-stakes for "a user of the reference could switch" (the engine
  * must answer the queries they would write next).
  */
object RelationalExtras {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  // ------------------------------------------------------------ pivot
  /** Q30: events pivoted to one count column per type per user bucket.
    * Explicit value list keeps the plan one-pass (no distinct-scan) and
    * the output schema deterministic. */
  def q30Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .withColumn("user_bucket", pmod(col("user_id"), lit(10)))
      .groupBy("user_bucket")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)

  val q30Sql: String =
    """SELECT user_id % 10 AS user_bucket,
      |  count(*) FILTER (event_type = 'click') AS click,
      |  count(*) FILTER (event_type = 'error') AS error,
      |  count(*) FILTER (event_type = 'purchase') AS purchase,
      |  count(*) FILTER (event_type = 'signup') AS signup,
      |  count(*) FILTER (event_type = 'view') AS view
      |FROM events GROUP BY 1""".stripMargin

  // ------------------------------------------- scalar subquery (SQL API)
  /** Q31: orders above the average order value — exercised through
    * `spark.sql` (the SQL front door + scalar-subquery planning), with
    * the decimal-sum average so both engines compare against the exact
    * same threshold. */
  def q31ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders").createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders_v
        |WHERE o_totalprice > (
        |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*)
        |  FROM orders_v)""".stripMargin)
  }

  val q31Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > (
      |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*)
      |  FROM orders)""".stripMargin

  // ------------------------------------- correlated EXISTS subqueries
  /** Q57: correlated EXISTS / NOT EXISTS through the SQL front door —
    * per nation, customers holding at least one high-value order but no
    * low-value one. Catalyst decorrelates both subqueries into a
    * left-semi and a left-anti join on `o_custkey` (never a per-row
    * re-execution), so the plan is two hash joins — the same shape q11
    * builds explicitly with the DataFrame API, reached from declarative
    * SQL. */
  def q57Exists(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "customer").createOrReplaceTempView("customer_v")
    Tables(spark, dir, "orders").createOrReplaceTempView("orders_x")
    spark.sql(
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer_v c
        |WHERE EXISTS (SELECT 1 FROM orders_x o
        |        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
        |  AND NOT EXISTS (SELECT 1 FROM orders_x o
        |        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 5000)
        |GROUP BY c_nationkey""".stripMargin)
      .select(col("c_nationkey").cast("long").as("c_nationkey"), col("n_customers"))
  }

  val q57Sql: String =
    """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, count(*) AS n_customers
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 5000)
      |GROUP BY c_nationkey""".stripMargin

  // ------------------------------------------- statistical aggregates
  /** Q58: per-type distribution stats — mean and sample stddev derived
    * in closed form from exact DECIMAL moments (Σx, Σx²). Spark's
    * `stddev_samp` streams Welford-style over doubles, so its low bits
    * depend on partition order; the moment form keeps the aggregation
    * exact (decimal addition commutes) and does the floating-point math
    * once per group at the end — bit-identical on any cluster size and
    * in any engine. Still one shuffle, still map-side partial sums. */
  def q58Stats(spark: SparkSession, dir: String): DataFrame = {
    val x = col("value").cast("decimal(18,6)")
    // n counts non-null values (count(*) would skew both stats under
    // NULLs); the variance numerator is clamped at 0 because the exact
    // decimal moments can round to a tiny negative once cast to double
    // (a constant-valued group gives ~-1e-19 → NaN in Spark, a hard
    // sqrt error in DuckDB); n = 1 yields NULL, matching stddev_samp.
    val varNum = greatest(lit(0.0),
      col("sx2").cast("double") -
        col("sx").cast("double") * col("sx").cast("double") / col("n"))
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        count(x).as("n"),
        sum(x).as("sx"),
        sum((x * x).cast("decimal(38,12)")).as("sx2"))
      .select(col("event_type"), col("n"),
        round((col("sx").cast("double") / col("n")), 6).as("mean"),
        when(col("n") > 1, round(sqrt(varNum / (col("n") - 1)), 6)).as("stddev"))
  }

  val q58Sql: String =
    """WITH m AS (SELECT event_type, count(value) AS n,
      |    sum(CAST(value AS DECIMAL(18,6))) AS sx,
      |    sum(CAST(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))
      |        AS DECIMAL(38,12))) AS sx2
      |  FROM events GROUP BY 1)
      |SELECT event_type, n,
      |  round(CAST(sx AS DOUBLE) / n, 6) AS mean,
      |  CASE WHEN n > 1 THEN
      |    round(sqrt(greatest(0.0,
      |      CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
      |      / (n - 1)), 6)
      |  END AS stddev
      |FROM m""".stripMargin

  // --------------------------------------------------- full outer join
  /** Q59: daily order activity FULL OUTER JOIN daily event activity —
    * completes the join-type matrix (inner/left/semi/anti are
    * q10–q12/q11). The two tables' date ranges barely overlap, so both
    * null sides are exercised at every scale factor. Aggregating to
    * per-day counts BEFORE the join means the outer join itself moves
    * |days|, not |rows|. */
  def q59FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val od = Tables(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val ed = Tables(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    od.join(ed, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  val q59Sql: String =
    """WITH od AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
      |    FROM orders GROUP BY 1),
      |ed AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
      |    FROM events GROUP BY 1)
      |SELECT COALESCE(od.day, ed.day) AS day,
      |  COALESCE(n_orders, 0) AS n_orders, COALESCE(n_events, 0) AS n_events
      |FROM od FULL OUTER JOIN ed ON od.day = ed.day""".stripMargin

  // -------------------------------------------------- set operators
  /** Q32: INTERSECT / EXCEPT over user activity sets: users who both
    * purchased and errored, minus users with a high-value signup (the
    * EXCEPT side is selective so the result is non-trivial at every
    * scale factor). */
  def q32SetOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    def users(t: String) = ev.where(col("event_type") === t).select("user_id")
    users("purchase").intersect(users("error"))
      .except(ev.where(col("event_type") === "signup" && col("value") > 190.0)
        .select("user_id"))
  }

  val q32Sql: String =
    """SELECT user_id FROM events WHERE event_type = 'purchase'
      |INTERSECT
      |SELECT user_id FROM events WHERE event_type = 'error'
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'signup' AND value > 190""".stripMargin

  // -------------------------------------------------- JSON functions
  /** Q33: extract the numeric payload from the raw JSON props column —
    * the engine-level JSON surface (the reference parses JSON only at
    * scan time; downstream users still need point extraction). */
  def q33Json(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events").select(
      col("event_id"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      get_json_object(col("props"), "$.missing").as("missing"))

  val q33Sql: String =
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |  json_extract_string(props, '$.missing') AS missing
      |FROM events""".stripMargin

  // -------------------------------------------------- array functions
  /** Q34: per-user sorted distinct event-type array + element ops —
    * array aggregation, sorting, sizing, membership. The array itself is
    * emitted as a canonical JSON string (`to_json`) so the result is
    * scalar-typed end to end: the verification harness canonicalizes
    * rows by sorting every output column, which a raw array cell breaks. */
  def q34Arrays(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("user_id")
      .agg(sort_array(collect_set(col("event_type"))).as("types"))
      .select(
        col("user_id"),
        to_json(col("types")).as("types_json"),
        size(col("types")).cast("long").as("n_types"),
        array_contains(col("types"), "error").as("has_error"),
        element_at(col("types"), 1).as("first_type"))

  val q34Sql: String =
    """WITH t AS (SELECT user_id, list_sort(list(DISTINCT event_type)) AS types
      |           FROM events GROUP BY user_id)
      |SELECT user_id, CAST(to_json(types) AS VARCHAR) AS types_json,
      |  CAST(len(types) AS BIGINT) AS n_types,
      |  list_contains(types, 'error') AS has_error, types[1] AS first_type
      |FROM t""".stripMargin

  // -------------------------------------------------- percentiles
  /** Q35: exact interpolated percentiles per event type — Spark's exact
    * `percentile` (not the approximate sketch) against DuckDB's
    * `quantile_cont`; both interpolate linearly over the sorted values,
    * so results are bit-comparable. The approximate sketch variant
    * (`percentile_approx`) is deliberately NOT oracle-checked — sketches
    * are engine-specific. */
  def q35Percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("median_value"),
        expr("percentile(value, 0.9)").as("p90_value"),
        // multi-quantile in ONE pass (array-returning percentile), then
        // unpacked to scalars so the harness can sort/hash the columns
        expr("percentile(value, array(0.25, 0.75))").as("iqr"))
      .select(
        col("event_type"), col("median_value"), col("p90_value"),
        element_at(col("iqr"), 1).as("p25"),
        element_at(col("iqr"), 2).as("p75"))

  val q35Sql: String =
    """WITH t AS (SELECT event_type,
      |    quantile_cont(value, 0.5) AS median_value,
      |    quantile_cont(value, 0.9) AS p90_value,
      |    quantile_cont(value, [0.25, 0.75]) AS iqr
      |  FROM events GROUP BY event_type)
      |SELECT event_type, median_value, p90_value,
      |  iqr[1] AS p25, iqr[2] AS p75
      |FROM t""".stripMargin

  // ---------------------------------------------------------- unpivot
  /** Q44: wide→long reshape. Per-returnflag exact sums of the four
    * lineitem measures, unpivoted to (flag, measure, value) — the
    * inverse of q30's pivot, closing the reshape surface. `unpivot` is a
    * zero-shuffle projection (each input row fans out to 4 output rows
    * in place); the only exchange is the upstream groupBy. */
  def q44Unpivot(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.AggExprs.decSum
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_price"),
        decSum(col("l_discount")).as("sum_disc"),
        decSum(col("l_tax")).as("sum_tax"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc"), col("sum_tax")),
        "measure", "value")
  }

  val q44Sql: String = {
    def m(src: String, name: String) =
      s"CAST(sum(CAST($src AS DECIMAL(18,6))) AS DOUBLE) AS $name"
    s"""WITH w AS (SELECT l_returnflag,
       |    ${m("l_quantity", "sum_qty")}, ${m("l_extendedprice", "sum_price")},
       |    ${m("l_discount", "sum_disc")}, ${m("l_tax", "sum_tax")}
       |  FROM lineitem GROUP BY 1)
       |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
       |UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
       |UNION ALL SELECT l_returnflag, 'sum_disc', sum_disc FROM w
       |UNION ALL SELECT l_returnflag, 'sum_tax', sum_tax FROM w""".stripMargin
  }

  // --------------------------------------------- range-frame moving avg
  /** Q52: per-user trailing 1-hour moving average of event values — the
    * RANGE-frame analytic (q14 covers only row-offset functions). The
    * frame orders on the exact epoch-µs long, so tied timestamps land in
    * the frame identically in any engine, and the windowed mean is a
    * DECIMAL sum over the frame divided by the frame count — exact,
    * order-independent. Partitions by user: cardinality grows with the
    * corpus, so the window sort stays distributed at any scale. */
  def q52MovingAvg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val HourUs = 3600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("epoch_us")
      .rangeBetween(-HourUs, 0)
    Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("epoch_us"),
        col("value").cast("decimal(18,6)").as("v"))
      .select(col("event_id"), col("user_id"), col("epoch_us"),
        round((sum(col("v")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")), 6).as("ma_1h"),
        count(lit(1)).over(w).cast("long").as("n_window"))
  }

  val q52Sql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS epoch_us,
      |    CAST(value AS DECIMAL(18,6)) AS v FROM events)
      |SELECT event_id, user_id, epoch_us,
      |  round(CAST(sum(v) OVER w AS DOUBLE) / CAST(count(*) OVER w AS DOUBLE), 6) AS ma_1h,
      |  CAST(count(*) OVER w AS BIGINT) AS n_window
      |FROM e WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  // ------------------------------------------------------------- cube
  /** Q53: CUBE over (event_type, user bucket) — all four grouping sets
    * in one pass, with `grouping()` flags disambiguating subtotal NULLs
    * from data NULLs. Complements q29's ROLLUP. Spark expands the cube
    * map-side, so it's still a single shuffle of 4× partial aggregates,
    * never four scans. */
  def q53Cube(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.AggExprs.decSum
    Tables(spark, dir, "events")
      .withColumn("user_bucket", pmod(col("user_id"), lit(10)))
      .cube("event_type", "user_bucket")
      .agg(
        grouping(col("event_type")).cast("long").as("g_type"),
        grouping(col("user_bucket")).cast("long").as("g_bucket"),
        count(lit(1)).as("n"), decSum(col("value")).as("sum_value"))
  }

  val q53Sql: String =
    """SELECT event_type, user_id % 10 AS user_bucket,
      |  CAST(GROUPING(event_type) AS BIGINT) AS g_type,
      |  CAST(GROUPING(user_id % 10) AS BIGINT) AS g_bucket,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY CUBE (event_type, user_id % 10)""".stripMargin

  // ------------------------------------------------ decile assignment
  /** Q64: customer-spend deciles — the two-pass BOUNDARY method, not an
    * `ntile` window: a global ntile would shuffle every customer row
    * into ONE partition for a total sort, the exact bottleneck q20's
    * top-k avoids. Instead: (1) one uniform groupBy for per-customer
    * spend (decimal-exact: `o_totalprice` is stored as double, summing
    * doubles is partition-order dependent), (2) one aggregate computes
    * the 9 exact interpolated decile boundaries, (3) a broadcast of
    * that 1-row boundary array and a narrow map assigns each customer
    * `1 + |{b : spend > b}|`. Stage 2's exact `percentile` buffers the
    * per-customer spends; at billions of customers swap it for
    * `approx_percentile` — stages 1 and 3 are already at-scale shapes.
    * Ties sit on the lower side of a boundary in both engines. */
  def q64Deciles(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables(spark, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("spend"))
    val bounds = spend.agg(expr(
      "percentile(spend, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("b"))
    spend.crossJoin(broadcast(bounds))
      .select(col("custkey"), round(col("spend"), 2).as("spend"),
        (lit(1) + size(filter(col("b"), x => col("spend") > x))).cast("long").as("decile"))
  }

  val q64Sql: String =
    """WITH s AS (SELECT o_custkey AS custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |  FROM orders GROUP BY 1),
      |q AS (SELECT quantile_cont(spend, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS b FROM s)
      |SELECT custkey, round(spend, 2) AS spend,
      |  CAST(1 + len(list_filter(b, x -> spend > x)) AS BIGINT) AS decile
      |FROM s CROSS JOIN q""".stripMargin

  // ------------------------------------------------------- q87 mode
  /** Q87: per-group mode (most frequent value) with a deterministic
    * tie-break — the categorical summarizer behind "dominant event
    * type per user" features. Two hash aggregations, zero windows: the
    * (user, type) counts collapse to one row per user via
    * `min(struct(-n, type))` — struct ordering makes that "highest
    * count, then lexicographically-first type" in a single partial-agg
    * friendly pass, so no per-user sort and no row_number shuffle; at
    * scale this is two map-side-combining aggs on uniform keys. */
  def q87Mode(spark: SparkSession, dir: String): DataFrame =
    q87ModeOn(Tables(spark, dir, "events"))

  private[operators] def q87ModeOn(events: DataFrame): DataFrame = {
    val counts = events
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
    counts.groupBy("user_id")
      .agg(min(struct((-col("n")).as("neg"), col("event_type").as("t"))).as("m"))
      .select(col("user_id"), col("m.t").as("mode_type"), (-col("m.neg")).as("n_events"))
  }

  val q87Sql: String =
    """WITH c AS (SELECT user_id, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT user_id, event_type, n,
      |    row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
      |  FROM c)
      |SELECT user_id, event_type AS mode_type, n AS n_events
      |FROM r WHERE rn = 1""".stripMargin

  // ------------------------------------------------ q94 MAD outliers
  /** Consistency constant: MAD × 1.4826 estimates σ under normality. */
  private val MadK = 1.4826
  private val MadSigmas = 3.0

  /** Q94: robust outlier detection per group — median + MAD (median
    * absolute deviation), flagging values beyond
    * [[MadSigmas]]·[[MadK]]·MAD of the median. The robust alternative
    * to q58's mean/stddev z-score: one corrupted sensor can drag a
    * mean arbitrarily but moves a median by at most one rank.
    *
    * Three passes by necessity (median → deviations → MAD →
    * threshold count), but each is a per-group aggregate on the same
    * uniform event_type keys, and the two tiny per-group medians
    * broadcast back — the corpus relation is scanned twice, never
    * shuffled wide. The outlier test compares at 6-decimal resolution
    * (round before compare) so an engine-ULP difference in the
    * interpolated median can't flip a boundary row. */
  def q94MadOutliers(spark: SparkSession, dir: String): DataFrame =
    q94MadOutliersOn(Tables(spark, dir, "events"))

  private[operators] def q94MadOutliersOn(events: DataFrame): DataFrame = {
    val e = events.select(col("event_type"), col("value"))
    val med = e.groupBy("event_type").agg(expr("percentile(value, 0.5)").as("med"))
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(dev, 0.5)").as("mad"), first(col("med")).as("med"))
    dev.drop("med").join(broadcast(mad), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(first(col("med")), 6).as("med"),
        round(first(col("mad")), 6).as("mad"),
        sum(when(round(col("dev") - lit(MadSigmas * MadK) * col("mad"), 6) > 0, 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  val q94Sql: String =
    s"""WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
       |  FROM events GROUP BY 1),
       |d AS (SELECT e.event_type, abs(e.value - m.med) AS dev, m.med
       |  FROM events e JOIN m USING (event_type)),
       |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad, any_value(med) AS med
       |  FROM d GROUP BY 1)
       |SELECT d.event_type, count(*) AS n,
       |  round(any_value(md.med), 6) AS med, round(any_value(md.mad), 6) AS mad,
       |  CAST(sum(CASE WHEN round(d.dev - $MadSigmas * $MadK * md.mad, 6) > 0
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       |FROM d JOIN md USING (event_type) GROUP BY 1""".stripMargin

  // --------------------------------------------- q131 bucketed join
  private val JoinBuckets = 8

  /** Q131: the co-located join, end-to-end — ingest `orders` and
    * `customer` as BUCKETED tables (both hash-bucketed × sorted on the
    * customer key into [[JoinBuckets]] buckets), then run the
    * segment-revenue join ON the bucketed layout. Because both sides
    * share bucket count and key, Catalyst plans the sort-merge join
    * with ZERO Exchange operators (plan-pinned in `ScaleToolsSpec`
    * mechanics and `PlanShapeSpec` for this query): the join cost is a
    * per-bucket streamed merge. At 100 TB this is THE recurring-join
    * optimization — the fact table shuffles once at ingest, never per
    * query; `SURVEY §3.3`'s daily dashboards re-join for free.
    *
    * The `merge` hint pins the co-located SMJ even where the dim side
    * is broadcast-sized in the test corpus — the plan under test is the
    * one the 100 TB deployment runs, not the small-SF shortcut.
    *
    * Results are layout-independent (bucketing changes WHERE rows sit,
    * not what they are), so the oracle is the plain join on the raw
    * parquet — layout correctness and plan shape are asserted
    * separately. */
  /** The joined (pre-aggregation) frame — exposed so `PlanShapeSpec`
    * can pin the zero-exchange property of the join itself, without the
    * downstream aggregation's legitimate exchange muddying the count. */
  private[graft] def bucketedJoinFrame(spark: SparkSession, dir: String): DataFrame = {
    val tag = java.lang.Integer.toHexString(dir.hashCode)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed_$tag"
    val ot = s"graft_b_orders_$tag"
    val ct = s"graft_b_customer_$tag"
    graft.sources.Bucketing.writeBucketedAt(
      Tables(spark, dir, "orders"), ot, s"$base/orders",
      Seq("o_custkey"), JoinBuckets, Seq("o_custkey"))
    graft.sources.Bucketing.writeBucketedAt(
      Tables(spark, dir, "customer"), ct, s"$base/customer",
      Seq("c_custkey"), JoinBuckets, Seq("c_custkey"))
    spark.table(ot).hint("merge")
      .join(spark.table(ct).hint("merge"),
        col("o_custkey") === col("c_custkey"))
  }

  def q131BucketedJoin(spark: SparkSession, dir: String): DataFrame =
    bucketedJoinFrame(spark, dir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct("c_custkey").as("n_customers"),
        sum(col("o_totalprice").cast("decimal(18,6)")).cast("double").as("revenue"))

  val q131Sql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  // ------------------------------------------------- q147 winsorize
  /** Q147: per-group winsorization — clip `value` to its event-type's
    * [p05, p95] band. The TRANSFORM counterpart to q94's MAD outlier
    * DETECTION: feature pipelines don't drop extreme rows, they cap
    * them so one sensor glitch can't dominate a mean/regression
    * downstream. Emits original + clipped value + the flag, so the
    * clip rate itself is auditable.
    *
    * Scale: one bounded-key percentile aggregation (|event_type| rows —
    * exact interpolated `percentile`, the engine-parity q35 proved),
    * broadcast back onto the stream; the clip is codegen'd
    * `least`/`greatest` — no second shuffle, no sort of the fact
    * table. NULL values are excluded up front (a clip of NULL is
    * undefined; both engines' percentile would skip them anyway). */
  def q147Winsorize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .where(col("value").isNotNull)
      .select("event_id", "event_type", "value")
    val bounds = ev.groupBy("event_type")
      .agg(expr("percentile(value, array(0.05, 0.95))").as("b"))
      .select(col("event_type"),
        element_at(col("b"), 1).as("lo"), element_at(col("b"), 2).as("hi"))
    ev.join(broadcast(bounds), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        round(least(greatest(col("value"), col("lo")), col("hi")), 6).as("value_clipped"),
        (col("value") < col("lo") || col("value") > col("hi")).as("was_clipped"))
  }

  val q147Sql: String =
    """WITH e AS (SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL),
      |b AS (SELECT event_type, quantile_cont(value, 0.05) AS lo,
      |    quantile_cont(value, 0.95) AS hi
      |  FROM e GROUP BY 1)
      |SELECT event_id, e.event_type, value,
      |  round(least(greatest(value, lo), hi), 6) AS value_clipped,
      |  (value < lo OR value > hi) AS was_clipped
      |FROM e JOIN b USING (event_type)""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q147_winsorize" -> q147Winsorize _,
    "q131_bucketed_join" -> q131BucketedJoin _,
    "q87_mode" -> q87Mode _,
    "q64_deciles" -> q64Deciles _,
    "q35_percentiles" -> q35Percentiles _,
    "q44_unpivot" -> q44Unpivot _,
    "q52_moving_avg" -> q52MovingAvg _,
    "q53_cube" -> q53Cube _,
    "q57_exists" -> q57Exists _,
    "q58_stats" -> q58Stats _,
    "q59_full_outer" -> q59FullOuter _,
    "q30_pivot" -> q30Pivot _,
    "q31_scalar_subquery" -> q31ScalarSubquery _,
    "q32_set_ops" -> q32SetOps _,
    "q33_json" -> q33Json _,
    "q34_arrays" -> q34Arrays _,
    "q94_mad_outliers" -> q94MadOutliers _)

  val oracles: Map[String, String] = Map(
    "q147_winsorize" -> q147Sql,
    "q131_bucketed_join" -> q131Sql,
    "q87_mode" -> q87Sql,
    "q64_deciles" -> q64Sql,
    "q35_percentiles" -> q35Sql,
    "q44_unpivot" -> q44Sql,
    "q52_moving_avg" -> q52Sql,
    "q53_cube" -> q53Sql,
    "q57_exists" -> q57Sql,
    "q58_stats" -> q58Sql,
    "q59_full_outer" -> q59Sql,
    "q30_pivot" -> q30Sql,
    "q31_scalar_subquery" -> q31Sql,
    "q32_set_ops" -> q32Sql,
    "q33_json" -> q33Sql,
    "q34_arrays" -> q34Sql,
    "q94_mad_outliers" -> q94Sql)
}
