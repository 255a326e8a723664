package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Declarative data-quality checks — the layer the reference documents
  * ("dbt models: Staging, Transforms, Test" — reference `README.md:30`,
  * `README.md:67` and its architecture diagram) but never implemented
  * (SURVEY §5: no dbt code exists in the repo). Same idea, Spark-first:
  * each check is a violation-counting aggregate, and all checks over one
  * table fuse into a SINGLE aggregation pass — at 100 TB you pay one
  * scan for the whole quality suite, not one per check.
  */
object DataQuality {

  sealed trait Check { def name: String; def violations: Column }

  /** Rows where any listed column is null. */
  case class NotNull(cols: Seq[String]) extends Check {
    val name = s"not_null(${cols.mkString(",")})"
    def violations: Column =
      sum(when(cols.map(col(_).isNull).reduce(_ || _), 1L).otherwise(0L))
  }

  /** Rows beyond the first occurrence of each key — computed without a
    * self-join via count - distinct count. Null-keyed rows are the
    * NotNull check's business, not duplicates: both counts here skip
    * rows with any null key (count DISTINCT already does; the base
    * count must match it, or every null row reads as a duplicate). */
  case class Unique(cols: Seq[String]) extends Check {
    val name = s"unique(${cols.mkString(",")})"
    def violations: Column =
      sum(when(cols.map(col(_).isNotNull).reduce(_ && _), 1L).otherwise(0L)) -
        countDistinct(cols.head, cols.tail: _*)
  }

  /** Rows whose column value is outside the accepted set. The name
    * carries the set, both to make reports self-describing and so two
    * different accepted-value checks on one column don't collide on
    * their aggregate alias. */
  case class AcceptedValues(c: String, values: Seq[String]) extends Check {
    val name = s"accepted_values($c:${values.mkString("|")})"
    def violations: Column =
      sum(when(!col(c).isin(values.map(lit): _*) || col(c).isNull, 1L).otherwise(0L))
  }

  /** Rows whose numeric column is outside [lo, hi] (bounds in the name
    * for the same alias-uniqueness reason as AcceptedValues). */
  case class InRange(c: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range($c,$lo,$hi)"
    def violations: Column =
      sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L))
  }

  /** One scan, all checks: returns (check, violations, pass). */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "data-quality run needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_.name).diff(checks.map(_.name).distinct).distinct.mkString(", ")}")
    val aggs = checks.map(c => coalesce(c.violations, lit(0L)).as(c.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot to one row per check
    val pairs = checks.map(c => struct(lit(c.name).as("check"), col(s"`${c.name}`").as("violations")))
    wide.select(explode(array(pairs: _*)).as("r"))
      .select(col("r.check").as("check"), col("r.violations").as("violations"))
      .withColumn("pass", col("violations") === 0L)
  }

  /** Referential integrity as a LAZY 1-row relation (check, violations,
    * pass): child keys with no parent, counted by an anti join. Staying
    * lazy matters — the suite unions this with the single-scan checks
    * into ONE plan, so a caller's action runs everything as one job
    * instead of paying an eager driver-side count at build time.
    * Sides are renamed before the join — with the common FK convention
    * of identically-named key columns, `col(childKey) === col(parentKey)`
    * would be an ambiguous reference and fail analysis. */
  def referential(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, name: String): DataFrame =
    child.select(col(childKey).as("__child_key"))
      .join(parent.select(col(parentKey).as("__parent_key")),
        col("__child_key") === col("__parent_key"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check"), col("violations"),
        (col("violations") === 0L).as("pass"))

  /** Eager convenience: the orphan count alone. */
  def orphans(child: DataFrame, childKey: String, parent: DataFrame, parentKey: String): Long =
    referential(child, childKey, parent, parentKey, "referential")
      .select("violations").collect().head.getLong(0)

  /** Q38: the quality suite over the testdata star schema — column
    * nullability, key uniqueness, accepted values, value ranges, and
    * lineitem→orders referential integrity, as one result relation. */
  def q38QualityChecks(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val evChecks = run(ev, Seq(
      NotNull(Seq("event_id", "ts", "user_id")),
      Unique(Seq("event_id")),
      AcceptedValues("event_type", Seq("click", "error", "purchase", "signup", "view")),
      InRange("value", 0.0, 1000.0)))
    val riRow = referential(
      Tables(spark, dir, "lineitem"), "l_orderkey",
      Tables(spark, dir, "orders"), "o_orderkey",
      "referential(lineitem.l_orderkey -> orders.o_orderkey)")
    evChecks.unionByName(riRow)
  }

  val q38Sql: String =
    """SELECT 'not_null(event_id,ts,user_id)' AS check,
      |  CAST(sum(CASE WHEN event_id IS NULL OR ts IS NULL OR user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
      |  sum(CASE WHEN event_id IS NULL OR ts IS NULL OR user_id IS NULL THEN 1 ELSE 0 END) = 0 AS pass
      |FROM events
      |UNION ALL
      |SELECT 'unique(event_id)', count(event_id) - count(DISTINCT event_id),
      |  count(event_id) - count(DISTINCT event_id) = 0 FROM events
      |UNION ALL
      |SELECT 'accepted_values(event_type:click|error|purchase|signup|view)',
      |  CAST(sum(CASE WHEN event_type IS NULL OR event_type NOT IN ('click','error','purchase','signup','view') THEN 1 ELSE 0 END) AS BIGINT),
      |  sum(CASE WHEN event_type IS NULL OR event_type NOT IN ('click','error','purchase','signup','view') THEN 1 ELSE 0 END) = 0
      |FROM events
      |UNION ALL
      |SELECT 'in_range(value,0.0,1000.0)',
      |  CAST(sum(CASE WHEN value < 0 OR value > 1000 THEN 1 ELSE 0 END) AS BIGINT),
      |  sum(CASE WHEN value < 0 OR value > 1000 THEN 1 ELSE 0 END) = 0
      |FROM events
      |UNION ALL
      |SELECT 'referential(lineitem.l_orderkey -> orders.o_orderkey)',
      |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
      |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)),
      |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
      |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) = 0""".stripMargin
}
