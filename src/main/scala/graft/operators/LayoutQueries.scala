package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data-layout operators — the physical-design side of the engine: how
  * rows are ORDERED into files so that later scans skip most of them.
  * At 100 TB the dominant cost of an interactive query is the bytes the
  * scan cannot prune; multi-dimensional clustering (z-order) is the
  * standard answer when queries filter on more than one column and a
  * single sort key can only serve one of them.
  */
object LayoutQueries {

  /** Bits per dimension (two 8-bit dims → 16-bit z-value). */
  private val ZBits = 8
  /** Rows-per-file proxy: the 16-bit z-space splits into 256 "files". */
  private val FileBuckets = 256

  /** Morton interleave of two [[ZBits]]-bit ints: bit i of `x` lands at
    * position 2i, bit i of `y` at 2i+1. Pure integer shift/mask
    * arithmetic — identical in any engine, fully codegen'd. */
  private[operators] def zValue(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(lit(1)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1)), 2 * i + 1)): Column
    }.reduce(_ + _)

  /** Q98: z-order layout audit — cluster events by the Morton
    * interleave of two independent filter dimensions (user bucket ×
    * event-id bucket), split the z-ordered corpus into
    * [[FileBuckets]] equal z-ranges ("files"), and report each file's
    * bounding box in both dimensions. The bounding boxes ARE the
    * min/max column statistics a parquet footer would carry: tight
    * boxes on BOTH dims is the property that lets a scan with a
    * predicate on either column prune most files — the audit that
    * tells you whether re-clustering is worth the write cost.
    *
    * Scale shape: the z-value is a narrow per-row projection; the
    * audit is one map-side-combined aggregation on a bounded key
    * (≤ [[FileBuckets]] groups). The real write path is
    * `repartitionByRange(zval)` + sortWithinPartitions — same
    * expression, no new machinery. */
  def q98ZOrder(spark: SparkSession, dir: String): DataFrame = {
    val lim = (1 << ZBits).toLong
    val z = Tables(spark, dir, "events")
      .select(pmod(col("user_id"), lit(lim)).cast("int").as("qx"),
        pmod(col("event_id"), lit(lim)).cast("int").as("qy"))
      .withColumn("z", zValue(col("qx"), col("qy")).cast("long"))
    z.groupBy(call_function("div", col("z"),
        lit((lim * lim / FileBuckets))).as("zfile"))
      .agg(count(lit(1)).as("n_rows"),
        min("qx").as("qx_min"), max("qx").as("qx_max"),
        min("qy").as("qy_min"), max("qy").as("qy_max"))
      // the prunability metric: fraction of each dim's domain a file's
      // bounding box spans (1/16 per dim is ideal for 256 files over
      // two 8-bit dims)
      .withColumn("qx_span",
        round((col("qx_max") - col("qx_min") + 1).cast("double") / lim.toDouble, 6))
      .withColumn("qy_span",
        round((col("qy_max") - col("qy_min") + 1).cast("double") / lim.toDouble, 6))
  }

  val q98Sql: String = {
    val lim = 1 << ZBits
    val zExpr = (0 until ZBits).map { i =>
      s"((((qx >> $i) & 1) << ${2 * i}) + (((qy >> $i) & 1) << ${2 * i + 1}))"
    }.mkString(" + ")
    s"""WITH q AS (SELECT CAST(user_id % $lim AS INTEGER) AS qx,
       |    CAST(event_id % $lim AS INTEGER) AS qy FROM events),
       |z AS (SELECT qx, qy, CAST($zExpr AS BIGINT) AS z FROM q),
       |g AS (SELECT z // ${lim.toLong * lim / FileBuckets} AS zfile,
       |    count(*) AS n_rows,
       |    min(qx) AS qx_min, max(qx) AS qx_max,
       |    min(qy) AS qy_min, max(qy) AS qy_max
       |  FROM z GROUP BY 1)
       |SELECT zfile, n_rows, qx_min, qx_max, qy_min, qy_max,
       |  round(CAST(qx_max - qx_min + 1 AS DOUBLE) / $lim.0, 6) AS qx_span,
       |  round(CAST(qy_max - qy_min + 1 AS DOUBLE) / $lim.0, 6) AS qy_span
       |FROM g""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q98_zorder" -> q98ZOrder _)

  val oracles: Map[String, String] = Map(
    "q98_zorder" -> q98Sql)
}
