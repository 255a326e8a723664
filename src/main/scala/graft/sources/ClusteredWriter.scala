package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.LayoutQueries

/** The write path q98's audit measures: materialize a relation
  * z-order-clustered on two filter dimensions, so parquet footer
  * min/max statistics prune scans filtered on EITHER column.
  *
  * The cluster keys are **range-quantized** into 2^8 buckets from the
  * relation's measured min/max — NOT taken mod 2^8: a modulus wraps
  * any domain wider than 256 around every file, so the RAW columns'
  * footer min/max would stay domain-wide and no scan could prune
  * (locality in mod-space is worthless to a predicate on the raw
  * value). Range quantization is monotone, so tight buckets ⇒ tight
  * raw min/max — the thing the footer actually stores. The bounds
  * pass is one 1-row min/max aggregate (columnar scan of two columns;
  * at 100 TB that is the cheap part next to the clustering shuffle).
  *
  * Mechanics after quantization are exactly the two standard calls —
  * `repartitionByRange(n, z)` (contiguous z-ranges per output file;
  * range boundaries come from Spark's deterministic sample-based
  * partitioner) then `sortWithinPartitions(z)` (rows inside each file
  * in z order, so row-group stats are tight too) — over the same
  * Morton expression the audit uses ([[LayoutQueries.zValue]]). The
  * helper column is projected away before the write; projection
  * preserves the physical row order.
  *
  * Scale: one range shuffle (the clustering IS the shuffle — there is
  * no cheaper way to co-locate a 2-D locality curve), per-file local
  * sorts, and file count = `numFiles` sized to the 150–250 MB target
  * band (BASELINE.md's anti-small-file contract).
  */
object ClusteredWriter {

  private val Buckets = 256

  /** (min, max) of a numeric column, with degenerate/empty inputs
    * collapsed to a unit span so the quantizer never divides by 0. */
  private def bounds(df: DataFrame, c: Column): (Double, Double) = {
    val r = df.agg(min(c.cast("double")), max(c.cast("double"))).collect()(0)
    if (r.isNullAt(0) || r.isNullAt(1)) (0.0, 1.0)
    else {
      val (lo, hi) = (r.getDouble(0), r.getDouble(1))
      if (hi > lo) (lo, hi) else (lo, lo + 1.0)
    }
  }

  /** Monotone scale of `c` from [lo, hi] into [0, Buckets). */
  private def quantize(c: Column, lo: Double, hi: Double): Column =
    least(lit(Buckets - 1),
      floor((c.cast("double") - lit(lo)) * lit(Buckets.toDouble) / lit(hi - lo)))
      .cast("int")

  /** Write `df` to `path` as `numFiles` parquet files z-ordered on the
    * two given cluster keys, each range-quantized into 2^8 buckets
    * from its measured min/max (works for any numeric domain). */
  def writeZOrdered(df: DataFrame, xCol: Column, yCol: Column,
      path: String, numFiles: Int): Unit = {
    val (xLo, xHi) = bounds(df, xCol)
    val (yLo, yHi) = bounds(df, yCol)
    val z = LayoutQueries.zValue(
      quantize(xCol, xLo, xHi), quantize(yCol, yLo, yHi))
    df.withColumn("__z", z.cast("long"))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").option("compression", "snappy").parquet(path)
  }

  /** Per-file bounding boxes of a written layout — the footer stats a
    * scan would prune with. Returns (file, n_rows, x_span, y_span)
    * with spans as fractions of each RAW column's global [min, max]
    * range — deliberately not the quantized space, so a layout that is
    * only tight modulo some wrap (the failure mode range quantization
    * exists to avoid) audits as the unprunable layout it is. */
  def auditLayout(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val global = df.agg(
      min(xCol.cast("double")).as("gx_min"), max(xCol.cast("double")).as("gx_max"),
      min(yCol.cast("double")).as("gy_min"), max(yCol.cast("double")).as("gy_max"))
    df.select(input_file_name().as("file"),
        xCol.cast("double").as("x"), yCol.cast("double").as("y"))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"))
      .crossJoin(broadcast(global))
      .select(col("file"), col("n_rows"),
        round((col("x_max") - col("x_min")) /
          greatest(col("gx_max") - col("gx_min"), lit(1e-12)), 6).as("x_span"),
        round((col("y_max") - col("y_min")) /
          greatest(col("gy_max") - col("gy_min"), lit(1e-12)), 6).as("y_span"))
  }
}
