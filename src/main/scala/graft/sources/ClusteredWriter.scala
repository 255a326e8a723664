package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.LayoutQueries

/** The write path q98's audit measures: materialize a relation
  * z-order-clustered on two filter dimensions, so parquet footer
  * min/max statistics prune scans filtered on EITHER column.
  *
  * Mechanics are exactly the two standard calls —
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

  /** Write `df` to `path` as `numFiles` parquet files z-ordered on the
    * two given low-cardinality cluster keys (each taken mod 2^8, the
    * audit's geometry). */
  def writeZOrdered(df: DataFrame, xCol: Column, yCol: Column,
      path: String, numFiles: Int): Unit = {
    val lim = 256L
    val z = LayoutQueries.zValue(
      pmod(xCol, lit(lim)).cast("int"), pmod(yCol, lit(lim)).cast("int"))
    df.withColumn("__z", z.cast("long"))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").option("compression", "snappy").parquet(path)
  }

  /** Per-file bounding boxes of a written layout — the footer stats a
    * scan would prune with. Returns (file, n_rows, x_span, y_span)
    * with spans as the fraction of each dimension's 2^8 domain. */
  def auditLayout(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val lim = 256L
    df.select(input_file_name().as("file"),
        pmod(xCol, lit(lim)).cast("int").as("qx"),
        pmod(yCol, lit(lim)).cast("int").as("qy"))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"),
        min("qx").as("qx_min"), max("qx").as("qx_max"),
        min("qy").as("qy_min"), max("qy").as("qy_max"))
      .select(col("file"), col("n_rows"),
        round((col("qx_max") - col("qx_min") + 1).cast("double") / lim, 6).as("x_span"),
        round((col("qy_max") - col("qy_min") + 1).cast("double") / lim, 6).as("y_span"))
  }
}
