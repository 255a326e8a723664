package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables once at write time so
  * recurring joins/aggregations on the bucket key run with NO exchange.
  *
  * At 100 TB this is the difference between shuffling the fact table on
  * every analytical join versus shuffling it once at ingest: both sides
  * bucketed by the same key into the same bucket count → Catalyst plans
  * a sort-merge join with zero Exchange operators (verified by
  * `BucketingSpec` asserting on the physical plan).
  */
object Bucketing {

  /** Write a DataFrame as a bucketed (and optionally sorted) managed
    * table. Bucket count should target HDFS-block-sized buckets at the
    * expected table volume. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Path-anchored variant: the table's data lands under `path` (an
    * EXTERNAL table) instead of the session warehouse — the right shape
    * for harness-driven runs whose session never configured
    * `spark.sql.warehouse.dir` (a managed table would drop a
    * `spark-warehouse/` directory into the process cwd). */
  def writeBucketedAt(
      df: DataFrame,
      table: String,
      path: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Count shuffle Exchange operators in a frame's executed plan —
    * the assertion primitive for "this join is co-located". */
  def exchangeCount(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan
    var planStr = plan.toString()
    // AQE wraps the plan; count on the final string representation.
    planStr.linesIterator.count(l => l.contains("Exchange hashpartitioning"))
  }
}
