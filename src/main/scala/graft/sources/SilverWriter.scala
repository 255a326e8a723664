package graft.sources

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

import graft.functions.TimeExprs

/** Silver-layer writer: enrichment + hive-partitioned snappy Parquet
  * append (reference K1, `gzip-to-parquet-etl.py:261-277`: `COPY ...
  * PARTITION_BY (hiveperiod, dstrct_code) ... APPEND`).
  *
  * Single-pass design: the reference counts then copies, reading S3
  * twice (`s3_datalog_processor.py:162` + `:184`, flagged in SURVEY §3.1);
  * here an [[Observation]] rides along with the write job, so the
  * zero-row gate and row-count metric cost nothing extra.
  *
  * Scale: `repartition(partitionCols)` before the write produces one
  * task's worth of output per (date, district) partition per batch —
  * the reference's 150–250 MB file-size target
  * (`README-compacterv1.md:104`) — instead of tasks × partitions small
  * files. Skewed partitions are re-split by AQE.
  */
object SilverWriter {

  val PartitionCols: Seq[String] = Seq("hiveperiod", "dstrct_code")

  /** The reference's enrichment block (`gzip-to-parquet-etl.py:225-245`):
    * normalized event time (mixed-precision epoch → UTC), WITA display
    * time, WITA-date partition key. `dstrct_code` is injected by the
    * caller (it's batch metadata, not row data). */
  def enrich(df: DataFrame, district: String): DataFrame = {
    val (wita, hiveperiod) = TimeExprs.enrichment(col("heartbeat"))
    df.withColumn("datetime_wita", wita.cast("timestamp_ntz"))
      .withColumn("hiveperiod", hiveperiod)
      .withColumn("dstrct_code", lit(district))
  }

  /** Append a batch as partitioned parquet; returns rows written.
    * Zero-row batches write nothing but the directory skeleton —
    * the reference's gate (`gzip-to-parquet-etl.py:252-257`). */
  def write(df: DataFrame, target: String): Long = {
    val obs = Observation()
    df.observe(obs, count(lit(1)).as("rows"))
      .repartition(PartitionCols.map(col): _*)
      .write
      .mode("append")
      .option("compression", "snappy")
      .partitionBy(PartitionCols: _*)
      .parquet(target)
    obs.get("rows").asInstanceOf[Long]
  }
}
