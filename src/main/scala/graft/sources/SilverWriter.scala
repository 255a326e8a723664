package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
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

  /** Idempotent per-source-file write: any silver rows that came from
    * this batch's files on an EARLIER attempt are replaced, not
    * duplicated. This is what makes a compactor retry (crash after
    * write, before ack) and a drift re-queue (same file deliberately
    * re-ingested with a fuller schema) both safe — plain `append` is
    * neither.
    *
    * Steady state costs one extra pruned read: the batch's partitions
    * (typically the current day × one district) are scanned for
    * `source_file` overlap, and when none exists — every first attempt —
    * the write degenerates to the plain append above. Only an actual
    * replay pays the rewrite, which is scoped to the affected partitions
    * and published through [[PartitionPublish]] (durable stage, dynamic
    * overwrite, emptied-partition cleanup, stage kept on failure).
    *
    * `enriched` should be backed by a cached bronze batch (CompactorJob
    * caches it) — the partition/file-list probes re-read the batch. */
  def writeIdempotent(spark: SparkSession, enriched: DataFrame, target: String): Long = {
    val fs = new Path(target).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(target))) return write(enriched, target)

    val batchParts: Seq[PartitionPublish.Leaf] =
      enriched.select(PartitionCols.map(col): _*).distinct()
        .collect().map(r => PartitionCols.indices
          .map(i => Option(r.get(i)).map(_.toString)): PartitionPublish.Leaf)
    if (batchParts.isEmpty) return write(enriched, target) // zero-row gate
    // The null-hiveperiod catch-all joins the affected set for each
    // district in the batch: a replayed file's rows can land in a
    // DIFFERENT partition than its earlier attempt when the earlier
    // read ran under a drift-degraded schema that failed to parse the
    // partition-deriving field — those earlier rows sit in
    // __HIVE_DEFAULT_PARTITION__, and a probe scoped only to the new
    // partitions would never see (or replace) them.
    val districts = batchParts.map(_.last).distinct
    val affected = (batchParts ++ districts.map(d => Seq(None, d): PartitionPublish.Leaf)).distinct
    val dirs = affected.map(PartitionPublish.leafDir(target, PartitionCols, _))
      .filter(fs.exists)
    if (dirs.isEmpty) return write(enriched, target)
    val batchFiles = enriched.select("source_file").distinct()
      .collect().map(_.getString(0))

    // The replay probe reads ONLY the affected leaf directories
    // (basePath keeps the partition columns): a whole-table mergeSchema
    // read would run footer inference over every silver file on every
    // batch — table-wide cost in steady state. mergeSchema within the
    // affected leaves still matters: their files carry
    // drift-heterogeneous schemas by design, and a footer-sampled
    // schema would silently drop late-drifted columns from the rewrite.
    val existingTry = scala.util.Try(
      spark.read.option("mergeSchema", "true").option("basePath", target)
        .parquet(dirs.map(_.toString): _*))
    if (existingTry.isFailure) return write(enriched, target) // bare skeleton dirs
    val existing = existingTry.get
    val replayed = existing.where(col("source_file").isin(batchFiles: _*))
      .limit(1).count() > 0
    if (!replayed) return write(enriched, target)

    val keep = existing.where(!col("source_file").isin(batchFiles: _*))
    val combined = keep.unionByName(enriched, allowMissingColumns = true)
    val batchRows = enriched.count() // cheap: bronze batch is cached
    PartitionPublish.publish(spark, target, combined, PartitionCols, affected)
    batchRows
  }
}
