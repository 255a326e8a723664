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
    * via dynamic partition overwrite (the RepairJob pattern: stage the
    * combined rows durably first, because Spark refuses a plan that
    * overwrites a path it is still reading).
    *
    * `enriched` should be backed by a cached bronze batch (CompactorJob
    * caches it) — the partition/file-list probes re-read the batch. */
  def writeIdempotent(spark: SparkSession, enriched: DataFrame, target: String): Long = {
    val fs = new Path(target).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(target))) return write(enriched, target)

    // hiveperiod may be NULL (a clean row missing its heartbeat lands in
    // __HIVE_DEFAULT_PARTITION__): the predicate must use an explicit
    // isNull arm — `=== "null"` matches nothing, which would both hide
    // replays there and drop other files' rows from the rewrite.
    val affected = enriched.select(PartitionCols.map(col): _*).distinct()
      .collect().map(r => (Option(r.get(0)).map(_.toString), r.getString(1)))
    if (affected.isEmpty) return write(enriched, target) // zero-row gate
    val inAffected = affected
      .map { case (hpOpt, dc) =>
        hpOpt.map(col("hiveperiod") === _).getOrElse(col("hiveperiod").isNull) &&
          col("dstrct_code") === dc
      }
      .reduce(_ || _)
    val batchFiles = enriched.select("source_file").distinct()
      .collect().map(_.getString(0))

    // mergeSchema: silver files carry drift-heterogeneous schemas by
    // design; a footer-sampled schema would silently drop late-drifted
    // columns from the rewrite.
    val existingTry = scala.util.Try(
      spark.read.option("mergeSchema", "true").parquet(target))
    if (existingTry.isFailure) return write(enriched, target) // bare skeleton dir
    val existing = existingTry.get.where(inAffected)
    val replayed = existing.where(col("source_file").isin(batchFiles: _*))
      .limit(1).count() > 0
    if (!replayed) return write(enriched, target)

    val keep = existing.where(!col("source_file").isin(batchFiles: _*))
    val combined = keep.unionByName(enriched, allowMissingColumns = true)
    val stage = new Path(target, ".ingest_stage")
    combined.write.mode("overwrite").parquet(stage.toString)
    val batchRows = enriched.count() // cheap: bronze batch is cached

    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.read.parquet(stage.toString)
        .repartition(PartitionCols.map(col): _*)
        .write.mode("overwrite")
        .option("compression", "snappy")
        .partitionBy(PartitionCols: _*)
        .parquet(target)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    // Deleted only AFTER a successful overwrite. A publish that fails
    // mid-commit may have already cleared some affected partitions, and
    // then the stage is the only complete copy of their kept rows —
    // deleting it in a finally would turn a failed publish into silent
    // data loss. The failed run releases its claims, so the batch
    // retries; if the retry's silver read predates the partial commit
    // damage it rebuilds equivalently, and otherwise the surviving
    // stage (dot-prefixed, invisible to readers, re-overwritten by the
    // next rewrite of the same target) is the recovery artifact.
    fs.delete(stage, true)
    batchRows
  }
}
