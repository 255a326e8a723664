package graft.jobs

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TimeExprs

/** Mispartition repair — the reference's data-cleaner
  * (`data-cleaner.py:93-237`): rows whose stored `hiveperiod` partition
  * disagrees with the partition their event time dictates (possible when
  * device clocks drift days off and land "late" — the reference never
  * drops late data, §2.10) are detected and the affected partitions are
  * rewritten with re-derived keys.
  *
  * Differences from the reference, by design:
  *  - detection and rewrite are one Spark job each, not a driver loop
  *    over CSV work lists;
  *  - the rewrite uses dynamic partition overwrite (atomic per
  *    partition) instead of append-then-manually-delete — the reference
  *    stub's "delete old files" step is where its risk lived.
  */
object RepairJob {

  private def derivedPeriod: Column =
    to_date(TimeExprs.toWita(TimeExprs.normalizeEpoch(col("heartbeat"))))

  /** Audit query (reference `data-cleaner.py:109-115`): distinct
    * (stored partition, derived partition) disagreements. */
  def detectMispartitioned(silver: DataFrame): DataFrame =
    silver
      .withColumn("accurate_hiveperiod", derivedPeriod)
      .where(col("hiveperiod") =!= col("accurate_hiveperiod"))
      .select("hiveperiod", "dstrct_code", "accurate_hiveperiod")
      .distinct()

  /** Materialize the audit work list as a CSV report (SURVEY §2.2 K2) —
    * the reference's repair loop writes CSV audit/work lists
    * (`data-cleaner.py:117`, `data-cleaner.py:174`). `coalesce(1)` is
    * deliberate: the list is a DISTINCT over (partition, district)
    * pairs — operator-sized, not data-sized — and an audit report wants
    * one file. Returns the number of disagreement rows reported. */
  def writeAuditReport(spark: SparkSession, silverPath: String, reportDir: String): Long = {
    val silver = spark.read.option("mergeSchema", "true").parquet(silverPath)
    val audit = detectMispartitioned(silver).cache()
    try {
      val n = audit.count()
      audit.coalesce(1).write.mode("overwrite").option("header", "true").csv(reportDir)
      n
    } finally { audit.unpersist(); () }
  }

  /** Rewrite every partition touched by mispartitioned rows — sources
    * AND destinations, so dynamic overwrite never replaces a destination
    * partition with only its incoming rows. The set {stored ∪ derived}
    * from a global detection pass is closed: any row inside it lands
    * inside it. Returns the number of rows that changed partition. */
  def repair(spark: SparkSession, silverPath: String): Long = {
    // mergeSchema: silver files carry drift-heterogeneous schemas by
    // design; a footer-sampled schema would rewrite affected partitions
    // WITHOUT late-drifted columns — silent data loss that a row-count
    // check cannot see.
    val silver = spark.read.option("mergeSchema", "true").parquet(silverPath)
    val bad = detectMispartitioned(silver).collect()
    if (bad.isEmpty) return 0L

    val affected: Set[(String, String)] = bad.flatMap { r =>
      val dc = r.getString(1)
      Seq((r.getDate(0).toString, dc), (r.getDate(2).toString, dc))
    }.toSet
    val inAffected = affected
      .map { case (hp, dc) => col("hiveperiod") === hp && col("dstrct_code") === dc }
      .reduce(_ || _)

    val moved = silver.where(inAffected && col("hiveperiod") =!= derivedPeriod).count()

    // Published through the shared PartitionPublish: durable stage (the
    // overwrite must not read the path it rewrites), stage deleted only
    // after success (a mid-commit failure may leave the stage as the
    // only copy), and — load-bearing for idempotency — affected
    // partitions that end up with NO corrected rows are deleted: a
    // fully-mispartitioned partition contributes nothing to the rewrite
    // output, so dynamic overwrite alone would leave its stale rows in
    // place and every re-run would re-move (and duplicate) them.
    val affectedLeaves: Seq[graft.sources.PartitionPublish.Leaf] =
      affected.toSeq.map { case (hp, dc) => Seq(Some(hp), Some(dc)) }
    graft.sources.PartitionPublish.publish(spark, silverPath,
      silver.where(inAffected).withColumn("hiveperiod", derivedPeriod),
      Seq("hiveperiod", "dstrct_code"), affectedLeaves)
    moved
  }
}
