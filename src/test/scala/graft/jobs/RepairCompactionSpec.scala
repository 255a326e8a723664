package graft.jobs

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RepairCompactionSpec extends SparkSpec {
  import spark.implicits._

  private val Base = 1704067200L // 2024-01-01T00:00:00Z → WITA 2024-01-01

  /** A silver table where some rows sit in the wrong partition. */
  private def writeSilver(path: String): Unit = {
    val rows = Seq(
      // correct rows in 2024-01-01
      (Base, "u1", "2024-01-01", "D1"),
      (Base + 60, "u2", "2024-01-01", "D1"),
      // mispartitioned: event time says 2024-01-02, stored in 2024-01-01
      (Base + 86400, "u3", "2024-01-01", "D1"),
      // correct resident of the destination partition (must survive!)
      (Base + 86460, "u4", "2024-01-02", "D1"))
    rows.toDF("heartbeat", "unitno", "hiveperiod", "dstrct_code")
      .withColumn("hiveperiod", col("hiveperiod").cast("date"))
      .write.partitionBy("hiveperiod", "dstrct_code").parquet(path)
  }

  test("repair moves mispartitioned rows without losing destination residents") {
    val path = tmpDir("repair")
    writeSilver(path)
    val before = spark.read.parquet(path)
    assert(RepairJob.detectMispartitioned(before).count() == 1)

    val moved = RepairJob.repair(spark, path)
    assert(moved == 1)

    val after = spark.read.parquet(path)
    assert(after.count() == 4) // nothing lost
    assert(RepairJob.detectMispartitioned(after).count() == 0)
    val p2 = after.where("hiveperiod = '2024-01-02'")
      .select("unitno").as[String].collect().toSet
    assert(p2 == Set("u3", "u4")) // mover arrived, resident survived
  }

  test("repair clears a fully-mispartitioned partition and is idempotent") {
    val path = tmpDir("repair_full")
    // partition 2035-01-01 holds ONLY mispartitioned rows (a badly
    // clock-drifted device): dynamic overwrite alone would never touch
    // it (no corrected rows land there), leaving duplicates that every
    // re-run would multiply.
    Seq(
      (Base, "u1", "2035-01-01", "D1"),
      (Base + 60, "u2", "2035-01-01", "D1"),
      (Base + 120, "u3", "2024-01-01", "D1"))
      .toDF("heartbeat", "unitno", "hiveperiod", "dstrct_code")
      .withColumn("hiveperiod", col("hiveperiod").cast("date"))
      .write.partitionBy("hiveperiod", "dstrct_code").parquet(path)

    assert(RepairJob.repair(spark, path) == 2L)
    val after = spark.read.parquet(path)
    assert(after.count() == 3, "no duplicates from the emptied source partition")
    assert(after.where("hiveperiod = '2035-01-01'").isEmpty,
      "the fully-mispartitioned partition must be cleared")
    assert(RepairJob.detectMispartitioned(after).count() == 0)
    // idempotency: a second repair finds nothing to move
    assert(RepairJob.repair(spark, path) == 0L)
    assert(spark.read.parquet(path).count() == 3)
  }

  test("repair is a no-op on a healthy table") {
    val path = tmpDir("repair_ok")
    Seq((Base, "u1", "2024-01-01", "D1"))
      .toDF("heartbeat", "unitno", "hiveperiod", "dstrct_code")
      .withColumn("hiveperiod", col("hiveperiod").cast("date"))
      .write.partitionBy("hiveperiod", "dstrct_code").parquet(path)
    assert(RepairJob.repair(spark, path) == 0L)
    assert(spark.read.parquet(path).count() == 1)
  }

  test("audit report round-trips through CSV (K2 write, S5 read)") {
    val path = tmpDir("repair_audit")
    val report = tmpDir("repair_report")
    writeSilver(path)

    assert(RepairJob.writeAuditReport(spark, path, report) == 1L)

    // read back with the CSV source (S5) — header + inferred types
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(report)
    assert(back.columns.toSeq == Seq("hiveperiod", "dstrct_code", "accurate_hiveperiod"))
    val r = back.collect().head
    assert(r.getDate(0).toString == "2024-01-01")
    assert(r.getString(1) == "D1")
    assert(r.getDate(2).toString == "2024-01-02")
  }

  test("compaction merges small files, preserves rows, skips healthy partitions") {
    val path = tmpDir("compact")
    // fragmented partition: 8 appends of one file each
    (0 until 8).foreach { i =>
      Seq((Base + i, s"u$i", "2024-01-01", "D1"))
        .toDF("heartbeat", "unitno", "hiveperiod", "dstrct_code")
        .withColumn("hiveperiod", col("hiveperiod").cast("date"))
        .repartition(1)
        .write.mode("append").partitionBy("hiveperiod", "dstrct_code").parquet(path)
    }
    // healthy partition: single file
    Seq((Base + 86400, "ux", "2024-01-02", "D1"))
      .toDF("heartbeat", "unitno", "hiveperiod", "dstrct_code")
      .withColumn("hiveperiod", col("hiveperiod").cast("date"))
      .repartition(1)
      .write.mode("append").partitionBy("hiveperiod", "dstrct_code").parquet(path)

    val frag = CompactionJob.findFragmented(spark, path, maxFiles = 4)
    assert(frag.map(_.relPath) == Seq("hiveperiod=2024-01-01/dstrct_code=D1"))
    assert(frag.head.files == 8)

    val res = CompactionJob.run(spark, path, maxFiles = 4)
    assert(res.verified && res.rowsBefore == 8 && res.rowsAfter == 8)
    assert(CompactionJob.findFragmented(spark, path, maxFiles = 4).isEmpty)
    assert(spark.read.parquet(path).count() == 9) // healthy partition intact
  }

  test("a crash between the publish renames self-heals on the next run") {
    val path = tmpDir("compact_crash")
    (0 until 8).foreach { i =>
      Seq((Base + i, s"u$i", "2024-01-01", "D1"))
        .toDF("heartbeat", "unitno", "hiveperiod", "dstrct_code")
        .withColumn("hiveperiod", col("hiveperiod").cast("date"))
        .repartition(1)
        .write.mode("append").partitionBy("hiveperiod", "dstrct_code").parquet(path)
    }
    // Simulate the worst crash point: the leaf was moved aside to the
    // hidden backup but the verified staging copy never published — the
    // partition's only copy is invisible to reads and to findFragmented.
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaf = new org.apache.hadoop.fs.Path(s"$path/hiveperiod=2024-01-01/dstrct_code=D1")
    val bak = new org.apache.hadoop.fs.Path(leaf.getParent, s".compact_old_${leaf.getName}")
    assert(fs.rename(leaf, bak))
    assert(CompactionJob.findFragmented(spark, path, maxFiles = 4).isEmpty,
      "precondition: the orphaned partition is invisible")

    val res = CompactionJob.run(spark, path, maxFiles = 4)
    assert(res.verified && res.rowsBefore == 8 && res.rowsAfter == 8,
      "next run must restore the backup and compact it")
    assert(!fs.exists(bak))
    assert(spark.read.parquet(path).count() == 8)
  }

  test("a backup orphaned after a completed publish is reclaimed, not leaked") {
    val path = tmpDir("compact_bak_leak")
    Seq((Base, "u0", "2024-01-01", "D1"))
      .toDF("heartbeat", "unitno", "hiveperiod", "dstrct_code")
      .write.mode("append").partitionBy("hiveperiod", "dstrct_code").parquet(path)
    // Simulate a crash between the publish rename and the backup delete:
    // the compacted partition is visible AND its full pre-compaction copy
    // sits in the hidden backup. The partition is healthy (never selected
    // by findFragmented again), so without reclamation the duplicate data
    // persists forever.
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaf = new org.apache.hadoop.fs.Path(s"$path/hiveperiod=2024-01-01/dstrct_code=D1")
    val bak = new org.apache.hadoop.fs.Path(leaf.getParent, s".compact_old_${leaf.getName}")
    assert(org.apache.hadoop.fs.FileUtil.copy(fs, leaf, fs, bak, false,
      spark.sparkContext.hadoopConfiguration))

    CompactionJob.restoreOrphanBackups(spark, path)
    assert(!fs.exists(bak), "publish-complete backup must be deleted")
    assert(spark.read.parquet(path).count() == 1, "visible data untouched")
  }
}
