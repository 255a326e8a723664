package graft.jobs

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Regression tests for the silent-data-loss paths found in review:
  * silver files have drift-heterogeneous schemas by design, so any job
  * that rewrites partitions must read with mergeSchema — a
  * footer-sampled schema drops late-drifted columns while the row-count
  * "verified" check still passes. */
class DriftSchemaSpec extends SparkSpec {
  import spark.implicits._

  private val Base = 1704067200L

  /** Partition with TWO files of different schemas: an old file without
    * `fuel_level` (written first — its footer is the likely sample) and
    * a drifted file with it. */
  private def writeDriftedSilver(path: String): Unit = {
    Seq((Base, "old1", "2024-01-01", "D1"))
      .toDF("heartbeat", "unitno", "hiveperiod", "dstrct_code")
      .withColumn("hiveperiod", col("hiveperiod").cast("date"))
      .repartition(1)
      .write.mode("append").partitionBy("hiveperiod", "dstrct_code").parquet(path)
    Seq((Base + 60, "new1", "2024-01-01", "D1", 0.82),
      (Base + 120, "new2", "2024-01-01", "D1", 0.79),
      (Base + 180, "new3", "2024-01-01", "D1", 0.75),
      (Base + 240, "new4", "2024-01-01", "D1", 0.71),
      (Base + 300, "new5", "2024-01-01", "D1", 0.68))
      .toDF("heartbeat", "unitno", "hiveperiod", "dstrct_code", "fuel_level")
      .withColumn("hiveperiod", col("hiveperiod").cast("date"))
      .repartition(5)
      .write.mode("append").partitionBy("hiveperiod", "dstrct_code").parquet(path)
  }

  test("compaction preserves drifted columns (mergeSchema regression)") {
    val path = tmpDir("drift_compact")
    writeDriftedSilver(path)
    val res = CompactionJob.run(spark, path, maxFiles = 2)
    assert(res.verified && res.rowsBefore == 6)
    val after = spark.read.option("mergeSchema", "true").parquet(path)
    assert(after.columns.contains("fuel_level"), "drifted column lost by compaction")
    assert(after.where("fuel_level IS NOT NULL").count() == 5)
  }

  test("repair preserves drifted columns (mergeSchema regression)") {
    val path = tmpDir("drift_repair")
    writeDriftedSilver(path)
    // add a mispartitioned row so repair rewrites the partition
    Seq((Base + 86400, "moved", "2024-01-01", "D1"))
      .toDF("heartbeat", "unitno", "hiveperiod", "dstrct_code")
      .withColumn("hiveperiod", col("hiveperiod").cast("date"))
      .write.mode("append").partitionBy("hiveperiod", "dstrct_code").parquet(path)

    assert(RepairJob.repair(spark, path) == 1L)
    val after = spark.read.option("mergeSchema", "true").parquet(path)
    assert(after.count() == 7)
    assert(after.columns.contains("fuel_level"), "drifted column lost by repair")
    assert(after.where("fuel_level IS NOT NULL").count() == 5)
  }

  test("watchdog: a column drifting in mid-steady-state reaches silver without relearnSchema") {
    import java.sql.Timestamp
    import graft.Fixtures
    import graft.state.JdbcStateStore
    val dir = tmpDir("wd_bronze")
    val target = tmpDir("wd_silver")
    val store = new JdbcStateStore(
      s"jdbc:derby:memory:wd${scala.util.Random.nextInt(1000000)};create=true")
    store.ensureTable()
    try {
      // batch 1: registers the merged schema (no engine_temp anywhere)
      val (keys, _, _) = Fixtures.bronzeBatch(dir)
      keys.zipWithIndex.foreach { case (k, i) =>
        store.register(k, "DISTRICTB", new Timestamp(1704067200000L + i))
      }
      CompactorJob.run(spark, store, "wd-r1", "DISTRICTB", target)
      assert(!store.loadSchema(CompactorJob.SchemaDataset).get
        .fieldNames.contains("engine_temp"))

      // batch 2, steady state (relearnSchema stays false): a brand-new
      // field drifts in — the one-file watchdog must catch it
      val k2 = Fixtures.writeGz(s"$dir/site/dev9/2024010101/2024010101.txt.gz", Seq(
        s"""{"heartbeat": ${Fixtures.Base + 3600}, "unitno": "NEW1", "deviceid": "X", "gpsspeed": 10.0, "engine_temp": 88.5}"""))
      store.register(k2, "DISTRICTB", new Timestamp(1704070800000L))
      val r2 = CompactorJob.run(spark, store, "wd-r2", "DISTRICTB", target)
      assert(r2.rows == 1)
      assert(r2.newFields == Seq("engine_temp"),
        "drift-triggered inference must surface the new fields (re-ingest signal)")

      val silver = spark.read.option("mergeSchema", "true").parquet(target)
      assert(silver.columns.contains("engine_temp"),
        "drifted column silently dropped in steady state")
      assert(silver.where("engine_temp IS NOT NULL").count() == 1)
      assert(store.loadSchema(CompactorJob.SchemaDataset).get
        .fieldNames.contains("engine_temp"), "registry not re-learned")
    } finally store.close()
  }

  test("compaction sizes output files from partition bytes, not one file per partition") {
    val path = tmpDir("compact_sizing")
    // many small files in one partition
    (0 until 10).foreach { i =>
      Seq((Base + i, s"u$i", "2024-01-01", "D1"))
        .toDF("heartbeat", "unitno", "hiveperiod", "dstrct_code")
        .withColumn("hiveperiod", col("hiveperiod").cast("date"))
        .repartition(1)
        .write.mode("append").partitionBy("hiveperiod", "dstrct_code").parquet(path)
    }
    val res = CompactionJob.run(spark, path, maxFiles = 4)
    assert(res.verified && res.rowsBefore == 10)
    // tiny partition → 1 target file (bytes/200MB rounds up to 1)
    val files = new java.io.File(s"$path/hiveperiod=2024-01-01/dstrct_code=D1")
      .listFiles().filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    assert(files.length == 1, s"expected 1 compacted file, got ${files.length}")
  }
}
