package graft.jobs

import java.sql.Timestamp

import graft.{Fixtures, SparkSpec}
import graft.sources.{BronzeReader, SilverWriter}
import graft.state.JdbcStateStore

/** Drift blind-window recovery (VERDICT r4 residual #1): a field that
  * drifts in only a NON-sampled file of a batch is dropped from that
  * batch's silver rows by the schema-read path; when a later inference
  * discovers the field, the acked window must be re-queued and the
  * re-ingest must REPLACE the column-less rows, not duplicate them. */
class DriftRequeueSpec extends SparkSpec {

  private def newStore(): JdbcStateStore = {
    val db = s"memory:drift${scala.util.Random.nextInt(1000000)};create=true"
    val s = new JdbcStateStore(s"jdbc:derby:$db")
    s.ensureTable()
    s
  }

  private val B = Fixtures.Base

  test("late-discovered field re-queues the blind window; re-ingest replaces, not duplicates") {
    val dir = tmpDir("bronze_drift")
    val target = tmpDir("silver_drift")
    val store = newStore()

    // Run 1: one plain file → first inference seeds the registry.
    val fA = Fixtures.writeGz(s"$dir/a/1.txt.gz",
      Seq(Fixtures.row(B, "LD1", "DEVA", 10.0)))
    store.register(fA, "D", new Timestamp(1000L))
    val r1 = CompactorJob.run(spark, store, "run-1", "D", target)
    assert(r1.rows == 1 && r1.requeued == 0)

    // Run 2, the blind batch: the OLDER file carries a new field
    // (engine_temp) but the watchdog samples only the NEWEST claimed
    // file, which doesn't — so the batch is schema-read and the field
    // is silently dropped from silver.
    val fD1 = Fixtures.writeGz(s"$dir/d1/1.txt.gz",
      Seq(Fixtures.row(B + 60, "LD2", "DEVD1", 20.0, """, "engine_temp": 91.5""")))
    val fD2 = Fixtures.writeGz(s"$dir/d2/1.txt.gz",
      Seq(Fixtures.row(B + 120, "LD3", "DEVD2", 30.0)))
    store.register(fD1, "D", new Timestamp(2000L))
    store.register(fD2, "D", new Timestamp(3000L))
    val r2 = CompactorJob.run(spark, store, "run-2", "D", target)
    assert(r2.rows == 2 && r2.newFields.isEmpty && r2.requeued == 0)
    assert(!spark.read.option("mergeSchema", "true").parquet(target)
      .columns.contains("engine_temp"), "blind window: field must be absent")

    // Run 3: a newest file carries the field → watchdog fires, inference
    // merges it, and the acked window (runs 1–2) is re-queued.
    val fE = Fixtures.writeGz(s"$dir/e/1.txt.gz",
      Seq(Fixtures.row(B + 180, "LD4", "DEVE", 40.0, """, "engine_temp": 88.0""")))
    store.register(fE, "D", new Timestamp(4000L))
    val r3 = CompactorJob.run(spark, store, "run-3", "D", target)
    assert(r3.rows == 1)
    assert(r3.newFields == Seq("engine_temp"))
    assert(r3.requeued == 3, s"expected the acked window re-queued, got ${r3.requeued}")
    assert(store.pendingCount() == 3)

    // Run 4: re-claims the re-queued window; schema-read now includes
    // the merged field, and the idempotent write replaces the old rows.
    val r4 = CompactorJob.run(spark, store, "run-4", "D", target)
    assert(r4.claimed == 3 && r4.rows == 3 && r4.requeued == 0)

    val silver = spark.read.option("mergeSchema", "true").parquet(target)
    assert(silver.count() == 4, "re-ingest must replace, not duplicate")
    assert(silver.where("engine_temp IS NOT NULL").count() == 2,
      "the blind file's rows must regain the dropped column")
    assert(store.pendingCount() == 0)
    store.close()
  }

  test("writeIdempotent: replaying the same batch replaces its rows") {
    val dir = tmpDir("bronze_replay")
    val target = tmpDir("silver_replay")
    val f1 = Fixtures.writeGz(s"$dir/x/1.txt.gz", Seq(
      Fixtures.row(B, "LD1", "DEVX", 10.0),
      Fixtures.row(B + 60, "LD1", "DEVX", 11.0)))
    val f2 = Fixtures.writeGz(s"$dir/y/1.txt.gz",
      Seq(Fixtures.row(B + 120, "LD2", "DEVY", 12.0)))

    def enriched(paths: Seq[String]) = {
      val bronze = BronzeReader.read(spark, paths).cache()
      SilverWriter.enrich(bronze, "D")
    }

    assert(SilverWriter.writeIdempotent(spark, enriched(Seq(f1, f2)), target) == 3L)
    assert(spark.read.parquet(target).count() == 3)
    // Crash-retry shape: the same batch written again must not append.
    assert(SilverWriter.writeIdempotent(spark, enriched(Seq(f1, f2)), target) == 3L)
    assert(spark.read.parquet(target).count() == 3)
    // Partial replay (one file of the batch) also replaces just its rows.
    assert(SilverWriter.writeIdempotent(spark, enriched(Seq(f1)), target) == 2L)
    assert(spark.read.parquet(target).count() == 3)
    // A genuinely new file still appends.
    val f3 = Fixtures.writeGz(s"$dir/z/1.txt.gz",
      Seq(Fixtures.row(B + 180, "LD3", "DEVZ", 13.0)))
    assert(SilverWriter.writeIdempotent(spark, enriched(Seq(f3)), target) == 1L)
    assert(spark.read.parquet(target).count() == 4)
  }

  test("PartitionPublish clears an affected partition that receives no output rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val target = tmpDir("publish_clear")
    // partitions A (2 rows) and B (1 row)
    Seq(("2024-01-01", "D", 1L), ("2024-01-01", "D", 2L), ("2024-01-02", "D", 3L))
      .toDF("hiveperiod", "dstrct_code", "v")
      .withColumn("hiveperiod", col("hiveperiod").cast("date"))
      .write.partitionBy("hiveperiod", "dstrct_code").parquet(target)
    // publish replaces BOTH partitions, but the output lands only in B:
    // dynamic overwrite alone cannot clear A — the helper must.
    val rows = Seq(("2024-01-02", "D", 10L), ("2024-01-02", "D", 11L))
      .toDF("hiveperiod", "dstrct_code", "v")
      .withColumn("hiveperiod", col("hiveperiod").cast("date"))
    graft.sources.PartitionPublish.publish(spark, target, rows,
      Seq("hiveperiod", "dstrct_code"),
      Seq(Seq(Some("2024-01-01"), Some("D")), Seq(Some("2024-01-02"), Some("D"))))
    val after = spark.read.parquet(target)
    assert(after.count() == 2)
    assert(after.where("hiveperiod = '2024-01-01'").isEmpty,
      "the emptied affected partition must be cleared")
    assert(after.select("v").as[Long].collect().toSet == Set(10L, 11L))
  }

  test("writeIdempotent: null-heartbeat rows (default partition) replace, not duplicate") {
    val dir = tmpDir("bronze_nullhb")
    val target = tmpDir("silver_nullhb")
    // valid JSON, no heartbeat → hiveperiod NULL → __HIVE_DEFAULT_PARTITION__
    val fNull = Fixtures.writeGz(s"$dir/n/1.txt.gz", Seq(
      """{"unitno": "LD9", "deviceid": "DEVN", "gpsspeed": 1.0}""",
      Fixtures.row(B, "LD9", "DEVN", 2.0)))
    val fOther = Fixtures.writeGz(s"$dir/o/1.txt.gz",
      Seq("""{"unitno": "LD8", "deviceid": "DEVO", "gpsspeed": 3.0}"""))

    def enriched(paths: Seq[String]) = {
      val bronze = graft.sources.BronzeReader.read(spark, paths).cache()
      SilverWriter.enrich(bronze, "D")
    }
    assert(SilverWriter.writeIdempotent(spark, enriched(Seq(fNull, fOther)), target) == 3L)
    val silver = spark.read.parquet(target)
    assert(silver.count() == 3 && silver.where("hiveperiod IS NULL").count() == 2)
    // Replaying only fNull must replace its rows — including the one in
    // the default partition — and must NOT touch fOther's row there.
    assert(SilverWriter.writeIdempotent(spark, enriched(Seq(fNull)), target) == 2L)
    val after = spark.read.parquet(target)
    assert(after.count() == 3, "null-partition replay must neither drop nor duplicate")
    assert(after.where("hiveperiod IS NULL").count() == 2)
    assert(after.where("source_file LIKE '%/o/%'").count() == 1,
      "the other file's default-partition row must survive the rewrite")
  }
}
