package graft.streaming

import org.apache.spark.sql.functions._

import graft.{Fixtures, SparkSpec}
import graft.sources.BronzeReader

class StreamingIngestSpec extends SparkSpec {

  test("AvailableNow streaming ingest drains the backlog into silver") {
    val dir = tmpDir("sbronze")
    val target = tmpDir("ssilver")
    val ckpt = tmpDir("sckpt")
    val (keys, expectClean, _) = Fixtures.bronzeBatch(dir)

    // schema from a batch inference pass (prod would load it from state)
    val schema = BronzeReader.withCorruptColumn(
      spark.read.option("samplingRatio", "1.0").json(keys: _*).schema)

    val q = StreamingIngest.start(spark, s"$dir/site/*/*", schema, target, ckpt, "DISTRICTB")
    q.awaitTermination(120000)

    val silver = spark.read.parquet(target)
    assert(silver.count() == expectClean)
    assert(silver.select("hiveperiod").distinct().count() == 2) // incl. late row

    // restart with same checkpoint: nothing re-processed (file-source
    // exactly-once — the claim pattern's streaming equivalent)
    val q2 = StreamingIngest.start(spark, s"$dir/site/*/*", schema, target, ckpt, "DISTRICTB")
    q2.awaitTermination(120000)
    assert(spark.read.parquet(target).count() == expectClean)
  }

  test("ProcessingTime steady-state ingest picks up files arriving between polls") {
    val dir = tmpDir("pbronze")
    val target = tmpDir("psilver")
    val ckpt = tmpDir("pckpt")
    val (keys, expectClean, _) = Fixtures.bronzeBatch(dir)
    val schema = BronzeReader.withCorruptColumn(
      spark.read.option("samplingRatio", "1.0").json(keys: _*).schema)

    // steady-state mode: the reference's hourly poll loop
    // (`gzip-to-parquet-etl.py:345-347`), shrunk to 1 s for the test
    val q = StreamingIngest.start(spark, s"$dir/site/*/*", schema, target, ckpt,
      "DISTRICTB", availableNow = false, interval = "1 second")
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(target).count() == expectClean)

      // a new file lands mid-steady-state; the next poll must ingest it
      Fixtures.writeGz(s"$dir/site/dev5/2024010101/2024010101.txt.gz",
        Seq(Fixtures.row(1704070800L, "LD774", "SLS30I005", 47.5)))
      q.processAllAvailable()
      assert(spark.read.parquet(target).count() == expectClean + 1)
      assert(spark.read.parquet(target)
        .where(col("unitno") === "LD774").count() == 1)
    } finally q.stop()
  }

  test("per-minute live aggregate matches the batch computation") {
    import spark.implicits._
    // gpslat included: the live aggregate derives gpsstatus from it with
    // the same cleaning layer as the batch dashboard (no-fix sentinel
    // -8881.0 on the third row → "false")
    val events = Seq(
      (1704067200L, "LD772", "D1", 40.0, 39.0, 11.0, -2.1, "OK", "OK", "GPS"),
      (1704067210L, "LD772", "D1", 42.0, 40.0, 11.0, -2.1, "OK", "BAD", "GPS"),
      (1704067265L, "LD772", "D1", 44.0, 44.0, 10.0, -8881.0, "OK", "OK", "GPS"))
      .toDF("epoch", "unitno", "dstrct_code", "gpsspeed", "VehicleSpeed",
        "gpsnumsat", "gpslat", "camfrontstatus", "camcabinstatus", "speedsource")
      .withColumn("datetime_wita", timestamp_seconds(col("epoch")))

    val src = tmpDir("evsrc")
    events.write.parquet(src)
    val stream = spark.readStream.schema(events.schema).parquet(src)

    val agg = StreamingIngest.perMinuteLive(stream)
    val q = agg.writeStream.format("memory").queryName("per_minute")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("per_minute")
      .orderBy("minute")
      .select("minute", "avg_gpsspeed", "avg_error_rate", "camcabinstatus", "gpsstatus")
      .collect()
    assert(got.length == 2) // two 1-minute buckets
    assert(got(0).getDouble(1) == 41.0) // avg(40, 42)
    assert(got(0).getDouble(2) == 1.5) // avg(|40-39|, |42-40|)
    assert(got(0).getString(3) == "BAD") // string-min: any-bad-wins (A5)
    assert(got(0).getString(4) == "true") // gpslat-derived, like the batch path
    assert(got(1).getDouble(1) == 44.0)
    assert(got(1).getString(4) == "false") // -8881.0 no-fix sentinel
  }
}
