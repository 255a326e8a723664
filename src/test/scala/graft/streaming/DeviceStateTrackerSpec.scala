package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.DeviceStateTracker._

class DeviceStateTrackerSpec extends SparkSpec {
  import spark.implicits._

  test("gap alerts fire across micro-batches with state carried between them") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ping]
    val alerts = trackGaps(input.toDS(), gapSeconds = 60)
    val q = alerts.writeStream.format("memory").queryName("gap_alerts")
      .outputMode("append").start()

    // batch 1: two devices ping normally
    input.addData(Ping("devA", 1000L), Ping("devA", 1030L), Ping("devB", 1000L))
    q.processAllAvailable()
    assert(spark.table("gap_alerts").count() == 0)

    // batch 2: devA reappears after 300s silence; devB stays regular
    input.addData(Ping("devA", 1330L), Ping("devB", 1050L))
    q.processAllAvailable()
    val got = spark.table("gap_alerts").as[GapAlert].collect()
    assert(got.length == 1)
    assert(got.head.deviceid == "devA" && got.head.gapSeconds == 300L)
    assert(got.head.totalPings == 2L) // state counted batch-1 pings

    // batch 3: in-batch gap also detected
    input.addData(Ping("devB", 2000L))
    q.processAllAvailable()
    assert(spark.table("gap_alerts").count() == 2)
    q.stop()
  }

  test("dropDuplicatesWithinWatermark removes re-delivered events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val df = input.toDF().toDF("event_id", "ts")
    val deduped = dedupWithinWatermark(df, "event_id", "ts")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    input.addData((1L, t0), (2L, t0), (1L, t0)) // in-batch duplicate
    q.processAllAvailable()
    input.addData((2L, t0), (3L, t0)) // cross-batch re-delivery
    q.processAllAvailable()
    assert(spark.table("dedup_out").select("event_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L))
    q.stop()
  }

  test("streaming content-fingerprint dedup drops formatting-only re-deliveries") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.TextExprs
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val df = input.toDF().toDF("doc_id", "text", "ts")
      .withColumn("fp", TextExprs.fingerprint(col("text")))
    val deduped = dedupWithinWatermark(df, "fp", "ts")
    val q = deduped.writeStream.format("memory").queryName("fp_dedup")
      .outputMode("append").start()

    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    input.addData((1L, "Hello  World", t0), (2L, "unrelated text", t0))
    q.processAllAvailable()
    // batch 2: doc 3 is doc 1 with normalized-away formatting differences
    input.addData((3L, "  hello world ", t0))
    q.processAllAvailable()
    assert(spark.table("fp_dedup").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L),
      "a formatting-only duplicate must be dropped by its content fingerprint")
    q.stop()
  }
}
