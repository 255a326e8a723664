package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream funnel joins within the time bound, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val buys = MemoryStream[(Long, Timestamp, Long)]
    val cols = Seq("user_id", "ts", "event_id")
    val out = StreamJoin.funnel(
      clicks.toDF().toDF(cols: _*), buys.toDF().toDF(cols: _*), windowSeconds = 600)
    val q = out.writeStream.format("memory").queryName("funnel").outputMode("append").start()

    // batch 1: user 1 clicks; no purchase yet
    clicks.addData((1L, ts("2024-01-01 10:00:00"), 100L))
    q.processAllAvailable()
    assert(spark.table("funnel").count() == 0)

    // batch 2: user 1 buys 5 min later (in window); user 2 buys with no click
    buys.addData((1L, ts("2024-01-01 10:05:00"), 200L), (2L, ts("2024-01-01 10:05:00"), 201L))
    q.processAllAvailable()
    val rows = spark.table("funnel")
      .select("user_id", "trigger_id", "follow_id", "lag_us")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.toSeq == Seq((1L, 100L, 200L, 300L * 1000000)))

    // batch 3: user 1 buys again but outside the 10-min window → no new row
    buys.addData((1L, ts("2024-01-01 10:30:00"), 202L))
    q.processAllAvailable()
    assert(spark.table("funnel").count() == 1)
    q.stop()
  }

  test("funnel state is bounded: the analyzer accepts append mode (time-bound present)") {
    implicit val sqlCtx = spark.sqlContext
    val a = MemoryStream[(Long, Timestamp, Long)]
    val b = MemoryStream[(Long, Timestamp, Long)]
    val cols = Seq("user_id", "ts", "event_id")
    // .start() in append mode would throw for an unbounded stream-stream
    // join; reaching RUNNING proves the condition carries the range bound.
    val q = StreamJoin.funnel(a.toDF().toDF(cols: _*), b.toDF().toDF(cols: _*), 60)
      .writeStream.format("memory").queryName("bounded_check").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
  }

  test("stream-static enrich broadcasts the dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val facts = MemoryStream[(Long, Long)]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val out = StreamJoin.enrich(facts.toDF().toDF("user_id", "amount"), dim, "user_id")
    val q = out.writeStream.format("memory").queryName("enriched").outputMode("append").start()
    facts.addData((1L, 10L), (3L, 5L))
    q.processAllAvailable()
    val got = spark.table("enriched").as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 10L, "gold"), (3L, 5L, null)))
    q.stop()
  }
}
