package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Live sessionization: bursts merge into one session (including via a
  * cross-batch bridging event), sessions only emit after the watermark
  * proves the gap elapsed, and the session geometry matches q28's batch
  * semantics (end = last event + gap).
  */
class SessionMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hm: String): Timestamp =
    Timestamp.valueOf(s"2026-03-02 $hm:00")

  test("a bridged burst closes as ONE session with batch-identical geometry") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    // 2 h allowance: the bridge below arrives in a LATER micro-batch
    // than the events it merges, so it must stay above the watermark
    // (watermark = max event time − allowance, updated per batch; a
    // bridge below it would be dropped and the spans would close split).
    val q = SessionMonitor.sessions(input.toDF().toDF("ts", "user_id"), "2 hours")
      .writeStream.format("memory").queryName("live_sessions")
      .outputMode("append").start()
    try {
      // User 1: 09:00 and 09:50 — 50 min apart, TWO open sessions under
      // the 30-min gap... until the next batch's 09:25 bridges them.
      input.addData((ts("09:00"), 1L), (ts("09:50"), 1L))
      input.addData((ts("09:25"), 1L)) // later batch, above wm (07:50)
      // User 2: a lone event — its own session.
      input.addData((ts("09:05"), 2L))
      q.processAllAvailable()
      assert(spark.table("live_sessions").count() == 0,
        "nothing emits until the watermark passes a session end")

      // 13:00 event → watermark 11:00 > both session ends: they close.
      input.addData((ts("13:00"), 9L))
      q.processAllAvailable()
      val got = spark.table("live_sessions").collect()
        .map(r => r.getLong(2) ->
          ((r.getTimestamp(0).toString, r.getTimestamp(1).toString, r.getLong(3)))).toMap
      // The bridge MERGED the spans: one 3-event session 09:00→10:20
      // (last event 09:50 + 30-min gap), not two.
      assert(got.get(1L).contains(("2026-03-02 09:00:00.0", "2026-03-02 10:20:00.0", 3L)),
        got.toString)
      assert(got.get(2L).contains(("2026-03-02 09:05:00.0", "2026-03-02 09:35:00.0", 1L)),
        got.toString)
      assert(got.size == 2, s"user 9's session is still open: $got")
    } finally q.stop()
  }
}
