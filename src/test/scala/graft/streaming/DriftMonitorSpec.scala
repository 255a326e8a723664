package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Live PSI against a batch reference: an on-distribution window must
  * score 0 (not epsilon-noise), a fully-shifted window must score the
  * closed-form maximum and flag, and emission must follow the
  * watermark — finalized windows only, exactly once.
  */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 00:$minute%02d:00")

  test("on-distribution window scores 0; shifted window hits the closed form and flags") {
    implicit val sqlCtx = spark.sqlContext
    // Reference: event type m splits 50/50 over bins 0 and 1.
    val reference = DriftMonitor.referenceHistogram(Seq(
      ("m", 50.0), ("m", 150.0), ("m", 50.0), ("m", 150.0))
      .toDF("event_type", "value"))
    val input = MemoryStream[(Timestamp, String, Double)]
    val out = DriftMonitor.psiStream(
      input.toDF().toDF("ts", "event_type", "value"), reference)
    val q = out.writeStream.format("memory").queryName("drift_monitor")
      .outputMode("append").start()
    try {
      // window [00:00, 00:10): same 50/50 shape as the reference
      input.addData((ts(1), "m", 50.0), (ts(2), "m", 150.0),
        (ts(3), "m", 50.0), (ts(4), "m", 150.0))
      q.processAllAvailable()
      assert(spark.table("drift_monitor").count() == 0,
        "nothing may emit before the watermark passes the window end")

      // window [00:20, 00:30): all mass in bin 9 — and its max ts moves
      // the watermark to 00:15, finalizing the first window
      input.addData((ts(21), "m", 950.0), (ts(22), "m", 950.0),
        (ts(25), "m", 950.0))
      q.processAllAvailable()
      val afterFirst = spark.table("drift_monitor")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(3), r.getDouble(4), r.getBoolean(5)))
      assert(afterFirst.toSeq == Seq(("2026-01-01 00:00:00.0", 4L, 0.0, false)),
        s"matching distribution must score EXACTLY 0: ${afterFirst.toSeq}")

      // dummy window [00:40, 00:50) pushes the watermark past 00:30
      input.addData((ts(41), "m", 50.0))
      q.processAllAvailable()
      val eps = DriftMonitor.Eps
      val expected = 2.0 * ((eps - 0.5) * math.log(eps / 0.5)) +
        (1.0 - eps) * math.log(1.0 / eps)
      val shifted = spark.table("drift_monitor")
        .where(col("window_start") === ts(20)).collect()
      assert(shifted.length == 1, "the shifted window must emit exactly once")
      val r = shifted.head
      assert(r.getLong(3) == 3L)
      assert(math.abs(r.getDouble(4) - expected) < 1e-6,
        s"psi ${r.getDouble(4)} vs closed form $expected")
      assert(r.getBoolean(5), "a fully-shifted distribution must flag")
    } finally q.stop()
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
