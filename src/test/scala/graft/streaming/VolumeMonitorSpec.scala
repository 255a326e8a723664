package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The live volume monitor against a hand-computed slot baseline: an
  * on-baseline hour scores z≈0, a surge clears the threshold, an
  * unknown slot (no history) emits nothing, and windows only emit once
  * the watermark passes.
  */
class VolumeMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: String, hm: String): Timestamp =
    Timestamp.valueOf(s"$day $hm:00")

  test("surge against the Monday-9am baseline flags; on-baseline hour does not") {
    implicit val sqlCtx = spark.sqlContext
    // History: Mondays 2026-01-05 and -12, 09:00 slot with 5 and 15
    // events → µ=10, σ²=50, σ=7.071068.
    val history = (Seq.fill(5)(ts("2026-01-05", "09:10")) ++
      Seq.fill(15)(ts("2026-01-12", "09:20")))
      .map(t => ("purchase", t)).toDF("event_type", "ts")
    val base = VolumeMonitor.baseline(history)
    val row = base.collect()
    assert(row.length == 1 && row.head.getDouble(4) == 10.0)

    val input = MemoryStream[(Timestamp, String)]
    val out = VolumeMonitor.zStream(
      input.toDF().toDF("ts", "event_type"), base)
    val q = out.writeStream.format("memory").queryName("volume_monitor")
      .outputMode("append").start()
    try {
      // Monday 2026-01-19, 09:00 window: 30 events → z = 20/7.071 = 2.828 > 2.
      input.addData(Seq.fill(30)((ts("2026-01-19", "09:05"), "purchase")): _*)
      // Plus an hour with no baseline slot (Monday 03:00) — must not emit.
      input.addData((ts("2026-01-19", "03:05"), "purchase"))
      q.processAllAvailable()
      assert(spark.table("volume_monitor").count() == 0,
        "no emission before the watermark passes the window end")

      // Advance the watermark past 10:00 (30-min delay → event at 10:31).
      input.addData((ts("2026-01-19", "10:31"), "purchase"))
      q.processAllAvailable()
      val got = spark.table("volume_monitor").collect()
        .map(r => r.getTimestamp(0).toString ->
          (r.getLong(3), r.getDouble(6), r.getBoolean(7))).toMap
      assert(got.keySet == Set("2026-01-19 09:00:00.0"),
        s"the no-baseline 03:00 window must drop, not score: ${got.keySet}")
      val (n, z, flagged) = got("2026-01-19 09:00:00.0")
      assert(n == 30L && flagged, s"n=$n z=$z")
      assert(math.abs(z - 2.828427) < 1e-6, z.toString)
    } finally q.stop()
  }
}
