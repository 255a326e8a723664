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

  test("silentSlots pages for the window the stream structurally cannot emit") {
    // Baseline: Monday 09:00 is busy (µ=10, σ≈2.16 over 3 Mondays →
    // µ/σ > 2 ⇒ a zero-count hour is anomalous); Monday 03:00 is noisy
    // relative to its mean (µ/σ < 2) so its absence never pages.
    val history = (
      Seq.fill(8)(ts("2026-01-05", "09:10")) ++
        Seq.fill(10)(ts("2026-01-12", "09:20")) ++
        Seq.fill(12)(ts("2026-01-19", "09:05")) ++
        Seq(ts("2026-01-05", "03:30")) ++
        Seq.fill(5)(ts("2026-01-12", "03:30")) ++
        Seq.fill(9)(ts("2026-01-19", "03:30")))
      .map(t => ("purchase", t)).toDF("event_type", "ts")
    val base = VolumeMonitor.baseline(history)

    // Monday 2026-01-26: the sink saw a finalized 08:00 row (off-baseline
    // hours emit nothing and must not be expected) but NOTHING for 09:00
    // — the silent-feed case — and nothing for 03:00 (absence tolerated).
    val emitted = Seq((ts("2026-01-26", "08:00"), "purchase"))
      .toDF("window_start", "event_type")
    val got = VolumeMonitor.silentSlots(
      emitted, base, ts("2026-01-26", "00:00"), ts("2026-01-26", "12:00"))
      .collect()
    assert(got.length == 1, s"exactly the silent busy slot: ${got.mkString("; ")}")
    val r = got.head
    assert(r.getTimestamp(0) == ts("2026-01-26", "09:00") &&
      r.getString(2) == "purchase" && r.getLong(3) == 0L && r.getBoolean(7),
      s"got $r")
    assert(r.getDouble(6) < -2.0, s"z at zero must clear the threshold: ${r.getDouble(6)}")

    // An emitted 09:00 row silences the watchdog for that window.
    val got2 = VolumeMonitor.silentSlots(
      emitted.union(Seq((ts("2026-01-26", "09:00"), "purchase"))
        .toDF("window_start", "event_type")),
      base, ts("2026-01-26", "00:00"), ts("2026-01-26", "12:00"))
    assert(got2.count() == 0, "a scored window is not silent")
  }
}
