package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Live mixture drift against a trained target: an on-plan window
  * scores exactly 0, a skewed window scores the hand-computed
  * total-variation distance and flags, unknown domains count as
  * drift, and emission follows the watermark — exactly once.
  */
class MixtureMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 00:$minute%02d:00")

  test("on-plan window scores 0; skewed and unknown-domain windows hit the closed form") {
    implicit val sqlCtx = spark.sqlContext
    // target: en 0.75, zh 0.25 (char mass)
    val target = MixtureMonitor.train(
      Seq(("en", 300L), ("zh", 100L)).toDF("lang", "n_chars"))
    assert(target == Seq(("en", 0.75), ("zh", 0.25)))

    val input = MemoryStream[(Timestamp, String, Long)]
    val out = MixtureMonitor.driftStream(
      input.toDF().toDF("ts", "lang", "n_chars"), target)
    val q = out.writeStream.format("memory").queryName("mix_monitor")
      .outputMode("append").start()
    try {
      // window [00:00, 00:10): exactly on plan (150/50)
      input.addData((ts(1), "en", 100L), (ts(2), "en", 50L), (ts(3), "zh", 50L))
      q.processAllAvailable()
      assert(spark.table("mix_monitor").count() == 0,
        "nothing may emit before the watermark passes the window end")

      // window [00:20, 00:30): all zh — tv = (|0-.75| + |1-.25|)/2 = 0.75;
      // its max ts finalizes the first window
      input.addData((ts(21), "zh", 80L), (ts(25), "zh", 20L))
      q.processAllAvailable()
      val first = spark.table("mix_monitor").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      assert(first.toSeq == Seq(("2026-01-01 00:00:00.0", 200L, 0.0, false)),
        s"the on-plan window must score EXACTLY 0: ${first.toSeq}")

      // window [00:40, 00:50): half the mass in an UNKNOWN domain —
      // tv = (|.375-.75| + |.125-.25| + .5)/2 = 0.5; finalizes 00:20's
      input.addData((ts(41), "en", 75L), (ts(42), "zh", 25L), (ts(43), "xx", 100L))
      q.processAllAvailable()
      val second = spark.table("mix_monitor")
        .where(col("window_start") === ts(20)).collect()
      assert(second.length == 1, "the skewed window must emit exactly once")
      assert(second.head.getDouble(3) == 0.75 && second.head.getBoolean(4),
        s"all-zh window: ${second.head}")

      // a far-future row (watermark 01:05 − 10min > 00:50) finalizes
      // the unknown-domain window
      input.addData((Timestamp.valueOf("2026-01-01 01:05:00"), "en", 1L))
      q.processAllAvailable()
      val third = spark.table("mix_monitor")
        .where(col("window_start") === ts(40)).collect()
      assert(third.length == 1)
      assert(third.head.getDouble(3) == 0.5 && third.head.getBoolean(4),
        s"unknown-domain mass must count as drift: ${third.head}")
    } finally q.stop()
  }

  test("hostile domain names wire cleanly: a target domain named 'other', one with a dot") {
    implicit val sqlCtx = spark.sqlContext
    // Positional mass columns (r13): a domain literally named "other"
    // must not collide with the unknown-mass column, and "pt.br" must
    // not break column resolution — both broke the lang-derived m_$l
    // naming this test pins the fix for.
    val target = MixtureMonitor.train(
      Seq(("other", 100L), ("pt.br", 100L)).toDF("lang", "n_chars"))
    assert(target == Seq(("other", 0.5), ("pt.br", 0.5)))
    val input = MemoryStream[(Timestamp, String, Long)]
    val out = MixtureMonitor.driftStream(
      input.toDF().toDF("ts", "lang", "n_chars"), target)
    val q = out.writeStream.format("memory").queryName("mix_hostile")
      .outputMode("append").start()
    try {
      // on-plan window, plus mass in a genuinely unknown domain "xx":
      // shares (other .25, pt.br .25, unknown .5) vs (.5, .5, 0)
      // → tv = (.25 + .25 + .5)/2 = 0.5 — the named-"other" target
      // mass and the unknown mass must NOT pool together.
      input.addData((ts(1), "other", 50L), (ts(2), "pt.br", 50L), (ts(3), "xx", 100L))
      input.addData((Timestamp.valueOf("2026-01-01 01:05:00"), "other", 1L))
      q.processAllAvailable()
      val rows = spark.table("mix_hostile")
        .where(col("window_start") === ts(0)).collect()
      assert(rows.length == 1)
      assert(rows.head.getDouble(3) == 0.5 && rows.head.getBoolean(4),
        s"named-'other' domain must stay distinct from unknown mass: ${rows.head}")
    } finally q.stop()
  }
}
