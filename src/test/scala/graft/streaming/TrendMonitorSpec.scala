package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** The live trending monitor: top tokens surface with exact counts in
  * the within-capacity regime, windows emit only once the watermark
  * closes them, and ranks follow the deterministic (count desc, token)
  * order the batch q65 pins.
  */
class TrendMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(hm: String): Timestamp =
    Timestamp.valueOf(s"2026-03-02 $hm:00")

  test("a token flood tops the finalized window exactly once, after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = TrendMonitor.trending(input.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("trending")
      .outputMode("append").start()
    try {
      // 09:00 window: "spam" floods (12×), "ham" 8×, singletons trail.
      input.addData(
        Seq.fill(4)((ts("09:05"), "spam spam spam ham ham")) ++
          Seq((ts("09:10"), "alpha beta"), (ts("09:20"), "ham ham ham ham gamma")): _*)
      q.processAllAvailable()
      assert(spark.table("trending").count() == 0,
        "no emission before the watermark passes the window end")

      // 10:31 event → watermark 10:01 > 10:00 closes the 09:00 window.
      input.addData((ts("10:31"), "later"))
      q.processAllAvailable()
      val got = spark.table("trending").collect()
        .map(r => r.getLong(2) -> ((r.getString(3), r.getLong(4), r.getLong(5))))
        .toMap
      // Distinct tokens < capacity → sketch is exact (err = 0), and the
      // spam/ham tie at 12 breaks by (cnt desc, token asc): ham first.
      assert(got(1L) == (("ham", 12L, 0L)), got.toString)
      assert(got(2L) == (("spam", 12L, 0L)), got.toString)
      val singles = got.view.filterKeys(_ > 2).values.toSeq
      assert(singles.nonEmpty && singles.forall(v => v._2 == 1L && v._3 == 0L),
        s"tail ranks are the singletons: $got")
    } finally q.stop()
  }
}
