package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Caches
import graft.operators.SubstringDedup
import graft.sources.WinnowStore
import graft.state.JdbcStateStore

/** Streaming maintenance of the char-winnow fingerprint store:
  * micro-batches advance it exactly once, replays converge, and the
  * substring probe immediately rides the stream-maintained index.
  */
class WinnowMaintainerSpec extends SparkSpec {
  import spark.implicits._

  private val passage =
    "all rights reserved worldwide under the berne convention and " +
      "no part of this publication may be reproduced without permission "
  private def filler(tag: String, n: Int): String =
    Iterator.from(0).map(i => s"$tag$i ").take(n).mkString.take(n)
      .dropRight(1) + tag.head

  test("streamed batches advance the store exactly once; the probe reads it; replay skips") {
    implicit val sqlCtx = spark.sqlContext
    val ctl = new JdbcStateStore("jdbc:derby:memory:winmaint1;create=true")
    ctl.ensureTable()
    val dir = tmpDir("winmaint_store")
    val input = MemoryStream[(Long, String)]
    val q = WinnowMaintainer.exactlyOnce(
      input.toDF().toDF("doc_id", "text"), ctl, "winnowstore", dir)
      .option("checkpointLocation", tmpDir("winmaint_cp")).start()
    try {
      input.addData((2L, passage + filler("vc", 95)))
      q.processAllAvailable()
      input.addData((4L, filler("wd", 120) + passage))
      q.processAllAvailable()
    } finally q.stop()

    val hist = Seq((2L, passage + filler("vc", 95)),
      (4L, filler("wd", 120) + passage)).toDF("doc_id", "text")
    val fresh = Seq((1L, filler("za", 30) + passage + filler("zb", 50)))
      .toDF("doc_id", "text")
    spark.conf.set(WinnowStore.DirKey, dir)
    try {
      val idx = WinnowStore.openFresh(hist)
      assert(idx.isDefined, "stream-maintained store must be fresh for the streamed history")
      val got = SubstringDedup.substringProbeOn(fresh, hist, idx.get)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      Caches.releaseAll()
      assert(got == Set((1L, filler("za", 30).length + 1L, passage.length.toLong)),
        s"the probe must find exactly the planted passage in the fresh doc: $got")
    } finally spark.conf.unset(WinnowStore.DirKey)

    // Replay of a committed batch skips and never duplicates rows.
    val replayed = WinnowMaintainer.advanceBatch(
      Seq((2L, passage + filler("vc", 95))).toDF("doc_id", "text"),
      ctl, "winnowstore", dir, batchId = 0L)
    assert(!replayed, "committed batch must report skipped")
    val dupFps = spark.read.parquet(s"$dir/fps")
      .groupBy("doc_id", "fp").count().where(col("count") > 1).count()
    assert(dupFps == 0L, "no (doc, fp) row may duplicate after a replay")
  }
}
