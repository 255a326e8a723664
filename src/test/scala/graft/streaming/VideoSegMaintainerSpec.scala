package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.core.Caches
import graft.multimodal.VideoSegDedup
import graft.sources.VideoSegStore
import graft.state.JdbcStateStore

/** Streaming maintenance of the video segment fingerprint store:
  * micro-batches of video PAYLOADS decode exactly once into their own
  * day partitions, the pair query immediately rides the
  * stream-maintained index with zero re-decodes, and a committed
  * replay skips the decode.
  */
class VideoSegMaintainerSpec extends SparkSpec {
  import spark.implicits._

  // Two videos sharing a full interior CDC segment (the
  // VideoSegDedupSpec construction), one unrelated.
  private def isBoundary(w: String): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
    val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    h % 16 == 0
  }
  private lazy val shared = {
    val words = (0 until 2000).map(i => s"m$i")
    val bounds = words.filter(isBoundary).take(2)
    val fillers = words.filterNot(isBoundary).take(10)
    assert(bounds.size == 2)
    (bounds(0) +: fillers :+ bounds(1)).mkString("", " ", " ")
  }

  private def payloads(rows: (Long, String)*): Seq[(Long, Array[Byte])] =
    VideoSegDedup.renderVideos(rows.toSeq.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]]("content"))).toSeq

  test("streamed video batches decode once into day partitions; pairs ride the index; replay skips") {
    implicit val sqlCtx = spark.sqlContext
    val ctl = new JdbcStateStore("jdbc:derby:memory:vidmaint1;create=true")
    ctl.ensureTable()
    val dir = tmpDir("vidmaint_store")
    val day0 = payloads((10L, s"stream intro part ${shared}stream outro part"))
    val day1 = payloads(
      (20L, s"second batch lead ${shared}second batch tail"),
      (21L, "entirely unrelated streaming content with no clip shared at all"))
    val input = MemoryStream[(Long, Array[Byte])]
    val q = VideoSegMaintainer.exactlyOnce(
      input.toDF().toDF("video_id", "content"), ctl, "videosegstore", dir)
      .option("checkpointLocation", tmpDir("vidmaint_cp")).start()
    try {
      input.addData(day0: _*)
      q.processAllAvailable()
      input.addData(day1: _*)
      q.processAllAvailable()
    } finally q.stop()

    // The stream-maintained index serves the pair query with zero
    // decodes: the cross-batch shared clip surfaces.
    val pairs = VideoSegDedup.sharedSegmentPairs(VideoSegStore.open(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Caches.releaseAll()
    assert(pairs == Set((10L, 20L)), s"exactly the planted cross-batch clip: $pairs")

    // Replay of a committed batch skips (no decode, no digest change).
    val metaBefore = spark.read.parquet(s"$dir/meta").collect().toSet
    val replayed = VideoSegMaintainer.advanceBatch(
      day0.toDF("video_id", "content"), ctl, "videosegstore", dir, batchId = 0L)
    assert(!replayed, "a committed batch must be skipped on replay")
    assert(spark.read.parquet(s"$dir/meta").collect().toSet == metaBefore)

    // An UNcommitted replay (marker missing) converges: same index.
    ctl.close()
    val ctl2 = new JdbcStateStore("jdbc:derby:memory:vidmaint2;create=true")
    ctl2.ensureTable()
    val advanced = VideoSegMaintainer.advanceBatch(
      day0.toDF("video_id", "content"), ctl2, "videosegstore", dir, batchId = 0L)
    assert(advanced, "an unmarked batch must advance")
    val pairsAfter = VideoSegDedup.sharedSegmentPairs(VideoSegStore.open(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Caches.releaseAll()
    assert(pairsAfter == pairs, "replayed advance must converge to the same index")
    ctl2.close()
  }
}
