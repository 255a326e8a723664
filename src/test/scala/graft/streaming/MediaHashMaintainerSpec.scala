package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.core.Caches
import graft.multimodal.MediaDedup
import graft.sources.MediaHashStore
import graft.state.JdbcStateStore

/** Streaming maintenance of the media hash index's sourced face:
  * micro-batches of (media_id, text, content) decode exactly once,
  * each batch lands as its own day with its source digest, the decon
  * dispatch (openFreshFor) reads the stream-maintained index fresh,
  * and committed replays skip the decode entirely.
  */
class MediaHashMaintainerSpec extends SparkSpec {
  import spark.implicits._

  private val captions = Seq(
    10L -> "a red barn beside a quiet country road at dawn with mist",
    11L -> "an entirely unrelated picture of machinery in a factory hall",
    20L -> "a small boat crossing a calm lake under an overcast sky",
    21L -> "yet another unrelated frame of dense city traffic at night",
    30L -> "a benchmark photograph of a rare astronomical event over water")

  private def rows(ids: Long*): Seq[(Long, String, Array[Byte])] =
    ids.map { id =>
      val t = captions.toMap.apply(id)
      (id, t, MediaDedup.renderImage(t))
    }
  private def src(ids: Long*): DataFrame =
    ids.map(id => (id, captions.toMap.apply(id))).toDF("media_id", "text")

  test("streamed media batches decode once and advance the sourced face exactly once; the dispatch reads it; replay skips") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("mediamaint_store")
    // Backfill as day -1 (outside the stream's batch-id range).
    MediaHashStore.buildSourced(src(10L, 11L),
      MediaDedup.hashImages(rows(10L, 11L).map(r => (r._1, r._3))
        .toDF("media_id", "content")), dir, day = -1)
    val ctl = new JdbcStateStore("jdbc:derby:memory:mediamaint1;create=true")
    ctl.ensureTable()
    val input = MemoryStream[(Long, String, Array[Byte])]
    val q = MediaHashMaintainer.exactlyOnce(
      input.toDF().toDF("media_id", "text", "content"), ctl, "mediamaint", dir)
      .option("checkpointLocation", tmpDir("mediamaint_cp")).start()
    try {
      input.addData(rows(20L, 21L): _*)
      q.processAllAvailable()
      input.addData(rows(30L): _*)
      q.processAllAvailable()
    } finally q.stop()

    spark.conf.set(MediaHashStore.DirKey, dir)
    try {
      // Fresh for backfill + both streamed batches; hashes byte-equal
      // the inline render+hash of the same corpus.
      val served = MediaHashStore.openFreshFor(src(10L, 11L, 20L, 21L, 30L))
      assert(served.isDefined,
        "stream-maintained sourced store must be fresh for backfill + streamed batches")
      val inline = MediaDedup.hashImages(
        rows(10L, 11L, 20L, 21L, 30L).map(r => (r._1, r._3))
          .toDF("media_id", "content")).collect().map(_.toString).toSet
      assert(served.get.collect().map(_.toString).toSet == inline,
        "served hashes must equal the inline derivation")
      // A partial source (missing a streamed day's rows) reads stale.
      assert(MediaHashStore.openFreshFor(src(10L, 11L, 20L, 21L)).isEmpty,
        "a source missing a committed day must read stale")
    } finally {
      spark.conf.unset(MediaHashStore.DirKey)
      Caches.releaseAll()
    }

    // Committed replay skips — no decode, no rows duplicated.
    val before = spark.read.parquet(s"$dir/hashes").count()
    assert(!MediaHashMaintainer.advanceBatch(
      rows(20L, 21L).toDF("media_id", "text", "content"),
      ctl, "mediamaint", dir, batchId = 0L),
      "a committed batch must be skipped on replay")
    assert(spark.read.parquet(s"$dir/hashes").count() == before)
    ctl.close()
  }
}
