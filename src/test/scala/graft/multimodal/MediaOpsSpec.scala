package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MediaOps._

class MediaOpsSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(1L, "image", Array.tabulate(256)(_.toByte), 64, 64, 0L),
    MediaRow(2L, "image", Array.tabulate(128)(i => (i * 3).toByte), 32, 32, 0L),
    MediaRow(3L, "video", Array.tabulate(1000)(_.toByte), 640, 480, 10000L)).toDS()

  test("feature extraction: deterministic, fixed-dim, batch-shaped") {
    val feats = extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.length == 3)
    assert(feats.forall(_.features.length == FeatureDim))
    assert(feats.forall(f => f.features.forall(v => v >= -1f && v <= 1f)))
    // determinism: same payload → same features
    val again = extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.zip(again).forall { case (a, b) => a.features.sameElements(b.features) })
    assert(feats(0).n_bytes == 256L)
  }

  test("binary columns round-trip parquet with metadata intact") {
    val path = tmpDir("media")
    media.write.parquet(path)
    val back = spark.read.parquet(path).as[MediaRow].collect().sortBy(_.media_id)
    assert(back.length == 3)
    assert(back(0).content.length == 256)
    assert(back(2).media_type == "video" && back(2).duration_ms == 10000L)
  }

  test("resize updates metadata and shrinks payload") {
    val small = resize(media.filter(_.media_id == 1L), 8, 8).collect().head
    assert(small.width == 8 && small.height == 8)
    assert(small.content.length < 256 && small.content.length >= 1)
  }

  test("frame sampling emits one frame per interval, videos only") {
    val frames = sampleFrames(media, everyMs = 1000L).collect()
    assert(frames.length == 10) // 10s video, 1 frame/s
    assert(frames.forall(_.media_id == 3L))
    assert(frames.map(_.frame_idx).sorted.toSeq == (0 until 10))
  }

  test("metadata stats never deserialize payloads it doesn't need") {
    val stats = metadataStats(media.toDF()).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(stats("image") == 384L && stats("video") == 1000L)
  }

  test("media features flow into the embedding near-dup operators unchanged") {
    import org.apache.spark.sql.functions._
    // A byte-identical re-upload of blob 1 under a new id — the
    // media-side duplicate an embedding-cosine near-dup pass must find.
    val withDup = media.union(Seq(
      MediaRow(4L, "image", Array.tabulate(256)(_.toByte), 64, 64, 0L)).toDS())
    val feats = extractFeatures(withDup)
      .select(col("media_id"), col("features").cast("array<double>").as("v"))
    val pairs = feats.as("a")
      .join(feats.as("b"), col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("m1"), col("b.media_id").as("m2"),
        graft.functions.VectorExprs.cosine(col("a.v"), col("b.v")).as("cos"))
      .where(col("cos") > 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 4L)),
      s"only the byte-identical pair may clear the near-dup bar: ${pairs.toSeq}")
  }
}
