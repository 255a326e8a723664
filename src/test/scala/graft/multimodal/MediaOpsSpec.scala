package graft.multimodal

import graft.SparkSpec
import graft.multimodal.MediaOps._

class MediaOpsSpec extends SparkSpec {
  import spark.implicits._

  // Rows 1-2 are "images" whose bytes are NOT a decodable codec — they
  // exercise the stub-fallback path the corrupt tail of any real corpus
  // takes. Real-PNG rows are crafted per-test via [[png]].
  private def media = Seq(
    MediaRow(1L, "image", Array.tabulate(256)(_.toByte), 64, 64, 0L),
    MediaRow(2L, "image", Array.tabulate(128)(i => (i * 3).toByte), 32, 32, 0L),
    MediaRow(3L, "video", Array.tabulate(1000)(_.toByte), 640, 480, 10000L)).toDS()

  /** In-memory PNG fixture: w×h with per-pixel RGB from `f(x, y)`. */
  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

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

  test("real PNG decodes to true dimensions and pixel-derived features") {
    // Left half black, right half white: the 4×4 luminance grid's left
    // two columns must read dark (≈ -1) and the right two light (≈ +1)
    // — digest noise can't produce that structure.
    val halves = png(64, 32)((x, _) => if (x < 32) 0x000000 else 0xFFFFFF)
    val Some((w, h, feats)) = MediaOps.decodeImage(halves)
    assert(w == 64 && h == 32)
    for (i <- 0 until FeatureDim) {
      if (i % 4 < 2) assert(feats(i) < -0.9f, s"cell $i should be dark: ${feats(i)}")
      else assert(feats(i) > 0.9f, s"cell $i should be light: ${feats(i)}")
    }
    // the distributed path picks the real decode for this row
    val ds = Seq(MediaRow(7L, "image", halves, 0, 0, 0L)).toDS()
    val viaSpark = extractFeatures(ds).collect().head.features
    assert(viaSpark.sameElements(feats), "mapPartitions path must match direct decode")
    // garbage bytes under media_type=image fall back to the stub, not an error
    val stubbed = extractFeatures(media).collect().sortBy(_.media_id)
    assert(stubbed.forall(_.features.length == FeatureDim))
  }

  test("withDecodedDims corrects lying metadata from the payload") {
    val fixed = withDecodedDims(Seq(
      MediaRow(8L, "image", png(48, 24)((_, _) => 0x808080), 1, 1, 0L),
      MediaRow(9L, "image", Array[Byte](1, 2, 3), 5, 6, 0L), // undecodable: untouched
      MediaRow(10L, "video", Array[Byte](1), 640, 480, 1000L)).toDS())
      .collect().sortBy(_.media_id)
    assert(fixed(0).width == 48 && fixed(0).height == 24)
    assert(fixed(1).width == 5 && fixed(1).height == 6)
    assert(fixed(2).width == 640 && fixed(2).height == 480)
  }

  test("real image resize rescales pixels and re-encodes a decodable PNG") {
    val src = Seq(MediaRow(11L, "image",
      png(64, 32)((x, _) => if (x < 32) 0x000000 else 0xFFFFFF), 64, 32, 0L)).toDS()
    val out = resize(src, 16, 8).collect().head
    assert(out.width == 16 && out.height == 8)
    val Some((w, h, feats)) = MediaOps.decodeImage(out.content)
    assert(w == 16 && h == 8, "resized payload must itself be a decodable image")
    // the halves structure survives the rescale
    assert(feats(0) < -0.5f && feats(3) > 0.5f, feats.mkString(","))
  }

  /** In-memory WAV fixture: `ms` milliseconds of 16-bit mono PCM at
    * 8 kHz from `f(sampleIdx) ∈ [-1, 1]`. */
  private def wav(ms: Int)(f: Int => Double): Array[Byte] = {
    val rate = 8000f
    val n = (rate * ms / 1000).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = math.max(-1.0, math.min(1.0, f(i)))
      val s = math.round(v * 32767).toShort
      pcm(i * 2) = (s & 0xff).toByte; pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  test("real WAV decodes to true format, duration, and a loudness envelope") {
    // 400 ms: first half a full-scale 440 Hz tone, second half silence.
    // The RMS envelope's first 8 bins must read loud, the last 8 quiet
    // — digest noise can't produce that structure.
    val halfTone = wav(400)(i =>
      if (i < 1600) math.sin(2 * math.Pi * 440 * i / 8000.0) else 0.0)
    val Some((rate, channels, durMs, feats)) = MediaOps.decodeAudio(halfTone)
    assert(rate == 8000f && channels == 1, s"$rate/$channels")
    assert(durMs == 400L, s"duration must come from the payload: $durMs")
    assert(feats.length == FeatureDim)
    // sine RMS = 1/√2 → envelope ≈ 2/√2 − 1 ≈ 0.414; silence → −1
    for (i <- 0 until 8) assert(feats(i) > 0.3f, s"bin $i loud: ${feats(i)}")
    for (i <- 8 until 16) assert(feats(i) < -0.99f, s"bin $i quiet: ${feats(i)}")
    // distributed path picks the real decode; garbage audio stubs instead
    val ds = Seq(
      MediaRow(20L, "audio", halfTone, 0, 0, 0L),
      MediaRow(21L, "audio", Array[Byte](9, 9, 9), 0, 0, 123L)).toDS()
    val viaSpark = extractFeatures(ds).collect().sortBy(_.media_id)
    assert(viaSpark(0).features.sameElements(feats),
      "mapPartitions path must match direct decode")
    assert(viaSpark(1).features.length == FeatureDim, "garbage falls back to the stub")
    // withDecodedDims corrects a lying duration from the payload
    val fixed = withDecodedDims(ds).collect().sortBy(_.media_id)
    assert(fixed(0).duration_ms == 400L, fixed(0).toString)
    assert(fixed(1).duration_ms == 123L, "undecodable: untouched")
  }

  /** In-memory animated GIF: one solid-color 8×8 frame per entry. */
  private def gif(colors: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    w.setOutput(ios)
    w.prepareWriteSequence(null)
    colors.foreach { c =>
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, c)
      w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    w.endWriteSequence(); ios.close(); w.dispose()
    out.toByteArray
  }

  test("animated GIF videos sample REAL decoded frames in order; codec blobs keep the stub") {
    val colors = Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF)
    val rows = Seq(
      MediaRow(30L, "video", gif(colors), 8, 8, 4000L),
      MediaRow(31L, "video", Array.tabulate(1000)(_.toByte), 640, 480, 2000L)).toDS()
    val frames = sampleFrames(rows, everyMs = 1000L).collect()
    val real = frames.filter(_.media_id == 30L).sortBy(_.frame_idx)
    assert(real.length == 4, s"4 s at 1 fps = 4 frames: ${real.length}")
    real.zip(colors).foreach { case (f, c) =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f.content))
      assert(img != null, s"frame ${f.frame_idx} must be a standalone decodable PNG")
      assert((img.getRGB(4, 4) & 0xFFFFFF) == c,
        s"frame ${f.frame_idx} color ${(img.getRGB(4, 4) & 0xFFFFFF).toHexString} != ${c.toHexString}")
    }
    // non-GIF payload: the deterministic slice stub, same schema/cadence
    assert(frames.count(_.media_id == 31L) == 2)
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
