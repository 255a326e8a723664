package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.security.MessageDigest

import javax.imageio.stream.{ImageInputStream, ImageOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriter}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Segment-level video deduplication — the third modality face of the
  * dedup tier (text: q16/q149, image: q153). The production question:
  * two videos are rarely byte-identical, but they often SHARE SEGMENTS
  * (a syndicated intro, a re-posted clip inside a compilation); the
  * standard pipeline fingerprints content-defined segments per video
  * and joins on the fingerprints, so a shared clip surfaces no matter
  * where it sits in either container.
  *
  * This implementation runs the whole shape through a REAL container:
  *
  *  1. **Segment** the document's text by q85's content-defined
  *     chunking ([[cdcChunks]] — byte-for-byte the same boundary rule
  *     as `CurationQueries.cdcChunksOn` and its DuckDB oracle, so the
  *     q155 oracle can re-derive the ground truth in SQL).
  *  2. **Render** one frame per segment ([[MediaDedup.renderImage]]'s
  *     histogram plane) and **encode a real animated GIF** per
  *     document via `javax.imageio`'s sequence writer — the one
  *     animation container the JDK ships BOTH directions of. A 16×16
  *     frame has ≤ 256 distinct colors, so the GIF palette is exact
  *     and the container roundtrip lossless.
  *  3. **Decode** the GIF frames back (real `ImageIO` sequence read)
  *     and recover each segment's fingerprint from the frame PIXELS —
  *     the md5 of the segment text rides the frame's bottom row as a
  *     16-pixel watermark, and the segment's token count rides one
  *     more pixel so the join can drop trivial segments without any
  *     side-channel metadata. Everything the join needs survives the
  *     container, as it must at corpus scale where the sidecar
  *     database is never trusted.
  *  4. **Join** distinct (video, fingerprint) pairs on fingerprint —
  *     with the q17-style viral cap (a fingerprint held by more than
  *     [[DfCap]] videos is boilerplate, not reuse) — and count shared
  *     segments per video pair.
  *
  * Scale: synthesis/decode are one `mapPartitions` pass each (payloads
  * never leave executors); the join moves only 24-byte fingerprint
  * rows, distinct-ed per video first so an N-frame video costs N rows;
  * the df cap bounds any fingerprint's pair fan-out at [[DfCap]]².
  */
object VideoSegDedup {

  /** q85's boundary modulus: a token whose 32-bit md5 prefix ≡ 0
    * (mod 16) starts a new chunk. */
  private val CdcMod = 16

  /** Segments below this many tokens don't count as shared content
    * (a single common word is not a clip). Mirrored in the oracle. */
  val MinTokens = 8

  /** Viral-fingerprint cap: segments held by more videos than this are
    * boilerplate; pairing them would be quadratic noise. */
  val DfCap = 50

  /** q85's content-defined chunking, JVM-side, EXACTLY mirroring
    * `CurationQueries.cdcChunksOn` / its DuckDB oracle: tokens are
    * space-split (trailing empties kept — both engines keep them),
    * a token opens a new chunk when `long(md5(token)[0:8 hex]) % 16 == 0`,
    * chunk text is the tokens re-joined by single spaces. */
  private[graft] def cdcChunks(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val md = MessageDigest.getInstance("MD5")
    val words = text.split(" ", -1)
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var curWords = 0
    var started = false
    for (w <- words) {
      val d = md.digest(w.getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (h % CdcMod == 0 && started) {
        out += cur.toString; cur.clear(); curWords = 0
      }
      // separator per preceding WORD, not per non-empty prefix — empty
      // tokens must still separate, exactly like string_agg/concat_ws
      if (curWords > 0) cur.append(' ')
      cur.append(w)
      curWords += 1
      started = true
    }
    if (started) out += cur.toString
    out.result()
  }

  /** One frame per segment: the histogram render of the segment text,
    * with the segment's identity WATERMARKED into the pixels —
    * bottom row (y=15): the 16 md5 bytes of the segment text as grays;
    * pixel (15,14): min(255, token count). 256 pixels can hold at most
    * 256 distinct colors, so the GIF palette below stays exact. */
  private def frameOf(segment: String): BufferedImage = {
    val img = MediaDedup.renderFrame(segment)
    val md5 = MessageDigest.getInstance("MD5").digest(segment.getBytes("UTF-8"))
    var x = 0
    while (x < 16) {
      val g = md5(x) & 0xff
      img.setRGB(x, 15, (g << 16) | (g << 8) | g)
      x += 1
    }
    val n = math.min(255, segment.split(" ", -1).length)
    img.setRGB(15, 14, (n << 16) | (n << 8) | n)
    img
  }

  /** Encode frames as one animated GIF via the JDK sequence writer.
    * The writer is caller-supplied so a partition reuses ONE instance
    * across all its videos (`getImageWritersByFormatName` is a registry
    * lookup per call — the per-row-`getInstance` anti-pattern MediaOps
    * documents for MessageDigest); `setOutput` fully re-targets it. */
  private[graft] def encodeGif(frames: Seq[BufferedImage],
      writer: ImageWriter = ImageIO.getImageWritersByFormatName("gif").next()): Array[Byte] = {
    val buf = new ByteArrayOutputStream()
    val ios: ImageOutputStream = ImageIO.createImageOutputStream(buf)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f => writer.writeToSequence(new IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally ios.close()
    buf.toByteArray
  }

  /** Decode ALL frames of a GIF (unlike `MediaOps.decodeAnimationFrames`
    * this accepts single-frame payloads — a one-segment document is
    * still a video) and recover each frame's watermark:
    * (md5-hex fingerprint, token count). Undecodable payloads yield
    * no frames — a corrupt video simply cannot assert shared content. */
  private[graft] def readFrameMarks(content: Array[Byte]): Seq[(String, Int)] =
    try {
      val iis: ImageInputStream = ImageIO.createImageInputStream(new ByteArrayInputStream(content))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Seq.empty
        else {
          val r = readers.next()
          r.setInput(iis)
          try {
            (0 until r.getNumImages(true)).map { i =>
              val img = r.read(i)
              val hex = (0 until 16).map { x =>
                f"${img.getRGB(x, 15) & 0xff}%02x"
              }.mkString
              (hex, img.getRGB(15, 14) & 0xff)
            }
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Throwable => Seq.empty }

  /** (doc_id, text) → (video_id, content): one animated GIF per
    * document, one frame per CDC segment. Documents with no tokens
    * (null text) produce no video. */
  def renderVideos(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val writer = ImageIO.getImageWritersByFormatName("gif").next()
        it.flatMap { case (id, text) =>
          val segs = cdcChunks(text)
          if (segs.isEmpty) Iterator.empty
          else Iterator.single((id, encodeGif(segs.map(frameOf), writer)))
        }
      }
      .toDF("video_id", "content")
  }

  /** (video_id, content) → distinct (video_id, seg_fp) for segments
    * of ≥ [[MinTokens]] tokens, everything recovered from the decoded
    * frames. */
  def segmentFingerprints(videos: DataFrame): DataFrame = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.select(col("video_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, content) =>
        readFrameMarks(content).iterator
          .filter(_._2 >= MinTokens)
          .map { case (fp, _) => (id, fp) }
      })
      .toDF("video_id", "seg_fp")
      .distinct()
  }

  /** Video pairs sharing ≥1 non-viral segment, with the shared count:
    * (video_a, video_b, shared_segs). */
  def sharedSegmentPairs(fps: DataFrame): DataFrame = {
    val eligible = graft.core.Caches.persistTracked(
      fps.withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("seg_fp")))
        .filter(col("df") <= DfCap && col("df") >= 2)
        .select("video_id", "seg_fp"))
    val l = eligible.select(col("video_id").as("video_a"), col("seg_fp"))
    val r = eligible.select(col("video_id").as("video_b"), col("seg_fp"))
    l.join(r, "seg_fp")
      .filter(col("video_a") < col("video_b"))
      .groupBy("video_a", "video_b")
      .agg(count(lit(1)).cast("long").as("shared_segs"))
  }
}
