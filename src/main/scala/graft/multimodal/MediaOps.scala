package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.security.MessageDigest

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract /
  * resize / frame-sample operator surface a training-data pipeline
  * needs (BASELINE.json north star).
  *
  * The Spark-side plumbing — schema, partition-preserving batch shape,
  * per-partition iterator processing — is real for all three
  * modalities. The codec layer splits:
  *
  *  - **Images are REAL.** The JDK ships `javax.imageio` (PNG/JPEG/
  *    GIF/BMP) — [[decodeImage]] reads actual pixel dimensions and a
  *    4×4 downsampled-luminance feature grid, and [[resize]] rescales
  *    real pixels through `java.awt` and re-encodes PNG. No external
  *    library, no sandbox violation.
  *  - **Audio is REAL for the JDK-native containers.** The JDK ships
  *    `javax.sound.sampled` (WAV/AIFF/AU with PCM payloads) —
  *    [[decodeAudio]] parses the true sample rate / channel count /
  *    duration and computes a [[FeatureDim]]-bin RMS loudness envelope
  *    over the actual PCM samples. Compressed codecs (MP3/AAC/Opus)
  *    have no JDK decoder and take the stub path; swap in a codec
  *    library for those without touching the dataflow.
  *  - **Video: animated GIFs decode for REAL** (the one animation
  *    container with a JDK reader) — [[sampleFrames]] samples the
  *    requested cadence from the actual decoded frames, each
  *    re-encoded as a standalone PNG. True video codecs (H.264/VP9/…)
  *    remain a documented STUB: `decodeStub` produces a deterministic
  *    digest-derived feature vector, and frame sampling emits
  *    deterministic byte slices at the same cadence and schema. Media
  *    whose bytes don't parse (truncated payload, exotic codec) fall
  *    back to the same stub rather than failing the partition —
  *    corpus-scale media is always partly corrupt.
  *
  * Scale: `mapPartitions` over the binary column keeps each task
  * streaming through its partition's blobs one at a time (no
  * collect-to-driver, no per-row task overhead); binary payloads ride
  * the normal shuffle/scan machinery, and metadata predicates
  * (media_type, byte size) are ordinary pushed-down column filters.
  */
object MediaOps {

  // ImageIO's default stream cache is DISK-backed: every read/encode
  // creates (and deletes) a temp FILE under java.io.tmpdir, which at
  // executor parallelism turns the codec tier into an fsync/contention
  // benchmark — measured on the 10x corpus: the image queries ran
  // SLOWER at local[32] than local[8] until this flag. Memory-cached
  // streams are strictly better for our in-memory byte payloads. The
  // flag is JVM-global; loading any graft codec class sets it.
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed media row: opaque payload + queryable metadata. */
  case class MediaRow(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      content: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      features: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, content: Array[Byte])

  val FeatureDim = 16
  private val Grid = 4 // FeatureDim = Grid²: one luminance cell per feature

  /** STUB decoder (audio/video + unparseable images): a real
    * implementation would decode the codec and run a feature extractor;
    * this derives a deterministic pseudo-feature vector from the
    * content digest so plumbing, schema, batch shape and partitioning
    * are all testable without media libraries. */
  private[multimodal] def decodeStub(content: Array[Byte]): Array[Float] =
    decodeWith(MessageDigest.getInstance("MD5"), content)

  private def decodeWith(md: MessageDigest, content: Array[Byte]): Array[Float] = {
    val d = md.digest(content) // digest() resets the instance for reuse
    Array.tabulate(FeatureDim)(i => ((d(i) & 0xff) / 255.0f) * 2f - 1f)
  }

  /** REAL image decode via `javax.imageio`: (width, height, 4×4
    * mean-luminance grid scaled to [-1, 1], row-major). None when the
    * bytes aren't a decodable image — the caller falls back to the
    * stub. Luminance is the Rec.601 weighting; the grid mean is exact
    * over each cell's pixels, so the vector is deterministic for a
    * given payload on any JVM. */
  private[multimodal] def decodeImage(content: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(content))).map { img =>
        val (w, h) = (img.getWidth, img.getHeight)
        val feats = Array.tabulate(FeatureDim) { i =>
          val (gx, gy) = (i % Grid, i / Grid)
          val x0 = gx * w / Grid; val x1 = math.max(x0 + 1, (gx + 1) * w / Grid)
          val y0 = gy * h / Grid; val y1 = math.max(y0 + 1, (gy + 1) * h / Grid)
          var sum = 0.0; var n = 0
          var y = y0
          while (y < y1 && y < h) {
            var x = x0
            while (x < x1 && x < w) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) * 0.299 +
                ((rgb >> 8) & 0xff) * 0.587 + (rgb & 0xff) * 0.114) / 255.0
              n += 1; x += 1
            }
            y += 1
          }
          (if (n == 0) -1.0 else (sum / n) * 2 - 1).toFloat
        }
        (w, h, feats)
      }
    } catch { case _: Throwable => None }

  /** REAL audio decode via `javax.sound.sampled`: (sample_rate,
    * channels, duration_ms, [[FeatureDim]]-bin RMS loudness envelope in
    * [-1, 1]). None when the bytes aren't a JDK-parseable audio stream
    * (the caller falls back to the stub). The envelope is computed over
    * the raw PCM samples with all channels pooled per bin — integer
    * sample decode and an exact running sum of squares, so the vector
    * is deterministic for a given payload on any JVM. Only PCM sample
    * layouts the JDK actually produces are handled (8-bit, and 16-bit
    * either endianness); anything else stubs. */
  // The SAME platform codec parsers AudioSystem dispatches to
  // (java.desktop provides WaveFileReader/AiffFileReader/AuFileReader),
  // resolved ONCE per JVM: AudioSystem.getAudioInputStream routes every
  // call through a globally-synchronized provider lookup
  // (JDK13Services), which at executor parallelism serialized the whole
  // decode tier — measured on the 10x corpus, the audio audit scaled
  // SUPER-linearly (and ran slower at local[32] than local[8]) until
  // the lock left the per-row path. The readers themselves are
  // stateless and thread-safe.
  // Probe order matters as much as the lookup: the platform's
  // SoftMidiAudioFileReader registers AHEAD of WaveFileReader and its
  // failed probe costs ~85µs (it spins up MIDI parsing machinery) vs
  // ~2µs for the PCM container readers — on an all-WAV corpus that is
  // 40× per-row overhead for a reader that can never match. Sort the
  // PCM container parsers first, MIDI-ish ones last; every reader is
  // still consulted, so no format is lost.
  private lazy val audioReaders: List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.toList
      .sortBy(r => (r.getClass.getSimpleName.contains("Midi"),
        !r.getClass.getSimpleName.startsWith("Wave")))
  }

  private def openAudio(content: Array[Byte]): AudioInputStream = {
    val it = audioReaders.iterator
    while (it.hasNext) {
      try return it.next().getAudioInputStream(new ByteArrayInputStream(content))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
    }
    throw new javax.sound.sampled.UnsupportedAudioFileException("no platform reader matched")
  }

  private[multimodal] def decodeAudio(content: Array[Byte]): Option[(Float, Int, Long, Array[Float])] =
    decodePcmSamples(content).map { case (rate, channels, durMs, samples) =>
      val nSamples = samples.length
      val feats = Array.tabulate(FeatureDim) { b =>
        val s0 = (b.toLong * nSamples / FeatureDim).toInt
        val s1 = math.max(s0 + 1, ((b + 1).toLong * nSamples / FeatureDim).toInt)
        var sum2 = 0.0; var i = s0
        while (i < s1 && i < nSamples) { val s = samples(i); sum2 += s * s; i += 1 }
        val n = math.max(1, math.min(s1, nSamples) - s0)
        (math.sqrt(sum2 / n) * 2 - 1).toFloat
      }
      (rate, channels, durMs, feats)
    }

  /** The shared PCM decode under [[decodeAudio]] and
    * [[AudioDedup.aHash]]: (sample_rate, channels, duration_ms,
    * normalized samples in [-1, 1], all channels interleaved as
    * delivered). Exact integer sample reads — the array is
    * deterministic for a given payload on any JVM. Same guarded
    * reader path (sorted [[audioReaders]]), same None-on-undecodable
    * contract. */
  private[multimodal] def decodePcmSamples(content: Array[Byte]): Option[(Float, Int, Long, Array[Double])] =
    try {
      val in = openAudio(content)
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        val pcmSigned = enc == AudioFormat.Encoding.PCM_SIGNED
        val pcmUnsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
        if (!(pcmSigned || pcmUnsigned) || (bits != 8 && bits != 16)) None
        else {
          val bytes = in.readAllBytes()
          val bps = bits / 8
          val nSamples = bytes.length / bps
          if (nSamples == 0) None
          else {
            def sampleAt(i: Int): Double = {
              if (bps == 1) {
                if (pcmSigned) bytes(i).toDouble / 128.0
                else ((bytes(i) & 0xff) - 128).toDouble / 128.0
              } else {
                val (lo, hi) = if (fmt.isBigEndian) (i * 2 + 1, i * 2) else (i * 2, i * 2 + 1)
                // signed: sign-extend the hi byte; unsigned: mask it
                // (sign-extension would corrupt values ≥ 0x8000)
                val v =
                  if (pcmSigned) (bytes(hi) << 8) | (bytes(lo) & 0xff)
                  else (((bytes(hi) & 0xff) << 8) | (bytes(lo) & 0xff)) - 32768
                v.toDouble / 32768.0
              }
            }
            val samples = Array.tabulate(nSamples)(sampleAt)
            val frames =
              if (in.getFrameLength >= 0) in.getFrameLength
              else (bytes.length / math.max(1, fmt.getFrameSize)).toLong
            val durMs = math.round(frames * 1000.0 / fmt.getFrameRate)
            Some((fmt.getSampleRate, fmt.getChannels, durMs, samples))
          }
        }
      } finally in.close()
    } catch { case _: Throwable => None }

  /** Per-partition feature extraction over the binary column: real
    * pixel features for decodable images, real PCM loudness envelopes
    * for decodable audio, digest stub for everything else. One
    * MessageDigest per PARTITION (this is the point of mapPartitions):
    * per-row `getInstance` would do a JCA provider lookup per blob. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      rows.map { r =>
        val real = r.media_type match {
          case "image" => decodeImage(r.content).map(_._3)
          case "audio" => decodeAudio(r.content).map(_._4)
          case _ => None
        }
        MediaFeatures(r.media_id, r.media_type, r.content.length.toLong,
          real.getOrElse(decodeWith(md, r.content)))
      }
    }
  }

  /** Re-derive media metadata from the PAYLOAD: image rows whose bytes
    * decode get their true width/height, audio rows their true
    * duration_ms (upstream metadata lies at corpus scale); everything
    * else passes through untouched. */
  def withDecodedDims(media: Dataset[MediaRow]): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      r.media_type match {
        case "image" => decodeImage(r.content) match {
          case Some((w, h, _)) => r.copy(width = w, height = h)
          case None => r
        }
        case "audio" => decodeAudio(r.content) match {
          case Some((_, _, durMs, _)) => r.copy(duration_ms = durMs)
          case None => r
        }
        case _ => r
      }
    })
  }

  /** Resize: REAL pixel rescale + PNG re-encode for decodable images
    * (`java.awt` bilinear-ish default scaling); for audio/video and
    * unparseable images the stub truncates the payload proportionally,
    * preserving the contract that output metadata reflects the new
    * dimensions. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val real =
        if (r.media_type == "image")
          try {
            Option(ImageIO.read(new ByteArrayInputStream(r.content))).map { img =>
              val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
              val buf = new ByteArrayOutputStream()
              ImageIO.write(out, "png", buf)
              r.copy(content = buf.toByteArray, width = w, height = h)
            }
          } catch { case _: Throwable => None }
        else None
      real.getOrElse {
        val scale = math.min(1.0, (w.toLong * h).toDouble / math.max(1, r.width.toLong * r.height))
        val n = math.max(1, (r.content.length * scale).toInt)
        r.copy(content = r.content.take(n), width = w, height = h)
      }
    })
  }

  /** REAL multi-frame decode for animated GIFs via `javax.imageio`
    * (the one animation container the JDK ships a reader for): each
    * frame re-encoded as standalone PNG. None for single-frame or
    * non-GIF payloads. */
  private[multimodal] def decodeAnimationFrames(content: Array[Byte]): Option[IndexedSeq[Array[Byte]]] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(content))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(iis)
          try {
            val n = r.getNumImages(true)
            if (n <= 1) None
            else Some((0 until n).map { i =>
              val buf = new ByteArrayOutputStream()
              ImageIO.write(r.read(i), "png", buf)
              buf.toByteArray
            })
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Throwable => None }

  /** Frame sampling for video rows: REAL for animated GIFs — the
    * requested cadence (`duration_ms / everyMs` frames) is sampled
    * evenly from the actual decoded frames, each a standalone PNG —
    * and a documented STUB for true video codecs (no JDK decoder):
    * deterministic byte slices at the same cadence, same schema. flatMap
    * keeps the operation streaming — one video never materializes all
    * frames unless consumed. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").flatMap { r =>
      val n = math.max(1, (r.duration_ms / math.max(1, everyMs)).toInt)
      decodeAnimationFrames(r.content) match {
        case Some(frames) =>
          (0 until n).iterator.map { j =>
            Frame(r.media_id, j, frames((j.toLong * frames.length / n).toInt))
          }
        case None =>
          val chunk = math.max(1, r.content.length / n)
          (0 until n).iterator.map { i =>
            Frame(r.media_id, i, r.content.slice(i * chunk, math.min((i + 1) * chunk, r.content.length)))
          }
      }
    }
  }

  /** Metadata-only scan: binary columns prune away when untouched —
    * the whole point of keeping media opaque next to queryable columns. */
  def metadataStats(media: DataFrame): DataFrame =
    media.groupBy("media_type").agg(
      count(lit(1)).as("n"),
      sum(length(col("content"))).as("total_bytes"),
      // long math: a gigapixel row overflows Int×Int, which THROWS under
      // Spark 4's default ANSI mode and would kill the whole stats query
      avg(col("width").cast("long") * col("height")).as("avg_pixels"))
}
