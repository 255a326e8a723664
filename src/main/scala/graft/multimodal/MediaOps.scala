package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the decode / feature-extract /
  * resize / frame-sample operator surface a training-data pipeline
  * needs (BASELINE.json north star).
  *
  * The Spark-side plumbing — schema, partition-preserving batch shape,
  * per-partition iterator processing — is real; the codec itself is a
  * STUB (this container has no image/audio libraries): `decodeStub`
  * produces a deterministic digest-derived feature vector wherever a
  * real decoder would run. Swap [[MediaRow.decode]] for an actual codec
  * (e.g. javacv / TwelveMonkeys) without touching the dataflow.
  *
  * Scale: `mapPartitions` over the binary column keeps each task
  * streaming through its partition's blobs one at a time (no
  * collect-to-driver, no per-row task overhead); binary payloads ride
  * the normal shuffle/scan machinery, and metadata predicates
  * (media_type, byte size) are ordinary pushed-down column filters.
  */
object MediaOps {

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

  /** STUB decoder: a real implementation would decode the codec and run
    * a feature extractor; this derives a deterministic pseudo-feature
    * vector from the content digest so plumbing, schema, batch shape and
    * partitioning are all testable without media libraries. */
  private[multimodal] def decodeStub(content: Array[Byte]): Array[Float] =
    decodeWith(MessageDigest.getInstance("MD5"), content)

  private def decodeWith(md: MessageDigest, content: Array[Byte]): Array[Float] = {
    val d = md.digest(content) // digest() resets the instance for reuse
    Array.tabulate(FeatureDim)(i => ((d(i) & 0xff) / 255.0f) * 2f - 1f)
  }

  /** Per-partition feature extraction over the binary column. One
    * MessageDigest per PARTITION (this is the point of mapPartitions):
    * per-row `getInstance` would do a JCA provider lookup per blob. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5")
      rows.map { r =>
        MediaFeatures(r.media_id, r.media_type, r.content.length.toLong,
          decodeWith(md, r.content))
      }
    }
  }

  /** STUB resize: a real implementation re-encodes pixels; the stub
    * truncates the payload proportionally, preserving the contract that
    * output metadata reflects the new dimensions. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val scale = math.min(1.0, (w.toLong * h).toDouble / math.max(1, r.width.toLong * r.height))
      val n = math.max(1, (r.content.length * scale).toInt)
      r.copy(content = r.content.take(n), width = w, height = h)
    })
  }

  /** STUB frame sampling for video rows: every `everyMs` milliseconds,
    * one Frame whose payload is a deterministic slice of the source
    * (a real decoder would emit encoded frames). flatMap keeps the
    * operation streaming — one video never materializes all frames
    * unless consumed. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").flatMap { r =>
      val n = math.max(1, (r.duration_ms / math.max(1, everyMs)).toInt)
      val chunk = math.max(1, r.content.length / n)
      (0 until n).iterator.map { i =>
        Frame(r.media_id, i, r.content.slice(i * chunk, math.min((i + 1) * chunk, r.content.length)))
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
