package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual-hash deduplication for the audio modality — the
  * re-encoded/re-uploaded-copy detector a speech corpus runs before
  * training, completing the dedup tier's modality symmetry (text:
  * q17/q18/q149…, image: q153/q157, video: q155). Exact byte dedup
  * misses copies that differ by container metadata or a trimmed
  * tail, and the text tier has nothing to shingle.
  *
  * The fingerprint is a **time-shift-invariant amplitude-distribution
  * hash** over the REAL decoded PCM ([[MediaOps.decodePcmSamples]] —
  * `javax.sound.sampled`, exact integer sample reads): each sample's
  * magnitude is quantized to [[Levels]] amplitude levels, adjacent-
  * sample level PAIRS are folded into a [[Buckets]]-bucket histogram
  * (the audio twin of [[MediaDedup]]'s bigram-histogram channel), and
  * bit b of the 64-bit hash is `hist(b) > hist(b+1 mod 64)` — rank
  * structure, so the hash is invariant to clip length and loudness-
  * preserving time shifts, and degrades by O(edit) bits under local
  * edits. Clips whose amplitude-transition *distributions* are close
  * land within a small Hamming radius regardless of where in the
  * clip the shared material sits — exactly the invariance a
  * cyclically-shifted or prefix-shared near-copy needs (a
  * time-binned envelope hash fails those: measured on the planted
  * corpus, phase-shifted near-dup renders share no time-aligned
  * structure at all).
  *
  * Downstream is pure reuse: the (media_id, ahash) relation rides
  * [[MediaDedup.nearDupPairs]]'s multi-index Hamming banding
  * unchanged — the pigeonhole exactness, the per-hash pre-group skew
  * guard, and the probe face are all modality-agnostic over a 64-bit
  * LongType column.
  *
  * Undecodable payloads fall back to a digest-derived hash (same
  * contract as [[MediaDedup.hashImages]]): byte-identical corrupt
  * blobs still exact-match at Hamming 0 instead of crashing the
  * partition.
  */
object AudioDedup {

  /** Amplitude quantization: 256 levels over |sample| ∈ [0, 1]. Fine
    * enough that the 16-bit PCM roundtrip error (2⁻¹⁵, an eighth of a
    * level) cannot move a sample across a level boundary except at
    * knife edges; coarse enough to absorb re-encode dither. */
  private[multimodal] val Levels = 256

  /** Folded histogram size = hash width. */
  private[multimodal] val Buckets = 64

  /** Pair-fold multiplier — the same mixing constant as the image
    * renderer's bigram channel. */
  private[multimodal] val FoldMul = 31

  /** 64-bit amplitude-distribution hash of one decoded clip. Exact
    * integer histogram + strict `>` comparisons: deterministic for a
    * given sample array on any JVM, and engine-portable (the DuckDB
    * oracle re-derives it with the same integer math). */
  private[multimodal] def aHashOf(samples: Array[Double]): Long = {
    if (samples.length < 2) return 0L
    val hist = new Array[Long](Buckets)
    var prev = levelOf(samples(0))
    var i = 1
    while (i < samples.length) {
      val cur = levelOf(samples(i))
      hist((FoldMul * prev + cur) % Buckets) += 1
      prev = cur
      i += 1
    }
    var bits = 0L
    var b = 0
    while (b < Buckets) {
      if (hist(b) > hist((b + 1) % Buckets)) bits |= 1L << b
      b += 1
    }
    bits
  }

  private def levelOf(s: Double): Int =
    math.min(Levels - 1, (math.abs(s) * Levels).toInt)

  private def digestHash(md: MessageDigest, content: Array[Byte]): Long = {
    val d = md.digest(content)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** (media_id, ahash) for every row of `media` (columns: media_id
    * LongType, content BinaryType). One decoder + digest per
    * PARTITION; payload bytes never leave the executor. The column is
    * named `dhash` so the relation plugs straight into
    * [[MediaDedup.nearDupPairs]]/`nearDupProbe`. */
  def hashAudio(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5")
        rows.map { case (id, content) =>
          val h = MediaOps.decodePcmSamples(content) match {
            case Some((_, _, _, samples)) => aHashOf(samples)
            case None => digestHash(md, content)
          }
          (id, h)
        }
      }
      .toDF("media_id", "dhash")
  }
}
