package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}



import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio-integrity audit — the dead-air detector a speech/audio corpus
  * runs before training: upstream pipelines routinely deliver
  * zero-amplitude payloads (muxing bugs, DRM-stripped tracks, truncated
  * uploads re-padded with silence) whose METADATA looks perfectly
  * healthy, and a model trained on silent clips with non-empty
  * transcripts learns to hallucinate. The only trustworthy signal is
  * the decoded PCM itself.
  *
  * The audit decodes each payload with the REAL JDK codec path
  * ([[MediaOps.decodeAudio]] — `javax.sound.sampled`, true WAV parsing,
  * exact integer sample reads) and flags a row when the RMS loudness
  * envelope over the actual samples is indistinguishable from silence,
  * or when the payload doesn't decode at all (an unverifiable clip is
  * never silently passed). One decoder pass per partition; payload
  * bytes never leave the executor.
  */
object AudioIntegrity {

  /** Synthesis parameters for the caption→audio testdata adapter.
    * `Samples` is graft-visible: the q178 oracle re-derives the
    * rendered sample sequence in SQL. */
  private val SampleRate = 8000f
  private[graft] val Samples = 2048

  /** Deterministic caption→audio renderer — the audio-modality twin of
    * [[MediaDedup.renderImage]] (TESTDATA.md ships no binary column).
    * 16-bit mono PCM WAV at 8 kHz: sample i takes its magnitude from
    * the caption's character at position i (mod length), scaled into
    * [0.25, 0.75] of full scale with alternating sign (no DC offset).
    * The 0.25 floor is the audit's margin: every rendered clip has RMS
    * ≥ 0.25 in every window, while dead air sits at exactly 0. */
  private[graft] def renderAudio(text: String): Array[Byte] = {
    val t = if (text == null || text.isEmpty) "\u0000" else text
    val pcm = new Array[Byte](Samples * 2)
    var i = 0
    while (i < Samples) {
      val c = t.charAt(i % t.length).toInt & 0xff
      val mag = 0.25 + 0.5 * (c / 255.0)
      val v = math.round((if (i % 2 == 0) mag else -mag) * 32767).toInt
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    encodeWav(pcm)
  }

  /** The planted corruption for q156: a payload of pure digital
    * silence, byte-for-byte a valid WAV. */
  private[graft] def silence(): Array[Byte] = encodeWav(new Array[Byte](Samples * 2))

  /** Hand-rolled RIFF/WAVE container (44-byte canonical PCM header +
    * samples). `AudioSystem.write` produces the identical container but
    * does an AudioFileWriter provider lookup per call — measured on the
    * 10x corpus, the render tier scaled SUPER-linearly under executor
    * parallelism until the registry left the hot path. The decode side
    * deliberately stays on the real JDK parser ([[MediaOps.decodeAudio]]),
    * which AudioIntegritySpec proves parses this container. */
  private def encodeWav(pcm: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](44 + pcm.length)
    def ascii(off: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    }
    val sr = SampleRate.toInt
    ascii(0, "RIFF"); le32(4, 36 + pcm.length); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16); le16(20, 1 /* PCM */); le16(22, 1 /* mono */)
    le32(24, sr); le32(28, sr * 2 /* byte rate */); le16(32, 2 /* block align */)
    le16(34, 16 /* bits */); ascii(36, "data"); le32(40, pcm.length)
    System.arraycopy(pcm, 0, out, 44, pcm.length)
    out
  }

  /** (doc_id, content) → (doc_id, max_env) where max_env is the LOUDEST
    * bin of the decoded RMS envelope, in [[MediaOps.decodeAudio]]'s
    * [-1, 1] scale (-1 = silence). Undecodable payloads surface as
    * Double.MinValue — below every real envelope, so the `< threshold`
    * flag catches them too. A clip is dead air only if its loudest
    * moment is silent, so max (not mean) is the right statistic: it
    * also catches nothing-but-a-click clips conservatively, and a
    * half-silent clip with real content in the other half passes. */
  def loudestBin(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col("doc_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, content) => (id, maxEnv(content)) })
      .toDF("doc_id", "max_env")
  }

  /** One payload's loudest envelope bin — the per-row kernel, shared
    * with the streaming gate (`streaming/MediaGate`) so batch audit
    * and live gate can never disagree on a row. */
  private[graft] def maxEnv(content: Array[Byte]): Double =
    MediaOps.decodeAudio(content).map(_._4.max.toDouble)
      .getOrElse(Double.MinValue)

  /** Flag threshold on the [-1, 1] envelope scale: rendered clips sit
    * at RMS ≥ 0.25 → envelope ≥ -0.5 in every bin; silence decodes to
    * exactly -1. -0.9 leaves ≥0.1 margin to silence and ≥0.4 to the
    * quietest legitimate clip. */
  val SilenceThreshold: Double = -0.9
}
