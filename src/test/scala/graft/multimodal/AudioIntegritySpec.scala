package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.MediaQueries

class AudioIntegritySpec extends SparkSpec {
  import spark.implicits._

  private val sf0001 = "/root/testdata/sf0.001"

  test("rendered WAV decodes for real: true format, loud everywhere; silence sits at -1") {
    val wav = AudioIntegrity.renderAudio("a caption that becomes two thousand real PCM samples")
    val decoded = MediaOps.decodeAudio(wav)
    assert(decoded.isDefined, "the JDK must parse our own WAV")
    val (rate, channels, durMs, env) = decoded.get
    assert(rate == 8000f && channels == 1)
    assert(durMs == 256L, s"2048 samples at 8 kHz = 256 ms, got $durMs")
    // amplitude floor 0.25 ⇒ every envelope bin ≥ -0.5, with margin to the -0.9 gate
    assert(env.forall(_ > -0.51f), s"min bin ${env.min}")

    val silent = MediaOps.decodeAudio(AudioIntegrity.silence()).get._4
    assert(silent.forall(_ == -1.0f), "digital silence must decode to exactly -1")
  }

  test("loudestBin: rendered passes, silence and undecodable flagged") {
    val rows = Seq(
      (1L, AudioIntegrity.renderAudio("ordinary spoken content")),
      (2L, AudioIntegrity.silence()),
      (3L, Array.tabulate[Byte](80)(_.toByte))) // not a WAV
      .toDF("doc_id", "content")
    val d = AudioIntegrity.loudestBin(rows).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d(1L) > AudioIntegrity.SilenceThreshold)
    assert(d(2L) == -1.0)
    assert(d(3L) == Double.MinValue)
  }

  test("q156 recovers the planted dead-air set exactly at sf0.001") {
    val got = MediaQueries.q156AudioAudit(spark, sf0001)
      .collect().map(_.getLong(0)).toSeq
    val want = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(length(col("text")) >= 50 && col("doc_id") % 9 === 4)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    assert(want.nonEmpty)
  }
}
