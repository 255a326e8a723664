package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.multimodal.{AudioIntegrity, MediaDedup}

/** The live media-integrity gate must agree row-for-row with the batch
  * audits it serves (q154 alignment, q156 dead air), quarantine
  * everything it cannot verify, and hold zero streaming state.
  */
class MediaGateSpec extends SparkSpec {
  import spark.implicits._

  private val capA = "a healthy caption whose stored payload is its own rendering"
  private val capB = "a caption whose image payload got swapped for the white decoy"
  private val capC = "a clip with genuine loud audio content rendered from me"
  private val capD = "a clip whose audio payload is pure digital silence"

  private def rows = Seq(
    (1L, "image", capA, MediaDedup.renderImage(capA)),
    (2L, "image", capB, MediaDedup.whiteDecoy()),
    (3L, "audio", capC, AudioIntegrity.renderAudio(capC)),
    (4L, "audio", capD, AudioIntegrity.silence()),
    (5L, "image", capA, Array.tabulate[Byte](48)(_.toByte)), // undecodable
    (6L, "hologram", capA, MediaDedup.renderImage(capA)))    // unknown modality

  test("streaming gate matches the batch audits row-for-row; unverifiable rows quarantined") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Array[Byte])]
    val q = MediaGate.gate(
      input.toDF().toDF("doc_id", "media_type", "text", "content"))
      .writeStream.format("memory").queryName("media_gate")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val out = spark.table("media_gate").collect()
        .map(r => r.getLong(0) -> ((r.getDouble(4), r.getBoolean(5)))).toMap
      assert(out.keySet == rows.map(_._1).toSet)
      assert(out(1L) == ((0.0, true)), "intact image: distance 0, kept")
      assert(out(2L)._1 > 3.5 && !out(2L)._2, "decoy image quarantined")
      assert(out(3L)._2 && out(3L)._1 <= MediaGate.SilenceDistance, "loud audio kept")
      assert(out(4L) == ((1.0, false)), "silence: distance exactly 1 (= -(-1)), quarantined")
      assert(!out(5L)._2, "undecodable payload quarantined")
      assert(!out(6L)._2, "unknown modality quarantined")

      // batch parity: the same rows through the batch audit kernels
      val batchImg = MediaDedup.alignmentDistances(
        rows.filter(_._2 == "image").map(r => (r._1, r._3, r._4))
          .toDF("doc_id", "text", "content"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      batchImg.foreach { case (id, d) => assert(out(id)._1 == d, s"image $id diverges") }
      val batchAud = AudioIntegrity.loudestBin(
        rows.filter(_._2 == "audio").map(r => (r._1, r._4))
          .toDF("doc_id", "content"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      batchAud.foreach { case (id, e) => assert(out(id)._1 == -e, s"audio $id diverges") }
    } finally q.stop()
  }

  test("the gate is stateless: zero streaming state operators") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Array[Byte])]
    val q = MediaGate.gate(
      input.toDF().toDF("doc_id", "media_type", "text", "content"))
      .writeStream.format("memory").queryName("media_gate_stateless")
      .outputMode("append").start()
    try {
      input.addData(rows.head)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
  }
}
