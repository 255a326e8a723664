package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.ClassifierQueries

/** Train-batch/serve-stream round trip: the stream-side per-row fold
  * must agree with the batch trainer's per-bucket formulation on every
  * document (same weights, algebraically identical margin), and the
  * gate must actually separate a corpus the trainer learned.
  */
class QualityGateSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "aa aa ab", "en"), (2L, "aa ab aa", "en"), (3L, "ab aa", "en"),
    (4L, "bb bc bb", "de"), (5L, "bc bb", "de"), (6L, "bb bb bc", "de"))

  test("streaming scores match the batch scorer at its 6-dp output grain; gate separates") {
    implicit val sqlCtx = spark.sqlContext
    val docs = corpus.toDF("doc_id", "text", "lang")
    val w = ClassifierQueries.trainWeights(docs)
    val batch = ClassifierQueries.qualityLrOn(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    graft.core.Caches.releaseAll()

    val input = MemoryStream[(Long, String)]
    val gated = QualityGate.gate(
      input.toDF().toDF("doc_id", "text"), w)
    val q = gated.writeStream.format("memory").queryName("quality_gate")
      .outputMode("append").start()
    try {
      input.addData(corpus.map(c => (c._1, c._2)): _*)
      q.processAllAvailable()
      val streamed = spark.table("quality_gate")
        .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
      assert(streamed.size == corpus.size)
      corpus.foreach { case (id, _, lang) =>
        val (score, keep) = streamed(id)
        // batch emits round(p, 6); the stream-side fold differs from the
        // batch per-bucket sum only by IEEE summation order (≪ 1e-9),
        // so 6-dp rounding is the comparison grain
        assert(math.abs(score - batch(id)) < 1e-6,
          s"doc $id: stream $score vs batch ${batch(id)}")
        assert(keep == (lang == "en"),
          s"doc $id ($lang) gated wrong: $streamed")
      }
    } finally q.stop()
  }

  test("null text scores through the bias row — every row lands in exactly one stream") {
    // The batch trainer gives a null-text doc only its bias feature row,
    // so its score is sigmoid(bias). The gate must match — a null score
    // made keep null, and the row fell out of BOTH the keep and the
    // quarantine filters silently.
    val docs = corpus.toDF("doc_id", "text", "lang")
    val w = ClassifierQueries.trainWeights(docs)
    val bias = w.getOrElse(-1L, 0.0)
    val gated = QualityGate.gate(
      Seq((100L, null: String), (1L, "aa aa ab")).toDF("doc_id", "text"), w)
    val rows = gated.collect().map(r =>
      r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    val (nullScore, nullKeep) = rows(100L)
    assert(math.abs(nullScore - 1.0 / (1.0 + math.exp(-bias))) < 1e-12,
      s"null text must score sigmoid(bias), got $nullScore")
    // keep is non-null either way — the row is in exactly one stream
    assert(gated.where(col("keep") || !col("keep")).count() == 2,
      "no row may have a null keep flag")
    assert(nullKeep == (nullScore >= 0.5))
  }

  test("the gate is stateless: the streaming plan carries no state operator") {
    implicit val sqlCtx = spark.sqlContext
    val docs = corpus.toDF("doc_id", "text", "lang")
    val w = ClassifierQueries.trainWeights(docs)
    val input = MemoryStream[(Long, String)]
    val q = QualityGate.gate(input.toDF().toDF("doc_id", "text"), w)
      .writeStream.format("memory").queryName("quality_gate_stateless")
      .outputMode("append").start()
    try {
      input.addData((1L, "aa"))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        s"gating must hold zero streaming state: ${q.lastProgress}")
    } finally q.stop()
  }
}
