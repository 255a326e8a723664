package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityQueries

/** Train-batch/serve-stream round trip for the embedding gate: stream
  * scores must equal the batch scorer's exactly (same centroid literal,
  * same expression), the gate must quarantine planted aliens and
  * degenerate vectors, and its ranking must agree with q161's audit.
  */
class EmbeddingGateSpec extends SparkSpec {
  import spark.implicits._

  /** 20 inliers around a common direction + an antipodal alien. */
  private lazy val (reference, alien) = {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(8)(rnd.nextGaussian())
    val ref = (0 until 20).map { i =>
      (i.toLong, base.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }
    (ref, (900L, base.map(x => (-x).toFloat).toSeq))
  }

  test("stream scores equal batch scores exactly; aliens and zero vectors quarantine") {
    implicit val sqlCtx = spark.sqlContext
    val zero = (901L, Seq.fill(8)(0.0f))
    val rows = reference :+ alien :+ zero
    val refDf = reference.toDF("vec_id", "embedding")
    val cent = EmbeddingGate.train(refDf)
    assert(cent.length == 8)

    val batch = EmbeddingGate.gate(rows.toDF("vec_id", "embedding"), cent, 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap

    val input = MemoryStream[(Long, Seq[Float])]
    val q = EmbeddingGate.gate(input.toDF().toDF("vec_id", "embedding"), cent, 0.5)
      .writeStream.format("memory").queryName("embedding_gate")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("embedding_gate")
        .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
      assert(streamed.size == rows.size)
      // identical literal centroid + identical expression ⇒ exact equality
      rows.foreach { case (id, _) =>
        assert(streamed(id) == batch(id),
          s"vec $id: stream ${streamed(id)} vs batch ${batch(id)}")
      }
      assert(!streamed(900L)._2 && streamed(900L)._1 < 0, "antipodal alien quarantined")
      assert(!streamed(901L)._2 && streamed(901L)._1 == 0.0,
        "zero vector scores 0, not NaN — NaN would outrank every threshold")
      reference.foreach { case (id, _) =>
        assert(streamed(id)._2, s"inlier $id must pass: ${streamed(id)}")
      }
    } finally q.stop()
  }

  test("the gate's scores agree with q161's audit at its 6-dp output grain") {
    val rows = reference :+ alien
    val df = rows.toDF("vec_id", "embedding")
    val audit = SimilarityQueries.embedOutliersOn(df, rows.length)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    graft.core.Caches.releaseAll()
    val gated = EmbeddingGate.gate(df, EmbeddingGate.train(df), 0.5)
      .select(col("vec_id"), round(col("sim"), 6).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(audit.keySet == gated.keySet)
    audit.foreach { case (id, s) =>
      assert(math.abs(s - gated(id)) < 1e-12,
        s"vec $id: audit $s vs gate ${gated(id)}")
    }
  }
}
