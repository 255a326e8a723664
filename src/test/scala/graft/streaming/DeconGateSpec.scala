package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.core.Caches
import graft.sources.DeconStore
import graft.state.JdbcStateStore

/** Streaming eval-set decontamination gate: micro-batches are probed
  * against the benchmark suite (through a fresh DeconStore), every doc
  * gets an exactly-once verdict, and the verdicts equal the batch
  * face's on the same docs.
  */
class DeconGateSpec extends SparkSpec {
  import spark.implicits._

  private val passage =
    "all rights reserved worldwide under the berne convention and " +
      "no part of this publication may be reproduced without permission "
  private def filler(tag: String, n: Int): String =
    Iterator.from(0).map(i => s"$tag$i ").take(n).mkString.take(n)
      .dropRight(1) + tag.head

  test("streamed batches get exactly-once verdicts matching the batch face; replay skips") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Seq((20L, filler("ea", 35) + passage + filler("eb", 25)))
      .toDF("doc_id", "text")
    val storeDir = tmpDir("decongate_store")
    DeconStore.build(ev, storeDir)
    Caches.releaseAll()
    spark.conf.set(DeconStore.DirKey, storeDir)

    val ctl = new JdbcStateStore("jdbc:derby:memory:decongate1;create=true")
    ctl.ensureTable()
    val outDir = tmpDir("decongate_out")
    val b0 = Seq(
      (1L, filler("da", 50) + passage + filler("db", 30)), // contaminated
      (2L, filler("dz", 130)))                             // clean
    val b1 = Seq(
      (3L, passage + filler("dc", 40)),                    // contaminated
      (4L, filler("dy", 90)))                              // clean
    try {
      val input = MemoryStream[(Long, String)]
      val q = DeconGate.exactlyOnce(input.toDF().toDF("doc_id", "text"),
        ev, ctl, "decongate", outDir)
        .option("checkpointLocation", tmpDir("decongate_cp")).start()
      try {
        input.addData(b0: _*)
        q.processAllAvailable()
        input.addData(b1: _*)
        q.processAllAvailable()
      } finally q.stop()

      val got = spark.read.parquet(s"$outDir/batch=0", s"$outDir/batch=1")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      val L = passage.length.toLong
      assert(got == Map(
        1L -> (L, false), 2L -> (0L, true),
        3L -> (L, false), 4L -> (0L, true)),
        s"every doc must carry its exactly-once verdict: $got")

      // parity with the batch face on the same docs
      Caches.releaseAll()
      val batchVerdicts = DeconGate.flag(
        (b0 ++ b1).toDF("doc_id", "text"), ev).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
      assert(batchVerdicts == got, "stream and batch faces must agree")

      // a replayed committed batch skips (and the partition survives)
      Caches.releaseAll()
      assert(!DeconGate.gateBatch(b0.toDF("doc_id", "text"), ev, ctl,
        "decongate", outDir, batchId = 0L))
      assert(spark.read.parquet(s"$outDir/batch=0").count() == 2)
    } finally {
      spark.conf.unset(DeconStore.DirKey)
      Caches.releaseAll()
    }
  }
}
