package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Caches
import graft.sources.VectorIndexStore
import graft.state.JdbcStateStore

/** Streaming maintenance of the IVF index store: micro-batches are
  * assigned against the frozen codebook and appended exactly once,
  * replays converge, and the q139 probe immediately rides the
  * stream-maintained index.
  */
class VectorMaintainerSpec extends SparkSpec {
  import spark.implicits._

  test("streamed batches advance the index exactly once; the probe reads it; replay skips") {
    implicit val sqlCtx = spark.sqlContext
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val backfill = e.where(pmod(col("vec_id"), lit(5)) =!= 0)
      .where(col("vec_id") % 3 =!= 2)
    val streamed = e.where(pmod(col("vec_id"), lit(5)) =!= 0)
      .where(col("vec_id") % 3 === 2)
    val b0 = streamed.where(col("vec_id") % 2 === 0)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toSeq
    val b1 = streamed.where(col("vec_id") % 2 === 1)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toSeq

    val dir = tmpDir("vecmaint_store")
    // build: backfill as day -1 (outside the stream's batch-id range)
    VectorIndexStore.build(e, backfill, dir, day = -1)
    val ctl = new JdbcStateStore("jdbc:derby:memory:vecmaint1;create=true")
    ctl.ensureTable()
    val input = MemoryStream[(Long, Array[Float])]
    val q = VectorMaintainer.exactlyOnce(
      input.toDF().toDF("vec_id", "embedding"), ctl, "vectorstore", dir)
      .option("checkpointLocation", tmpDir("vecmaint_cp")).start()
    try {
      input.addData(b0: _*)
      q.processAllAvailable()
      input.addData(b1: _*)
      q.processAllAvailable()
    } finally q.stop()

    val idx = e.where(pmod(col("vec_id"), lit(5)) =!= 0)
    spark.conf.set(VectorIndexStore.DirKey, dir)
    try {
      val opened = VectorIndexStore.openFresh(e, idx)
      assert(opened.isDefined,
        "stream-maintained store must be fresh for backfill + streamed batches")
      // the probe through the stream-maintained index equals inline
      val stored = graft.operators.SimilarityQueries
        .q139IvfProbe(spark, "/root/testdata/sf0.001").collect()
        .map(_.toString).toSet
      Caches.releaseAll()
      spark.conf.unset(VectorIndexStore.DirKey)
      val inline = graft.operators.SimilarityQueries
        .q139IvfProbe(spark, "/root/testdata/sf0.001").collect()
        .map(_.toString).toSet
      assert(stored == inline, "probe must be byte-identical through the stream-built index")
    } finally {
      spark.conf.unset(VectorIndexStore.DirKey)
      Caches.releaseAll()
    }

    // Replay of a committed batch skips and never duplicates rows.
    val before = spark.read.parquet(s"$dir/assign").count()
    val replayed = VectorMaintainer.advanceBatch(
      b0.toDF("vec_id", "embedding"), ctl, "vectorstore", dir, batchId = 0L)
    assert(!replayed, "a committed batch must be skipped on replay")
    assert(spark.read.parquet(s"$dir/assign").count() == before)
  }
}
