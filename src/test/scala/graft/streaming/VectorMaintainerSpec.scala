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

  test("scaled face: streamed batches maintain the √N index exactly once; q188 rides it; crash-mid-advance replay converges") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = e.where(pmod(col("vec_id"), lit(5)) =!= 0)
    val backfill = idx.where(col("vec_id") % 3 =!= 2)
    val streamed = idx.where(col("vec_id") % 3 === 2)
    val b0 = streamed.where(col("vec_id") % 2 === 0)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toSeq
    val b1 = streamed.where(col("vec_id") % 2 === 1)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toSeq

    val dir = tmpDir("vecmaint_scaled")
    VectorIndexStore.buildScaled(e, backfill, dir, day = -1, trained = false)
    val ctl = new JdbcStateStore("jdbc:derby:memory:vecmaint2;create=true")
    ctl.ensureTable()
    val input = MemoryStream[(Long, Array[Float])]
    val q = VectorMaintainer.exactlyOnceScaled(
      input.toDF().toDF("vec_id", "embedding"), ctl, "scaledstore", dir)
      .option("checkpointLocation", tmpDir("vecmaint_scaled_cp")).start()
    try {
      input.addData(b0: _*)
      q.processAllAvailable()
      input.addData(b1: _*)
      q.processAllAvailable()
    } finally q.stop()

    spark.conf.set(VectorIndexStore.DirKey, dir)
    try {
      assert(VectorIndexStore.openFreshScaled(e, idx).isDefined,
        "stream-maintained scaled store must be fresh for backfill + streamed batches")
      val stored = graft.operators.SimilarityQueries
        .q188IvfScaled(spark, sf).collect().map(_.toString).toSet
      Caches.releaseAll()
      spark.conf.unset(VectorIndexStore.DirKey)
      val inline = graft.operators.SimilarityQueries
        .q188IvfScaled(spark, sf).collect().map(_.toString).toSet
      assert(stored == inline,
        "q188 must be byte-identical through the stream-maintained scaled index")
    } finally {
      spark.conf.unset(VectorIndexStore.DirKey)
      Caches.releaseAll()
    }

    // Crash-mid-advance (advance ran, marker insert lost): the replay
    // re-runs the idempotent advance — retire-then-write converges to
    // the same rows — and only then marks. Simulate by advancing the
    // store directly without the marker.
    VectorIndexStore.advanceDayScaled(b0.toDF("vec_id", "embedding"), dir, day = 7)
    val preRepair = spark.read.parquet(s"$dir/assign_scaled").count()
    assert(VectorMaintainer.advanceBatchScaled(
      b0.toDF("vec_id", "embedding"), ctl, "scaledstore", dir, batchId = 7L),
      "an unmarked batch must replay the advance")
    assert(spark.read.parquet(s"$dir/assign_scaled").count() == preRepair,
      "the replayed advance must converge, not duplicate")
    // …and the now-committed batch skips.
    assert(!VectorMaintainer.advanceBatchScaled(
      b0.toDF("vec_id", "embedding"), ctl, "scaledstore", dir, batchId = 7L))
    ctl.close()
  }

  test("scaled-PQ face: streamed batches encode against both frozen codebooks exactly once; q195 rides it; replay skips") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    // q195 indexes its whole corpus (e, e) — backfill 2/3 of it at
    // build, stream the rest in two micro-batches.
    val backfill = e.where(col("vec_id") % 3 =!= 2)
    val streamed = e.where(col("vec_id") % 3 === 2)
    val b0 = streamed.where(col("vec_id") % 2 === 0)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toSeq
    val b1 = streamed.where(col("vec_id") % 2 === 1)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toSeq

    val inline = graft.operators.SimilarityQueries
      .q195IvfPqScaled(spark, sf).collect().map(_.toString).toSet
    Caches.releaseAll()

    val dir = tmpDir("vecmaint_pqs")
    VectorIndexStore.buildPqScaled(e, backfill, dir, day = -1, trained = false)
    val ctl = new JdbcStateStore("jdbc:derby:memory:vecmaint3;create=true")
    ctl.ensureTable()
    val input = MemoryStream[(Long, Array[Float])]
    val q = VectorMaintainer.exactlyOncePqScaled(
      input.toDF().toDF("vec_id", "embedding"), ctl, "pqscaledstore", dir)
      .option("checkpointLocation", tmpDir("vecmaint_pqs_cp")).start()
    try {
      input.addData(b0: _*)
      q.processAllAvailable()
      input.addData(b1: _*)
      q.processAllAvailable()
    } finally q.stop()

    spark.conf.set(VectorIndexStore.DirKey, dir)
    try {
      assert(VectorIndexStore.openFreshPqScaled(e, e).isDefined,
        "stream-maintained scaled-PQ store must be fresh for backfill + streamed batches")
      val stored = graft.operators.SimilarityQueries
        .q195IvfPqScaled(spark, sf).collect().map(_.toString).toSet
      Caches.releaseAll()
      assert(stored == inline,
        "q195 must be byte-identical through the stream-maintained scaled-PQ index " +
          "(advance ≡ build: streamed days encode against the SAME frozen codebooks)")
    } finally {
      spark.conf.unset(VectorIndexStore.DirKey)
      Caches.releaseAll()
    }

    // Replay of a committed batch skips and never duplicates codes.
    val before = spark.read.parquet(s"$dir/codes_pqs").count()
    assert(!VectorMaintainer.advanceBatchPqScaled(
      b0.toDF("vec_id", "embedding"), ctl, "pqscaledstore", dir, batchId = 0L),
      "a committed batch must be skipped on replay")
    assert(spark.read.parquet(s"$dir/codes_pqs").count() == before)
    ctl.close()
  }
}
