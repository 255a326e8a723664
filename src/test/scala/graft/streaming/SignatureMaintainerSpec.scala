package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Caches
import graft.operators.DedupQueries
import graft.sources.SignatureStore
import graft.state.JdbcStateStore

/** Streaming maintenance of the signature store: micro-batches advance
  * it exactly once, replays converge instead of duplicating, and the
  * batch dedup tier immediately reads the stream-maintained store.
  */
class SignatureMaintainerSpec extends SparkSpec {
  import spark.implicits._

  private val base = (1 to 40).map(i => s"w$i").mkString(" ")

  private def newStore(name: String): JdbcStateStore = {
    val s = new JdbcStateStore(s"jdbc:derby:memory:$name;create=true")
    s.ensureTable()
    s
  }

  test("streamed batches advance the store exactly once; replay skips; dedup tier reads it") {
    implicit val sqlCtx = spark.sqlContext
    val ctl = newStore("sigmaint1")
    val dir = tmpDir("sigmaint_store")
    val input = MemoryStream[(Long, String)]
    val q = SignatureMaintainer.exactlyOnce(
      input.toDF().toDF("doc_id", "text"), ctl, "sigstore", dir)
      .option("checkpointLocation", tmpDir("sigmaint_cp")).start()
    try {
      input.addData((1L, base + " tail one"), (2L, base + " tail two"))
      q.processAllAvailable()
      input.addData((10L, base + " tail one x"),
        (20L, "another unrelated fresh document with its own words entirely"))
      q.processAllAvailable()
    } finally q.stop()

    // The store now covers both micro-batches: fresh for the union.
    val corpus = Seq(
      (1L, base + " tail one"), (2L, base + " tail two"),
      (10L, base + " tail one x"),
      (20L, "another unrelated fresh document with its own words entirely"))
      .toDF("doc_id", "text")
    spark.conf.set(SignatureStore.DirKey, dir)
    try {
      assert(SignatureStore.openFresh(corpus).isDefined,
        "stream-maintained store must be fresh for the streamed corpus")
      // and the BATCH dedup tier reads it directly: near-dup pairs over
      // the streamed docs, signatures straight from the store.
      val pairs = DedupQueries.minhashLshOn(corpus, fastHash = true)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      Caches.releaseAll()
      assert(pairs.contains((1L, 10L)) || pairs.contains((10L, 1L)),
        s"the cross-batch near-dup pair must surface: $pairs")
    } finally spark.conf.unset(SignatureStore.DirKey)

    // Replay of a committed batch (at-least-once foreachBatch): skips.
    val replayed = SignatureMaintainer.advanceBatch(
      Seq((1L, base + " tail one")).toDF("doc_id", "text"),
      ctl, "sigstore", dir, batchId = 0L)
    assert(!replayed, "committed batch must report skipped")
    val perDoc = spark.read.parquet(s"$dir/sigs")
      .groupBy("doc_id").count().select("count").as[Long].collect()
    assert(perDoc.nonEmpty && perDoc.forall(_ == 1L),
      "no doc may carry duplicate signature rows after a replay")
  }

  test("a torn day (crash mid-advance, no marker) converges on replay") {
    val ctl = newStore("sigmaint2")
    val dir = tmpDir("sigmaint_torn")
    val day0 = Seq((1L, base + " tail one")).toDF("doc_id", "text")
    SignatureStore.build(day0, dir, day = 0)
    Caches.releaseAll()
    ctl.markBatch("sigstore", 0L)

    // Simulate the crash: day=1 partition data exists, but neither the
    // meta commit row nor the batch marker ever landed.
    val torn = Seq((10L, "torn partial leftover content here")).toDF("doc_id", "text")
    DedupQueries.shinglesOf(torn).withColumn("day", lit(1))
      .write.mode("append").partitionBy("day").parquet(s"$dir/shingles")
    Caches.releaseAll()
    assert(!ctl.batchCommitted("sigstore", 1L))

    val batch1 = Seq((10L, base + " tail one x")).toDF("doc_id", "text")
    val wrote = SignatureMaintainer.advanceBatch(
      batch1, ctl, "sigstore", dir, batchId = 1L)
    assert(wrote, "uncommitted batch must (re)write")

    // The torn leftovers are gone; the store is fresh for the REAL corpus.
    val corpus = day0.unionByName(batch1)
    spark.conf.set(SignatureStore.DirKey, dir)
    try assert(SignatureStore.openFresh(corpus).isDefined,
      "replayed day must converge to a fresh store")
    finally spark.conf.unset(SignatureStore.DirKey)
    val day1Sh = spark.read.parquet(s"$dir/shingles")
      .where(col("day") === 1).select("sh").as[String].collect()
    assert(day1Sh.nonEmpty && !day1Sh.exists(_.contains("torn")),
      s"torn shingles must vanish on replay: ${day1Sh.take(3).mkString(";")}")
  }
}
