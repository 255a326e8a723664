package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Caches
import graft.multimodal.MediaDedup
import graft.sources.VerdictStore
import graft.state.JdbcStateStore

/** The verdict maintainer's exactly-once contract on BOTH churn
  * directions (VERDICT r15 next-1 "done" criteria): ingest batches
  * advance the evidence once and replays skip; a crash between
  * advance and marker converges on replay; suite-edit advances probe
  * history once and flag it, retires clear a benchmark's flags with
  * zero probes. Verdicts are asserted on PLANTED docs: one
  * contaminated on all three eyes, one clean, fillers that keep with
  * null evidence (the absence rule for missing modalities).
  */
class VerdictMaintainerSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic embeddings: one-hot (±e_i) vectors so cross-doc
  // cosines are exactly 0 or -1 — no flaky near-threshold pairs. The
  // suite doc and its planted copy alone share direction e_7.
  private def oneHot(i: Int, sign: Float = 1f): Array[Float] =
    Array.tabulate(8)(j => if (j == i % 8) sign else 0f)

  private val evalText =
    "the canonical benchmark passage about a lighthouse keeper counting ships through a long winter night"
  private val cleanText =
    "an entirely unrelated field report describing soil moisture measurements across terraced farmland plots"

  /** (doc_id, text, embedding, content) rows; null modality = absent. */
  private def rel(rows: Seq[(Long, String, Option[Array[Float]], Option[Array[Byte]])]): DataFrame =
    rows.toDF("doc_id", "text", "embedding", "content")

  private val fillers: Seq[(Long, String, Option[Array[Float]], Option[Array[Byte]])] =
    (0L to 15L).map(i => (i, s"filler $i",
      // axes 0..6 only — e_7 is reserved for the planted suite pair,
      // so every filler×suite cosine is exactly 0 or -1, never a hit
      Some(oneHot(i.toInt % 7, if (i < 8) 1f else -1f)), None))

  // batch 0: doc 23, contaminated on ALL THREE eyes vs suite doc 100
  private val dirty = (23L, s"scraped copy: $evalText with trailing commentary",
    Some(oneHot(7).map(_ * 0.9f)), Some(MediaDedup.renderImage(evalText)))
  // batch 1: doc 24, clean everywhere
  private val clean = (24L, cleanText,
    Some(oneHot(3)), Some(MediaDedup.renderImage(cleanText)))

  private val suiteA = Seq("a" -> VerdictMaintainer.corpusOf(rel(Seq(
    (100L, evalText, Some(oneHot(7)), Some(MediaDedup.renderImage(evalText)))))))

  private def fullTrain = VerdictMaintainer.corpusOf(rel(fillers ++ Seq(dirty, clean)))

  private def evCount(dir: String, eye: String): Long =
    try spark.read.parquet(s"$dir/ev_$eye").count()
    catch { case _: Throwable => 0L }

  test("ingest batches advance evidence exactly once; crash-replay converges; planted verdicts and the absence rule hold") {
    val dir = tmpDir("verdictmaint_store")
    VerdictStore.build(VerdictMaintainer.corpusOf(rel(fillers)), suiteA, dir,
      trained = false)
    val ctl = new JdbcStateStore("jdbc:derby:memory:verdmaint1;create=true")
    ctl.ensureTable()

    assert(VerdictMaintainer.advanceBatch(rel(Seq(dirty)), suiteA, ctl,
      "verdict", dir, batchId = 0L), "an unmarked batch must advance")
    val after0 = evCount(dir, "gram")
    assert(!VerdictMaintainer.advanceBatch(rel(Seq(dirty)), suiteA, ctl,
      "verdict", dir, batchId = 0L), "a committed batch must be skipped on replay")
    assert(evCount(dir, "gram") == after0, "a skipped replay must not re-write")

    // crash between advance and marker: the direct advance stands, the
    // maintainer replay re-runs the idempotent retire-then-write and
    // only then marks — row counts converge, never duplicate.
    VerdictStore.advanceDay(VerdictMaintainer.corpusOf(rel(Seq(clean))),
      suiteA, dir, day = 1)
    val preRepair = (evCount(dir, "gram"), evCount(dir, "sem"), evCount(dir, "img"))
    assert(VerdictMaintainer.advanceBatch(rel(Seq(clean)), suiteA, ctl,
      "verdict", dir, batchId = 1L), "an unmarked batch must replay the advance")
    assert((evCount(dir, "gram"), evCount(dir, "sem"), evCount(dir, "img")) == preRepair,
      "the replayed advance must converge, not duplicate")
    Caches.releaseAll()

    spark.conf.set(VerdictStore.DirKey, dir)
    try {
      val served = VerdictStore.openFreshThreeEye(fullTrain,
        suiteA.head._2)
      assert(served.isDefined,
        "stream-maintained store must be fresh for backfill + both batches")
      val byDoc = served.get.collect().map(r => r.getLong(0) -> r).toMap
      Caches.releaseAll()
      assert(byDoc.keySet == (0L to 15L).toSet + 23L + 24L)

      val d = byDoc(23L)
      assert(!d.getBoolean(6), "the planted copy must be dropped")
      assert(d.getLong(1) > 0L, "gram eye: span mass over the shared run")
      assert(d.getLong(2) >= 1L && d.getLong(7) == 100L,
        "semantic eye: hit with witness 100")
      assert(d.getLong(4) >= 1L && d.getLong(5) == 0L && d.getLong(8) == 100L,
        "media eye: verbatim re-render at hamming 0, witness 100")

      val c = byDoc(24L)
      assert(c.getBoolean(6) && c.getLong(1) == 0L && c.getLong(2) == 0L &&
        c.getLong(4) == 0L, "the clean doc must keep with zero evidence")

      val f = byDoc(3L)
      assert(f.getBoolean(6) && f.isNullAt(5) && f.isNullAt(8),
        "a doc with no image keeps, media columns null (absence rule)")
    } finally {
      spark.conf.unset(VerdictStore.DirKey)
      Caches.releaseAll()
    }
  }

  test("streamed ingest wiring: micro-batches advance the store through foreachBatch, verdicts current through the last batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("verdictmaint_stream")
    VerdictStore.build(VerdictMaintainer.corpusOf(rel(fillers)), suiteA, dir,
      trained = false)
    val ctl = new JdbcStateStore("jdbc:derby:memory:verdmaint3;create=true")
    ctl.ensureTable()
    val input = MemoryStream[(Long, String, Option[Array[Float]], Option[Array[Byte]])]
    val q = VerdictMaintainer.exactlyOnce(
      input.toDF().toDF("doc_id", "text", "embedding", "content"),
      suiteA, ctl, "verdict_stream", dir)
      .option("checkpointLocation", tmpDir("verdictmaint_stream_cp")).start()
    try {
      input.addData(dirty)
      q.processAllAvailable()
      input.addData(clean)
      q.processAllAvailable()
    } finally q.stop()
    Caches.releaseAll()
    spark.conf.set(VerdictStore.DirKey, dir)
    try {
      val served = VerdictStore.openFreshThreeEye(fullTrain, suiteA.head._2)
      assert(served.isDefined,
        "the stream-maintained store must be fresh through the last committed batch")
      val keeps = served.get.collect().map(r => r.getLong(0) -> r.getBoolean(6)).toMap
      Caches.releaseAll()
      assert(!keeps(23L) && keeps(24L),
        "streamed batches must carry the same verdicts as the direct advances")
    } finally {
      spark.conf.unset(VerdictStore.DirKey)
      Caches.releaseAll()
    }
  }

  test("suite-edit face: an advance probes history once and flags it; a retire clears its flags; replays skip") {
    val dir = tmpDir("verdictmaint_suite")
    VerdictStore.build(fullTrain, suiteA, dir, trained = false)
    val ctl = new JdbcStateStore("jdbc:derby:memory:verdmaint2;create=true")
    ctl.ensureTable()

    // benchmark b: a new eval doc equal to history doc 24 on all eyes
    val editsAdvance = Seq(
      ("b", "advance", 200L, cleanText, Some(oneHot(3)),
        Some(MediaDedup.renderImage(cleanText))))
      .toDF("bench", "action", "doc_id", "text", "embedding", "content")
    assert(VerdictMaintainer.applySuiteBatch(editsAdvance, fullTrain, ctl,
      "verdict_suite", dir, batchId = 0L), "an unmarked edit batch must apply")
    assert(!VerdictMaintainer.applySuiteBatch(editsAdvance, fullTrain, ctl,
      "verdict_suite", dir, batchId = 0L), "a committed edit batch must skip")
    Caches.releaseAll()

    val suiteB = VerdictMaintainer.corpusOf(rel(Seq(
      (200L, cleanText, Some(oneHot(3)), Some(MediaDedup.renderImage(cleanText))))))
    val suiteBoth = VerdictStore.Corpus(
      suiteA.head._2.txt.unionByName(suiteB.txt),
      suiteA.head._2.emb.unionByName(suiteB.emb),
      suiteA.head._2.img.unionByName(suiteB.img))

    spark.conf.set(VerdictStore.DirKey, dir)
    try {
      val served = VerdictStore.openFreshThreeEye(fullTrain, suiteBoth)
      assert(served.isDefined, "store must be fresh for the advanced suite")
      val byDoc = served.get.collect().map(r => r.getLong(0) -> r).toMap
      Caches.releaseAll()
      assert(!byDoc(24L).getBoolean(6) && byDoc(24L).getLong(7) == 200L,
        "the history probe must flag doc 24 against the new benchmark")
      assert(!byDoc(23L).getBoolean(6),
        "doc 23 keeps its flags from benchmark a")

      // retire benchmark a: doc 23's flags clear with ZERO probes
      val editsRetire = Seq(("a", "retire", 0L, "", Option.empty[Array[Float]],
        Option.empty[Array[Byte]]))
        .toDF("bench", "action", "doc_id", "text", "embedding", "content")
      assert(VerdictMaintainer.applySuiteBatch(editsRetire, fullTrain, ctl,
        "verdict_suite", dir, batchId = 1L))
      assert(VerdictStore.openFreshThreeEye(fullTrain, suiteBoth).isEmpty,
        "the pre-retire suite must read stale")
      val afterRetire = VerdictStore.openFreshThreeEye(fullTrain, suiteB)
      assert(afterRetire.isDefined, "the b-only suite must be fresh")
      val byDoc2 = afterRetire.get.collect().map(r => r.getLong(0) -> r).toMap
      Caches.releaseAll()
      assert(byDoc2(23L).getBoolean(6),
        "retiring benchmark a must clear doc 23's flags")
      assert(!byDoc2(24L).getBoolean(6),
        "doc 24 stays flagged by the surviving benchmark")
    } finally {
      spark.conf.unset(VerdictStore.DirKey)
      Caches.releaseAll()
    }
  }
}
