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

  test("combined gate streams exactly once: two-eye verdicts per batch, null embeddings keep their gram verdict, replay skips") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(59)
    val base = Array.fill(16)(rnd.nextGaussian())
    val evText = Seq((90L, filler("ea", 35) + passage + filler("eb", 25)))
      .toDF("doc_id", "text")
    val evEmb = ((0 until 16).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)) :+
      ((90L, base.map(_.toFloat).toSeq))).toDF("vec_id", "embedding")
    // doc 50: gram leak, clean embedding; doc 51: paraphrase (embedding
    // only); doc 52: clean both; doc 53: NULL embedding + gram leak —
    // must still drop on the gram eye alone.
    val b0 = Seq(
      (50L, filler("da", 50) + passage + filler("db", 30),
        Array.fill(16)(rnd.nextGaussian().toFloat).toSeq),
      (51L, filler("dz", 130), base.map(x => (x + 0.01).toFloat).toSeq),
      (52L, filler("dy", 110), Array.fill(16)(rnd.nextGaussian().toFloat).toSeq),
      (53L, filler("dc", 20) + passage + filler("dd", 20),
        null.asInstanceOf[Seq[Float]]))
    val ctl = new JdbcStateStore("jdbc:derby:memory:decongate3;create=true")
    ctl.ensureTable()
    val outDir = tmpDir("decongate_comb_out")
    val input = MemoryStream[(Long, String, Seq[Float])]
    // τ = 0.9: random 16-dim gaussian pairs sit at |cos| ≲ 0.5, the
    // planted near-copy at ≈ 1 — the margin that keeps the clean docs
    // deterministic (the batch-face test's convention).
    val q = DeconGate.exactlyOnceCombined(
      input.toDF().toDF("doc_id", "text", "embedding"),
      evText, evEmb, ctl, "decongate_comb", outDir, tau = 0.9)
      .option("checkpointLocation", tmpDir("decongate_comb_cp")).start()
    try {
      input.addData(b0: _*)
      q.processAllAvailable()
    } finally q.stop()
    Caches.releaseAll()

    val got = spark.read.parquet(s"$outDir/batch=0").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    val L = passage.length.toLong
    assert(got(50L)._1 == L && got(50L)._2 == 0L && !got(50L)._3,
      s"gram leak drops with zero semantic hits: $got")
    assert(got(51L)._1 == 0L && got(51L)._2 >= 1L && !got(51L)._3,
      s"the paraphrase drops on the semantic eye alone: $got")
    assert(got(52L) == ((0L, 0L, true)), s"clean doc keeps: $got")
    assert(got(53L)._1 == L && got(53L)._2 == 0L && !got(53L)._3,
      s"a null-embedding doc keeps its gram verdict: $got")

    // committed replay skips; the partition survives
    assert(!DeconGate.gateCombinedBatch(
      b0.toDF("doc_id", "text", "embedding"), evText, evEmb, ctl,
      "decongate_comb", outDir, batchId = 0L))
    assert(spark.read.parquet(s"$outDir/batch=0").count() == 4)
    ctl.close()
  }

  test("three-eye gate streams exactly once: a re-crawled benchmark image drops on the media eye alone; null payloads keep their seen-eye verdicts; replay skips") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(73)
    val base = Array.fill(16)(rnd.nextGaussian())
    val evCaption = "a benchmark photograph of a rare astronomical event over calm water"
    val evText = Seq((90L, filler("ea", 35) + passage + filler("eb", 25)))
      .toDF("doc_id", "text")
    val evEmb = ((0 until 16).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)) :+
      ((90L, base.map(_.toFloat).toSeq))).toDF("vec_id", "embedding")
    // the suite's images are hashed ONCE at release — the gate never
    // re-decodes them per batch
    val evImg = graft.multimodal.MediaDedup.hashImages(
      Seq((90L, graft.multimodal.MediaDedup.renderImage(evCaption)))
        .toDF("media_id", "content"))

    // 70: gram leak, clean embedding, NO image; 71: paraphrase only;
    // 72: clean everywhere (own unrelated image); 73: clean text + clean
    // embedding but the benchmark's own image re-crawled; 74: gram leak
    // with NULL embedding AND null content — the gram verdict stands.
    def rv() = Array.fill(16)(rnd.nextGaussian().toFloat).toSeq
    val b0 = Seq(
      (70L, filler("da", 50) + passage + filler("db", 30), rv(),
        null.asInstanceOf[Array[Byte]]),
      (71L, filler("dz", 130), base.map(x => (x + 0.01).toFloat).toSeq,
        null.asInstanceOf[Array[Byte]]),
      (72L, filler("dy", 110), rv(),
        graft.multimodal.MediaDedup.renderImage(
          "an entirely unrelated picture of dense machinery in a factory hall")),
      (73L, filler("dw", 120), rv(),
        graft.multimodal.MediaDedup.renderImage(evCaption)),
      (74L, filler("dc", 20) + passage + filler("dd", 20),
        null.asInstanceOf[Seq[Float]], null.asInstanceOf[Array[Byte]]))
    val ctl = new JdbcStateStore("jdbc:derby:memory:decongate4;create=true")
    ctl.ensureTable()
    val outDir = tmpDir("decongate_three_out")
    val input = MemoryStream[(Long, String, Seq[Float], Array[Byte])]
    val q = DeconGate.exactlyOnceThreeEye(
      input.toDF().toDF("doc_id", "text", "embedding", "content"),
      evText, evEmb, evImg, ctl, "decongate_three", outDir, tau = 0.9)
      .option("checkpointLocation", tmpDir("decongate_three_cp")).start()
    try {
      input.addData(b0: _*)
      q.processAllAvailable()
    } finally q.stop()
    Caches.releaseAll()

    val got = spark.read.parquet(s"$outDir/batch=0").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)), r.getBoolean(6)))).toMap
    val L = passage.length.toLong
    assert(got(70L) == ((L, 0L, 0L, None, false)),
      s"imageless gram leak drops on grams alone: ${got(70L)}")
    assert(got(71L)._1 == 0L && got(71L)._2 >= 1L && got(71L)._3 == 0L && !got(71L)._5,
      s"the paraphrase drops on the semantic eye alone: ${got(71L)}")
    assert(got(72L) == ((0L, 0L, 0L, None, true)),
      s"the clean doc keeps under all three eyes: ${got(72L)}")
    assert(got(73L) == ((0L, 0L, 1L, Some(0L), false)),
      s"the re-crawled benchmark image drops doc 73 on the media eye alone: ${got(73L)}")
    assert(got(74L) == ((L, 0L, 0L, None, false)),
      s"null embedding + null payload keeps the gram verdict: ${got(74L)}")

    // committed replay skips; the partition survives
    assert(!DeconGate.gateThreeEyeBatch(
      b0.toDF("doc_id", "text", "embedding", "content"), evText, evEmb,
      evImg, ctl, "decongate_three", outDir, batchId = 0L, tau = 0.9))
    assert(spark.read.parquet(s"$outDir/batch=0").count() == 5)
    ctl.close()
  }

  test("combined gate: gram and semantic faces catch disjoint leaks; keep = clean under both") {
    val rnd = new scala.util.Random(31)
    val base = Array.fill(16)(rnd.nextGaussian())
    val evText = Seq((90L, filler("ea", 35) + passage + filler("eb", 25)))
      .toDF("doc_id", "text")
    val evEmb = ((0 until 16).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)) :+
      ((90L, base.map(_.toFloat).toSeq))).toDF("vec_id", "embedding")
    // doc 30: verbatim gram leak, embedding far (semantic face blind to it);
    // doc 31: paraphrase — no shared gram, embedding next to the benchmark;
    // doc 32: clean on both faces.
    val batchText = Seq(
      (30L, filler("da", 50) + passage + filler("db", 30)),
      (31L, filler("dz", 130)),
      (32L, filler("dy", 110))).toDF("doc_id", "text")
    val batchEmb = Seq(
      (30L, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq),
      (31L, base.map(x => (x + 0.01).toFloat).toSeq),
      (32L, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val got = DeconGate.flagCombined(batchText, evText, batchEmb, evEmb, tau = 0.9)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    Caches.releaseAll()
    val L = passage.length.toLong
    assert(got(30L) == ((L, 0L, false)), s"gram leak must drop with zero semantic hits: $got")
    assert(got(31L)._1 == 0L && got(31L)._2 >= 1L && !got(31L)._3,
      s"the paraphrase must drop on the semantic face alone: $got")
    assert(got(32L) == ((0L, 0L, true)), s"the clean doc keeps: $got")
  }

  test("semantic gate: store-served verdicts equal inline when codebooks agree, and are batch-INDEPENDENT") {
    import graft.sources.SemanticDeconStore
    val rnd = new scala.util.Random(23)
    val base = Array.fill(16)(rnd.nextGaussian())
    // Eval suite: the 16 codebook-eligible fillers (vec_id < 16) PLUS
    // the benchmark vector 20 — so the inline union codebook equals
    // the store's eval-derived one whenever the batch carries no
    // id < 16, which is what makes exact parity provable.
    val fillers = (0 until 16).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq))
    val ev = (fillers :+ ((20L, base.map(_.toFloat).toSeq)))
      .toDF("vec_id", "embedding")
    val para = (100L, base.map(x => (x + 0.01).toFloat).toSeq)    // paraphrase of 20
    val clean = (101L, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)
    def verdicts(batch: Seq[(Long, Seq[Float])]): Map[Long, Boolean] = {
      val out = DeconGate.flagSemantic(
        batch.toDF("vec_id", "embedding"), ev, tau = 0.9)
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      Caches.releaseAll()
      out
    }
    val inlineV = verdicts(Seq(para, clean))
    assert(inlineV == Map(100L -> false, 101L -> true), s"inline sanity: $inlineV")

    val dir = tmpDir("semdecon_store")
    SemanticDeconStore.build(ev, dir, trained = false)
    Caches.releaseAll()
    spark.conf.set(SemanticDeconStore.DirKey, dir)
    try {
      assert(SemanticDeconStore.openFresh(ev).isDefined,
        "store must be fresh for its own suite")
      // parity: same batch, same verdicts, store or inline
      assert(verdicts(Seq(para, clean)) == inlineV,
        "store-served verdicts must equal inline when codebooks agree")
      // batch-independence: the paraphrase's verdict cannot change when
      // an id-below-codebook vector joins its micro-batch (inline
      // union-codebook derivation would swap codebook entry 5 for the
      // batch's; the frozen store codebook cannot)
      val adversary = (5L, base.map(x => (-x).toFloat).toSeq)
      val withAdv = verdicts(Seq(para, clean, adversary))
      assert(withAdv(100L) == inlineV(100L) && withAdv(101L) == inlineV(101L),
        s"frozen-codebook verdicts must not depend on batch composition: $withAdv")

      // retire the suite's only partition: stale for the suite → the
      // gate falls back inline and still flags the paraphrase
      SemanticDeconStore.retireBenchmark("all", spark, dir)
      assert(SemanticDeconStore.openFresh(ev).isEmpty,
        "retired store must read stale for a non-empty suite")
      assert(verdicts(Seq(para, clean)) == inlineV,
        "stale store must cost a recompute, never a missed leak")
    } finally {
      spark.conf.unset(SemanticDeconStore.DirKey)
      Caches.releaseAll()
    }
  }

  test("a sink straddling a schema upgrade reads back correctly through readVerdicts, without the caller passing mergeSchema") {
    val ev = Seq((20L, filler("ua", 35) + passage + filler("ub", 25)))
      .toDF("doc_id", "text")
    val ctl = new JdbcStateStore("jdbc:derby:memory:decongateupg;create=true")
    ctl.ensureTable()
    val outDir = tmpDir("decongate_upgrade")

    // PRE-upgrade batch: an r13-era gate wrote the bare single-eye
    // verdict with NO version stamp (simulated by writing the kernel's
    // relation directly, exactly what the old gated() did).
    DeconGate.flag(
      Seq((1L, filler("va", 50) + passage), (2L, filler("vz", 120)))
        .toDF("doc_id", "text"), ev)
      .write.parquet(s"$outDir/batch=0")
    Caches.releaseAll()

    // POST-upgrade batch: today's three-eye gate, stamped, more columns.
    assert(DeconGate.gateThreeEyeBatch(
      Seq((3L, filler("wa", 50) + passage,
          Option.empty[Array[Float]], Option.empty[Array[Byte]]),
        (4L, filler("wz", 120),
          Option.empty[Array[Float]], Option.empty[Array[Byte]]))
        .toDF("doc_id", "text", "embedding", "content"),
      ev, spark.range(0).selectExpr("id as vec_id",
        "cast(array() as array<float>) as embedding"),
      spark.range(0).selectExpr("id as media_id", "id as dhash"),
      ctl, "decongate_upg", outDir, batchId = 1L))
    Caches.releaseAll()

    val got = DeconGate.readVerdicts(spark, outDir)
    // union schema: every column of both eras present exactly once
    assert(got.columns.count(_ == "verdict_schema") == 1)
    assert(got.columns.contains("witness_image"),
      "the upgraded batch's columns must survive the mixed read")
    val byDoc = got.collect().map(r =>
      r.getLong(0) -> ((r.getAs[Long]("contam_chars"),
        r.getAs[Boolean]("keep"), r.getAs[Int]("verdict_schema")))).toMap
    Caches.releaseAll()
    assert(byDoc(1L)._2 == false && byDoc(1L)._3 == 0,
      "pre-upgrade rows surface as version 0 with their verdicts intact")
    assert(byDoc(2L) == ((0L, true, 0)))
    assert(byDoc(3L)._2 == false &&
      byDoc(3L)._3 == DeconGate.VerdictSchemaVersion,
      "post-upgrade rows carry the current stamp")
    assert(byDoc(4L)._2 == true)
    // the old rows' absent media columns read as null — an imageless
    // doc, never a hamming-0 lookalike
    val old1 = got.where(org.apache.spark.sql.functions.col("doc_id") === 1L).head()
    assert(old1.isNullAt(old1.fieldIndex("witness_image")))
    ctl.close()
  }
}
