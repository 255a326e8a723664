package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Caches
import graft.multimodal.MediaDedup
import graft.streaming.DeconGate

/** The verdict store's contract (VERDICT r15 next-1):
  *
  *  - store ≡ inline BYTE-parity on q196 (two-eye) and q198
  *    (three-eye) under the first-K codebook convention — the serve
  *    path rolls stored evidence up through the SAME DeconGate code
  *    the inline gate uses, so this pins the evidence relations, not
  *    a re-implementation;
  *  - per-(benchmark, day) evidence COMPOSES: day advances and
  *    benchmark advances/retires each touch only their partitions and
  *    the composed serve equals a from-scratch inline sweep of the
  *    resulting corpus × suite;
  *  - freshness is digest-exact in both directions (train drift and
  *    suite drift read stale → inline), torn advances are invisible
  *    (meta commit point), and retire clears flags with zero probes.
  */
class VerdictStoreSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")

  /** The media tier's eligible (media_id, text) relation — the same
    * eligibility MediaQueries' decon faces use. */
  private def eligible = docs
    .filter(length(col("text")) >= 50)
    .select(col("doc_id").as("media_id"), col("text"))

  private def hashed(media: DataFrame): DataFrame =
    MediaDedup.hashImages(
      media.as[(Long, String)]
        .map { case (id, t) => (id, MediaDedup.renderImage(t)) }
        .toDF("media_id", "content"))

  private def trainCorpus = VerdictStore.Corpus(
    docs.filter(col("doc_id") % 10 =!= 0),
    emb.filter(col("vec_id") % 10 =!= 0),
    hashed(eligible.filter(col("media_id") % 10 =!= 0)))

  private def suiteCorpus(pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : VerdictStore.Corpus = VerdictStore.Corpus(
    docs.filter(pred(col("doc_id"))),
    emb.filter(pred(col("vec_id"))),
    hashed(eligible.filter(pred(col("media_id")))))

  private def rows(df: DataFrame): Set[String] = {
    val out = df.collect().map(_.toString).toSet
    Caches.releaseAll()
    out
  }


  /** The inline three-eye sweep under the store's FROZEN codebook
    * (first-K of the full table). The plain [[DeconGate.flagThreeEye]]
    * arm re-derives its semantic codebook from train ∪ suite per call,
    * so on a SUB-corpus (one day retired, one benchmark retired) it
    * would assign against a smaller union — the batch-dependence the
    * frozen codebook exists to remove. On the full corpus the two
    * arms coincide (union first-K = full first-K), which is what the
    * dispatch parity test pins through the real queries. */
  private def inlineThree(train: VerdictStore.Corpus,
      suite: VerdictStore.Corpus): Set[String] = {
    val sq = graft.operators.SimilarityQueries
    val cents = sq.centroidList(emb)
    val two = DeconGate.composeTwoEye(
      DeconGate.flagFromSpans(
        train.txt.select("doc_id"),
        graft.operators.SubstringDedup.deconProbeOn(train.txt, suite.txt)),
      DeconGate.flagSemanticFromMatches(
        train.emb.select(col("vec_id").as("doc_id")),
        sq.semanticDeconVia(train.emb, cents,
          sq.multiAssignWithNv(suite.emb, cents), sq.SemDeconTau)))
    rows(DeconGate.composeThreeEye(two,
      DeconGate.flagMediaFromPairs(
        train.img.select(col("media_id").as("doc_id")),
        MediaDedup.deconPairs(train.img, suite.img,
          graft.operators.MediaQueries.MaxHamming))))
  }

  test("store-served q196/q198 are byte-identical to the inline sweep (first-K codebook)") {
    val inline196 = rows(graft.operators.SubstringDedup.q196DeconVerdict(spark, sf))
    val inline198 = rows(graft.operators.MediaQueries.q198ThreeEyeDecon(spark, sf))
    // the serve-arm signal is structured, not a stderr line (r17
    // advice): unstored runs stamp "inline"
    assert(spark.conf.get(VerdictStore.ArmKeyPrefix + "q198") == "inline")
    val inline197 = rows(graft.operators.MediaQueries.q197MediaDecon(spark, sf))
    val inline199 = rows(graft.operators.MediaQueries.q199MediaCoverage(spark, sf))
    val inline200 = rows(graft.operators.MediaQueries.q200MediaScrub(spark, sf))

    val dir = tmpDir("verdictstore_parity")
    // codebookFrom = the full table: the inline kernel derives its
    // centroids from train ∪ eval = all embeddings, so the frozen
    // store codebook must come from the same relation for exact
    // parity; trained = false because the inline arm is first-K.
    VerdictStore.build(trainCorpus,
      Seq("all" -> suiteCorpus(_ % 10 === 0)), dir,
      codebookFrom = Some(emb), trained = false)
    Caches.releaseAll()

    spark.conf.set(VerdictStore.DirKey, dir)
    try {
      assert(VerdictStore.openFreshTwoEye(
        trainCorpus.txt, trainCorpus.emb,
        docs.filter(col("doc_id") % 10 === 0),
        emb.filter(col("vec_id") % 10 === 0)).isDefined,
        "store must be fresh for its own build relations")
      assert(rows(graft.operators.SubstringDedup.q196DeconVerdict(spark, sf)) == inline196,
        "store-served q196 must equal the inline two-eye sweep byte-for-byte")
      assert(rows(graft.operators.MediaQueries.q198ThreeEyeDecon(spark, sf)) == inline198,
        "store-served q198 must equal the inline three-eye sweep byte-for-byte")
      assert(spark.conf.get(VerdictStore.ArmKeyPrefix + "q198") == "store",
        "a fresh store must stamp the store arm")

      // the img evidence IS q197's pair relation: the whole media
      // report tier serves from it through the shared body
      assert(rows(graft.operators.MediaQueries.q197MediaDecon(spark, sf)) == inline197,
        "store-served q197 pairs must equal the inline banding byte-for-byte")
      assert(rows(graft.operators.MediaQueries.q199MediaCoverage(spark, sf)) == inline199,
        "store-served q199 coverage must equal the inline rollup")
      assert(rows(graft.operators.MediaQueries.q200MediaScrub(spark, sf)) == inline200,
        "store-served q200 scrub must equal the inline rollup")

      // train drift (one doc edited) reads stale → the queries fall
      // back inline and still produce the right verdicts
      val drifted = VerdictStore.Corpus(
        trainCorpus.txt.withColumn("text",
          when(col("doc_id") === 1L, lit("EDITED")).otherwise(col("text"))),
        trainCorpus.emb, trainCorpus.img)
      assert(VerdictStore.openFreshThreeEye(drifted, suiteCorpus(_ % 10 === 0)).isEmpty,
        "an edited train doc must read stale")
      Caches.releaseAll()

      // per-modality freshness: the text edit cannot invalidate the
      // MEDIA pairs (the eyes are independent; only the img digests
      // gate the pair serve) — but a different radius must
      assert(VerdictStore.openFreshMediaPairs(trainCorpus.img,
        suiteCorpus(_ % 10 === 0).img).isDefined,
        "a text edit must not stale the media pair serve")
      assert(VerdictStore.openFreshMediaPairs(trainCorpus.img,
        suiteCorpus(_ % 10 === 0).img, maxHamming = 0).isEmpty,
        "a radius the store was not built at must read stale")
      Caches.releaseAll()

      // thresholds are part of freshness (review r16): evidence
      // gathered at the build's τ / radius cannot serve a caller whose
      // verdict contract names different ones — even under TrustKey
      spark.conf.set(VerdictStore.TrustKey, "true")
      try {
        assert(VerdictStore.openFreshThreeEye(trainCorpus,
          suiteCorpus(_ % 10 === 0), tau = 0.9).isEmpty,
          "a τ the store was not built at must read stale")
        assert(VerdictStore.openFreshThreeEye(trainCorpus,
          suiteCorpus(_ % 10 === 0), maxHamming = 0).isEmpty,
          "a radius the store was not built at must read stale")
        assert(VerdictStore.openFreshTwoEye(
          trainCorpus.txt, trainCorpus.emb,
          docs.filter(col("doc_id") % 10 === 0),
          emb.filter(col("vec_id") % 10 === 0), tau = 0.9).isEmpty,
          "the two-eye face checks τ too")
      } finally spark.conf.unset(VerdictStore.TrustKey)

      // benchmark names splice into bench= partition paths: a name the
      // path would truncate must be rejected at build time, before any
      // store content is touched
      intercept[IllegalArgumentException] {
        VerdictStore.build(trainCorpus,
          Seq("mmlu=v2" -> suiteCorpus(_ % 10 === 0)), dir)
      }
      intercept[IllegalArgumentException] {
        VerdictStore.advanceBenchmark("a/b",
          suiteCorpus(_ % 10 === 0), trainCorpus, dir)
      }
      // '%' is rejected too: discovery URL-unescapes partition values,
      // so 'mmlu%3Dv2' would read back as 'mmlu=v2' and the serve-side
      // isin filter would miss all of that benchmark's evidence while
      // the content digests still pass (fresh-but-under-reporting)
      intercept[IllegalArgumentException] {
        VerdictStore.build(trainCorpus,
          Seq("mmlu%3Dv2" -> suiteCorpus(_ % 10 === 0)), dir)
      }
      // a benchmark listed twice would append its sem/img evidence
      // twice and inflate the published hit counts — rejected before
      // any store content is touched
      intercept[IllegalArgumentException] {
        VerdictStore.build(trainCorpus,
          Seq("a" -> suiteCorpus(_ % 20 === 0),
            "a" -> suiteCorpus(_ % 20 === 0)), dir)
      }
      Caches.releaseAll()
    } finally {
      spark.conf.unset(VerdictStore.DirKey)
      Caches.releaseAll()
    }
  }

  test("day advances compose: two-day ingest ≡ one build; retireDay excises exactly its day; torn advance is invisible") {
    val suite = suiteCorpus(_ % 10 === 0)
    val day1 = VerdictStore.Corpus(
      trainCorpus.txt.where(col("doc_id") % 3 =!= 2),
      trainCorpus.emb.where(col("vec_id") % 3 =!= 2),
      hashed(eligible.filter(col("media_id") % 10 =!= 0 && col("media_id") % 3 =!= 2)))
    val day2 = VerdictStore.Corpus(
      trainCorpus.txt.where(col("doc_id") % 3 === 2),
      trainCorpus.emb.where(col("vec_id") % 3 === 2),
      hashed(eligible.filter(col("media_id") % 10 =!= 0 && col("media_id") % 3 === 2)))

    val dir = tmpDir("verdictstore_days")
    VerdictStore.build(day1, Seq("all" -> suite), dir, day = 1,
      codebookFrom = Some(emb), trained = false)
    VerdictStore.advanceDay(day2, Seq("all" -> suite), dir, day = 2)
    Caches.releaseAll()

    spark.conf.set(VerdictStore.DirKey, dir)
    try {
      val served = VerdictStore.openFreshThreeEye(trainCorpus, suite)
      assert(served.isDefined,
        "XOR-composed day metas must cover the two-day union")
      assert(rows(served.get) == inlineThree(trainCorpus, suite),
        "two-day maintained store must serve the one-sweep inline verdicts")

      // day-level takedown: retire day 2, serve day 1's corpus alone
      VerdictStore.retireDay(spark, dir, 2)
      assert(VerdictStore.openFreshThreeEye(trainCorpus, suite).isEmpty,
        "after retiring day 2 the full corpus must read stale")
      val servedDay1 = VerdictStore.openFreshThreeEye(day1, suite)
      assert(servedDay1.isDefined, "day 1 alone must still be fresh")
      assert(rows(servedDay1.get) == inlineThree(day1, suite),
        "the retired day's docs and evidence must be fully excised")

      // re-advance day 2 (replay/convergence) and serve the union again
      VerdictStore.advanceDay(day2, Seq("all" -> suite), dir, day = 2)
      assert(rows(VerdictStore.openFreshThreeEye(trainCorpus, suite).get) ==
        inlineThree(trainCorpus, suite),
        "a re-advanced day must converge to the same serve")

      // torn advance: evidence written, day meta lost → stale, inline
      val f = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      f.delete(new org.apache.hadoop.fs.Path(s"$dir/day_meta/day=2"), true)
      assert(VerdictStore.openFreshThreeEye(trainCorpus, suite).isEmpty,
        "a day without its meta commit must be invisible (stale → inline)")
      Caches.releaseAll()
    } finally {
      spark.conf.unset(VerdictStore.DirKey)
      Caches.releaseAll()
    }
  }

  test("file-backed serve freshness: unchanged corpus digests scan-free; a mutated single day still demotes to inline") {
    // The deployed shape: the offered train corpus is day-partitioned
    // parquet. The freshness digests must then ride the FileDigests
    // per-file cache — an unchanged corpus costs a LISTING per serve,
    // zero data scanned (the 100 TB serve is flat) — while any
    // in-place day mutation changes that day's file signatures,
    // re-scans exactly those files, and demotes the serve to inline.
    FileDigests.clearForTest()
    val root = tmpDir("verdictstore_files")
    def dayOf(id: org.apache.spark.sql.Column) =
      when(id % 3 === 2, 2).otherwise(1)
    docs.filter(col("doc_id") % 10 =!= 0)
      .withColumn("day", dayOf(col("doc_id")))
      .write.partitionBy("day").parquet(s"$root/txt")
    emb.filter(col("vec_id") % 10 =!= 0)
      .withColumn("day", dayOf(col("vec_id")))
      .write.partitionBy("day").parquet(s"$root/emb")
    hashed(eligible.filter(col("media_id") % 10 =!= 0))
      .withColumn("day", dayOf(col("media_id")))
      .write.partitionBy("day").parquet(s"$root/img")
    Caches.releaseAll()
    def fTrain = VerdictStore.Corpus(
      spark.read.parquet(s"$root/txt").select("doc_id", "text"),
      spark.read.parquet(s"$root/emb").select("vec_id", "embedding"),
      spark.read.parquet(s"$root/img").select("media_id", "dhash"))
    val suite = suiteCorpus(_ % 10 === 0)

    val dir = tmpDir("verdictstore_files_store")
    VerdictStore.build(fTrain, Seq("all" -> suite), dir,
      codebookFrom = Some(emb), trained = false)
    Caches.releaseAll()

    spark.conf.set(VerdictStore.DirKey, dir)
    try {
      assert(VerdictStore.openFreshThreeEye(fTrain, suite).isDefined,
        "the file-backed corpus must read fresh")
      Caches.releaseAll()
      // steady state: the repeat serve's freshness digests compose
      // from the per-file cache — zero additional files scanned
      val scanned = FileDigests.filesScanned.sum()
      assert(VerdictStore.openFreshThreeEye(fTrain, suite).isDefined)
      assert(FileDigests.filesScanned.sum() == scanned,
        "an unchanged offered corpus must digest scan-free (flat serve)")
      Caches.releaseAll()

      // mutate ONE day in place (new part files under day=2): the
      // digest sees it through the changed file signatures and the
      // serve demotes to inline — cost, never a missed pair
      val f = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      val day2 = spark.read.parquet(s"$root/txt").where(col("day") === 2)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0),
          if (r.getLong(0) == 2L) "EDITED BODY" else r.getString(1))).toSeq
      assert(day2.exists(_._1 == 2L), "doc 2 must sit in day 2 of this split")
      f.delete(new org.apache.hadoop.fs.Path(s"$root/txt/day=2"), true)
      day2.toDF("doc_id", "text").write.parquet(s"$root/txt/day=2")
      assert(VerdictStore.openFreshThreeEye(fTrain, suite).isEmpty,
        "a mutated single day must demote the serve to inline")
      // per-modality freshness: the text mutation cannot stale the
      // media pair serve — its img files are untouched
      assert(VerdictStore.openFreshMediaPairs(fTrain.img, suite.img).isDefined,
        "a text-day mutation must not stale the media pair serve")
      Caches.releaseAll()
    } finally {
      spark.conf.unset(VerdictStore.DirKey)
      Caches.releaseAll()
    }
  }

  test("suite edits: retire clears flags with zero probes; advance probes history once; composed ≡ inline per suite version") {
    // Two benchmarks partitioning the eval split: a = %20==0, b = %20==10.
    val benchA = suiteCorpus(_ % 20 === 0)
    val benchB = suiteCorpus(c => c % 20 === 10)
    val both = suiteCorpus(_ % 10 === 0)

    val dir = tmpDir("verdictstore_suite")
    VerdictStore.build(trainCorpus, Seq("a" -> benchA, "b" -> benchB), dir,
      codebookFrom = Some(emb), trained = false)
    Caches.releaseAll()

    spark.conf.set(VerdictStore.DirKey, dir)
    try {
      // per-benchmark evidence composes to the whole-suite verdicts
      assert(rows(VerdictStore.openFreshThreeEye(trainCorpus, both).get) ==
        inlineThree(trainCorpus, both),
        "two benchmarks' evidence must compose to the whole-suite inline sweep")

      // retire benchmark a: zero probes — docs flagged only by a read
      // clean again; the full suite now reads stale (never served
      // against a suite the store no longer holds)
      VerdictStore.retireBenchmark("a", spark, dir)
      assert(VerdictStore.openFreshThreeEye(trainCorpus, both).isEmpty,
        "the full suite must read stale after a retire")
      assert(rows(VerdictStore.openFreshThreeEye(trainCorpus, benchB).get) ==
        inlineThree(trainCorpus, benchB),
        "after retiring a, the store must serve exactly the b-only inline verdicts")

      // advance a back: ONE history probe against a alone, composed
      // serve equals the whole-suite sweep again
      VerdictStore.advanceBenchmark("a", benchA, trainCorpus, dir)
      assert(rows(VerdictStore.openFreshThreeEye(trainCorpus, both).get) ==
        inlineThree(trainCorpus, both),
        "a re-advanced benchmark must restore the whole-suite verdicts")

      // an advance over PARTIAL history must fail loud, not write a
      // benchmark whose evidence silently misses docs
      val partial = VerdictStore.Corpus(
        trainCorpus.txt.where(col("doc_id") % 3 === 0),
        trainCorpus.emb.where(col("vec_id") % 3 === 0),
        trainCorpus.img)
      intercept[Exception] {
        VerdictStore.advanceBenchmark("c", benchA, partial, dir)
      }
      Caches.releaseAll()

      // a day advanced against a SUBSET suite must fail loud (r17
      // advice, high): an ingest face whose captured suite predates a
      // concurrent advanceBenchmark would otherwise commit a day whose
      // evidence silently misses the new benchmark — fresh-but-wrong
      val e = intercept[IllegalArgumentException] {
        VerdictStore.advanceDay(trainCorpus, Seq("a" -> benchA), dir, day = 99)
      }
      assert(e.getMessage.contains("b"),
        "the error must name the stored benchmark the offered suite misses")

      // the meta roots (2 benchmarks here, any number of days) are
      // each read as ONE partitioned scan — one Spark job per call,
      // never one driver-side parquet open per partition (O(B + D)
      // serial plan-executions per serve at the 50×1000 design point)
      assert(countJobs(VerdictStore.readMetas(spark, s"$dir/suite_meta", "bench")) == 1,
        "suite_meta must be one partitioned read, not a scan per benchmark")
      assert(countJobs(VerdictStore.readMetas(spark, s"$dir/day_meta", "day")) == 1,
        "day_meta must be one partitioned read, not a scan per day")
      assert(VerdictStore.readMetas(spark, s"$dir/suite_meta", "bench")
        .map(_._1).toSet == Set("a", "b"),
        "the batched read must surface every live benchmark's meta")
    } finally {
      spark.conf.unset(VerdictStore.DirKey)
      Caches.releaseAll()
    }
  }
}
