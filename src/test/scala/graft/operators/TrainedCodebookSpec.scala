package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{SemanticDeconStore, VectorIndexStore}

/** The trained-codebook repair (VERDICT r13 next-1), pinned on a
  * PLANTED clustered corpus where the first-K-vectors convention
  * provably under-recalls:
  *
  *  - ids 0..15 ("cluster A") are 16 orthogonal axis vectors — exactly
  *    the vectors every first-K codebook is built from;
  *  - a heavy "cluster B" sits on an axis NONE of them spans: 40 mass
  *    points (ids 102..141, component toward A₅), a paraphrase pair —
  *    train 101 (components toward A₀/A₁) vs eval 20 (components
  *    toward A₂/A₃) — and two probe queries (components toward A₀).
  *
  * Under first-K every centroid lies in cluster A, so bucketing within
  * cluster B is decided by the TINY tie-breaking components: the
  * paraphrase pair's probe sets ({c0,c1} vs {c2,c3}) are disjoint — the
  * semantic-decon candidate join NEVER SEES the pair — and a query's
  * probed buckets miss the mass sitting in c5. k-means (the q43
  * machinery as [[SimilarityQueries.trainedCodebook]] /
  * [[SimilarityQueries.scaledCodebookTrained]]) pulls the B-mass's
  * centroid into cluster B within one round, after which every B vector
  * shares its bucket: the pair meets, the mass is found.
  */
class TrainedCodebookSpec extends SparkSpec {
  import spark.implicits._

  private val D = 24
  private val Tau = 0.9

  private def vec(parts: (Int, Float)*): Seq[Float] = {
    val m = parts.toMap
    Seq.tabulate(D)(d => m.getOrElse(d, 0f))
  }

  private def aSeeds: Seq[(Long, Seq[Float])] =
    (0 until 16).map(i => (i.toLong, vec(i -> 1f)))

  private def mass: Seq[(Long, Seq[Float])] =
    (102L to 141L).map(id =>
      (id, vec(16 -> 1f, 5 -> 0.05f, (17 + (id % 7)).toInt -> 0.01f)))

  private val v101 = (101L, vec(16 -> 1f, 0 -> 0.05f, 1 -> 0.03f))
  private val v20 = (20L, vec(16 -> 1f, 2 -> 0.05f, 3 -> 0.03f))

  private def queries: Seq[(Long, Seq[Float])] =
    Seq(200L, 201L).map(id =>
      (id, vec(16 -> 1f, 0 -> 0.05f, (17 + (id % 7)).toInt -> 0.01f)))

  private def df(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  test("semantic decon: first-K misses the planted paraphrase pair; a trained codebook finds it, store/inline parity exact") {
    val train = df(aSeeds ++ mass :+ v101)
    val ev = df(Seq(v20))

    // The first-K convention: all 16 centroids in cluster A → the
    // pair's probe sets are disjoint → zero candidates, zero matches.
    val firstK = SimilarityQueries.semanticDeconOn(train, ev, Tau).collect()
    assert(firstK.isEmpty,
      s"the plant requires first-K to miss every cluster-B match: ${firstK.toSeq}")

    // Trained store: k-means on the corpus moves a centroid into
    // cluster B; every B vector then shares its bucket.
    val dir = tmpDir("semdecon_trained")
    SemanticDeconStore.build(ev, dir,
      codebookFrom = Some(train.unionByName(ev)), trained = true)
    graft.core.Caches.releaseAll()
    spark.conf.set(SemanticDeconStore.DirKey, dir)
    try {
      val (cents, evalIdx) = SemanticDeconStore.openFresh(ev) match {
        case Some(x) => x
        case None => fail("trained store must be fresh for its own suite")
      }
      val trained = SimilarityQueries.semanticDeconVia(train, cents, evalIdx, Tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(trained.contains((101L, 20L)),
        s"the trained codebook must surface the paraphrase pair: $trained")
      assert(trained.size == 41,
        s"all 40 mass points + the paraphrase must match eval 20: ${trained.size}")

      // Store/inline parity: the store-served verdicts equal a fresh
      // derivation with the SAME trained codebook (parquet roundtrip +
      // frozen-codebook assignment fidelity).
      val inlineIdx = SimilarityQueries.multiAssignWithNv(ev, cents)
      val inline = SimilarityQueries.semanticDeconVia(train, cents, inlineIdx, Tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(inline == trained, "store-served ≡ inline with the same codebook")
    } finally {
      spark.conf.unset(SemanticDeconStore.DirKey)
      graft.core.Caches.releaseAll()
    }
  }

  test("scaled IVF: trained codebook recall beats first-K on the plant; the store serves it end-to-end") {
    val idxRows = aSeeds ++ mass :+ v101
    val idx = df(idxRows)
    val corpus = df(idxRows ++ queries)
    val fresh = df(queries)

    // Exact ground truth: top-5 neighbors of each query over the index.
    val qn = graft.functions.VectorExprs.normalized(fresh, "embedding", "nv", Seq("vec_id"))
      .select(col("vec_id").as("q_id"), col("nv").as("qv"))
    val in = graft.functions.VectorExprs.normalized(idx, "embedding", "nv", Seq("vec_id"))
      .select(col("vec_id").as("n_id"), col("nv"))
    val exact = qn.crossJoin(in)
      .withColumn("cos", graft.functions.VectorExprs.dot(col("qv"), col("nv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))))
      .where(col("rn") <= 5).select("q_id", "n_id")

    val k = SimilarityQueries.scaledK(corpus)
    val firstKCents = SimilarityQueries.scaledCodebook(corpus, k)
    val trainedCents = SimilarityQueries.scaledCodebookTrained(corpus, k)
    def recall(cents: Seq[Seq[Double]]): Map[Long, Double] = {
      val approx = SimilarityQueries.ivfProbeScaledWith(
        fresh, cents, SimilarityQueries.scaledAssign(idx, cents))
      val out = SimilarityQueries.annRecallOf(exact, approx).collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      graft.core.Caches.releaseAll()
      out
    }
    val rFirstK = recall(firstKCents)
    val rTrained = recall(trainedCents)
    for (q <- Seq(200L, 201L)) {
      assert(rFirstK(q) < 0.5,
        s"the plant requires first-K to under-recall: $rFirstK")
      assert(rTrained(q) == 1.0,
        s"the trained codebook must find every true neighbor: $rTrained")
    }

    // End-to-end through the store: buildScaled(trained = true) serves
    // the trained codebook to the UNCHANGED probe path, and the
    // codebook-meta digest keeps freshness exact (no retraining on open).
    val dir = tmpDir("vectorstore_trained")
    VectorIndexStore.buildScaled(corpus, idx, dir, trained = true)
    spark.conf.set(VectorIndexStore.DirKey, dir)
    try {
      val opened = VectorIndexStore.openFreshScaled(corpus, idx)
      assert(opened.isDefined, "trained scaled store must be fresh for its own pair")
      assert(opened.get._1 == trainedCents,
        "the stored codebook must be the trained artifact")
      val viaStore = SimilarityQueries.ivfProbeScaledOn(fresh, idx, corpus)
        .collect().map(_.toString).toSet
      val direct = SimilarityQueries.ivfProbeScaledWith(
        fresh, trainedCents, SimilarityQueries.scaledAssign(idx, trainedCents))
        .collect().map(_.toString).toSet
      assert(viaStore == direct, "store-served trained probe ≡ direct derivation")
      graft.core.Caches.releaseAll()

      // a mutated corpus digests differently → stale → inline retrain
      val mutated = corpus.withColumn("embedding",
        when(col("vec_id") === 103L,
          transform(col("embedding"), x => x * lit(2.0f)))
          .otherwise(col("embedding")))
      assert(VectorIndexStore.openFreshScaled(mutated, idx).isEmpty,
        "the codebook-meta digest must catch corpus drift without retraining")
    } finally {
      spark.conf.unset(VectorIndexStore.DirKey)
      graft.core.Caches.releaseAll()
    }
  }

  test("scaled-PQ store built with a trained codebook serves the q195 kernel end-to-end") {
    val corpus = df(aSeeds ++ mass ++ Seq(v101) ++ queries)
    val dir = tmpDir("pqstore_trained")
    VectorIndexStore.buildPqScaled(corpus, corpus, dir, trained = true)
    graft.core.Caches.releaseAll()
    spark.conf.set(VectorIndexStore.DirKey, dir)
    try {
      val opened = VectorIndexStore.openFreshPqScaled(corpus, corpus)
      assert(opened.isDefined, "trained scaled-PQ store must be fresh for its own corpus")
      val k = SimilarityQueries.scaledK(corpus)
      assert(opened.get._1 == SimilarityQueries.scaledCodebookTrained(corpus, k),
        "the stored coarse codebook must be the trained artifact")
      // stored artifacts ≡ the direct derivation with the SAME trained
      // codebook (PQ codebooks and every code survive the roundtrip) —
      // which is exactly what makes the served q195 kernel correct
      def codeSet(df: org.apache.spark.sql.DataFrame) =
        df.select("vec_id", "bkt", "sub", "code").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
      val (_, pqCents, codes) = SimilarityQueries
        .pqScaledIndexArtifactsWith(corpus, opened.get._1)
      assert(opened.get._2 == pqCents,
        "stored PQ codebooks must equal the trained derivation")
      assert(codeSet(opened.get._3) == codeSet(codes),
        "stored codes must equal the trained derivation")
      // and the serving kernel runs end-to-end through the store
      val viaStore = SimilarityQueries.ivfPqScaledOn(corpus)
      assert(viaStore.count() > 0)
    } finally {
      spark.conf.unset(VectorIndexStore.DirKey)
      graft.core.Caches.releaseAll()
    }
  }
}
