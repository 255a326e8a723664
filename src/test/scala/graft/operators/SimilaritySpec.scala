package graft.operators

import graft.SparkSpec

/** Semantics of the IVF-bucketed near-dup against the brute-force
  * oracle on data shaped like real duplicate embeddings: tight clusters,
  * where a near-dup operator must find every pair. (The shipped
  * testdata's embeddings are near-uniform — bucketing is exercised for
  * oracle parity there, but only cluster-structured data can pin
  * recall.)
  */
class SimilaritySpec extends SparkSpec {

  /** 16 tight clusters in 16-dim, one codebook-eligible member per
    * cluster among vec_id < 16 (cluster = id % 16) — every member's
    * nearest codebook entry is its own cluster's representative by a
    * wide margin, so bucketed candidate generation must be exhaustive
    * for same-cluster pairs. */
  private lazy val clustered = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(16)(Array.fill(16)(rnd.nextGaussian()))
    (0 until 128).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => (x + 0.02 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketed near-dup finds exactly the brute-force pairs on clustered data") {
    val got = pairs(SimilarityQueries.nearDupBucketed(clustered, 0.9))
    val want = pairs(SimilarityQueries.nearDupBrute(clustered, 0.9))
    assert(want.nonEmpty, "fixture must contain near-dup pairs")
    assert(got == want,
      s"bucketed missed ${(want -- got).size} pairs, invented ${(got -- want).size}")
  }

  test("q125 SRP-LSH finds exactly the brute-force pairs on clustered data") {
    // Tight clusters agree on every sign bit (cluster dots are O(1)
    // while the 0.02σ noise perturbs them by O(0.01)), so same-cluster
    // pairs share the full signature; the exact verify makes precision
    // structural — got ⊆ want always, and on this fixture got == want.
    val got = pairs(SimilarityQueries.srpLshOn(clustered, 0.9))
    graft.core.Caches.releaseAll()
    val want = pairs(SimilarityQueries.nearDupBrute(clustered, 0.9))
    assert(want.nonEmpty, "fixture must contain near-dup pairs")
    assert(got == want,
      s"SRP missed ${(want -- got).size} pairs, invented ${(got -- want).size}")
  }

  /** An all-zero embedding has scale 0; quantization must emit zero codes
    * (not divide 0/0 into NaN and crash the ANSI cast to array<int>). */
  test("int8 quantization survives a degenerate all-zero vector") {
    import spark.implicits._
    val e = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)),
      (1L, Seq(1f, -2f, 0.5f, 0f))).toDF("vec_id", "embedding")
    val rows = SimilarityQueries.quantizeInt8On(e)
      .orderBy("vec_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getDouble(1) == 0.0, "zero vector must report scale 0")
    assert(rows(0).getString(2) == "[0,0,0,0]", "zero vector must quantize to zero codes")
    assert(rows(0).getDouble(3) == 0.0, "zero vector reconstructs exactly")
    assert(rows(1).getString(2) == "[64,-127,32,0]")
  }

  /** The fixture seeds (vec_id < 16) hit each true cluster exactly once
    * (cluster = id % 16), so a correct trainer must converge to a
    * codebook where every true cluster maps wholly to one learned
    * cluster and no two true clusters merge. */
  test("k-means recovers the planted clusters from one-per-cluster seeds") {
    val assigned = SimilarityQueries.kmeansAssignOn(clustered, 16, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(assigned.length == 128)
    val byTrue = assigned.groupBy { case (id, _) => id % 16 }
      .map { case (t, rows) => t -> rows.map(_._2).toSet }
    assert(byTrue.values.forall(_.size == 1),
      s"some true cluster split across learned clusters: $byTrue")
    assert(byTrue.values.map(_.head).toSet.size == 16,
      "two true clusters merged into one learned cluster")
  }

  test("q79 PQ: a Lloyd round never worsens quantization error; codes are well-formed") {
    import org.apache.spark.sql.functions._
    val subs = graft.core.Caches.persistTracked(
      SimilarityQueries.pqSubvectors(clustered))
    val seeds = SimilarityQueries.pqTrain(subs, 0)
    val trained = SimilarityQueries.pqTrain(subs, 1)
    def mse(cents: Map[Int, Seq[(Long, Seq[Double])]]): Double =
      subs.select(avg(SimilarityQueries.pqMinDist(col("sv"), col("sub"), cents)))
        .head.getDouble(0)
    val (e0, e1) = (mse(seeds), mse(trained))
    assert(e1 <= e0 + 1e-9,
      s"Lloyd's descent must not increase reconstruction error: seed=$e0 trained=$e1")

    val codes = SimilarityQueries.pqEncodeOn(clustered).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(codes.groupBy(_._1).forall(_._2.length == 4),
      "every vector must emit exactly one code per subspace")
    assert(codes.forall(c => c._3 >= 0 && c._3 < 8),
      "codes must stay within the seeded centroid id range")
    graft.core.Caches.releaseAll()
  }

  test("q80 ADC search: codes alone recover every same-cluster neighbor") {
    // The lossy-compression claim: after vectors collapse to 4 codes,
    // ADC distance must still rank the 7 same-cluster members of each
    // query above all 120 strangers — top-5 purely same-cluster for
    // every query (deterministic fixture; measured 50/50 slots).
    val rows = SimilarityQueries.adcTopKOn(clustered).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == 50, "10 queries x top-5")
    val impure = rows.filterNot { case (q, n) => n % 16 == q % 16 }
    assert(impure.isEmpty,
      s"ADC ranked a different-cluster vector into a top-5: $impure")
    graft.core.Caches.releaseAll()
  }

  test("q82 IVF-PQ: coarse pruning loses nothing when buckets align with clusters") {
    // The composition claim: restricting ADC scoring to the probed
    // coarse buckets must return EXACTLY what unpruned ADC returns on
    // cluster-structured data — every query's own-cluster bucket is
    // among its probes, and q80's winners are all same-cluster, so
    // pruning may only discard losers. Set equality (ids, ranks, and
    // rounded distances) pins both halves of the composition.
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val full = rows(SimilarityQueries.adcTopKOn(clustered))
    graft.core.Caches.releaseAll()
    val pruned = rows(SimilarityQueries.ivfPqTopKOn(clustered))
    graft.core.Caches.releaseAll()
    assert(pruned.size == 50, "10 queries x top-5")
    assert(pruned == full,
      s"IVF pruning changed the ADC result: missing=${full -- pruned} extra=${pruned -- full}")
  }

  test("q88 refine: shortlist + exact re-rank recovers the true cosine top-5") {
    // The whole point of the refine stage: ADC distances are lossy, but
    // after re-ranking the shortlist with raw vectors the result must
    // equal the EXACT brute-force top-5 — computed here independently,
    // driver-side, from the fixture itself.
    val vecs = clustered.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = (0L until 10L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(n => (n, cos(vecs(q), vecs(n))))
        .sortBy { case (n, c) => (-c, n) }.take(5).zipWithIndex
        .map { case ((n, _), i) => (q, n, i + 1L) }
    }.toSet
    val got = SimilarityQueries.pqRefineOn(clustered).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.core.Caches.releaseAll()
    assert(got == expected,
      s"refined top-5 diverged from exact: missing=${expected -- got} extra=${got -- expected}")
  }

  test("q195 scaled IVF-PQ: the composed serving shape recovers the exact top-5 on clustered data") {
    // q88's claim carried to the DATA-SCALED coarse quantizer: when
    // buckets align with clusters, scaled pruning + ADC shortlist +
    // exact re-rank must equal the brute-force cosine top-5.
    val vecs = clustered.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = (0L until 10L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(n => (n, cos(vecs(q), vecs(n))))
        .sortBy { case (n, c) => (-c, n) }.take(5).zipWithIndex
        .map { case ((n, _), i) => (q, n, i + 1L) }
    }.toSet
    val got = SimilarityQueries.ivfPqScaledOn(clustered).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.core.Caches.releaseAll()
    assert(got == expected,
      s"scaled IVF-PQ diverged from exact: missing=${expected -- got} extra=${got -- expected}")
  }

  test("q195 at sf0.001: bounded shape, dense ranks, recall pinned vs exact") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val got = SimilarityQueries.q195IvfPqScaled(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.core.Caches.releaseAll()
    val byQ = got.groupBy(_._1)
    byQ.foreach { case (q, rs) =>
      assert(q < 10, s"queries are the first NumQueries ids: $q")
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.size).map(_.toLong),
        s"ranks must be dense for $q")
    }
    val q = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val truth = e.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
      .crossJoin(broadcast(q)).where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        graft.functions.VectorExprs.cosine(col("q_vec"), col("n_vec")).as("cos"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(desc("cos"), col("n_id"))))
      .where(col("rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = got.map(t => (t._1, t._2)).toSet.intersect(truth)
    val recall = hits.size.toDouble / truth.size
    // Near-uniform corpus: recall is bounded by the probed-bucket
    // fraction exactly like q188's (measured 0.444 there); the PQ
    // shortlist (20 ≫ top-5) costs little on top. The CLUSTERED test
    // above pins the real-data (exhaustive) behavior.
    assert(recall >= 0.35,
      f"scaled IVF-PQ recall@5 $recall%.3f under the 0.35 floor (hits ${hits.size}/${truth.size})")
    graft.core.Caches.releaseAll()
  }

  test("q123 MMR: diversity beats a near-duplicate of the first pick; groups independent") {
    import spark.implicits._
    // Label 0: two copies of the x-axis direction (ids 1, 2) and one
    // off-axis vector (id 3, (0.6, 0.8, 0)). Centroid ≈ (0.956, 0.294, 0):
    // rel(1) = rel(2) ≈ 0.956 > rel(3) ≈ 0.809. Pick 1 = id 1 (rel tie
    // → lowest id). Pick 2 at λ=0.7: the duplicate id 2 scores
    // 0.7·0.956 − 0.3·1 ≈ 0.369; id 3 scores 0.7·0.809 − 0.3·0.6 ≈
    // 0.386 → DIVERSITY wins even at lower relevance. Label 1 is a
    // separate bucket and must select independently.
    val emb = Seq(
      (1L, Array(1f, 0f, 0f), 0), (2L, Array(1f, 0f, 0f), 0),
      (3L, Array(0.6f, 0.8f, 0f), 0),
      (10L, Array(0f, 0f, 1f), 1), (11L, Array(0f, 1f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = SimilarityQueries.mmrDiverseOn(emb, k = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got((0, 1)) == 1L, s"first pick is the relevance argmax (id tie-break): $got")
    assert(got((0, 2)) == 3L, s"second pick must be the diverse vector, not the duplicate: $got")
    assert(got.keySet == Set((0, 1), (0, 2), (1, 1), (1, 2)), got.toString)
    assert(Set(10L, 11L).contains(got((1, 1))), "label 1 selects from its own bucket only")
  }

  // ---------------------------------------------------------- q130
  test("q130: lowest same-cluster id wins; copies carry dup_of; cross-cluster twins never pair") {
    import spark.implicits._
    // 8 near-orthogonal seeds (ids 0..7 are the k-means init), plus:
    // 8 = exact copy of 0 (same cluster, cos 1) → dup, dup_of = 0
    // 9 = another copy of 0 → dup, dup_of = 0 (the MINIMUM witness, not 8)
    // 10 = copy of 3 → dup_of = 3
    // 11 = isolated direction → kept
    def unit(i: Int): Seq[Float] = Seq.tabulate(12)(j => if (j == i) 1.0f else 0.0f)
    val rows: Seq[(Long, Seq[Float])] =
      (0 until 8).map(i => (i.toLong, unit(i))) ++
        Seq((8L, unit(0)), (9L, unit(0)), (10L, unit(3)),
          (11L, Seq.tabulate(12)(j => if (j >= 8) 0.5f else 0.0f)))
    val e = rows.toDF("vec_id", "embedding")
    val got = SimilarityQueries.semDedupOn(e, tau = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    graft.core.Caches.releaseAll()
    assert(got(0L) == ((0, -1L)), s"the lowest id of a dup group is kept: $got")
    assert(got(8L) == ((1, 0L)) && got(9L) == ((1, 0L)),
      s"both copies point at the MINIMUM witness: $got")
    assert(got(10L) == ((1, 3L)), got.toString)
    assert(got(11L) == ((0, -1L)), s"an isolated direction is kept: $got")
    assert((0 until 8).forall(i => got(i.toLong)._1 == 0),
      s"near-orthogonal seeds are all kept: $got")
  }

  // ----------------------------------------------------------- q136
  test("q136: recall counts exact-set hits — full, partial, and empty overlap") {
    import spark.implicits._
    def rel(rows: (Long, Long)*) = rows.toDF("q_id", "n_id")
    val truth = rel((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
    // q1: approx finds 2 of 3 (one wrong guess doesn't count against);
    // q2: finds none — must still appear with recall 0, not vanish.
    val approx = rel((1L, 10L), (1L, 12L), (1L, 99L), (2L, 30L), (2L, 31L))
    val got = SimilarityQueries.annRecallOf(truth, approx)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((2L, 0.666667)), got.toString)
    assert(got(2L) == ((0L, 0.0)), got.toString)
    // identity: an index that returns the truth scores recall 1 everywhere
    val perfect = SimilarityQueries.annRecallOf(truth, truth)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(perfect == Map(1L -> 1.0, 2L -> 1.0))
  }

  test("q139: the daily probe reads only the index side and ranks densely") {
    val got = SimilarityQueries.q139IvfProbe(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.core.Caches.releaseAll()
    assert(got.nonEmpty)
    assert(got.forall(_._1 % 5 == 0), "queries are exactly the fresh batch")
    assert(got.forall(_._2 % 5 != 0), "neighbors come only from the persisted index side")
    got.groupBy(_._1).foreach { case (q, rows) =>
      val rns = rows.map(_._3).sorted.toSeq
      assert(rns == (1L to rns.length), s"q$q ranks must be dense from 1: $rns")
      assert(rns.length <= 5, s"q$q exceeded top-k: $rns")
    }
  }

  test("q136: the sf0.001 IVF index holds useful recall against exact top-k") {
    val got = SimilarityQueries.q136AnnRecall(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    graft.core.Caches.releaseAll()
    assert(got.size == 10, got.toString)
    val mean = got.values.sum / got.size
    // nprobe=4 of 16 buckets; measured 0.94 mean / 0.8 min at sf0.001
    // (0.92 mean at sf0.01) — the pin is a floor, loose enough to
    // survive testdata regeneration.
    assert(mean >= 0.5, s"mean recall@5 collapsed: $got")
  }

  test("q164: rank eval is internally consistent with q136's recall") {
    val sf = "/root/testdata/sf0.001"
    val recall = SimilarityQueries.q136AnnRecall(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    graft.core.Caches.releaseAll()
    val eval = SimilarityQueries.q164AnnRankEval(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    graft.core.Caches.releaseAll()
    assert(eval.length == 10)
    eval.foreach { case (q, mrr, ndcg) =>
      assert(mrr >= 0 && mrr <= 1 && ndcg >= 0 && ndcg <= 1, s"q$q: $mrr/$ndcg")
      // MRR is 1/rank by construction: 0 or a unit fraction of rank ≤ 5
      assert(mrr == 0.0 ||
        (1 to 5).exists(r => math.abs(mrr - 1.0 / r) < 1e-6), s"q$q mrr=$mrr")
      // binary-gain nDCG: full recall fills all top-k slots with hits,
      // so DCG = IDCG exactly; zero recall zeroes it; partial sits
      // strictly between
      if (recall(q) == 1.0) assert(ndcg == 1.0, s"q$q: recall 1 but ndcg $ndcg")
      if (recall(q) == 0.0) assert(ndcg == 0.0, s"q$q: recall 0 but ndcg $ndcg")
      if (recall(q) > 0 && recall(q) < 1)
        assert(ndcg > 0 && ndcg < 1, s"q$q: recall ${recall(q)} ndcg $ndcg")
      // the true top-1 found at all ⇒ it contributes to DCG too
      if (mrr > 0) assert(ndcg > 0, s"q$q: mrr $mrr but ndcg 0")
    }
    assert(eval.exists(_._2 > 0), "some query must find its true top-1")
  }

  test("q185: a planted paraphrase the gram tier provably misses is caught semantically") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    // The eval doc and its PARAPHRASE: same meaning (near-identical
    // embedding), zero shared 40-char run (different wording) — the
    // documented failure mode of exact-substring decontamination.
    val evalText = "the quick brown fox jumps over the lazy dog while " +
      "seventeen violinists rehearse a concerto in the abandoned grain silo"
    val paraText = "a speedy russet fox leaps above an idle hound as " +
      "17 violin players practice their concerto inside a disused corn tower"
    val otherTrain = "completely unrelated text about submarine cable " +
      "maintenance schedules in the north atlantic shipping corridor zone"
    // doc_id 20 = eval (%10 == 0), 21 = paraphrase, 23 = unrelated
    val docs = Seq((20L, evalText), (21L, paraText), (23L, otherTrain))
      .toDF("doc_id", "text")
    // GRAM decon sees nothing: no 40-char run is shared
    val gramSpans = SubstringDedup.deconSpansOn(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0)).collect()
    assert(gramSpans.isEmpty,
      s"fixture must be gram-invisible, got ${gramSpans.toSeq}")
    graft.core.Caches.releaseAll()
    // Embeddings: the paraphrase sits next to the eval vector (cos
    // ≈ 0.99); the unrelated doc and 16 codebook fillers sit far away.
    val base = Array.fill(16)(rnd.nextGaussian())
    def jitter(eps: Double) = base.map(x => (x + eps * rnd.nextGaussian()).toFloat).toSeq
    val fillers = (0 until 16).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)
    }
    val emb = (fillers ++ Seq(
      (20L, jitter(0.01)), (21L, jitter(0.02)),
      (23L, Array.fill(16)(rnd.nextGaussian().toFloat).toSeq)))
      .toDF("vec_id", "embedding")
    val flagged = SimilarityQueries.semanticDeconOn(
      emb.where(col("vec_id") % 10 =!= 0 || col("vec_id") < 16),
      emb.where(col("vec_id") === 20L), tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(flagged.map(_._1).toSet == Set(21L),
      s"exactly the paraphrase must flag at tau=0.9: ${flagged.toSeq}")
    assert(flagged.head._3 > 0.9 && flagged.head._2 == 20L)
    // and the streaming gate face agrees: keep=false for 21, true for 23
    val verdicts = graft.streaming.DeconGate.flagSemantic(
      emb.where(col("vec_id").isin(21L, 23L)),
      emb.where(col("vec_id") === 20L), tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(verdicts == Map(21L -> false, 23L -> true), s"gate verdicts: $verdicts")
  }

  test("q185 on sf0.001: directional, thresholded, and candidate-verified exactly") {
    val rows = SimilarityQueries.q185SemanticDecon(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty, "the tuned tau must fire on every SF")
    rows.foreach { case (d, e, s) =>
      assert(d % 10 != 0, s"train side only: $d")
      assert(e % 10 == 0, s"eval side only: $e")
      assert(s >= 0.35 && s <= 1.0)
    }
  }

  test("q188 scaled-K IVF probe: bounded shape, dense ranks, recall pinned vs exact") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val got = SimilarityQueries.q188IvfScaled(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.core.Caches.releaseAll()
    // shape: every fresh vector gets ≤5 dense-ranked index-side rows
    val byQ = got.groupBy(_._1)
    byQ.foreach { case (q, rs) =>
      assert(q % 5 == 0, s"queries are the fresh batch: $q")
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.size).map(_.toLong),
        s"ranks must be dense for $q")
      rs.foreach { case (_, n, _) => assert(n % 5 != 0, s"neighbors from the index side: $n") }
    }
    // recall@5 vs the exact brute-force ground truth (fresh × index)
    val fresh = e.where(pmod(col("vec_id"), lit(5)) === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val idx = e.where(pmod(col("vec_id"), lit(5)) =!= 0)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
    val truth = idx.crossJoin(broadcast(fresh))
      .select(col("q_id"), col("n_id"),
        graft.functions.VectorExprs.cosine(col("q_vec"), col("n_vec")).as("cos"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(desc("cos"), col("n_id"))))
      .where(col("rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = got.map(t => (t._1, t._2)).toSet.intersect(truth)
    val recall = hits.size.toDouble / truth.size
    // sf0.001's embeddings are near-uniform (no cluster structure —
    // see the class header), so recall is bounded by the probed-bucket
    // fraction; measured 0.444 at K=⌈√500⌉=23, nprobe=4. The floor
    // pins against regression, the CLUSTERED assertion below pins the
    // real-data behavior (duplicates cluster; uniform is worst-case).
    assert(recall >= 0.4,
      f"scaled-K probe recall@5 $recall%.3f under the 0.4 floor (hits ${hits.size}/${truth.size})")
    graft.core.Caches.releaseAll()

    // On cluster-structured data (what duplicated/near-dup corpora look
    // like) the scaled-K probe must be EXHAUSTIVE for same-cluster
    // neighbors: every member of a cluster shares its argmax centroid,
    // so the true top-5 (all same-cluster at this geometry) is found.
    import spark.implicits._
    val cFresh = clustered.where(pmod(col("vec_id"), lit(5)) === 0)
    val cIdx = clustered.where(pmod(col("vec_id"), lit(5)) =!= 0)
    val cGot = SimilarityQueries.ivfProbeScaledOn(cFresh, cIdx, clustered)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cTruth = cIdx.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
      .crossJoin(broadcast(cFresh.select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))))
      .select(col("q_id"), col("n_id"),
        graft.functions.VectorExprs.cosine(col("q_vec"), col("n_vec")).as("cos"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(desc("cos"), col("n_id"))))
      .where(col("rn") <= 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cRecall = cTruth.intersect(cGot).size.toDouble / cTruth.size
    assert(cRecall == 1.0,
      f"clustered scaled-K recall must be exhaustive, got $cRecall%.3f")
    graft.core.Caches.releaseAll()
  }

  test("q190/q191: semantic report and act faces partition q185's matches exactly") {
    val dir = "/root/testdata/sf0.001"
    val matches = SimilarityQueries.q185SemanticDecon(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    graft.core.Caches.releaseAll()
    val cov = SimilarityQueries.q190SemanticCoverage(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    graft.core.Caches.releaseAll()
    val scrub = SimilarityQueries.q191SemanticScrub(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getDouble(3)))
      .toMap
    graft.core.Caches.releaseAll()
    // coverage: every eval doc reported; counts/maxes re-derive from q185
    val byEval = matches.groupBy(_._2)
    assert(cov.values.map(_._1).sum == matches.length,
      "coverage counts must partition the match relation")
    byEval.foreach { case (e, ms) =>
      assert(cov(e) == ((ms.length.toLong, ms.map(_._3).max)), s"eval $e cell")
    }
    assert(cov.count(_._2._1 == 0L) == cov.size - byEval.size,
      "clean eval docs report 0, not absence")
    // scrub: exactly the matched train docs drop, with min witness/max sim
    val byTrain = matches.groupBy(_._1)
    scrub.foreach { case (d, (keep, w, mx)) =>
      byTrain.get(d) match {
        case Some(ms) =>
          assert(!keep && w.contains(ms.map(_._2).min) && mx == ms.map(_._3).max,
            s"train $d must drop with its witness")
        case None => assert(keep && w.isEmpty && mx == 0.0, s"train $d must keep")
      }
    }
    assert(scrub.count(!_._2._1) == byTrain.size, "drops == matched train docs")
  }

  test("q161: planted alien vectors occupy the lowest centroid-cosine ranks") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 60 inliers near a common direction; 3 planted outliers pointing
    // the opposite way — any centroid-alignment audit must rank the
    // plants as the 3 most outlying, in antipodal-first order.
    val base = Array.fill(16)(rnd.nextGaussian())
    val inliers = (0 until 60).map { i =>
      (i.toLong, base.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val plants = Seq(
      (100L, base.map(x => (-x).toFloat).toSeq),              // antipodal
      (101L, base.map(x => (-x + 0.3).toFloat).toSeq),        // near-antipodal
      (102L, base.zipWithIndex.map { case (x, j) =>           // orthogonal-ish
        (if (j % 2 == 0) x else -x).toFloat }.toSeq))
    val e = (inliers ++ plants).toDF("vec_id", "embedding")
    val got = SimilarityQueries.embedOutliersOn(e, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSet == Set(100L, 101L, 102L),
      s"plants must be the 3 most outlying: ${got.toSeq}")
    assert(got.sortBy(_._2).head._1 == 100L, "the antipodal plant ranks first")
    assert(got.forall(_._3 < 0.5), s"outlier cosines must sit low: ${got.toSeq}")
    // decimal centroid sums ⇒ bit-identical under re-partitioning
    val again = SimilarityQueries.embedOutliersOn(e.repartition(7), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.sortBy(_._2).sameElements(again.sortBy(_._2)),
      "outlier audit must be partitioning-independent")
  }
}
