package graft.operators

import graft.SparkSpec

/** Hand-computed semantics for the corpus-selection tier (q126–q128) —
  * the cases the uniform oracle diff can't stress: smoothing arms of the
  * perplexity model (seen / unseen-bigram / unseen-prefix), importance
  * weights actually separating target-typical from off-target documents,
  * and the GD trainer learning a separable corpus to correct predictions.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  // ----------------------------------------------------------- q126
  test("q126: all three smoothing arms — seen bigram, unseen bigram with seen prefix, unseen prefix") {
    // Train (en): "a b", "a b c" → V = {a,b,c} = 3;
    // c12 = {a b: 2, b c: 1}; prefix marginals c1 = {a: 2, b: 1}.
    val got = TextQueries.perplexityOn(docs(
      (1L, "a b", "en"),
      (2L, "a b c", "en"),
      (3L, "a b x", "de"),  // "b x": prefix b seen, bigram unseen
      (4L, "z q", "fr")))   // prefix z unseen → uniform 1/V
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap

    def nll(p: Double) = -math.log(p) / math.log(2.0)
    val pAB = 3.0 / 5.0   // (2+1)/(2+3)
    val pBC = 2.0 / 4.0   // (1+1)/(1+3)
    val pBX = 1.0 / 4.0   // (0+1)/(1+3)
    val pZQ = 1.0 / 3.0   // uniform backoff

    assert(got(1L)._1 == 1L)
    assert(math.abs(got(1L)._2 - nll(pAB)) < 1e-6, got(1L).toString)
    assert(got(2L)._1 == 2L)
    assert(math.abs(got(2L)._2 - (nll(pAB) + nll(pBC)) / 2.0) < 1e-6)
    assert(math.abs(got(3L)._2 - (nll(pAB) + nll(pBX)) / 2.0) < 1e-6)
    assert(math.abs(got(4L)._2 - nll(pZQ)) < 1e-6)
    // ppl = 2^avg_nll, applied to the already-rounded mean
    assert(math.abs(got(4L)._3 - 3.0) < 1e-3, got(4L).toString)
    // the off-model doc scores strictly worse than its in-model twin
    assert(got(3L)._2 > got(2L)._2)
  }

  test("q126: sub-2-token docs are excluded from scoring") {
    val got = TextQueries.perplexityOn(docs(
      (1L, "a b", "en"), (2L, "solo", "en")))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L))
  }

  // ----------------------------------------------------------- q127
  test("q127: target-typical docs weigh above off-target docs; mixed doc lands between") {
    // Target (en) speaks only 'aa'; the off-target mass is only 'bb'.
    val d = docs(
      (1L, "aa aa aa", "en"), (2L, "aa aa aa", "en"),
      (3L, "bb bb bb", "de"), (4L, "bb bb bb", "de"),
      (5L, "aa bb aa", "de"))  // off-target label, target-leaning content
    val got = SamplingQueries.dsirWeightsOn(d)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.values.forall(_._1 == 3L))
    assert(got(1L)._2 == got(2L)._2)            // identical content, identical weight
    assert(got(1L)._2 > got(5L)._2, got.toString) // pure target > mixed
    assert(got(5L)._2 > got(3L)._2, got.toString) // mixed > pure off-target
    assert(got(3L)._2 == got(4L)._2)
  }

  test("q127: weights are deterministic across runs") {
    val d = docs((1L, "x y z", "en"), (2L, "p q r", "de"), (3L, "x q", "es"))
    val run = () => SamplingQueries.dsirWeightsOn(d)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).sortBy(_._1).toSeq
    assert(run() == run())
  }

  // ----------------------------------------------------------- q128
  test("q128: 3 GD rounds learn a separable corpus to correct predictions") {
    val d = docs(
      (1L, "aa aa", "en"), (2L, "aa aa", "en"), (3L, "aa aa", "en"),
      (4L, "bb bb", "de"), (5L, "bb bb", "de"), (6L, "bb bb", "de"))
    val got = ClassifierQueries.qualityLrOn(d)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    assert(got.size == 6)
    got.foreach { case (_, (_, score, _)) =>
      assert(score > 0.0 && score < 1.0, got.toString)
    }
    // every prediction matches its label, and scores separate cleanly
    got.foreach { case (id, (label, score, pred)) =>
      assert(pred == label.toInt, s"doc $id: $got")
      assert(if (label == 1L) score > 0.5 else score < 0.5)
    }
    // symmetric corpus → bias stays 0 → scores mirror around 0.5
    assert(math.abs(got(1L)._2 + got(4L)._2 - 1.0) < 1e-6, got.toString)
  }

  test("q128: scoring is deterministic and leaves no pinned storage behind") {
    val d = docs(
      (1L, "u v w", "en"), (2L, "m n o", "de"),
      (3L, "u n", "en"), (4L, "v o m", "fr"))
    // Sweep other suites' leftovers first — this pin is about what q128
    // itself leaves behind (the SessionHygieneSpec convention).
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    val run = () => {
      val r = ClassifierQueries.qualityLrOn(d)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
      graft.core.Caches.releaseAll()
      r
    }
    assert(run() == run())
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      spark.sparkContext.getPersistentRDDs.toString)
  }

  // ----------------------------------------------------------- q133
  private def labeled(rows: (Long, Double)*) =
    rows.toDF("label", "score")

  test("q133: tied scores take midranks — the hand-computed 0.875 case") {
    // Ascending: .1 (rank 1), .5 tied (midrank 2.5), .9 (rank 4).
    // Positive ranks 2.5 + 4 = 6.5; U = 6.5 − 2·3/2 = 3.5; AUC = 3.5/4.
    val got = ClassifierQueries.aucOf(labeled(
      (1L, 0.9), (1L, 0.5), (0L, 0.5), (0L, 0.1))).collect().head
    assert(got.getDouble(0) == 0.875, got.toString)
    assert(got.getLong(1) == 2L && got.getLong(2) == 2L, got.toString)
  }

  test("q133: perfect separation is 1, inversion is 0, one fully tied score is 0.5") {
    def auc(rows: (Long, Double)*): Double =
      ClassifierQueries.aucOf(labeled(rows: _*)).collect().head.getDouble(0)
    assert(auc((1L, 0.9), (1L, 0.8), (0L, 0.2), (0L, 0.1)) == 1.0)
    assert(auc((1L, 0.1), (1L, 0.2), (0L, 0.8), (0L, 0.9)) == 0.0)
    assert(auc((1L, 0.5), (1L, 0.5), (0L, 0.5), (0L, 0.5)) == 0.5)
  }

  test("q133: a classifier that separates its corpus scores AUC exactly 1") {
    // The q128 separable corpus: training drives every en score above
    // every non-en score (pinned above), so the composed q128 → q133
    // evaluation must report perfect ranking — and the counts must be
    // the class sizes, not the doc count.
    val d = docs(
      (1L, "aa aa", "en"), (2L, "aa aa", "en"), (3L, "aa aa", "en"),
      (4L, "bb bb", "de"), (5L, "bb bb", "de"), (6L, "bb bb", "de"))
    val got = ClassifierQueries.aucOf(
      ClassifierQueries.qualityLrOn(d).select("label", "score")).collect().head
    graft.core.Caches.releaseAll()
    assert(got.getDouble(0) == 1.0, got.toString)
    assert(got.getLong(1) == 3L && got.getLong(2) == 3L, got.toString)
  }
}
