package graft.operators

import graft.SparkSpec

/** The BPE trainer against hand-computed merges, a driver-side
  * reference implementation on a random corpus, and the properties a
  * merge table must satisfy (monotone token shrink, deterministic
  * tie-breaks, correct repeated-pair scans).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def mergesOf(texts: String*): Seq[(Int, String, Long)] = {
    val out = BpeQueries.bpeMergesOn(texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    graft.core.Caches.releaseAll()
    out
  }

  test("the classic low/lower corpus learns l·o, lo·w, then the tie-broken e·r") {
    // Words: low ×2, lower ×1. Round 1: l-o and o-w both count 3 —
    // the pair-string tie-break picks "l o". Round 2: "lo w" (3).
    // Round 3: low-e and e-r both count 1 — "e r" wins the tie.
    val got = mergesOf("low low", "lower")
    assert(got.take(3) == Seq((1, "l o", 3L), (2, "lo w", 3L), (3, "e r", 1L)), got.toString)
    // Inference side: the first three merges tokenize "lower" as
    // [low, er] (round 4 would merge those too — a 2-word corpus
    // converges to whole words).
    val toks = BpeQueries.applyMerges("lower", got.take(3).map(_._2))
    assert(toks == Seq("low", "er"), toks.toString)
  }

  test("repeated-pair runs merge non-overlapping left-to-right") {
    assert(BpeQueries.mergeTokens(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(BpeQueries.mergeTokens(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(BpeQueries.mergeTokens(Seq("x"), "a", "b") == Seq("x"))
  }

  test("a word shorter than any pair leaves the trainer exhausted, not crashed") {
    val got = mergesOf("a b c") // three 1-char words → no adjacent pairs
    assert(got.isEmpty)
  }

  test("trainer matches a driver-side reference on a random corpus; token count shrinks monotonically") {
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(60)(Seq.fill(2 + rnd.nextInt(6))(('a' + rnd.nextInt(4)).toChar).mkString)
    val text = words.mkString(" ")
    val got = mergesOf(text)
    // Reference: same algorithm, plain Scala on the driver.
    var vocab = words.groupBy(identity).map { case (w, g) =>
      (w.map(_.toString): Seq[String], g.size.toLong)
    }.toSeq
    val expect = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var counts = Map.empty[String, Long]
    for (_ <- 1 to BpeQueries.Rounds) {
      counts = vocab.flatMap { case (toks, n) =>
        toks.sliding(2).filter(_.size == 2).map(p => (p.head + " " + p(1), n))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.nonEmpty) {
        val best = counts.toSeq.minBy { case (p, n) => (-n, p) }
        expect += best
        val Array(a, b) = best._1.split(" ", 2)
        vocab = vocab.map { case (toks, n) => (BpeQueries.mergeTokens(toks, a, b), n) }
      }
    }
    assert(got.map(m => (m._2, m._3)) == expect.toSeq, s"\n got=$got\n exp=$expect")
    // Monotone shrink: each merge with count k removes exactly k tokens.
    val total0 = words.map(_.length).sum.toLong
    val totals = got.scanLeft(total0) { case (acc, (_, _, n)) => acc - n }
    assert(totals == totals.sorted.reverse && totals.distinct == totals,
      s"every merge must strictly shrink the corpus: $totals")
  }

  test("q122 encode: hand-computed token counts under the low/lower merges") {
    // Same corpus as the trainer test: merges are l·o, lo·w, e·r (8
    // rounds keep merging, so compute the FULL expectation with the
    // reference applyMerges rather than guessing round counts by hand).
    val docs = Seq((0L, "low low"), (1L, "lower")).toDF("doc_id", "text")
    val merges = BpeQueries.bpeMergesOn(docs).orderBy("round")
      .collect().map(_.getString(1)).toSeq
    graft.core.Caches.releaseAll()
    val got = BpeQueries.bpeEncodeOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    graft.core.Caches.releaseAll()
    val lowN = BpeQueries.applyMerges("low", merges).length.toLong
    val lowerN = BpeQueries.applyMerges("lower", merges).length.toLong
    assert(got(0L) == ((2L, 2 * lowN, 6L, 6.0 / (2 * lowN))), got.toString)
    assert(got(1L) == ((1L, lowerN, 5L, 5.0 / lowerN)), got.toString)
  }

  test("q122 encode invariants on a random corpus: n_words <= n_tokens <= n_chars") {
    val rnd = new scala.util.Random(13)
    val docs = (0L until 20L).map { i =>
      (i, Seq.fill(3 + rnd.nextInt(8))(
        Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(4)).toChar).mkString).mkString(" "))
    }.toDF("doc_id", "text")
    val rows = BpeQueries.bpeEncodeOn(docs).collect()
    graft.core.Caches.releaseAll()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (w, t, c) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w <= t && t <= c, s"doc ${r.getLong(0)}: words=$w tokens=$t chars=$c")
    }
  }
}
