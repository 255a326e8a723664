package graft.operators

import graft.SparkSpec

/** WordPiece against hand-computed merges — pinning exactly where it
  * diverges from BPE (likelihood-scored training, greedy
  * longest-match-first encoding with whole-word [UNK] fallback).
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val sf0001 = "/root/testdata/sf0.001"

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def wpMerges(texts: String*): Seq[(Int, String, Long, Double)] = {
    val out = WordPieceQueries.wpMergesOn(corpus(texts: _*))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    graft.core.Caches.releaseAll()
    out
  }

  test("likelihood scoring disagrees with BPE's count scoring — by construction") {
    // ab ×9, cd ×1. The pair (a,##b) counts 9 but its units each count
    // 9 → score 9/81. The pair (c,##d) counts 1 with singleton units →
    // score 1. WordPiece promotes the perfectly-cohesive rare pair
    // first; BPE promotes the frequent one.
    val text = Array.fill(9)("ab").mkString(" ") + " cd"
    val wp = wpMerges(text)
    assert(wp.map(t => (t._1, t._2, t._3)) ==
      Seq((1, "c ##d", 1L), (2, "a ##b", 9L)), wp.toString)
    assert(math.abs(wp.head._4 - 1.0) < 1e-12, s"cohesive pair scores 1.0: $wp")
    assert(math.abs(wp(1)._4 - 9.0 / 81.0) < 1e-9, wp.toString)
    val bpe = BpeQueries.bpeMergesOn(corpus(text))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    graft.core.Caches.releaseAll()
    assert(bpe.head == ((1, "a b")),
      s"BPE must pick the frequent pair the likelihood criterion demotes: $bpe")
  }

  test("equal scores tie-break on pair ascending — cross-run stable") {
    val got = wpMerges("ab cd")
    assert(got.map(_._2) == Seq("a ##b", "c ##d"), got.toString)
  }

  test("merge products keep the continuation prefix of their left unit") {
    assert(WordPieceQueries.mergedSymbol("a", "##b") == "ab")
    assert(WordPieceQueries.mergedSymbol("##a", "##b") == "##ab")
    assert(WordPieceQueries.mergeWith(Seq("a", "##a", "##a"), "a", "##a", "aa") ==
      Seq("aa", "##a"), "repeated runs merge non-overlapping left-to-right")
  }

  test("greedy encode: longest match first, continuation pieces, whole-word [UNK]") {
    val vocab = WordPieceQueries.vocabFromMerges(
      Set("a", "b", "c", "d"), Seq("c ##d", "a ##b"))
    assert(vocab("ab") && vocab("cd") && vocab("##c") && !vocab("##cd"))
    assert(WordPieceQueries.encodeWord("ab", vocab) == ((Seq("ab"), false)))
    // longest-match: "ab" wins over "a", remainder uses ## pieces
    assert(WordPieceQueries.encodeWord("abcd", vocab) ==
      ((Seq("ab", "##c", "##d"), false)))
    // cd is only a word-INITIAL piece ("##cd" was never formed): at a
    // non-initial position the encoder must fall back to chars
    assert(WordPieceQueries.encodeWord("cdcd", vocab) ==
      ((Seq("cd", "##c", "##d"), false)))
    // any unmatchable remainder collapses the whole word
    assert(WordPieceQueries.encodeWord("axb", vocab) == ((Seq("[UNK]"), true)))
  }

  test("trainer matches a driver-side reference on a random corpus") {
    val rnd = new scala.util.Random(13)
    val words = Seq.fill(60)(
      Seq.fill(2 + rnd.nextInt(6))(('a' + rnd.nextInt(4)).toChar).mkString)
    val got = wpMerges(words.mkString(" "))
    // Reference: same likelihood-scored algorithm, plain Scala.
    var vocab = words.groupBy(identity).map { case (w, g) =>
      (WordPieceQueries.initSymbols(w), g.size.toLong)
    }.toSeq
    val expect = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
    for (_ <- 1 to WordPieceQueries.Rounds) {
      val pairCounts = vocab.flatMap { case (toks, n) =>
        toks.sliding(2).filter(_.size == 2).map(p => ((p.head, p(1)), n))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val unitCounts = vocab.flatMap { case (toks, n) => toks.map(u => (u, n)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (pairCounts.nonEmpty) {
        val best = pairCounts.toSeq.map { case ((a, b), np) =>
          (a, b, np, np.toDouble / (unitCounts(a).toDouble * unitCounts(b).toDouble))
        }.minBy { case (a, b, _, sc) => (-sc, a, b) }
        expect += ((best._1 + " " + best._2, best._3,
          math.rint(best._4 * 1e9) / 1e9))
        val m = WordPieceQueries.mergedSymbol(best._1, best._2)
        vocab = vocab.map { case (toks, n) =>
          (WordPieceQueries.mergeWith(toks, best._1, best._2, m), n)
        }
      }
    }
    assert(got.map(t => (t._2, t._3, t._4)) == expect.toSeq,
      s"\n got=$got\n exp=$expect")
  }

  test("q162/q163 at sf0.001: dense rounds, bounded scores, encode invariants hold") {
    val merges = WordPieceQueries.q162WordPieceMerges(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    graft.core.Caches.releaseAll()
    assert(merges.map(_._1).toSeq == (1 to merges.length), "rounds dense from 1")
    assert(merges.nonEmpty && merges.length <= WordPieceQueries.Rounds)
    assert(merges.forall(m => m._3 > 0 && m._4 > 0 && m._4 <= 1.0),
      s"score = np/(na·nb) is in (0, 1]: ${merges.toSeq}")
    val again = WordPieceQueries.q162WordPieceMerges(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    graft.core.Caches.releaseAll()
    assert(merges.sameElements(again), "trainer must be deterministic")

    val enc = WordPieceQueries.q163WordPieceEncode(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    graft.core.Caches.releaseAll()
    val chars = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id",
        "CAST(length(replace(text, ' ', '')) AS LONG) AS n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(enc.nonEmpty)
    enc.foreach { case (id, nWords, nPieces, nUnk) =>
      assert(nPieces >= nWords, s"doc $id: every word yields ≥1 piece")
      assert(nPieces <= chars(id), s"doc $id: pieces can never exceed characters")
      assert(nUnk >= 0 && nUnk <= nWords, s"doc $id: UNK count bounded by words")
    }
    // the corpus alphabet is complete by construction, so nothing UNKs
    assert(enc.map(_._4).sum == 0,
      "alphabet built from the same corpus ⇒ every word encodable")
  }
}
