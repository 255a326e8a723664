package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private val sf0001 = "/root/testdata/sf0.001"

  test("viterbi: picks the probable multi-char piece, reconstructs, handles unknowns") {
    val logp = Map("a" -> math.log(0.2), "b" -> math.log(0.2), "ab" -> math.log(0.5))
    assert(UnigramQueries.viterbi("ab", logp) == List("ab"),
      "one probable piece must beat two cheap ones")
    assert(UnigramQueries.viterbi("aba", logp) == List("ab", "a"))
    // reconstruction invariant on an arbitrary word
    val segs = UnigramQueries.viterbi("abab", logp)
    assert(segs.mkString == "abab")
    // unknown character: survives as its own floor-scored piece
    assert(UnigramQueries.viterbi("axb", logp) == List("a", "x", "b"))
  }

  test("trainer: deterministic, chars always shipped, every corpus word segmentable in-vocab") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cats sat on the mats"),
      (3L, "a rat sat on a hat")).toDF("doc_id", "text")
    val v1 = UnigramQueries.trainVocab(docs)
    graft.core.Caches.releaseAll()
    val v2 = UnigramQueries.trainVocab(docs)
    graft.core.Caches.releaseAll()
    assert(v1 == v2, "two runs must agree byte-for-byte")
    val charsNeeded = "the cat sat on mat cats mats a rat hat".replace(" ", "").toSet
    assert(charsNeeded.forall(c => v1.contains(c.toString)),
      "every corpus character must ship")
    // closure: each word's Viterbi under the shipped vocab uses only shipped pieces
    val total = v1.values.sum.toDouble
    val logp = v1.map { case (p, c) => p -> math.log(c / total) }
    for (w <- Seq("the", "cats", "sat", "mats")) {
      val segs = UnigramQueries.viterbi(w, logp)
      assert(segs.mkString == w)
      assert(segs.forall(v1.contains), s"$w segmented outside the vocab: $segs")
    }
    // the corpus's repeated words must earn multi-char pieces
    assert(v1.keys.exists(_.length > 1), "EM must keep some multi-char piece")
  }

  test("q158/q159 at sf0.001: trained pieces compress below characters; invariants hold") {
    val vocabDf = UnigramQueries.q158UnigramVocab(spark, sf0001)
    val vocab = vocabDf.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(vocab.nonEmpty)
    assert(vocab.map(_._1).toSeq == (1 to vocab.length), "ranks must be dense from 1")
    assert(vocab.forall(_._3 > 0L), "shipped pieces must have earned usage")
    // hard EM is winner-take-all: a piece that loses every Viterbi in a
    // round dies, so the survivor set is much smaller than the seed (a
    // soft-EM trainer would keep fractional users alive longer) — but a
    // real corpus must still retain a meaningful multi-char tier
    assert(vocab.count(_._2.length > 1) >= 20,
      s"expected a meaningful multi-char tier, got ${vocab.count(_._2.length > 1)}")
    graft.core.Caches.releaseAll()

    val enc = UnigramQueries.q159UnigramEncode(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_chars_nospace"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(enc.length == docs.size)
    enc.foreach { case (id, nWords, nPieces) =>
      val chars = docs(id)
      assert(nPieces >= nWords, s"doc $id: a word is at least one piece")
      assert(nPieces <= chars, s"doc $id: pieces can never exceed characters")
    }
    // compression: the trained vocab must do strictly better than chars
    val totalPieces = enc.map(_._3).sum.toDouble
    val totalChars = enc.map(e => docs(e._1)).sum.toDouble
    assert(totalPieces < totalChars * 0.6,
      f"trained pieces should compress well below characters: ${totalPieces / totalChars}%.2f")
    graft.core.Caches.releaseAll()
  }
}
