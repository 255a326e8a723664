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

  test("sampling: sharp α recovers Viterbi, low α actually varies, always reconstructs") {
    val logp = Map("a" -> math.log(0.2), "b" -> math.log(0.2), "ab" -> math.log(0.5))
    // α → ∞: the argmax segmentation dominates the lattice
    (0L until 50L).foreach { s =>
      assert(UnigramQueries.sampleSegmentation("abab", logp, alpha = 100.0, seed = s) ==
        UnigramQueries.viterbi("abab", logp))
    }
    // low α: both segmentations of "ab" must appear across seeds
    val seen = (0L until 200L)
      .map(s => UnigramQueries.sampleSegmentation("ab", logp, alpha = 0.2, seed = s))
      .toSet
    assert(seen == Set(List("ab"), List("a", "b")), s"expected both splits, got $seen")
    // reconstruction + determinism under any seed
    (0L until 50L).foreach { s =>
      val segs = UnigramQueries.sampleSegmentation("ababab", logp, 0.5, s)
      assert(segs.mkString == "ababab")
      assert(segs == UnigramQueries.sampleSegmentation("ababab", logp, 0.5, s))
    }
    // unknown characters survive sampling too
    assert(UnigramQueries.sampleSegmentation("axb", logp, 0.5, 7L).mkString == "axb")
  }

  test("q160 at sf0.001: deterministic, bounded by words and characters") {
    val r1 = UnigramQueries.q160UnigramSample(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.core.Caches.releaseAll()
    val r2 = UnigramQueries.q160UnigramSample(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.core.Caches.releaseAll()
    assert(r1.sameElements(r2), "seeded augmentation must be byte-reproducible")
    val words = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_words"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_chars"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .map(t => t._1 -> ((t._2, t._3))).toMap
    r1.foreach { case (id, sampled, exact) =>
      val (_, chars) = words(id)
      assert(sampled <= chars && exact <= chars)
      assert(sampled > 0 == (chars > 0))
    }
    // the sampler must actually diversify somewhere in a real corpus
    assert(r1.exists { case (_, s, v) => s != v },
      "at α=0.1 some document must sample a non-Viterbi segmentation")
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
