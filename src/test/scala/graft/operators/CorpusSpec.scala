package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Corpus-preparation semantics the oracle rows can't pin: split-side
  * membership of the contamination check, token conservation through
  * packing, word-boundary scrubbing, and the repetition metric.
  */
class CorpusSpec extends SparkSpec {

  /** doc_ids partitioned by the same md5 bucket the operators use. */
  private lazy val (trainIds, evalIds) = {
    import spark.implicits._
    val buckets = spark.range(0, 200).toDF("doc_id")
      .withColumn("bucket", SamplingQueries.hashBucket(col("doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    (buckets.filter(_._2 < 90).map(_._1), buckets.filter(_._2 >= 90).map(_._1))
  }

  test("contamination: verbatim eval copy of a train doc scores 1.0, fresh text 0.0") {
    import spark.implicits._
    val copied = "the quick brown fox jumps over the lazy dog"
    val fresh = "entirely novel eval only words never seen in train side"
    val docs = Seq(
      (trainIds(0), copied),
      (evalIds(0), copied),
      (evalIds(1), fresh)).toDF("doc_id", "text")
    val out = CorpusQueries.contaminationOn(docs)
      .select("doc_id", "contamination").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out.keySet == Set(evalIds(0), evalIds(1)), "only eval docs are reported")
    assert(out(evalIds(0)) == 1.0, "verbatim copy must be fully contaminated")
    assert(out(evalIds(1)) == 0.0, "unseen text must be clean")
  }

  test("contamination tolerates sub-shingle documents instead of throwing") {
    import spark.implicits._
    // 1-2 token docs must be filtered, not crash ANSI element_at (the
    // backwards sequence() trap) — on either side of the split.
    val docs = Seq(
      (trainIds(0), "hi"),
      (evalIds(0), "two words"),
      (evalIds(1), "three tokens here now")).toDF("doc_id", "text")
    val out = CorpusQueries.contaminationOn(docs).collect()
    assert(out.map(_.getLong(0)).toSet == Set(evalIds(1)))
  }

  test("packing conserves every token and opens bin 0 in every group") {
    import spark.implicits._
    val text100 = Seq.fill(100)("w").mkString(" ") // 100 tokens each
    val docs = (0L until 300L).map(i => (i, text100)).toDF("doc_id", "text")
    val out = CorpusQueries.packingOn(docs).collect()
    assert(out.map(_.getAs[Long]("n_tokens")).sum == 300L * 100,
      "token mass must be conserved through packing")
    assert(out.map(_.getAs[Long]("n_docs")).sum == 300L)
    val groups = out.map(_.getAs[Long]("grp")).distinct
    groups.foreach { g =>
      assert(out.exists(r => r.getAs[Long]("grp") == g && r.getAs[Long]("bin") == 0L),
        s"group $g must start packing at bin 0")
    }
  }

  test("packing conserves tokens for arbitrary document lengths (property)") {
    import spark.implicits._
    // deterministic pseudo-random lengths, including budget-straddling docs
    val docs = (0L until 200L).map { i =>
      val ntok = 1 + ((i * 2654435761L) % 900L).toInt // 1..900 tokens
      (i, Seq.fill(ntok)("w").mkString(" "))
    }
    val total = docs.map(_._2.count(_ == ' ') + 1).sum
    val out = CorpusQueries.packingOn(docs.toDF("doc_id", "text")).collect()
    assert(out.map(_.getAs[Long]("n_tokens")).sum == total)
    assert(out.map(_.getAs[Long]("n_docs")).sum == 200L)
    assert(out.forall(_.getAs[Long]("bin") >= 0L))
  }

  test("scrub matches whole words and digit runs only; fp ignores which term matched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "customer 123 vector data"), // 3 matches
      (2L, "customers and vectors"), //     0 — boundary must hold
      (3L, "customer data"), //              1
      (4L, "vector data") //                 1, same scrubbed text as doc 3
    ).toDF("doc_id", "text")
    val out = CorpusQueries.scrubOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(3))).toMap
    assert(out(1L)._1 == 3L && out(2L)._1 == 0L && out(3L)._1 == 1L && out(4L)._1 == 1L)
    assert(out(3L)._2 == out(4L)._2,
      "docs identical after scrubbing must share a fingerprint")
    assert(out(2L)._2 != out(3L)._2)
  }

  test("q90 dup coverage: shared phrases count, self-repetition does not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s t u v"),     // 3 shingles, shares "p q r s t" with doc 2
      (2L, "z p q r s t w"),     // 3 shingles, 1 shared
      (3L, "a b c d e f"),       // 2 shingles, none shared
      (4L, "m m m m m m m m"))   // self-repeating → 1 DISTINCT shingle, df 1
      .toDF("doc_id", "text")
    val got = CorpusQueries.dupCoverageOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 1L, 0.333333), (2L, 3L, 1L, 0.333333),
      (3L, 2L, 0L, 0.0), (4L, 1L, 0L, 0.0)), got.mkString(", "))
  }

  test("repetition ratio is exact on a crafted document") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a b b"), // 5 tokens, 2 distinct → 0.6, repetitious
      (2L, "a b c d e") //  0.0, clean
    ).toDF("doc_id", "text")
    val out = CorpusQueries.repetitionOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((5L, 2L, 0.6, true)))
    assert(out(2L) == ((5L, 5L, 0.0, false)))
  }

  // ------------------------------------------------------ q144/q145
  test("q144: the Heaps curve is monotone and its endpoint is the full vocabulary") {
    val dir = "/root/testdata/sf0.01"
    val rows = CorpusQueries.q144Heaps(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0.2, 0.4, 0.6, 0.8, 1.0))
    rows.sliding(2).foreach { case Array((_, t1, v1), (_, t2, v2)) =>
      assert(t2 > t1, "token volume grows strictly with the prefix")
      assert(v2 >= v1, "vocabulary never shrinks")
    }
    // endpoint consistency: prefix 1.0 IS the whole corpus vocabulary
    import org.apache.spark.sql.functions._
    val fullVocab = graft.core.Tables(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("t")).distinct().count()
    assert(rows.last._3 == fullVocab, s"${rows.last._3} != $fullVocab")
  }

  test("q145: hapax rates are bounded and a template corpus scores 0") {
    val real = CorpusQueries.q145Hapax(spark, "/root/testdata/sf0.01").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(real.nonEmpty)
    real.foreach { case (types, hapax, rate) =>
      assert(hapax <= types && rate >= 0.0 && rate <= 1.0, s"$types $hapax $rate")
      assert((hapax == 0L) == (rate == 0.0))
    }
  }

  test("q165 corpus card: planted dups, lang majority, and tie-breaks pin exactly") {
    import spark.implicits._
    val docs = Seq(
      // srcA: 4 docs, one exact-dup PAIR (both members count), langs en/en/de/de
      (1L, "a b c", "en", "srcA"), (2L, "a b c", "en", "srcA"),
      (3L, "d e", "de", "srcA"), (4L, "f g h i", "de", "srcA"),
      // srcB: 2 docs, no dups, lang tie 1-1 → lexicographically first wins
      (5L, "x y", "fr", "srcB"), (6L, "z w v", "en", "srcB"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusQueries.corpusCardOn(docs)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("srcA")
    // words 3+3+2+4 = 12; chars (with spaces) 5+5+3+7 = 20
    assert(a.getLong(1) == 4 && a.getLong(2) == 12 && a.getLong(3) == 20,
      s"srcA volume: $a")
    assert(a.getLong(5) == 2 && a.getDouble(6) == 0.5,
      s"srcA dup pair: both members count, rate 2/4: $a")
    // en and de both appear twice → lang tie-break is lexicographic asc
    assert(a.getLong(7) == 2 && a.getString(8) == "de", s"srcA langs: $a")
    val b = got("srcB")
    assert(b.getLong(5) == 0 && b.getDouble(6) == 0.0, s"srcB no dups: $b")
    assert(b.getString(8) == "en", s"srcB 1-1 lang tie → 'en' wins: $b")
    // cross-source: identical text in DIFFERENT sources still counts as
    // corpus-level dup for both (dedup is corpus-wide, the card is per-source)
    val got2 = CorpusQueries.corpusCardOn(docs.union(
      Seq((7L, "a b c", "en", "srcB")).toDF("doc_id", "text", "lang", "source")))
      .collect().map(r => r.getString(0) -> r.getLong(5)).toMap
    assert(got2("srcB") == 1 && got2("srcA") == 2,
      s"corpus-wide dup detection attributes per source: $got2")
  }
}
