package graft.operators

import graft.SparkSpec

/** q166 is pure composition over q122/q159/q163 (+ the q167 byte-level
  * encode) — every number it
  * reports must re-derive from the individual encode relations, and
  * the cross-algorithm invariants (shared word/char totals, fertility
  * ≥ 1, fertility × chars_per_piece = chars/word identically) must
  * hold because all three rows describe the same corpus.
  */
class TokenizerCompareSpec extends SparkSpec {

  private val sf0001 = "/root/testdata/sf0.001"

  test("q166: rows re-derive from the per-tokenizer encodes; invariants hold") {
    val rows = TokenizerCompare.q166TokenizerCompare(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    graft.core.Caches.releaseAll()
    assert(rows.keySet == Set("bpe", "bytebpe", "unigram", "wordpiece"))
    // same whitespace-token convention everywhere → identical word and
    // char totals across the four rows
    assert(rows.values.map(_._1).toSet.size == 1, s"word totals differ: $rows")
    assert(rows.values.map(_._3).toSet.size == 1, s"char totals differ: $rows")
    rows.foreach { case (algo, (w, p, c, fert, cpp)) =>
      assert(w > 0 && p >= w, s"$algo: every word yields ≥ 1 piece ($w, $p)")
      // byte-level pieces are byte spans: on multi-byte text they CAN
      // outnumber characters (chars is the shared numerator, so its
      // chars_per_piece < 1 is honest, not a bug) — the ≤ chars bound
      // only holds for the three char-level tokenizers.
      if (algo != "bytebpe")
        assert(p <= c, s"$algo: pieces can never exceed characters ($p, $c)")
      assert(math.abs(fert - p.toDouble / w) < 1e-6, s"$algo fertility: $fert")
      assert(math.abs(cpp - c.toDouble / p) < 1e-6, s"$algo cpp: $cpp")
    }
    // cross-check against the individual encode queries, summed by hand
    val bpe = BpeQueries.q122BpeEncode(spark, sf0001)
      .collect().map(r => (r.getLong(1), r.getLong(2))) // n_words, n_tokens
    graft.core.Caches.releaseAll()
    assert(rows("bpe")._1 == bpe.map(_._1).sum && rows("bpe")._2 == bpe.map(_._2).sum,
      s"bpe row must equal q122's sums: ${rows("bpe")} vs $bpe")
    val wp = WordPieceQueries.q163WordPieceEncode(spark, sf0001)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    graft.core.Caches.releaseAll()
    assert(rows("wordpiece")._1 == wp.map(_._1).sum &&
      rows("wordpiece")._2 == wp.map(_._2).sum,
      s"wordpiece row must equal q163's sums")
    val bb = BpeQueries.byteBpeEncodeOn(graft.core.Tables(spark, sf0001, "documents"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    graft.core.Caches.releaseAll()
    assert(rows("bytebpe")._1 == bb.map(_._1).sum &&
      rows("bytebpe")._2 == bb.map(_._2).sum,
      s"bytebpe row must equal the byte-encode sums")
  }

  test("q180: per-lang cells sum to q166's corpus totals; premiums floor at 1") {
    val cells = TokenizerCompare.q180TokenizerFertility(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(6)))).toMap
    graft.core.Caches.releaseAll()
    val corpus = TokenizerCompare.q166TokenizerCompare(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    graft.core.Caches.releaseAll()
    val langs = Set("en", "es", "fr", "de", "zh")
    for (algo <- Seq("unigram", "bytebpe")) {
      val mine = cells.filter(_._1._1 == algo)
      assert(mine.keySet.map(_._2) == langs, s"$algo must cover every lang")
      // partition consistency: the fairness cut is a re-bucketing of
      // the SAME encode relation q166 aggregates corpus-wide
      assert(mine.values.map(_._1).sum == corpus(algo)._1,
        s"$algo word totals must partition q166's")
      assert(mine.values.map(_._2).sum == corpus(algo)._2,
        s"$algo piece totals must partition q166's")
      // premium semantics: min 1 (the best-served language), none below
      val premiums = mine.values.map(_._4)
      assert(premiums.min == 1.0, s"$algo cheapest lang must sit at 1.0")
      assert(premiums.forall(_ >= 1.0))
      // fertility ≥ 1 in every cell (a word is at least one piece)
      assert(mine.values.forall(_._3 >= 1.0))
    }
  }

  test("q180 planted disparity: a CJK domain pays a byte-BPE premium an ASCII one doesn't") {
    import spark.implicits._
    // Same word count per doc; the zh domain's words are 3-byte CJK
    // codepoints, so byte-level BPE starts at 3 bytes/char and its
    // fertility premium over the ASCII domain must be substantial —
    // the exact regime the audit exists to expose. (The unigram
    // tokenizer is char-level, so its premium stays comparatively
    // small: the disparity is STRUCTURAL to byte tokenizers, not an
    // artifact of the fixture.)
    val en = (1L to 6L).map(i => (i, "en", "data table merge scan filter " * 8))
    val zh = (11L to 16L).map(i => (i, "zh", "数据 表格 合并 扫描 过滤 " * 8))
    val docs = (en ++ zh).toDF("doc_id", "lang", "text")
    val cells = TokenizerCompare.fertilityOn(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(4), r.getDouble(6)))
      .toMap
    graft.core.Caches.releaseAll()
    val (fertZhB, premZhB) = cells(("bytebpe", "zh"))
    val (fertEnB, premEnB) = cells(("bytebpe", "en"))
    assert(premEnB == 1.0 && premZhB > 1.3,
      s"byte-BPE must charge the CJK domain a premium: en $premEnB zh $premZhB")
    assert(fertZhB > fertEnB)
    val premZhU = cells(("unigram", "zh"))._2
    val premEnU = cells(("unigram", "en"))._2
    assert(math.max(premZhU, premEnU) < premZhB,
      s"the char-level tokenizer's premium ($premZhU/$premEnU) must sit below byte-BPE's ($premZhB)")
  }
}
