package graft.operators

import graft.SparkSpec

/** Byte-level BPE (q167): the GPT-2-style byte-fallback trainer. The
  * property the tier exists for — EVERY string is encodable (closed
  * 256-symbol alphabet, nothing can be `[UNK]`) and every encoding
  * decodes back to the exact original — pinned on multi-byte text
  * (CJK, emoji, combining accents), plus trainer parity with the
  * char-level trainer on ASCII where the two provably coincide.
  */
class ByteBpeSpec extends SparkSpec {
  import spark.implicits._

  private def df(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def encodeWord(w: String, merges: Seq[String]): Seq[String] =
    merges.foldLeft(BpeQueries.byteSymbols(w)) { (ts, m) =>
      val Array(a, b) = m.split(" ", 2)
      BpeQueries.mergeTokens(ts, a, b)
    }

  test("byte symbolization round-trips CJK, emoji, and accents exactly") {
    for (w <- Seq("hello", "héllo", "日本語", "🙂👍", "mix日🙂x", "naïve", "ü")) {
      val syms = BpeQueries.byteSymbols(w)
      assert(syms.forall(_.length == 2), s"$w → $syms")
      assert(BpeQueries.decodeByteTokens(syms) == w, s"$w failed the round-trip")
    }
    // 日 is 3 UTF-8 bytes, 🙂 is 4 — byte, not char, granularity.
    assert(BpeQueries.byteSymbols("日").length == 3)
    assert(BpeQueries.byteSymbols("🙂").length == 4)
  }

  test("on ASCII the first merges coincide with the char trainer (hex-mapped)") {
    // BpeSpec's classic corpus: low ×2, lower ×1. l=6c o=6f w=77 e=65 r=72.
    val got = BpeQueries.byteBpeMergesOn(df("low low", "lower"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    graft.core.Caches.releaseAll()
    assert(got.take(3) == Seq((1, "6c 6f", 3L), (2, "6c6f 77", 3L), (3, "65 72", 1L)),
      got.toString)
  }

  test("trained merges partition the byte sequence: every word decodes back, including unseen foreign text") {
    val corpus = df("the cat sat on the mat", "日本語 の 文書 🙂",
      "the 日本語 corpus mixes 🙂 scripts")
    val merges = BpeQueries.byteBpeMergesOn(corpus).orderBy("round")
      .select("pair").as[String].collect().toSeq
    graft.core.Caches.releaseAll()
    assert(merges.nonEmpty)
    // Every training word round-trips through its encoding.
    val words = corpus.as[(Long, String)].collect()
      .flatMap(_._2.split(" ")).filter(_.nonEmpty).distinct
    for (w <- words) {
      val toks = encodeWord(w, merges)
      assert(BpeQueries.decodeByteTokens(toks) == w, s"$w → $toks")
    }
    // And so does text the trainer NEVER saw — the closed byte alphabet
    // is the no-[UNK] guarantee (the gap q163's BERT-faithful WordPiece
    // makes visible).
    for (w <- Seq("Ωμέγα", "👻", "未見", "zzz")) {
      val toks = encodeWord(w, merges)
      assert(toks.nonEmpty && BpeQueries.decodeByteTokens(toks) == w, s"$w → $toks")
    }
  }

  test("encode relation invariants: words ≤ tokens ≤ bytes, ratio consistent") {
    val corpus = df("aa aa bb 日本 🙂", "aa bb cc dd 🙂🙂")
    val enc = BpeQueries.byteBpeEncodeOn(corpus).collect()
    graft.core.Caches.releaseAll()
    assert(enc.length == 2)
    for (r <- enc) {
      val (w, t, b) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w <= t && t <= b, s"$r violates words ≤ tokens ≤ bytes")
      assert(math.abs(r.getDouble(4) - b.toDouble / t) < 1e-6)
    }
    // Merging strictly compresses the frequent pure-ASCII repeats:
    // doc 0 ("aa" ×2 etc.) must land under its raw byte count.
    assert(enc.map(r => r.getLong(2)).sum < enc.map(r => r.getLong(3)).sum)
  }
}
