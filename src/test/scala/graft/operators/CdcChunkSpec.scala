package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.SparkSpec

/** The property that justifies content-defined chunking (q85) over
  * fixed windows (q63): an edit re-fingerprints ONLY the chunk it
  * touches. Plus hand-counted q84 pair statistics.
  */
class CdcChunkSpec extends SparkSpec {

  /** Scala replica of the operator's boundary predicate —
    * first-8-hex-chars(md5(token)) mod 16 == 0 — used to CONSTRUCT
    * docs with known chunk structure (and doubling as a portability
    * check of the md5 math). */
  private def isBoundary(w: String): Boolean = {
    val d = MessageDigest.getInstance("MD5")
      .digest(w.getBytes(StandardCharsets.UTF_8))
    val hex = d.map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % 16 == 0
  }

  private lazy val (boundaryWords, plainWords) =
    (0 until 400).map(i => s"w$i").partition(isBoundary)

  private def chunksOf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    CurationQueries.cdcChunksOn(rows.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
  }

  test("q85: an insertion re-fingerprints exactly one chunk") {
    assert(boundaryWords.size >= 2 && plainWords.size >= 31, "fixture vocabulary")
    val run1 = plainWords.slice(0, 10)
    val run2 = plainWords.slice(10, 20)
    val run3 = plainWords.slice(20, 30)
    val b = boundaryWords.take(2)
    // doc 1: run1 | b0 run2 | b1 run3  → chunks 0,1,2
    val original = (run1 ++ (b(0) +: run2) ++ (b(1) +: run3)).mkString(" ")
    // doc 2: same with one plain token inserted mid-run2
    val edited = (run1 ++ (b(0) +: (run2.take(5) ++ Seq(plainWords(30)) ++ run2.drop(5)))
      ++ (b(1) +: run3)).mkString(" ")
    val c1 = chunksOf(Seq((1L, original)))
    val c2 = chunksOf(Seq((2L, edited)))
    assert(c1.length == 3 && c2.length == 3,
      s"expected 3 chunks per doc: ${c1.length}, ${c2.length}")
    val fp1 = c1.sortBy(_._2).map(_._5)
    val fp2 = c2.sortBy(_._2).map(_._5)
    assert(fp1(0) == fp2(0) && fp1(2) == fp2(2),
      "chunks outside the edit must keep their fingerprints")
    assert(fp1(1) != fp2(1), "the edited chunk must re-fingerprint")
    // the same edit under fixed 128-token windows would shift every
    // downstream chunk — here token counts confirm only chunk 1 grew
    assert(c2.sortBy(_._2).map(_._3).toSeq ==
      c1.sortBy(_._2).map(_._3).zipWithIndex.map { case (n, i) =>
        if (i == 1) n + 1 else n }.toSeq)
  }

  test("q85: chunk ids are the cumulative boundary count; start positions align") {
    val ws = plainWords.take(3) ++ Seq(boundaryWords.head) ++ plainWords.slice(3, 5)
    val got = chunksOf(Seq((7L, ws.mkString(" ")))).sortBy(_._2)
    // chunk 0: 3 plain tokens from pos 0; chunk 1: boundary + 2 from pos 3
    assert(got.map(t => (t._2, t._3, t._4)).toSeq == Seq((0L, 3L, 0L), (1L, 3L, 3L)),
      got.mkString(", "))
  }

  test("q84: hand-counted bigram frequencies with deterministic tie order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c"), // pairs: "a b"×2, "b a", "b c"
      (2L, "a b"),       // "a b"
      (3L, "solo"))      // single token — guarded out, no pairs
      .toDF("doc_id", "text")
    val got = TextQueries.pairStatsOn(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)), got.mkString(", "))
  }
}
