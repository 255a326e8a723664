package graft.operators

import graft.SparkSpec

/** Curation-decision semantics the oracle alone can't demonstrate: the
  * keeper of a duplicate cluster is chosen among the SURVIVORS of the
  * narrow filters, so one badly-formatted copy (which the fingerprint
  * normalizes onto the cluster but the raw-text signals reject) cannot
  * drag every copy of the content out of the training set.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val GoodText =
    "the quick brown fox jumps over the lazy dog while the rain falls on " +
      "the quiet hills and a small bird sings through the evening air"

  test("a cluster whose min-id copy fails a filter keeps the surviving sibling") {
    // Doc 1 is the SHOUTED copy: same fingerprint (lowercased, collapsed),
    // but the case-sensitive stopword and ' th' signals see nothing, so it
    // fails the language filter. Doc 2 passes everything. A corpus-wide
    // min(doc_id) keeper would call doc 2 a 'duplicate' of the rejected
    // doc 1 and delete the content entirely.
    val docRel = Seq(
      (1L, "en", GoodText.toUpperCase, GoodText.length),
      (2L, "en", GoodText, GoodText.length)
    ).toDF("doc_id", "lang", "text", "n_chars")

    val out = CurationQueries.curationOn(docRel)
      .select("doc_id", "reason", "keep")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getBoolean(2)))).toMap

    assert(out(1L) == (("non_english", false)), s"shouted copy rejected: ${out(1L)}")
    assert(out(2L) == (("keep", true)),
      s"surviving copy must be the cluster keeper, got ${out(2L)}")
  }

  test("within survivors, min doc_id wins and the rest are duplicates") {
    val docRel = Seq(
      (7L, "en", GoodText, GoodText.length),
      (9L, "en", GoodText, GoodText.length)
    ).toDF("doc_id", "lang", "text", "n_chars")
    val out = CurationQueries.curationOn(docRel)
      .select("doc_id", "reason")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(7L -> "keep", 9L -> "duplicate"))
  }
}
