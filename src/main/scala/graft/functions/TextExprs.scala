package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expression library for the training-data-pipeline surface
  * (BASELINE.json north star): tokenization, shingling, MinHash banding,
  * SimHash, fingerprinting, quality metrics, language-ID heuristics.
  *
  * All pure `Column` transforms over `functions._` higher-order array
  * functions — codegen'd, no UDFs, so every operator stays inside
  * whole-stage codegen and distributes trivially: per-document work is
  * embarrassingly parallel; only the pair-finding joins shuffle.
  */
object TextExprs {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles (space-joined). Caller must ensure
    * `size(tokens) >= n` — standard MinHash preprocessing.
    *
    * The token array binds to a lambda variable (`transform` over a
    * 1-element wrapper) instead of being referenced directly inside the
    * position lambda: a direct reference gets inlined by project
    * collapsing and re-evaluates the upstream `split` once per
    * `element_at` — an O(tokens²) tax that dominated every shingle
    * consumer (q17/q18/q40/q48/q54) before binding. */
  def shingles(toks: Column, n: Int): Column =
    flatten(transform(array(toks), t =>
      transform(
        sequence(lit(0), size(t) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(t, i + k + 1)): _*))))

  /** Normalized-document fingerprint: lowercase, collapse whitespace, md5.
    * The batch analog of a rolling-hash content fingerprint. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** Count of tokens belonging to a fixed marker set. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*)))

  /** Exact sum of token lengths (integer arithmetic — deterministic). */
  def totalTokenChars(toks: Column): Column =
    aggregate(transform(toks, t => length(t)), lit(0), (acc, x) => acc + x)

  private val HexChars: Column = array("0123456789abcdef".map(c => lit(c.toString)): _*)

  /** 64-bit SimHash of a document's distinct-token set, returned as a
    * 16-hex-char string (avoids signed-64 overflow games and is directly
    * comparable across engines).
    *
    * Must be computed via [[simhashAggExprs]] over exploded distinct
    * tokens, then [[simhashAssemble]] on the 64 per-bit vote sums.
    */
  /** The 16 hex digits of each token's md5-derived 64-bit hash, as int
    * columns d0..d15. */
  def tokenHexDigits(tok: Column): Seq[Column] = {
    val hex = md5(tok.cast("binary"))
    (0 until 16).map(j => conv(substring(hex, j + 1, 1), 16, 10).cast("int"))
  }

  // ---- shared curation signals ------------------------------------
  // q60 is BY CONTRACT the composition of q22/q23/q51; these single
  // definitions are what keeps that claim true — a threshold change
  // here changes the standalone signal query and the curation verdict
  // together, instead of drifting silently in per-file copies.

  /** Integer quality score (q22/q60): +1 per passing heuristic —
    * 20–400 tokens, type-token ratio ≥ 0.3, stopword rate in
    * [0.01, 0.3]. */
  def qualityScore(nTokens: Column, nTypes: Column, nStop: Column): Column =
    (when(nTokens.between(20, 400), 1).otherwise(0) +
      when(nTypes * lit(1.0) / nTokens >= 0.3, 1).otherwise(0) +
      when((nStop * lit(1.0) / nTokens).between(0.01, 0.3), 1).otherwise(0))
      .cast("long")

  /** ' th' character-trigram rate (q23/q60's English signal). */
  def thRate(text: Column): Column =
    (length(text) - length(regexp_replace(text, " th", ""))) * lit(1.0) / length(text)

  /** Language heuristic (q23/q60): marker-word density + trigram rate. */
  def langPred(markerRate: Column, thRate: Column): Column =
    when(markerRate >= 0.05 && thRate >= 0.01, lit("en")).otherwise(lit("other"))

  /** Duplicate-token ratio (q51/q60, the Gopher repetition signal). */
  def dupRatio(nTokens: Column, nDistinct: Column): Column =
    round(lit(1.0) - nDistinct.cast("double") / nTokens.cast("double"), 6)

  /** 64 per-bit vote aggregates (+1 if bit set, -1 otherwise) over a
    * document's tokens; index jb = nibble*4 + bitInNibble (MSB first). */
  def simhashAggExprs(digits: Seq[Column]): Seq[Column] =
    for (j <- 0 until 16; b <- 0 until 4) yield
      sum(when(shiftright(digits(j), 3 - b).bitwiseAND(lit(1)) === 1, 1).otherwise(-1))
        .as(s"v_${j}_$b")

  /** Reassemble the 64 vote sums into the hex SimHash (bit = vote > 0). */
  def simhashAssemble(votes: Seq[Column]): Column = {
    val nibbleChars = (0 until 16).map { j =>
      val nib = (0 until 4).map { b =>
        when(votes(j * 4 + b) > 0, lit(1 << (3 - b))).otherwise(lit(0))
      }.reduce(_ + _)
      element_at(HexChars, nib + 1)
    }
    concat(nibbleChars: _*)
  }
}
