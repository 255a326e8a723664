package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Caches, Tables}
import graft.functions.TextExprs

/** Distributed BPE tokenizer training — the iterative loop that q84's
  * adjacent-pair counting pass belongs to. Each round counts adjacent
  * token pairs across the corpus (weighted by word frequency), promotes
  * the most frequent pair to a merge, applies it everywhere, and
  * repeats — exactly the byte-pair-encoding trainer of Sennrich et al.
  * ("Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016), shaped for a cluster.
  *
  * Spark-first shape, and why it scales:
  *  - **The state is the VOCABULARY, not the corpus.** Words collapse
  *    to distinct (word, count, tokens) rows before the first round —
  *    the corpus-sized scan happens once, and every round after runs
  *    over a vocabulary-bounded typed Dataset. That collapse is what
  *    makes trainer cost independent of corpus row count (the standard
  *    trick every production BPE trainer uses).
  *  - Per round: ONE map-side-combined pair-count aggregation over the
  *    vocab, ONE 1-row argmax fetched to the driver (deterministic
  *    tie-break: count desc, then pair asc — cross-run stable), ONE
  *    narrow typed map applying the merge. The merge table itself —
  *    the thing a tokenizer ships — lives on the driver, k rows.
  *  - Merge application is an explicit left-to-right non-overlapping
  *    scan over the token array ([[mergeTokens]]) — correct on
  *    repeated-pair runs ("aaa" + merge a·a → [aa, a]) where the
  *    string-replace shortcut silently corrupts adjacent matches.
  *  - Each round's vocab persists (tracked) so the next round's count
  *    doesn't recompute the whole merge chain; lineage stays k deep
  *    for k rounds (tolerance-style longer runs would add GraphOps'
  *    `localCheckpoint` cut, nothing else).
  *
  * The merge selection (iterative argmax) has no tractable single-SQL
  * formulation, so q117 is a rows-only driver check like q40/q55/q76;
  * BpeSpec pins the trainer against a hand-computed corpus and a
  * driver-side reference implementation, plus the monotone
  * token-count-shrinks property.
  */
object BpeQueries {

  /** Merge rounds — part of the query contract (like q107's
    * [[GraphQueries.Iterations]]). */
  val Rounds = 8

  case class WordTokens(word: String, n: Long, toks: Seq[String])

  /** Q117: the learned merge table (round, pair, n) over the documents
    * corpus — words are whitespace tokens, initial symbols are their
    * characters. */
  def q117BpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeMergesOn(Tables(spark, dir, "documents"))

  private[graft] def bpeMergesOn(docRel: DataFrame): DataFrame = {
    val spark = docRel.sparkSession
    import spark.implicits._
    var vocab: Dataset[WordTokens] = Caches.persistTrackedDs(docRel
      .select(explode(TextExprs.tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => WordTokens(w, n, w.map(_.toString)) })
    val merges = mutable.ArrayBuffer.empty[(Int, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= Rounds && !exhausted) {
      // Pair counts weighted by word frequency; overlapping positions
      // count (standard BPE: "aaa" contributes (a,a) twice).
      val best = vocab.flatMap(wt =>
          wt.toks.iterator.sliding(2).withPartial(false)
            .map(p => (p.head + " " + p(1), wt.n)))
        .toDF("pair", "w")
        .groupBy("pair").agg(sum("w").as("n"))
        .orderBy(desc("n"), asc("pair"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best.head.getString(0)
        merges += ((round, pair, best.head.getLong(1)))
        val Array(a, b) = pair.split(" ", 2)
        vocab = Caches.persistTrackedDs(
          vocab.map(wt => wt.copy(toks = mergeTokens(wt.toks, a, b))))
        round += 1
      }
    }
    merges.toSeq.toDF("round", "pair", "n")
  }

  /** Tokenize `word` with a learned merge list (applied in order) —
    * what an inference-side tokenizer does with the shipped table. */
  private[graft] def applyMerges(word: String, merges: Seq[String]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) { (toks, m) =>
      val Array(a, b) = m.split(" ", 2)
      mergeTokens(toks, a, b)
    }

  /** Q122: ENCODE the corpus with the trained tokenizer — the apply
    * side of q117's train side, i.e. what every downstream packing /
    * budgeting / mixture stage actually consumes: per document, the
    * word count, the subword token count under the learned merges, and
    * the chars-per-token compression the tokenizer achieves.
    *
    * Spark-first shape (same trick as the trainer, inverted):
    *  - The merge table is DRIVER state by construction (q117 returns
    *    k rows) — it broadcasts with the closure; encoding never
    *    shuffles it.
    *  - Words collapse to DISTINCT (word, subtokens) before the
    *    left-to-right merge scan runs — the O(|word|·k) encode cost is
    *    paid once per vocabulary entry, not once per corpus token.
    *  - One uniform join back (every word row matches exactly one
    *    vocab row — no skewed key can exist on the DISTINCT side) and
    *    one map-side-combined per-doc aggregate.
    *
    * Rows-only like q117 (the merge table inside has no SQL
    * formulation); BpeSpec pins hand-computed counts end-to-end and
    * the invariant n_words ≤ n_tokens ≤ n_chars. */
  def q122BpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeEncodeOn(Tables(spark, dir, "documents"))

  private[graft] def bpeEncodeOn(docRel: DataFrame): DataFrame = {
    val spark = docRel.sparkSession
    import spark.implicits._
    val merges = bpeMergesOn(docRel).orderBy("round")
      .select("pair").as[String].collect().toSeq
    val words = Caches.persistTracked(docRel
      .select(col("doc_id"), explode(TextExprs.tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0))
    val encoded = words.select("word").distinct().as[String]
      .map(w => (w, applyMerges(w, merges).length.toLong))
      .toDF("word", "n_sub")
    words.join(encoded, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_sub").as("n_tokens"),
        sum(length(col("word")).cast("long")).as("n_chars"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"), col("n_chars"),
        round(col("n_chars").cast("double") / col("n_tokens").cast("double"), 6)
          .as("chars_per_token"))
  }

  /** One left-to-right non-overlapping pass replacing adjacent (a, b)
    * with a+b — the scan that makes "aaa" + (a·a) → [aa, a], not [aa, aa]. */
  private[graft] def mergeTokens(toks: Seq[String], a: String, b: String): Seq[String] = {
    val out = mutable.ListBuffer.empty[String]
    var i = 0
    val n = toks.length
    while (i < n) {
      if (i + 1 < n && toks(i) == a && toks(i + 1) == b) { out += (a + b); i += 2 }
      else { out += toks(i); i += 1 }
    }
    out.toList
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q117_bpe_merges" -> q117BpeMerges _,
    "q122_bpe_encode" -> q122BpeEncode _)

  /** No oracle for either: iterative argmax selection has no tractable
    * single-SQL formulation (and the string-replace approximation is
    * wrong on repeated pairs) — rows-only driver checks, spec-pinned. */
  val oracles: Map[String, String] = Map.empty
}
