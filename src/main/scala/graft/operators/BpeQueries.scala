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
  *  - Each round's vocab is `localCheckpoint`ed (tracked): the cut
  *    both caches the round's rows AND truncates the typed-map plan
  *    chain — measured necessary, not hygiene: with persist alone the
  *    per-round planning cost DOUBLED past ~11 rounds (the 16-round
  *    byte trainer hit 16.7 s on round 16 at sf0.001, flat in data),
  *    with the cut every round is flat. GraphOps' iteration loops use
  *    the same move.
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

  private[graft] def bpeMergesOn(docRel: DataFrame): DataFrame =
    trainMerges(docRel, Rounds, w => w.map(_.toString))

  /** The trainer loop, parameterized on the initial symbolization (and
    * round count) — characters for q117, UTF-8 bytes for q167. The
    * dataflow is identical: the corpus collapses once to distinct
    * (word, count) rows, and every round is one map-side-combined pair
    * count + a 1-row driver argmax + a narrow merge map. */
  private def trainMerges(docRel: DataFrame, rounds: Int,
      init: String => Seq[String]): DataFrame = {
    val spark = docRel.sparkSession
    import spark.implicits._
    var vocab: Dataset[WordTokens] = Caches.persistTrackedDs(docRel
      .select(explode(TextExprs.tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => WordTokens(w, n, init(w)) })
    val merges = mutable.ArrayBuffer.empty[(Int, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
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
        // localCheckpoint, NOT persist: each round must CUT the typed
        // map chain, not just cache it. With persist the logical plan
        // kept every prior round's map/serde nodes and per-round cost
        // doubled from ~round 11 (measured on the 16-round byte
        // trainer: 0.4 s/round → 16.7 s at round 16, 43 s total at
        // sf0.001 — pure planning/canonicalization, flat in data).
        // The checkpoint pins the same bytes the persist did (tracked
        // for release the same way) and rounds stay flat: 16 rounds
        // ≈ 6 s. Same move as GraphOps' iteration loops.
        vocab = Caches.localCheckpointTracked(
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
    // Train-once/serve-many: a fresh TokenizerStore supplies the merge
    // table (k driver rows) without re-running the trainer; fallback is
    // the inline train, so a stale store costs time, never correctness.
    val merges = graft.sources.TokenizerStore.openBpeMerges(docRel).getOrElse(
      bpeMergesOn(docRel).orderBy("round")
        .select("pair").as[String].collect().toSeq)
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

  // ---- Byte-level BPE (q167): GPT-2-style byte fallback ----------------

  /** Byte-level merge rounds. More than the char trainer's [[Rounds]]:
    * byte pieces start two-to-four× smaller than characters (UTF-8),
    * so the same number of merges buys less compression; 16 keeps the
    * trainer bounded while producing multi-byte pieces that actually
    * span CJK/emoji codepoint boundaries (the property the tier is
    * for). Part of the query contract like [[Rounds]]. */
  val ByteRounds = 16

  /** A word's UTF-8 bytes as two-hex-digit symbols ("é" →
    * ["c3","a9"]) — the byte alphabet is CLOSED (256 symbols), so
    * every string is encodable and nothing can be `[UNK]` (the gap
    * BERT-faithful WordPiece q163 makes visible). Hex strings rather
    * than GPT-2's printable-unicode remap: the remap exists so a
    * byte-level vocab survives a TEXT file round-trip, which a parquet
    * merge table doesn't need — and hex keeps the pair table ASCII and
    * deterministic to sort. */
  private[graft] def byteSymbols(word: String): Seq[String] =
    word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => f"${b & 0xff}%02x").toSeq

  /** Inverse of [[byteSymbols]] ∘ merges: concatenated hex pieces back
    * to the string — the round-trip ByteBpeSpec pins on CJK/emoji. */
  private[graft] def decodeByteTokens(toks: Seq[String]): String = {
    val hex = toks.mkString
    val bytes = hex.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Q167: the learned byte-level merge table (round, pair, n) — the
    * same trainer loop as q117 over UTF-8 byte symbols. A merge's
    * product may end mid-codepoint (bytes, not chars, are the unit —
    * that is what makes the alphabet closed); the ENCODER's output
    * still always decodes, because the pieces partition the exact byte
    * sequence of the word. */
  def q167ByteBpeMerges(spark: SparkSession, dir: String): DataFrame =
    byteBpeMergesOn(Tables(spark, dir, "documents"))

  private[graft] def byteBpeMergesOn(docRel: DataFrame): DataFrame =
    trainMerges(docRel, ByteRounds, byteSymbols)

  /** Byte-level encode of the corpus (the q122 shape over byte
    * symbols): per doc, word count, byte-piece count under the learned
    * merges, and raw UTF-8 byte count — q166's bake-off consumes this
    * so the byte tokenizer competes on the same fertility /
    * compression axes as the three char-level ones. */
  private[graft] def byteBpeEncodeOn(docRel: DataFrame): DataFrame = {
    val spark = docRel.sparkSession
    import spark.implicits._
    val merges = graft.sources.TokenizerStore.openByteBpeMerges(docRel).getOrElse(
      byteBpeMergesOn(docRel).orderBy("round")
        .select("pair").as[String].collect().toSeq)
    val words = Caches.persistTracked(docRel
      .select(col("doc_id"), explode(TextExprs.tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0))
    val encoded = words.select("word").distinct().as[String]
      .map { w =>
        val toks = merges.foldLeft(byteSymbols(w)) { (ts, m) =>
          val Array(a, b) = m.split(" ", 2)
          mergeTokens(ts, a, b)
        }
        (w, toks.length.toLong, byteSymbols(w).length.toLong)
      }
      .toDF("word", "n_sub", "n_bytes")
    words.join(encoded, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_sub").as("n_tokens"),
        sum("n_bytes").as("n_bytes"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"), col("n_bytes"),
        round(col("n_bytes").cast("double") / col("n_tokens").cast("double"), 6)
          .as("bytes_per_token"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q117_bpe_merges" -> q117BpeMerges _,
    "q122_bpe_encode" -> q122BpeEncode _,
    "q167_bytebpe_merges" -> q167ByteBpeMerges _)

  /** No oracle for any: iterative argmax selection has no tractable
    * single-SQL formulation (and the string-replace approximation is
    * wrong on repeated pairs) — rows-only driver checks, spec-pinned. */
  val oracles: Map[String, String] = Map.empty
}
