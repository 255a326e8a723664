package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Caches, Tables}
import graft.functions.TextExprs

/** Distributed WordPiece tokenizer training + encoding — the third of
  * the three production subword algorithms (BPE q117/q122, unigram-LM
  * q158–q160), completing the tokenizer tier. WordPiece (Schuster &
  * Nakajima 2012; BERT's tokenizer) differs from BPE in BOTH phases,
  * and each difference is the point of the query:
  *
  *  - **Training** promotes the pair maximizing the LIKELIHOOD score
  *    `count(a·b) / (count(a) · count(b))` — the mutual-information
  *    criterion — not BPE's raw pair count. A pair of individually
  *    rare symbols that always co-occur beats a frequent pair of
  *    frequent symbols (the spec pins a corpus where the two
  *    criteria provably disagree on the first merge).
  *  - **Encoding** is greedy longest-match-first against the final
  *    piece vocabulary (word-initial pieces plain, word-internal
  *    pieces `##`-prefixed), NOT a replay of the merge history; a
  *    word with any unmatchable remainder becomes a single `[UNK]`
  *    (BERT's behavior — partial fallback is a different algorithm).
  *
  * Spark-first shape, inherited from the BPE trainer and equally
  * 100 TB-safe:
  *  - the corpus collapses once to DISTINCT (word, count) rows, so
  *    every training round runs over a vocabulary-bounded Dataset;
  *  - per round: two map-side-combined aggregations over the persisted
  *    vocab (pair counts, unit counts), one broadcast join — the unit
  *    table is PROVABLY tiny (≤ 2·|alphabet| initial symbols +
  *    one product per completed round) — and a 1-row driver argmax
  *    with a deterministic tie-break (score desc, pair asc);
  *  - encoding pays the greedy scan once per DISTINCT word, then one
  *    uniform join back and a per-doc map-side-combined aggregate.
  *
  * Like q117/q158, iterative argmax selection has no single-SQL
  * formulation — both queries are rows-only, spec-pinned in
  * WordPieceSpec (criterion disagreement vs BPE, greedy-encode and
  * UNK semantics by hand, corpus-level invariants, double-run
  * determinism).
  */
object WordPieceQueries {

  /** Merge rounds — part of the query contract like [[BpeQueries.Rounds]]. */
  val Rounds = 8

  case class WpWord(word: String, n: Long, toks: Seq[String])

  /** WordPiece initial symbols: first char plain, word-internal chars
    * `##`-prefixed — the continuation convention the greedy encoder
    * depends on. */
  private[graft] def initSymbols(word: String): Seq[String] =
    word.zipWithIndex.map { case (c, i) => if (i == 0) c.toString else "##" + c }

  /** The symbol a merge produces: `b` loses its continuation prefix,
    * `a` keeps whatever form it has ("a"+"##b" → "ab"; "##a"+"##b" →
    * "##ab"). */
  private[graft] def mergedSymbol(a: String, b: String): String =
    a + b.stripPrefix("##")

  /** One left-to-right non-overlapping pass replacing adjacent (a, b)
    * with `m` — same repeated-run-safe scan as [[BpeQueries.mergeTokens]],
    * parameterized on the output symbol because WordPiece's product is
    * not the concatenation of the pair's surface forms. */
  private[graft] def mergeWith(toks: Seq[String], a: String, b: String,
      m: String): Seq[String] = {
    val out = mutable.ListBuffer.empty[String]
    var i = 0
    val n = toks.length
    while (i < n) {
      if (i + 1 < n && toks(i) == a && toks(i + 1) == b) { out += m; i += 2 }
      else { out += toks(i); i += 1 }
    }
    out.toList
  }

  /** Q162: the learned WordPiece merge table (round, pair, n, score)
    * over the documents corpus. `score` is the likelihood criterion
    * the round's winner maximized; `n` the pair's weighted count (what
    * BPE would have ranked by — keeping both makes the criterion
    * difference auditable row by row). */
  def q162WordPieceMerges(spark: SparkSession, dir: String): DataFrame =
    wpMergesOn(Tables(spark, dir, "documents"))

  private[graft] def wpMergesOn(docRel: DataFrame): DataFrame = {
    val spark = docRel.sparkSession
    import spark.implicits._
    var vocab: Dataset[WpWord] = Caches.persistTrackedDs(docRel
      .select(explode(TextExprs.tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => WpWord(w, n, initSymbols(w)) })
    val merges = mutable.ArrayBuffer.empty[(Int, String, Long, Double)]
    var roundNo = 1
    var exhausted = false
    while (roundNo <= Rounds && !exhausted) {
      val pairs = vocab.flatMap(wt =>
          wt.toks.iterator.sliding(2).withPartial(false)
            .map(p => (p.head, p(1), wt.n)))
        .toDF("a", "b", "w")
        .groupBy("a", "b").agg(sum("w").as("np"))
      val units = vocab.flatMap(wt => wt.toks.iterator.map(u => (u, wt.n)))
        .toDF("u", "w").groupBy("u").agg(sum("w").as("nu"))
      val best = pairs
        .join(broadcast(units.select(col("u").as("a"), col("nu").as("na"))), "a")
        .join(broadcast(units.select(col("u").as("b"), col("nu").as("nb"))), "b")
        .select(col("a"), col("b"), col("np"),
          (col("np").cast("double") /
            (col("na").cast("double") * col("nb").cast("double"))).as("score"))
        .orderBy(desc("score"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        merges += ((roundNo, a + " " + b, best.head.getLong(2), best.head.getDouble(3)))
        val m = mergedSymbol(a, b)
        // Lineage cut per round, not persist — see BpeQueries.trainMerges:
        // the typed map chain's planning cost doubles past ~11 rounds.
        vocab = Caches.localCheckpointTracked(
          vocab.map(wt => wt.copy(toks = mergeWith(wt.toks, a, b, m))))
        roundNo += 1
      }
    }
    merges.toSeq.toDF("round", "pair", "n", "score")
      .withColumn("score", round(col("score"), 9))
  }

  /** Greedy longest-match-first WordPiece encode of one word against a
    * piece vocabulary. Returns (pieces, isUnk): any unmatchable
    * remainder collapses the WHOLE word to `[UNK]`. */
  private[graft] def encodeWord(word: String, vocab: Set[String]): (Seq[String], Boolean) = {
    val out = mutable.ListBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      val prefix = if (pos == 0) "" else "##"
      var end = word.length
      var found: String = null
      while (end > pos && found == null) {
        val cand = prefix + word.substring(pos, end)
        if (vocab(cand)) found = cand else end -= 1
      }
      if (found == null) return (Seq("[UNK]"), true)
      out += found
      pos = end
    }
    (out.toList, false)
  }

  /** Q163: ENCODE the corpus with the trained WordPiece vocabulary —
    * per document the word count, piece count ([UNK] words contribute
    * one piece), and how many words fell to [UNK]. The vocabulary is
    * the initial alphabet plus every merge product — driver state by
    * construction (≤ 2·|alphabet| + [[Rounds]] entries), shipped in
    * the closure; the greedy scan runs once per DISTINCT word. */
  def q163WordPieceEncode(spark: SparkSession, dir: String): DataFrame =
    wpEncodeOn(Tables(spark, dir, "documents"))

  /** The train-time alphabet as a relation scan (used by the store's
    * build; [[wpEncodeOn]]'s inline path derives the identical set from
    * its already-persisted words relation). */
  private[graft] def alphabetOf(docRel: DataFrame): Set[String] = {
    val spark = docRel.sparkSession
    import spark.implicits._
    docRel.select(explode(TextExprs.tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0)
      .select(explode(split(col("word"), "")).as("ch"))
      .where(col("ch") =!= "").distinct()
      .as[String].collect().toSet
  }

  private[graft] def wpEncodeOn(docRel: DataFrame): DataFrame = {
    val spark = docRel.sparkSession
    import spark.implicits._
    val words = Caches.persistTracked(docRel
      .select(col("doc_id"), explode(TextExprs.tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0))
    // Train-once/serve-many: a fresh TokenizerStore supplies both the
    // merge table and the train-time alphabet; the inline fallback
    // derives the alphabet from the words relation it persists anyway.
    val (merges, alphabet) = graft.sources.TokenizerStore.openWordPiece(docRel)
      .getOrElse {
        val m = wpMergesOn(docRel).orderBy("round")
          .select("pair").as[String].collect().toSeq
        val a = words.select(explode(split(col("word"), "")).as("ch"))
          .where(col("ch") =!= "").distinct()
          .as[String].collect().toSet
        (m, a)
      }
    val pieceVocab = vocabFromMerges(alphabet, merges)
    val encoded = words.select("word").distinct().as[String]
      .map { w =>
        val (pieces, unk) = encodeWord(w, pieceVocab)
        (w, pieces.length.toLong, if (unk) 1L else 0L)
      }
      .toDF("word", "n_pieces", "unk")
    words.join(encoded, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("n_pieces").as("n_pieces"),
        sum("unk").as("n_unk"))
      .orderBy("doc_id")
  }

  /** The encoder's vocabulary: every character as a word-initial piece
    * AND a `##` continuation piece, plus each merge's product. */
  private[graft] def vocabFromMerges(alphabet: Set[String],
      merges: Seq[String]): Set[String] =
    alphabet.flatMap(c => Seq(c, "##" + c)) ++ merges.map { m =>
      val Array(a, b) = m.split(" ", 2)
      mergedSymbol(a, b)
    }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q162_wordpiece_merges" -> q162WordPieceMerges _,
    "q163_wordpiece_encode" -> q163WordPieceEncode _)

  /** Rows-only like q117/q158: iterative argmax has no single-SQL
    * formulation; WordPieceSpec pins both phases by hand. */
  val oracles: Map[String, String] = Map.empty
}
