package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Caches, Tables}
import graft.functions.TextExprs

/** Distributed unigram-LM tokenizer training — the OTHER canonical LLM
  * tokenizer next to BPE (q117): Kudo's unigram language model
  * ("Subword Regularization", ACL 2018), the algorithm behind
  * SentencePiece's default trainer. Where BPE grows a vocabulary by
  * merging, unigram starts from an over-complete substring seed and
  * SHRINKS it with EM: each round segments every word optimally under
  * the current piece probabilities, re-estimates probabilities from the
  * usage counts, and drops pieces that earn no usage. This
  * implementation runs the hard-EM (Viterbi) variant — each word
  * contributes counts along its single best segmentation — which keeps
  * every step integer-exact and cross-run deterministic; soft EM would
  * only change the count fractions, not the dataflow.
  *
  * Spark-first shape, same scaling contract as the BPE trainer:
  *  - **The state is the VOCABULARY, not the corpus.** Words collapse
  *    to distinct (word, n) rows once; every EM round runs over that
  *    vocabulary-bounded relation, so trainer cost is independent of
  *    corpus row count.
  *  - Per round: the current piece table (a few thousand entries, the
  *    thing a tokenizer ships) rides into a typed flatMap as a plain
  *    broadcast-sized closure map; the Viterbi DP is O(len·MaxPiece)
  *    per distinct word; ONE map-side-combined count aggregation comes
  *    back vocabulary-sized to the driver. No shuffle ever carries
  *    more than (piece, count) rows.
  *  - Determinism: seed selection and the final ranking order by
  *    (count desc, piece asc); the DP breaks score ties toward the
  *    longest final piece (smallest split point); all counts are
  *    integer sums. Two runs on any partitioning agree byte-for-byte
  *    (UnigramSpec pins a double run).
  *
  * Like q117/q122, the iterative EM loop has no tractable single-SQL
  * formulation → rows-only driver check; UnigramSpec carries a
  * hand-computed corpus, closure/reconstruction invariants, and the
  * compression-beats-characters property.
  */
object UnigramQueries {

  /** Longest candidate piece, in characters. */
  val MaxPiece = 6

  /** Multi-character pieces kept at seeding (single characters are
    * always kept — they guarantee every word stays segmentable). */
  val SeedVocab = 1500

  /** EM rounds — part of the query contract. */
  val Rounds = 3

  /** CAP on multi-character pieces in the shipped vocabulary. Hard EM
    * is winner-take-all — a piece that loses every Viterbi in a round
    * earns zero count and dies — so the survivor set is typically well
    * under this cap (soft EM would keep fractional users alive longer;
    * same dataflow, different count arithmetic). */
  val FinalVocab = 800

  /** Floor log-prob for characters absent from the current table
    * (never hit when encoding the training corpus; keeps the DP total
    * on foreign text instead of failing the row). */
  private val UnkLogp = -1e9

  case class WordN(word: String, n: Long)

  /** Viterbi segmentation of `word` under piece log-probs: the
    * highest-scoring split, ties broken toward the longest last piece
    * (ascending split-point scan with strict improvement). */
  private[operators] def viterbi(word: String, logp: Map[String, Double]): List[String] = {
    val L = word.length
    val best = Array.fill(L + 1)(Double.NegativeInfinity)
    val back = new Array[Int](L + 1)
    best(0) = 0.0
    var i = 1
    while (i <= L) {
      var j = math.max(0, i - MaxPiece)
      while (j < i) {
        logp.get(word.substring(j, i)) match {
          case Some(lp) if best(j) + lp > best(i) =>
            best(i) = best(j) + lp; back(i) = j
          case _ => ()
        }
        j += 1
      }
      if (best(i) == Double.NegativeInfinity) {
        // unseen character: its own piece at the floor score
        best(i) = best(i - 1) + UnkLogp; back(i) = i - 1
      }
      i += 1
    }
    var out = List.empty[String]
    var k = L
    while (k > 0) { out = word.substring(back(k), k) :: out; k = back(k) }
    out
  }

  /** Distinct-word collapse (the same first step as the BPE trainer). */
  private def wordsOf(docRel: DataFrame): Dataset[WordN] = {
    val spark = docRel.sparkSession
    import spark.implicits._
    Caches.persistTrackedDs(docRel
      .select(explode(TextExprs.tokens(col("text"))).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => WordN(w, n) })
  }

  /** Train the vocabulary: returns (piece → last-round usage count),
    * single characters always present. */
  private[graft] def trainVocab(docRel: DataFrame): Map[String, Long] = {
    val spark = docRel.sparkSession
    import spark.implicits._
    val words = wordsOf(docRel)

    // Seed: every substring of length 1..MaxPiece, frequency-weighted.
    val seed = words.flatMap { wn =>
      val w = wn.word
      for {
        s <- (0 until w.length).iterator
        e <- (s + 1) to math.min(w.length, s + MaxPiece)
      } yield (w.substring(s, e), wn.n)
    }.toDF("piece", "n")
      .groupBy("piece").agg(sum("n").as("n"))
    val chars = seed.where(length(col("piece")) === 1)
      .as[(String, Long)].collect()
    val multi = seed.where(length(col("piece")) > 1)
      .orderBy(desc("n"), asc("piece")).limit(SeedVocab)
      .as[(String, Long)].collect()
    var vocab: Map[String, Long] = (chars ++ multi).toMap

    var round = 1
    while (round <= Rounds) {
      val total = math.max(1L, vocab.valuesIterator.sum)
      val logp = vocab.map { case (p, c) =>
        p -> math.log(c.toDouble / total)
      }
      val counts = words.flatMap(wn =>
          viterbi(wn.word, logp).iterator.map(p => (p, wn.n)))
        .toDF("piece", "n")
        .groupBy("piece").agg(sum("n").as("n"))
        .as[(String, Long)].collect().toMap
      // M-step + prune: multi-char pieces live only while they earn
      // usage; characters always survive (floor count 1) so every
      // word stays segmentable next round.
      vocab = counts ++ chars.iterator.map { case (c, _) =>
        c -> math.max(1L, counts.getOrElse(c, 0L))
      }.toMap
      round += 1
    }
    // Ship: all characters + the FinalVocab best multi-char pieces.
    val keepMulti = vocab.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(FinalVocab)
    (vocab.iterator.filter(_._1.length == 1) ++ keepMulti).toMap
  }

  /** Train-once/serve-many: a fresh [[graft.sources.TokenizerStore]]
    * supplies the vocabulary without re-running EM; fallback is the
    * inline train (stale store costs time, never correctness). */
  private[graft] def vocabFor(docRel: DataFrame): Map[String, Long] =
    graft.sources.TokenizerStore.openUnigramVocab(docRel)
      .getOrElse(trainVocab(docRel))

  /** The shipped artifact as a relation: (rank, piece, n_used), rank
    * by (usage desc, piece asc) like every trainer artifact. */
  private[graft] def vocabToDf(spark: SparkSession, vocab: Map[String, Long]): DataFrame = {
    import spark.implicits._
    vocab.toSeq.sortBy { case (p, c) => (-c, p) }
      .zipWithIndex
      .map { case ((p, c), i) => (i + 1, p, c) }
      .toDF("rank", "piece", "n_used")
  }

  /** Q158: the trained unigram vocabulary. */
  def q158UnigramVocab(spark: SparkSession, dir: String): DataFrame =
    vocabToDf(spark, vocabFor(Tables(spark, dir, "documents")))

  /** Q159: encode the corpus with the trained vocabulary — per doc,
    * the Viterbi piece count next to the whitespace and character
    * counts the budget planners use (q24's estimate, made exact).
    * Same batch-train/serve shape as q122's BPE encode. */
  def q159UnigramEncode(spark: SparkSession, dir: String): DataFrame =
    unigramEncodeOn(Tables(spark, dir, "documents"))

  private[graft] def unigramEncodeOn(docRel: DataFrame): DataFrame = {
    val vocab = vocabFor(docRel)
    val total = math.max(1L, vocab.valuesIterator.sum)
    val logp = vocab.map { case (p, c) => p -> math.log(c.toDouble / total) }
    val spark2 = docRel.sparkSession
    import spark2.implicits._
    docRel.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks =
          if (text == null) Seq.empty[String]
          else text.split(" ", -1).toSeq.filter(_.nonEmpty)
        val pieces = toks.iterator.map(w => viterbi(w, logp).length.toLong).sum
        (id, toks.size.toLong, pieces)
      }
      .toDF("doc_id", "n_words", "n_pieces")
      .orderBy("doc_id")
  }

  /** Candidate split points for position `i` (1-based end): every
    * in-vocab piece ending at `i`, weighted `forward(j) + α·logp`; the
    * single-char unknown fallback only when NO piece reaches `i` — the
    * same rule [[viterbi]] applies, so the sampler's lattice and the
    * Viterbi lattice are identical. */
  private def lattice(word: String, logp: Map[String, Double], alpha: Double,
      f: Array[Double], i: Int): List[(Int, Double)] = {
    var out = List.empty[(Int, Double)]
    var j = math.max(0, i - MaxPiece)
    while (j < i) {
      logp.get(word.substring(j, i)).foreach(lp => out = (j, f(j) + alpha * lp) :: out)
      j += 1
    }
    if (out.isEmpty) List((i - 1, f(i - 1) + alpha * UnkLogp)) else out
  }

  private def logSumExp(ws: List[(Int, Double)]): Double = {
    val m = ws.iterator.map(_._2).max
    if (m == Double.NegativeInfinity) m
    else m + math.log(ws.iterator.map(w => math.exp(w._2 - m)).sum)
  }

  /** One segmentation sampled with P(s) ∝ Π p(piece)^α — Kudo's subword
    * regularization, by exact forward-filtering / backward-sampling
    * over the segmentation lattice. α→∞ sharpens to Viterbi; α→0
    * approaches uniform over segmentations. Deterministic for a given
    * `seed` (SplittableRandom's algorithm is specified, not
    * implementation-defined), so the "random" augmentation is
    * reproducible corpus-wide. */
  private[operators] def sampleSegmentation(word: String, logp: Map[String, Double],
      alpha: Double, seed: Long): List[String] = {
    val L = word.length
    val f = Array.fill(L + 1)(Double.NegativeInfinity)
    f(0) = 0.0
    var i = 1
    while (i <= L) { f(i) = logSumExp(lattice(word, logp, alpha, f, i)); i += 1 }
    val rnd = new java.util.SplittableRandom(seed)
    var out = List.empty[String]
    var k = L
    while (k > 0) {
      val cands = lattice(word, logp, alpha, f, k)
      val u = rnd.nextDouble()
      var acc = 0.0
      var pick = cands.head._1
      val it = cands.iterator
      var done = false
      while (it.hasNext && !done) {
        val (j, w) = it.next()
        acc += math.exp(w - f(k))
        if (u < acc) { pick = j; done = true }
      }
      if (!done) pick = cands.last._1 // float-rounding tail lands on the last candidate
      out = word.substring(pick, k) :: out
      k = pick
    }
    out
  }

  /** Sampling temperature for q160 — Kudo's paper's own setting
    * (α = 0.1 in the subword-regularization experiments), and here it
    * is load-bearing: hard EM drives losing pieces to the floor count
    * (their log-probs sit ~7 nats under the winners), so a mild α
    * would just reproduce Viterbi; α = 0.1 flattens the lattice enough
    * that plausible alternative segmentations actually get sampled
    * (measured: 'the' splits to chars ~23% of draws). */
  val SampleAlpha = 0.1

  /** Q160: subword-regularization encode — the training-time
    * augmentation Kudo's paper is actually about: each word is encoded
    * by a SAMPLED segmentation (α-smoothed lattice) instead of the
    * argmax, giving the model segmentation diversity. The seed is a
    * hash of (doc_id, word position), so the augmentation is
    * deterministic and reproducible — re-running the corpus job yields
    * byte-identical "random" segmentations, the property a distributed
    * training pipeline needs for resumable epochs. Output per doc:
    * sampled piece count next to the Viterbi count. */
  def q160UnigramSample(spark: SparkSession, dir: String): DataFrame = {
    val docRel = Tables(spark, dir, "documents")
    val vocab = vocabFor(docRel)
    val total = math.max(1L, vocab.valuesIterator.sum)
    val logp = vocab.map { case (p, c) => p -> math.log(c.toDouble / total) }
    val spark2 = docRel.sparkSession
    import spark2.implicits._
    docRel.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks =
          if (text == null) Seq.empty[String]
          else text.split(" ", -1).toSeq.filter(_.nonEmpty)
        var sampled = 0L
        var exact = 0L
        toks.iterator.zipWithIndex.foreach { case (w, idx) =>
          val seed = (scala.util.hashing.MurmurHash3.stringHash(s"$id:$idx").toLong << 32) |
            (scala.util.hashing.MurmurHash3.stringHash(s"$idx:$id").toLong & 0xffffffffL)
          sampled += sampleSegmentation(w, logp, SampleAlpha, seed).length
          exact += viterbi(w, logp).length
        }
        (id, sampled, exact)
      }
      .toDF("doc_id", "n_sampled", "n_viterbi")
      .orderBy("doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q158_unigram_vocab" -> q158UnigramVocab _,
    "q159_unigram_encode" -> q159UnigramEncode _,
    "q160_unigram_sample" -> q160UnigramSample _)

  /** Iterative EM / seeded sampling — no single-SQL formulation;
    * rows-only like q117. */
  val oracles: Map[String, String] = Map.empty
}
