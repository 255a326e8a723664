package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Q166: the tokenizer BAKE-OFF — all three trained subword algorithms
  * (BPE q117/q122, unigram-LM q158/q159, WordPiece q162/q163) trained
  * on the same corpus and compared on the two numbers that decide
  * which tokenizer a training pipeline ships:
  *
  *  - **fertility** (pieces per word, lower = fewer tokens per word =
  *    cheaper training/inference for the same text);
  *  - **chars per piece** (higher = better compression of the byte
  *    budget into the context window).
  *
  * One row per algorithm, aggregated from the SAME per-document encode
  * relations the individual queries publish — so this query is pure
  * composition: anything it says is cross-checkable row-for-row
  * against q122/q159/q163 (the spec does exactly that), and its cost
  * is theirs plus three bounded-key aggregations.
  *
  * Character totals come from the shared corpus scan (spaces excluded
  * — all three tokenizers segment within words), so chars_per_piece is
  * comparable across rows by construction. Sums ride longs (exact);
  * the two ratios are rounded at the very end. Rows-only like its
  * inputs (three iterative trainers have no SQL form).
  */
object TokenizerCompare {

  def q166TokenizerCompare(spark: SparkSession, dir: String): DataFrame = {
    val chars = Tables(spark, dir, "documents")
      .select(sum(length(regexp_replace(col("text"), " ", ""))
        .cast("long")).as("n_chars"))
      .collect().head.getLong(0)
    def card(algo: String, enc: DataFrame, words: org.apache.spark.sql.Column,
        pieces: org.apache.spark.sql.Column): DataFrame =
      enc.agg(sum(words).as("w"), sum(pieces).as("p"))
        .select(lit(algo).as("algo"), col("w").as("n_words"),
          col("p").as("n_pieces"), lit(chars).as("n_chars"),
          round(col("p").cast("double") / col("w").cast("double"), 6)
            .as("fertility"),
          round(lit(chars).cast("double") / col("p").cast("double"), 6)
            .as("chars_per_piece"))
    val bpe = card("bpe", BpeQueries.q122BpeEncode(spark, dir),
      col("n_words"), col("n_tokens"))
    // Byte-level BPE (q167) competes on the same axes — its pieces are
    // byte spans, so chars_per_piece < 1 is possible on multi-byte text
    // and the column stays honest (chars is the shared numerator).
    val bb = card("bytebpe", BpeQueries.byteBpeEncodeOn(
      Tables(spark, dir, "documents")), col("n_words"), col("n_tokens"))
    val uni = card("unigram", UnigramQueries.q159UnigramEncode(spark, dir),
      col("n_words"), col("n_pieces"))
    val wp = card("wordpiece", WordPieceQueries.q163WordPieceEncode(spark, dir),
      col("n_words"), col("n_pieces"))
    bpe.unionByName(bb).unionByName(uni).unionByName(wp).orderBy("algo")
  }

  /** Q180: tokenizer FERTILITY BY DOMAIN — the fairness audit q166's
    * corpus-level bake-off can't see: a tokenizer whose corpus
    * fertility looks fine can still make one language pay a multiple
    * of another's tokens for the same text (the "tokenizer premium"
    * documented across public multilingual-NLP work), which skews both
    * the effective mixture (token budgets are spent per piece, not per
    * char) and inference cost. One row per (algo, lang):
    *
    *  - `fertility` — pieces per word within the language;
    *  - `chars_per_piece` — language chars (spaces excluded) per piece;
    *  - `premium` — fertility / the algo's cheapest-language fertility
    *    (1.0 = this lang tokenizes as cheaply as the best-served one).
    *
    * Two structurally-different tokenizers make the cut meaningful:
    * unigram-LM (char-subword — fertility tracks word-shape frequency)
    * and byte-level BPE (fertility tracks BYTES, the regime where
    * non-Latin scripts famously pay multiples). Pure composition over
    * the SAME per-doc encode relations q159/q167 publish (joined to
    * the documents table's lang tag), so every cell is cross-checkable
    * against the oracle-green-adjacent encodes; rows-only like its
    * inputs (iterative trainers have no SQL form), aggregate
    * consistency with q166 spec-pinned.
    */
  def q180TokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    fertilityOn(Tables(spark, dir, "documents"))

  private[graft] def fertilityOn(docRel: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val langs = docRel
      .select(col("doc_id"), col("lang"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("nc"))
    def card(algo: String, enc: DataFrame,
        pieces: org.apache.spark.sql.Column): DataFrame =
      enc.join(langs, "doc_id")
        .groupBy("lang")
        .agg(sum("n_words").as("n_words"), sum(pieces).as("n_pieces"),
          sum("nc").as("n_chars"))
        .select(lit(algo).as("algo"), col("lang"), col("n_words"),
          col("n_pieces"), col("n_chars"),
          (col("n_pieces").cast("double") / col("n_words").cast("double"))
            .as("raw_fert"),
          (col("n_chars").cast("double") / col("n_pieces").cast("double"))
            .as("raw_cpp"))
    val uni = card("unigram", UnigramQueries.unigramEncodeOn(docRel),
      col("n_pieces"))
    val bb = card("bytebpe", BpeQueries.byteBpeEncodeOn(docRel),
      col("n_tokens"))
    val w = Window.partitionBy("algo")
    uni.unionByName(bb)
      .withColumn("premium", col("raw_fert") / min("raw_fert").over(w))
      .select(col("algo"), col("lang"), col("n_words"), col("n_pieces"),
        round(col("raw_fert"), 6).as("fertility"),
        round(col("raw_cpp"), 6).as("chars_per_piece"),
        round(col("premium"), 6).as("premium"))
      .orderBy("algo", "lang")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q166_tokenizer_compare" -> q166TokenizerCompare _,
    "q180_tokenizer_fertility" -> q180TokenizerFertility _)

  /** Rows-only: composes three iterative trainers (q117/q158/q162). */
  val oracles: Map[String, String] = Map.empty
}
