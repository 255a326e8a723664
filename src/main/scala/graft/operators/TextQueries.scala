package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextExprs

/** Text-analysis operators over the `documents` table: quality scoring,
  * language-ID heuristics, token counting, and derived statistics.
  * Everything is a narrow per-row projection — embarrassingly parallel,
  * no shuffles, fully codegen'd (no UDFs).
  */
object TextQueries {

  private val Stopwords = Seq("the", "a")

  // ---------------------------------------------------- quality score
  /** Per-document quality metrics: token counts, type-token ratio,
    * stopword ratio, mean token length, and a deterministic integer
    * quality score — the standard pre-training corpus filter features. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"), TextExprs.tokens(col("text")).as("w"))
      .select(
        col("doc_id"),
        col("n_chars"),
        size(col("w")).cast("long").as("n_tokens"),
        size(array_distinct(col("w"))).cast("long").as("n_types"),
        TextExprs.markerCount(col("w"), Stopwords).cast("long").as("n_stop"),
        TextExprs.totalTokenChars(col("w")).cast("long").as("tok_chars"))
    base.select(
      col("doc_id"), col("n_tokens"), col("n_types"),
      (col("n_types") * lit(1.0) / col("n_tokens")).as("ttr"),
      (col("n_stop") * lit(1.0) / col("n_tokens")).as("stopword_ratio"),
      (col("tok_chars") * lit(1.0) / col("n_tokens")).as("avg_token_len"),
      (when(col("n_tokens").between(20, 400), 1).otherwise(0) +
        when(col("n_types") * lit(1.0) / col("n_tokens") >= 0.3, 1).otherwise(0) +
        when((col("n_stop") * lit(1.0) / col("n_tokens")).between(0.01, 0.3), 1).otherwise(0))
        .cast("long").as("quality_score"))
  }

  val textQualitySql: String =
    """WITH b AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |m AS (SELECT doc_id, len(w) AS n_tokens,
      |  len(list_distinct(w)) AS n_types,
      |  len(list_filter(w, x -> x IN ('the', 'a'))) AS n_stop,
      |  list_sum(list_transform(w, x -> len(x))) AS tok_chars FROM b)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, CAST(n_types AS BIGINT) AS n_types,
      |  n_types * 1.0 / n_tokens AS ttr,
      |  n_stop * 1.0 / n_tokens AS stopword_ratio,
      |  tok_chars * 1.0 / n_tokens AS avg_token_len,
      |  CAST((CASE WHEN n_tokens BETWEEN 20 AND 400 THEN 1 ELSE 0 END +
      |        CASE WHEN n_types * 1.0 / n_tokens >= 0.3 THEN 1 ELSE 0 END +
      |        CASE WHEN n_stop * 1.0 / n_tokens BETWEEN 0.01 AND 0.3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS quality_score
      |FROM m""".stripMargin

  // -------------------------------------------------------- language ID
  /** N-gram-heuristic language scorer: marker-token density ('the'/'a'
    * function-word rate) plus the ' th' character-trigram rate; thresholds
    * yield a deterministic prediction compared against the labeled lang. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val w = TextExprs.tokens(col("text"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        (TextExprs.markerCount(w, Stopwords) * lit(1.0) / size(w)).as("marker_rate"),
        ((length(col("text")) - length(regexp_replace(col("text"), " th", ""))) * lit(1.0)
          / length(col("text"))).as("th_rate"))
      .withColumn("lang_pred",
        when(col("marker_rate") >= 0.05 && col("th_rate") >= 0.01, lit("en"))
          .otherwise(lit("other")))
      .withColumn("is_match", col("lang_pred") === col("lang"))
  }

  val langIdSql: String =
    """WITH b AS (SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents),
      |m AS (SELECT doc_id, lang,
      |  len(list_filter(w, x -> x IN ('the', 'a'))) * 1.0 / len(w) AS marker_rate,
      |  (len(text) - len(replace(text, ' th', ''))) * 1.0 / len(text) AS th_rate FROM b)
      |SELECT doc_id, lang, marker_rate, th_rate,
      |  CASE WHEN marker_rate >= 0.05 AND th_rate >= 0.01 THEN 'en' ELSE 'other' END AS lang_pred,
      |  (CASE WHEN marker_rate >= 0.05 AND th_rate >= 0.01 THEN 'en' ELSE 'other' END) = lang AS is_match
      |FROM m""".stripMargin

  // ------------------------------------------------------ token count
  /** Token counting three ways: whitespace tokens, a BPE-ish regex
    * segmentation (letter runs / digit runs / punctuation), and the
    * chars/4 heuristic LLM-token estimate. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      size(split(col("text"), "\\s+")).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")).cast("long").as("bpe_tokens"),
      call_function("div", col("n_chars") + 3, lit(4L)).as("est_tokens"))

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS bpe_tokens,
      |  (n_chars + 3) // 4 AS est_tokens
      |FROM documents""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_text_quality" -> textQuality _,
    "q23_lang_id" -> langId _,
    "q24_token_count" -> tokenCount _)

  val oracles: Map[String, String] = Map(
    "q22_text_quality" -> textQualitySql,
    "q23_lang_id" -> langIdSql,
    "q24_token_count" -> tokenCountSql)
}
