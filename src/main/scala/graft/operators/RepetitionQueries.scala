package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Intra-document repetition filters (Rae et al., Gopher §A1.1's
  * "repetition" quality signals) — the WITHIN-doc face the dedup tier
  * lacked: q149-q175 find text repeated ACROSS documents; a document
  * that degenerates into repeating itself (boilerplate loops, scraper
  * artifacts, "batch batch batch...") passes every cross-doc filter
  * and still poisons a language model. Two of Gopher's signals, made
  * exactly reproducible:
  *
  *  - `top2_frac`: fraction of the document's characters covered by
  *    its single most frequent word BIGRAM (count × bigram length /
  *    doc chars, capped at 1; ties broken by bigram text so the
  *    argmax is deterministic in both engines).
  *  - `dup10_frac`: fraction of word positions starting a word
  *    10-gram that occurs more than once in the SAME document. (A
  *    position-fraction rather than Gopher's char-coverage variant —
  *    overlap-merging char coverage isn't well-defined in one SQL
  *    pass, and the position fraction is the same signal with an
  *    exact, engine-portable definition.)
  *
  * `keep` applies Gopher-magnitude thresholds (top2 < 0.20,
  * dup10 < 0.30). Scale shape: two narrow explodes over the word
  * array (2-gram and 10-gram), each partially aggregated by
  * (doc_id, gram) before any shuffle; the per-doc argmax is one
  * window over doc-sized groups — nothing corpus-global, no joins
  * wider than doc_id.
  */
object RepetitionQueries {

  private[operators] val Top2Threshold = 0.20
  private[operators] val Dup10Threshold = 0.30

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  def q176GopherRepetition(spark: SparkSession, dir: String): DataFrame =
    repetitionOn(docs(spark, dir))

  private[operators] def repetitionOn(docRel: DataFrame): DataFrame = {
    val base = docRel.select(col("doc_id"),
      length(col("text")).as("n_chars"),
      split(col("text"), " ").as("w"))
      .withColumn("n_words", size(col("w")).cast("long"))
    // most frequent bigram per doc, deterministic tie-break on the text
    val bg = base.filter(col("n_words") >= 2)
      .select(col("doc_id"), col("n_chars"), explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))")).as("g"))
    val topBg = bg.groupBy("doc_id", "n_chars", "g").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("c").desc, col("g").asc)))
      .filter(col("rn") === 1)
      .select(col("doc_id"),
        least(lit(1.0), col("c") * length(col("g")) / col("n_chars"))
          .as("top2_frac"))
    // duplicated-10-gram position fraction per doc
    val g10 = base.filter(col("n_words") >= 10)
      .select(col("doc_id"), col("n_words"), explode(expr(
        "transform(sequence(1, size(w) - 9), " +
          "i -> concat_ws(' ', slice(w, i, 10)))")).as("g"))
    val dup10 = g10.groupBy("doc_id", "n_words", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n_words")
      .agg(sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_pos"))
      .select(col("doc_id"),
        (col("dup_pos") * lit(1.0) / (col("n_words") - 9)).as("dup10_frac"))
    base.select(col("doc_id"), col("n_words"))
      .join(topBg, Seq("doc_id"), "left")
      .join(dup10, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("top2_frac"), lit(0.0)).as("top2_frac"),
        coalesce(col("dup10_frac"), lit(0.0)).as("dup10_frac"))
      .withColumn("keep",
        col("top2_frac") < Top2Threshold && col("dup10_frac") < Dup10Threshold)
  }

  val gopherRepetitionSql: String = {
    val g10cat = (1 to 10).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id, len(text) AS n_chars,
       |             string_split(text, ' ') AS w FROM documents),
       |base AS (SELECT doc_id, n_chars, w, len(w) AS n_words FROM t),
       |bg AS (SELECT doc_id, n_chars,
       |         unnest(list_transform(range(len(w) - 1),
       |           i -> w[i+1] || ' ' || w[i+2])) AS g
       |       FROM base WHERE n_words >= 2),
       |bgc AS (SELECT doc_id, n_chars, g, count(*) AS c
       |        FROM bg GROUP BY 1, 2, 3),
       |top2 AS (SELECT doc_id,
       |           least(1.0, c * len(g) * 1.0 / n_chars) AS top2_frac
       |         FROM (SELECT doc_id, n_chars, g, c,
       |                 row_number() OVER (PARTITION BY doc_id
       |                   ORDER BY c DESC, g ASC) AS rn
       |               FROM bgc) WHERE rn = 1),
       |g10 AS (SELECT doc_id, n_words,
       |          unnest(list_transform(range(len(w) - 9),
       |            i -> $g10cat)) AS g
       |        FROM base WHERE n_words >= 10),
       |g10c AS (SELECT doc_id, n_words, g, count(*) AS c
       |         FROM g10 GROUP BY 1, 2, 3),
       |dup10 AS (SELECT doc_id,
       |            sum(CASE WHEN c >= 2 THEN c ELSE 0 END) * 1.0
       |              / (n_words - 9) AS dup10_frac
       |          FROM g10c GROUP BY doc_id, n_words)
       |SELECT b.doc_id, CAST(b.n_words AS BIGINT) AS n_words,
       |  coalesce(t2.top2_frac, 0.0) AS top2_frac,
       |  coalesce(d.dup10_frac, 0.0) AS dup10_frac,
       |  (coalesce(t2.top2_frac, 0.0) < $Top2Threshold
       |     AND coalesce(d.dup10_frac, 0.0) < $Dup10Threshold) AS keep
       |FROM base b LEFT JOIN top2 t2 USING (doc_id)
       |LEFT JOIN dup10 d USING (doc_id)""".stripMargin
  }

  /** The same two metrics as ONE stateless per-row column — the
    * streaming face's kernel ([[graft.streaming.RepetitionGate]]).
    * The batch query explodes and partially aggregates because a
    * corpus run wants map-side combine and codegen; a live gate wants
    * zero shuffle and zero state, so here each row sorts its own gram
    * arrays and run-length-scans them with `aggregate` lambdas:
    *
    *  - top bigram = longest run in the ASC-sorted bigram array with
    *    strict `>` updates, so the first (= alphabetically smallest)
    *    maximal run wins — exactly the batch argmax's
    *    `(count desc, g asc)` tie-break;
    *  - duplicated-10-gram positions = Σ run lengths ≥ 2 over the
    *    sorted 10-gram array (runs flushed on change, finish lambda
    *    flushes the last).
    *
    * Arithmetic mirrors the batch expressions shape-for-shape
    * (`c * len(g) / n_chars`, `dup * 1.0 / (n_words - 9)`), so the
    * verdicts are bit-identical — RepetitionSpec pins gate-vs-batch
    * parity on the real corpus. Higher-order lambdas are
    * CodegenFallback; that is the price of statelessness and it is
    * paid per ROW with no shuffle, which is the right trade for a
    * gate (the batch face keeps the codegen'd explode shape).
    */
  private[graft] def rowMetrics(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.Column
    val w = split(text, " ")
    val nullStr = lit(null).cast("string")
    val bgs = sort_array(transform(sequence(lit(1), size(w) - 1),
      i => concat(element_at(w, i), lit(" "), element_at(w, i + 1))))
    val top = aggregate(bgs,
      struct(nullStr.as("prev"), lit(0L).as("run"),
        lit(0L).as("best"), nullStr.as("bg")),
      (a: Column, x: Column) => {
        val run = when(x.eqNullSafe(a.getField("prev")),
          a.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          when(run > a.getField("best"), run)
            .otherwise(a.getField("best")).as("best"),
          when(run > a.getField("best"), x)
            .otherwise(a.getField("bg")).as("bg"))
      },
      (a: Column) => struct(a.getField("best").as("c"), a.getField("bg").as("g")))
    val g10s = sort_array(transform(sequence(lit(1), size(w) - 9),
      i => concat_ws(" ", slice(w, i, lit(10)))))
    val dup = aggregate(g10s,
      struct(nullStr.as("prev"), lit(0L).as("run"), lit(0L).as("dup")),
      (a: Column, x: Column) => {
        val run = when(x.eqNullSafe(a.getField("prev")),
          a.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          (a.getField("dup") + when(!x.eqNullSafe(a.getField("prev"))
            && a.getField("run") >= 2L, a.getField("run")).otherwise(0L))
            .as("dup"))
      },
      (a: Column) => a.getField("dup") +
        when(a.getField("run") >= 2L, a.getField("run")).otherwise(0L))
    val nWords = size(w).cast("long")
    val top2 = when(nWords >= 2,
      least(lit(1.0), top.getField("c") * length(top.getField("g")) / length(text)))
      .otherwise(lit(0.0))
    val dup10 = when(nWords >= 10, dup * lit(1.0) / (nWords - 9))
      .otherwise(lit(0.0))
    struct(
      nWords.as("n_words"),
      top2.as("top2_frac"),
      dup10.as("dup10_frac"),
      (top2 < Top2Threshold && dup10 < Dup10Threshold).as("keep"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q176_gopher_repetition" -> q176GopherRepetition _)

  val oracles: Map[String, String] = Map(
    "q176_gopher_repetition" -> gopherRepetitionSql)
}
