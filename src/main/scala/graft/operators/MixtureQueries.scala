package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Domain-mixture balancing — the corpus-composition step between
  * curation and training that the tier didn't yet cover: given a
  * domain tag per document (here `lang`, the canonical multilingual
  * case), compute temperature-scaled sampling weights
  * (q_d ∝ p_d^α, the mT5/XLM-R exponential-smoothing recipe: α < 1
  * flattens the natural distribution so high-resource domains are
  * downsampled and low-resource ones upsampled without ever going to
  * uniform), and materialize a deterministic epoch at those weights.
  *
  * Scale shape: q170 is two K-sized aggregates (K = #domains) — one
  * partial-aggregated shuffle by domain, then broadcast cross joins of
  * one-row totals; nothing corpus-proportional ever shuffles. q171
  * joins the K-row boost table back (broadcast) and expands each doc
  * to `floor(boost) + Bernoulli(frac(boost))` copies with the
  * repo-standard md5-uniform (engine-portable, deterministic — the
  * same parity idiom as q74/q78), so the epoch is reproducible
  * row-for-row across engines and runs: no RNG state, no driver
  * round-trip, and the explode emits exactly the rows kept (docs with
  * zero copies are filtered before the sequence, which also avoids
  * Spark's descending `sequence(1, 0)` footgun).
  *
  * Reference analog: none (the reference has no training-data tier);
  * this extends the curation/sampling family (q74-q99, q119-q133).
  */
object MixtureQueries {

  /** Temperature exponent. 0.3 is mT5's published setting — far from
    * both extremes (1 = natural distribution, 0 = uniform). */
  private[operators] val MixAlpha = 0.3

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** Per-domain mixture table: natural char-mass share `p_nat`,
    * tempered share `p_temp`, and the up/down-sampling factor
    * `boost = p_temp / p_nat` that q171 materializes. Char mass (not
    * doc count) is the budget that matters for LM training. */
  private[operators] def mixtureOn(docRel: DataFrame): DataFrame = {
    val base = docRel.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
    val tot = base.agg(sum("chars").as("tot"))
    val p = base.crossJoin(broadcast(tot))
      .withColumn("p_nat", col("chars").cast("double") / col("tot"))
    val z = p.agg(sum(pow(col("p_nat"), MixAlpha)).as("zsum"))
    p.crossJoin(broadcast(z))
      .withColumn("p_temp", pow(col("p_nat"), MixAlpha) / col("zsum"))
      .withColumn("boost", col("p_temp") / col("p_nat"))
      .select(col("lang"), col("n_docs"), col("chars"),
        col("p_nat"), col("p_temp"), col("boost"))
  }

  def q170DomainMixture(spark: SparkSession, dir: String): DataFrame =
    mixtureOn(docs(spark, dir))

  private val mixtureCtes: String =
    s"""d AS (SELECT lang, count(*) AS n_docs,
       |        CAST(sum(n_chars) AS BIGINT) AS chars
       |      FROM documents GROUP BY lang),
       |t AS (SELECT CAST(sum(chars) AS BIGINT) AS tot FROM d),
       |p AS (SELECT lang, n_docs, chars,
       |        CAST(chars AS DOUBLE) / tot AS p_nat
       |      FROM d CROSS JOIN t),
       |z AS (SELECT sum(pow(p_nat, $MixAlpha)) AS zsum FROM p)""".stripMargin

  val domainMixtureSql: String =
    s"""WITH $mixtureCtes
       |SELECT lang, n_docs, chars, p_nat,
       |  pow(p_nat, $MixAlpha) / zsum AS p_temp,
       |  (pow(p_nat, $MixAlpha) / zsum) / p_nat AS boost
       |FROM p CROSS JOIN z""".stripMargin

  /** Q171: the epoch those weights imply, materialized. Each document
    * emits `floor(boost)` guaranteed copies plus one more with
    * probability `frac(boost)`, decided by the doc's md5-uniform — so
    * a boost-3.4 domain's docs appear 3 or 4 times and a boost-0.7
    * domain's appear 0 or 1 times, and the realized char mass per
    * domain concentrates at `p_temp` · total. Deterministic: same
    * corpus → byte-identical epoch, on any partitioning. */
  def q171TemperatureResample(spark: SparkSession, dir: String): DataFrame =
    temperatureResampleOn(docs(spark, dir))

  private[operators] def temperatureResampleOn(docRel: DataFrame): DataFrame = {
    val boosts = mixtureOn(docRel).select("lang", "boost")
    val u = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8),
      16, 10).cast("long")
    docRel.join(broadcast(boosts), "lang")
      .withColumn("n_copies",
        (floor(col("boost")).cast("long") +
          when(u < (col("boost") - floor(col("boost"))) * lit(4294967296.0), 1L)
            .otherwise(0L)))
      .filter(col("n_copies") >= 1)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
  }

  val temperatureResampleSql: String =
    s"""WITH $mixtureCtes,
       |b AS (SELECT lang, (pow(p_nat, $MixAlpha) / zsum) / p_nat AS boost
       |      FROM p CROSS JOIN z),
       |c AS (SELECT doc_id, documents.lang, boost,
       |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS u
       |      FROM documents JOIN b USING (lang)),
       |n AS (SELECT doc_id, lang,
       |        CAST(floor(boost) AS BIGINT) +
       |          (CASE WHEN u < (boost - floor(boost)) * 4294967296.0
       |                THEN 1 ELSE 0 END) AS n_copies
       |      FROM c)
       |SELECT doc_id, lang,
       |  CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy
       |FROM n WHERE n_copies >= 1""".stripMargin

  // ---------------------------------------- q177: epoch-capped budget
  /** Q177: waterfilling allocation of a training char budget across
    * domains under a max-epochs cap — the step AFTER q170 picks target
    * weights: a tempered target can demand more repetition of a
    * low-resource domain than is healthy (or available), so each
    * domain's allocation is capped at `EpochCap` passes over its data
    * and the freed budget redistributes proportionally among uncapped
    * domains (the standard waterfilling solution, e.g. the data-
    * constrained scaling setting of Muennighoff et al. 2023).
    *
    * Exact in one pass: sort domains by `ratio = cap_d / w_d` (the
    * budget scale at which d saturates). Saturation is a PREFIX of
    * that order — if row k fails `ratio_k ≤ λ_k` where
    * `λ_k = (B − Σ_{j<k} cap_j) / Σ_{j≥k} w_j`, algebra gives
    * `λ_{k+1} < λ_k < ratio_k ≤ ratio_{k+1}`, so every later row
    * fails too — which makes the per-row check with window prefix
    * sums equivalent to the iterative algorithm. The final water
    * level `λ* = (B − Σ_sat cap) / Σ_unsat w` prices every uncapped
    * domain, `alloc_d = min(cap_d, w_d · λ*)`.
    *
    * Scale shape: everything after the one domain aggregate is K rows
    * (K = #domains, driver-scale by construction) — the
    * single-partition windows are over K rows, never the corpus. */
  /** 2.5 passes max over any domain's data; with `BudgetMult` = 2× the
    * corpus char mass this splits the fixture's domains into both
    * regimes at every SF (the tempered target asks ~2.5-2.8 epochs of
    * every non-en domain, en ~1.2-1.3) with ≥0.01-epoch margins, so
    * the saturation booleans are float-stable across engines. */
  private[operators] val EpochCap = 2.5
  private[operators] val BudgetMult = 2.0

  def q177CappedMixture(spark: SparkSession, dir: String): DataFrame =
    cappedMixtureOn(docs(spark, dir), BudgetMult, EpochCap)

  private[operators] def cappedMixtureOn(
      docRel: DataFrame, budgetMult: Double, epochCap: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mix = mixtureOn(docRel).select(col("lang"), col("chars"),
      col("p_temp").as("w"))
    val tot = mix.agg(sum("chars").as("tot"))
    val base = mix.crossJoin(broadcast(tot))
      .withColumn("budget", col("tot") * budgetMult)
      .withColumn("cap_chars", col("chars") * epochCap)
      .withColumn("ratio", col("cap_chars") / col("w"))
    val ord = Window.orderBy(col("ratio").asc, col("lang").asc)
    val wf = base
      .withColumn("prefix_cap", coalesce(sum("cap_chars").over(
        ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      .withColumn("suffix_w", sum("w").over(
        ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("saturated",
        col("ratio") <= (col("budget") - col("prefix_cap")) / col("suffix_w"))
    val lam = wf.agg(
        sum(when(col("saturated"), col("cap_chars")).otherwise(0.0)).as("sc"),
        sum(when(!col("saturated"), col("w")).otherwise(0.0)).as("uw"),
        max("budget").as("b"))
      .select(when(col("uw") > 0, (col("b") - col("sc")) / col("uw"))
        .otherwise(lit(0.0)).as("lam_star"))
    wf.crossJoin(broadcast(lam))
      .withColumn("alloc_chars", when(col("saturated"), col("cap_chars"))
        .otherwise(col("w") * col("lam_star")))
      .select(col("lang"), col("chars"), col("w"), col("cap_chars"),
        col("saturated"), col("alloc_chars"),
        (col("alloc_chars") / col("chars")).as("epochs"))
  }

  val cappedMixtureSql: String =
    s"""WITH $mixtureCtes,
       |m AS (SELECT lang, chars, pow(p_nat, $MixAlpha) / zsum AS w
       |      FROM p CROSS JOIN z),
       |t2 AS (SELECT CAST(sum(chars) AS BIGINT) AS tot FROM m),
       |bb AS (SELECT lang, chars, w, tot * $BudgetMult AS budget,
       |         chars * $EpochCap AS cap_chars,
       |         (chars * $EpochCap) / w AS ratio
       |       FROM m CROSS JOIN t2),
       |wf AS (SELECT *,
       |         coalesce(sum(cap_chars) OVER (ORDER BY ratio ASC, lang ASC
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS prefix_cap,
       |         sum(w) OVER (ORDER BY ratio ASC, lang ASC
       |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       |           AS suffix_w
       |       FROM bb),
       |s AS (SELECT *, ratio <= (budget - prefix_cap) / suffix_w AS saturated
       |      FROM wf),
       |l AS (SELECT CASE
       |         WHEN sum(CASE WHEN NOT saturated THEN w ELSE 0 END) > 0
       |         THEN (max(budget)
       |               - sum(CASE WHEN saturated THEN cap_chars ELSE 0 END))
       |              / sum(CASE WHEN NOT saturated THEN w ELSE 0 END)
       |         ELSE 0 END AS lam_star FROM s)
       |SELECT lang, chars, w, cap_chars, saturated,
       |  CASE WHEN saturated THEN cap_chars ELSE w * lam_star END
       |    AS alloc_chars,
       |  (CASE WHEN saturated THEN cap_chars ELSE w * lam_star END) / chars
       |    AS epochs
       |FROM s CROSS JOIN l""".stripMargin

  // ------------------------------------------ q181: dedup mixture shift
  /** Q181: how deduplication SHIFTS the domain mixture — the
    * governance report between the dedup tier and q170's weighting:
    * duplicates are never uniform across domains (a crawl's viral
    * boilerplate concentrates in a few), so the post-dedup natural
    * distribution differs from the raw one, and mixture weights tuned
    * on raw shares silently re-weight the wrong corpus. One row per
    * domain: char mass and share before/after q16's exact dedup
    * (keeper = min doc_id per md5(text) — the SAME rule, so this
    * report is cross-checkable against q16 row-for-row), and the
    * share shift.
    *
    * A subtlety the left join handles: md5 groups can SPAN domains
    * (the same text under two lang tags), and the keeper's domain
    * takes the mass — a domain can legitimately lose everything.
    *
    * Scale shape: one md5 window over hash-sized groups + two K-sized
    * aggregates; broadcast one-row totals. */
  def q181DedupMixtureShift(spark: SparkSession, dir: String): DataFrame =
    dedupMixtureShiftOn(docs(spark, dir))

  private[operators] def dedupMixtureShiftOn(docRel: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val before = docRel.groupBy("lang").agg(sum("n_chars").as("chars_before"))
    val keepers = docRel
      .select(col("doc_id"), col("lang"), col("n_chars"),
        md5(col("text").cast("binary")).as("h"))
      .withColumn("rn",
        row_number().over(Window.partitionBy("h").orderBy("doc_id")))
      .filter(col("rn") === 1)
    val after = keepers.groupBy("lang").agg(sum("n_chars").as("chars_after"))
    val tb = before.agg(sum("chars_before").as("tb"))
    val ta = after.agg(sum("chars_after").as("ta"))
    before.join(after, Seq("lang"), "left")
      .na.fill(0L, Seq("chars_after"))
      .crossJoin(broadcast(tb)).crossJoin(broadcast(ta))
      .select(col("lang"), col("chars_before"), col("chars_after"),
        (col("chars_before").cast("double") / col("tb")).as("share_before"),
        (col("chars_after").cast("double") / col("ta")).as("share_after"),
        (col("chars_after").cast("double") / col("ta")
          - col("chars_before").cast("double") / col("tb")).as("shift"))
  }

  val dedupMixtureShiftSql: String =
    """WITH b AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS chars_before
      |           FROM documents GROUP BY lang),
      |k AS (SELECT lang, n_chars,
      |        row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |      FROM documents),
      |a AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS chars_after
      |      FROM k WHERE rn = 1 GROUP BY lang),
      |tb AS (SELECT CAST(sum(chars_before) AS BIGINT) AS tb FROM b),
      |ta AS (SELECT CAST(sum(chars_after) AS BIGINT) AS ta FROM a)
      |SELECT b.lang, chars_before,
      |  CAST(coalesce(chars_after, 0) AS BIGINT) AS chars_after,
      |  CAST(chars_before AS DOUBLE) / tb AS share_before,
      |  CAST(coalesce(chars_after, 0) AS DOUBLE) / ta AS share_after,
      |  CAST(coalesce(chars_after, 0) AS DOUBLE) / ta
      |    - CAST(chars_before AS DOUBLE) / tb AS shift
      |FROM b LEFT JOIN a USING (lang) CROSS JOIN tb CROSS JOIN ta""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q170_domain_mixture" -> q170DomainMixture _,
    "q171_temperature_resample" -> q171TemperatureResample _,
    "q177_capped_mixture" -> q177CappedMixture _,
    "q181_dedup_mixture_shift" -> q181DedupMixtureShift _)

  val oracles: Map[String, String] = Map(
    "q170_domain_mixture" -> domainMixtureSql,
    "q171_temperature_resample" -> temperatureResampleSql,
    "q177_capped_mixture" -> cappedMixtureSql,
    "q181_dedup_mixture_shift" -> dedupMixtureShiftSql)
}
