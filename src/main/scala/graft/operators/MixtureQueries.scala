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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q170_domain_mixture" -> q170DomainMixture _,
    "q171_temperature_resample" -> q171TemperatureResample _)

  val oracles: Map[String, String] = Map(
    "q170_domain_mixture" -> domainMixtureSql,
    "q171_temperature_resample" -> temperatureResampleSql)
}
