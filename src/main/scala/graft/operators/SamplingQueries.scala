package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deterministic sampling operators — the reproducibility-critical tier
  * of a training-data pipeline: train/test splits and corpus mixtures
  * must be stable across reruns, cluster sizes, and engines, so the
  * "randomness" is a content hash, never `rand()`.
  *
  * The hash is md5-derived (engine-portable, like every hash in this
  * codebase): bucket(id) = first-8-hex-chars(md5(id)) mod 100, giving a
  * uniform 0..99 percentile per row that DuckDB reproduces exactly.
  */
object SamplingQueries {

  /** Uniform hash bucket of an id column (default 0..99 percentile) —
    * the one deterministic split primitive every consumer shares
    * (q36/q37 sampling, q48 contamination split, q49 packing groups). */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(id.cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long"), lit(buckets.toLong))

  private def duckBucket(idExpr: String): String =
    s"(('0x' || substr(md5(CAST($idExpr AS VARCHAR)), 1, 8))::BIGINT % 100)"

  /** Q36: stable 10% sample of events, stratified audit by type —
    * the deterministic train/test-split primitive. Rerunning on any
    * cluster yields byte-identical membership. */
  def q36HashSample(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .withColumn("bucket", hashBucket(col("event_id")))
    ev.where(col("bucket") < 10)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sampled"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
  }

  val q36Sql: String =
    s"""SELECT event_type, count(*) AS n_sampled,
       |  min(event_id) AS min_id, max(event_id) AS max_id
       |FROM events WHERE ${duckBucket("event_id")} < 10
       |GROUP BY event_type""".stripMargin

  /** Q37: corpus mixture sampling — per-language acceptance rates (the
    * up/down-weighting step when composing a training mix), again by
    * content hash so the mix is reproducible. */
  def q37MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val rate = when(col("lang") === "en", 80)
      .when(col("lang") === "de", 50)
      .otherwise(20)
    Tables(spark, dir, "documents")
      .withColumn("bucket", hashBucket(col("doc_id")))
      .where(col("bucket") < rate)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("chars_kept"))
      .withColumn("chars_kept", col("chars_kept").cast("long"))
  }

  val q37Sql: String =
    s"""SELECT lang, count(*) AS n_kept,
       |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
       |FROM documents
       |WHERE ${duckBucket("doc_id")} <
       |  CASE WHEN lang = 'en' THEN 80 WHEN lang = 'de' THEN 50 ELSE 20 END
       |GROUP BY lang""".stripMargin

  // --------------------------------------------- q74 reservoir sample
  private val ReservoirK = 5

  /** Q74: exact-k deterministic reservoir sample per group — "exactly k
    * uniformly-chosen events per type, reproducibly". Hash-threshold
    * sampling (q36) keeps a ~p% slice whose SIZE varies with the data;
    * a reservoir returns exactly k, which is what mixture recipes and
    * eval-set carving actually specify.
    *
    * The uniform key is the full md5-derived 32-bit value (the
    * continuum behind [[hashBucket]]'s percentile), and selection is
    * the bounded-buffer [[graft.functions.TopKAggregator]]: ≤ k
    * candidates per group per partition travel through the shuffle —
    * the classic distributed-reservoir shape — while the oracle's
    * row_number window sorts EVERY row of every group. Determinism
    * makes the sample identical across engines, reruns, and cluster
    * sizes, which is exactly the property `rand()`-based reservoirs
    * lose. */
  def q74ReservoirSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Encoders
    val u = conv(substring(md5(col("event_id").cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val topk = udaf(new graft.functions.TopKAggregator(ReservoirK),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    Tables(spark, dir, "events")
      .select(col("event_type"), u.cast("double").as("u"), col("event_id"))
      .groupBy("event_type")
      .agg(topk(col("u"), col("event_id")).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), col("col._2").as("event_id"),
        (col("pos") + 1).cast("long").as("rn"),
        col("col._1").cast("long").as("u"))
  }

  val q74Sql: String =
    s"""WITH s AS (SELECT event_type, event_id,
       |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT AS u
       |  FROM events),
       |r AS (SELECT event_type, event_id, u,
       |    row_number() OVER (PARTITION BY event_type ORDER BY u DESC, event_id) AS rn
       |  FROM s)
       |SELECT event_type, event_id, CAST(rn AS BIGINT) AS rn, u
       |FROM r WHERE rn <= $ReservoirK""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_hash_sample" -> q36HashSample _,
    "q37_mixture_sample" -> q37MixtureSample _,
    "q74_reservoir_sample" -> q74ReservoirSample _)

  val oracles: Map[String, String] = Map(
    "q36_hash_sample" -> q36Sql,
    "q37_mixture_sample" -> q37Sql,
    "q74_reservoir_sample" -> q74Sql)
}
