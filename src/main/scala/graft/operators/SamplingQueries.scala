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

  private[operators] def duckBucket(idExpr: String): String =
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

  // ---------------------------------------------- q78 weighted sample
  private val WeightedK = 5
  private val MaxWeight = 8

  /** Q78: weighted sampling per language — longer documents should win
    * a slot proportionally more often (the importance-weighting move
    * when carving eval slices or re-balancing a mixture), but the draw
    * must stay deterministic and engine-portable: no `rand()`, and no
    * Efraimidis–Spirakis `ln(u)/w` keys either — libm `ln` is not
    * bit-portable across engines. Instead the priority is **max of w
    * salted hashes**: a document of integer weight w gets w independent
    * uniform draws `hash(doc_id || '#' || i)`, i < w, and keeps the
    * max. All Σw draws across the group are iid uniform, so the
    * group's argmax lands on document i with probability exactly
    * wᵢ/Σw — the weighted-sampling guarantee in pure integer
    * arithmetic.
    *
    * Scale shape: the ≤[[MaxWeight]]× draw explode is map-side and
    * bounded; the per-doc max is a partial-aggregating groupBy on
    * doc_id (uniform keys); selection reuses q74's bounded-buffer
    * top-k aggregate, so ≤ k rows per (lang, partition) cross the
    * final shuffle while the oracle's row_number window sorts every
    * row. */
  def q78WeightedSample(spark: SparkSession, dir: String): DataFrame =
    q78WeightedSampleOn(Tables(spark, dir, "documents"))

  private[operators] def q78WeightedSampleOn(docRel: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    val d = docRel
      .select(col("lang"), col("doc_id"),
        least(floor(col("n_chars") / 100) + 1, lit(MaxWeight)).cast("int").as("w"))
    val u = conv(substring(md5(
      concat(col("doc_id").cast("string"), lit("#"), col("i").cast("string"))
        .cast("binary")), 1, 8), 16, 10).cast("long")
    val prio = d
      .select(col("lang"), col("doc_id"), explode(sequence(lit(0), col("w") - 1)).as("i"))
      .select(col("lang"), col("doc_id"), u.as("u"))
      .groupBy("lang", "doc_id").agg(max("u").as("prio"))
    val topk = udaf(new graft.functions.TopKAggregator(WeightedK),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    prio
      .groupBy("lang")
      .agg(topk(col("prio").cast("double"), col("doc_id")).as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), col("col._2").as("doc_id"),
        (col("pos") + 1).cast("long").as("rn"),
        col("col._1").cast("long").as("prio"))
  }

  val q78Sql: String =
    s"""WITH d AS (SELECT lang, doc_id,
       |    least(n_chars // 100 + 1, $MaxWeight) AS w FROM documents),
       |dr AS (SELECT lang, doc_id, unnest(range(w)) AS i FROM d),
       |u AS (SELECT lang, doc_id,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(i AS VARCHAR)), 1, 8))::BIGINT AS u
       |  FROM dr),
       |p AS (SELECT lang, doc_id, max(u) AS prio FROM u GROUP BY 1, 2),
       |r AS (SELECT lang, doc_id, prio,
       |    row_number() OVER (PARTITION BY lang ORDER BY prio DESC, doc_id) AS rn
       |  FROM p)
       |SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn, prio
       |FROM r WHERE rn <= $WeightedK""".stripMargin

  // ------------------------------------------- q86 epoch shuffle order
  /** Shard count for the epoch shuffle. At corpus scale this is set so
    * one shard's rows fit an executor's sort buffer (e.g. thousands of
    * shards for 100 TB); 16 keeps the testdata shape realistic. */
  val ShuffleShards = 16

  /** Q86: deterministic epoch shuffle — the training-order assignment a
    * data loader consumes. Every doc gets an epoch-salted hash
    * priority; shard = priority mod [[ShuffleShards]], and the order
    * WITHIN a shard is the priority order. Together (shard, ord) is a
    * reproducible global permutation: same corpus + same epoch salt →
    * byte-identical order on any cluster, any partition count — and a
    * different salt (epoch number) gives an independent permutation,
    * which is exactly how you reshuffle between epochs without a
    * stateful shuffle service.
    *
    * Scale: the only heavy op is the per-shard `row_number` sort —
    * corpus/shards rows each, embarrassingly parallel across shards;
    * no global sort ever happens, and shard count is the knob that
    * bounds per-task memory. */
  def q86EpochShuffle(spark: SparkSession, dir: String): DataFrame =
    q86EpochShuffleOn(Tables(spark, dir, "documents"))

  private[operators] def q86EpochShuffleOn(docRel: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = conv(substring(md5(
      concat(col("doc_id").cast("string"), lit("#ep0")).cast("binary")), 1, 8), 16, 10)
      .cast("long")
    docRel
      .select(col("doc_id"), u.as("u"))
      .withColumn("shard", pmod(col("u"), lit(ShuffleShards.toLong)))
      .withColumn("ord", row_number()
        .over(Window.partitionBy("shard").orderBy(col("u"), col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("shard"), col("ord"))
  }

  val q86Sql: String =
    s"""WITH u AS (SELECT doc_id,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#ep0'), 1, 8))::BIGINT AS u
       |  FROM documents),
       |s AS (SELECT doc_id, u, u % $ShuffleShards AS shard FROM u)
       |SELECT doc_id, shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY u, doc_id) AS BIGINT) AS ord
       |FROM s""".stripMargin

  // --------------------------------------- q99 stratified exact sample
  /** Target sample size across all strata. */
  private val StratTarget = 100L

  /** Q99: stratified proportional sampling with EXACT per-stratum
    * allocation — each source contributes
    * `max(1, floor(T · N_h / N))` documents (floor allocation, every
    * stratum represented), chosen as the first n_h in the stratum's
    * deterministic md5 order. Unlike q36's bucket filter (whose
    * per-stratum counts are binomially distributed around the rate),
    * the allocation here is a hard quota — the shape mixture
    * dashboards and eval-set builders need.
    *
    * Scale shape: stratum sizes are one map-side-combined aggregate
    * that broadcasts back; selection is a rank window per stratum.
    * The md5 order key makes membership reproducible on any cluster,
    * and per-stratum windows sort only their own rows (AQE splits a
    * hot stratum; q74's bounded top-k aggregate is the swap-in for
    * pathological skew — only n_h rows per stratum matter). */
  def q99StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    q99StratifiedSampleOn(Tables(spark, dir, "documents"))

  private[operators] def q99StratifiedSampleOn(docRel: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docRel.select(col("doc_id"), col("source"),
      md5(col("doc_id").cast("string").cast("binary")).as("h"))
    val sizes = d.groupBy("source").agg(count(lit(1)).as("n_h"))
    val total = sizes.agg(sum("n_h").as("n"))
    val quota = sizes.crossJoin(broadcast(total))
      .select(col("source"),
        greatest(lit(1L),
          call_function("div", lit(StratTarget) * col("n_h"), col("n"))).as("quota"))
    val w = Window.partitionBy("source").orderBy("h", "doc_id")
    d.withColumn("rk", row_number().over(w).cast("long"))
      .join(broadcast(quota), "source")
      .where(col("rk") <= col("quota"))
      .select(col("doc_id"), col("source"), col("rk"), col("quota"))
  }

  val q99Sql: String =
    s"""WITH d AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
       |sz AS (SELECT source, count(*) AS n_h FROM d GROUP BY 1),
       |t AS (SELECT sum(n_h) AS n FROM sz),
       |q AS (SELECT source, greatest(1, ($StratTarget * n_h) // n) AS quota FROM sz, t),
       |r AS (SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk FROM d)
       |SELECT r.doc_id, r.source, CAST(r.rk AS BIGINT) AS rk, CAST(q.quota AS BIGINT) AS quota
       |FROM r JOIN q USING (source) WHERE r.rk <= q.quota""".stripMargin

  // --------------------------------------- q119 training negatives
  /** Negatives per query. */
  val NegativesK = 4
  /** Every NegQueryMod-th document is a "query" (1%). */
  val NegQueryMod = 100

  /** Q119: deterministic negative sampling for contrastive training —
    * every query document draws [[NegativesK]] pseudo-random corpus
    * documents as negatives, reproducibly (same corpus → same
    * negatives, any partitioning, any rerun — the q86 determinism
    * contract applied to pair mining). Draw i of query q is
    * md5(q·'#'·i) mod N, with the accidental self-draw remapped to the
    * next id — collision-free by construction.
    *
    * Contract: ids must be dense [0, N) (the testdata layout;
    * production corpora get one from a one-time contiguous-id
    * assignment — the standard move before any rank-free sampling).
    *
    * Scale shape: queries are a filter, draws a NegativesK-wide
    * map-only explode, N a broadcast 1-row count; resolving the drawn
    * id to its document is ONE uniform-key equi-join (md5 draws are
    * uniform — no hot negative). Nothing sorts, nothing windows. */
  def q119Negatives(spark: SparkSession, dir: String): DataFrame =
    negativesOn(Tables(spark, dir, "documents"))

  private[graft] def negativesOn(docRel: DataFrame): DataFrame = {
    val n = docRel.agg(count(lit(1)).as("n_docs"))
    val draws = docRel
      .where(pmod(col("doc_id"), lit(NegQueryMod.toLong)) === 0)
      .select(col("doc_id").as("query_id"))
      .crossJoin(broadcast(n))
      .select(col("query_id"), col("n_docs"),
        explode(sequence(lit(1), lit(NegativesK))).as("neg_idx"))
    val raw = pmod(
      conv(substring(md5(concat(col("query_id").cast("string"), lit("#"),
        col("neg_idx").cast("string")).cast("binary")), 1, 12), 16, 10).cast("long"),
      col("n_docs"))
    val negId = when(raw === col("query_id"),
      pmod(raw + 1, col("n_docs"))).otherwise(raw)
    draws
      .select(col("query_id"), col("neg_idx").cast("long").as("neg_idx"),
        negId.as("neg_id"))
      .join(docRel.select(col("doc_id").as("neg_id"), col("source").as("neg_source")),
        "neg_id")
      .select(col("query_id"), col("neg_idx"), col("neg_id"), col("neg_source"))
  }

  val q119Sql: String =
    s"""WITH n AS (SELECT count(*) AS n_docs FROM documents),
       |q AS (SELECT doc_id AS query_id FROM documents WHERE doc_id % $NegQueryMod = 0),
       |d AS (SELECT query_id, n_docs, unnest(range(1, ${NegativesK + 1})) AS neg_idx
       |  FROM q CROSS JOIN n),
       |r AS (SELECT query_id, CAST(neg_idx AS BIGINT) AS neg_idx, n_docs,
       |    ('0x' || substr(md5(CAST(query_id AS VARCHAR) || '#' || CAST(neg_idx AS VARCHAR)), 1, 12))::BIGINT
       |      % n_docs AS raw
       |  FROM d),
       |x AS (SELECT query_id, neg_idx,
       |    CASE WHEN raw = query_id THEN (raw + 1) % n_docs ELSE raw END AS neg_id
       |  FROM r)
       |SELECT x.query_id, x.neg_idx, x.neg_id, doc.source AS neg_source
       |FROM x JOIN documents doc ON x.neg_id = doc.doc_id""".stripMargin

  // --------------------------------------- q127 DSIR importance weights
  /** Hashed-feature space for the importance model. 64 buckets is the
    * demo size; DSIR's published recipe uses 10k hashed bigram buckets —
    * the shape is identical, the constant is the knob. */
  private val DsirBuckets = 64
  private val DsirTargetLang = "en"

  /** Q127: importance weights for Data Selection via Importance
    * Resampling (Xie et al. 2023) — score every document by how much
    * more likely its hashed-unigram bag is under the TARGET distribution
    * (here the `en` subset, standing in for "looks like the eval
    * domain") than under the RAW corpus distribution. Selection is then
    * just [[q78WeightedSample]] on `exp(log_weight)` — this query
    * produces the weights, the sampling tier already owns the draw.
    *
    * log w(doc) = Σ_tok ln( p̂_target[h(tok)] / p̂_raw[h(tok)] ), with
    * both distributions Laplace-smoothed (+1 over [[DsirBuckets]]) so a
    * bucket unseen in the target corpus penalizes but never −∞.
    *
    * Scale shape: the corpus collapses ONCE to per-doc bucket counts
    * (≤ [[DsirBuckets]] rows per doc — the persisted relation is
    * docs×64-bounded, not token-level); both global distributions are
    * 64-row aggregations OF that relation (no rescan), and scoring is a
    * broadcast join of the 64-row log-ratio table back to it. Per-bucket
    * log-ratios are rounded to 12 dp before the per-doc DECIMAL sum so
    * the result is partition-order independent and engine-portable. */
  def q127DsirWeights(spark: SparkSession, dir: String): DataFrame =
    dsirWeightsOn(Tables(spark, dir, "documents"))

  private[operators] def dsirWeightsOn(docRel: DataFrame): DataFrame = {
    val b = DsirBuckets.toLong
    val feat = graft.core.Caches.persistTracked(docRel
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.TextExprs.tokens(col("text"))).as("tok"))
      .withColumn("bucket", hashBucket(col("tok"), DsirBuckets))
      .groupBy("doc_id", "lang", "bucket").agg(count(lit(1)).as("cnt")))
    val rawCnt = feat.groupBy("bucket").agg(sum("cnt").as("r_cnt"))
    val tgtCnt = feat.where(col("lang") === DsirTargetLang)
      .groupBy("bucket").agg(sum("cnt").as("t_cnt"))
    val totR = rawCnt.agg(sum("r_cnt").as("tot_r"))
    val totT = tgtCnt.agg(sum("t_cnt").as("tot_t"))
    // Arithmetic arrangement mirrored EXACTLY in the oracle SQL: IEEE
    // mul/div are correctly rounded (engine-portable); only the ln needs
    // the 12-dp round.
    val lw = rawCnt.join(tgtCnt, Seq("bucket"), "left")
      .crossJoin(broadcast(totR)).crossJoin(broadcast(totT))
      .select(col("bucket"),
        round(log(
          ((coalesce(col("t_cnt"), lit(0L)) + lit(1L)).cast("double")
            * (col("tot_r") + lit(b)).cast("double"))
          / ((col("r_cnt") + lit(1L)).cast("double")
            * (col("tot_t") + lit(b)).cast("double"))), 12).as("lw"))
    feat.join(broadcast(lw), "bucket")
      .groupBy("doc_id", "lang")
      .agg(sum("cnt").as("n_tokens"),
        round(sum((col("cnt") * col("lw")).cast("decimal(28,12)"))
          .cast("double"), 6).as("log_weight"))
  }

  val q127Sql: String =
    s"""WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |f AS (SELECT doc_id, lang,
       |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % $DsirBuckets AS bucket,
       |    count(*) AS cnt
       |  FROM tok GROUP BY 1, 2, 3),
       |r AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS r_cnt FROM f GROUP BY 1),
       |t AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS t_cnt
       |  FROM f WHERE lang = '$DsirTargetLang' GROUP BY 1),
       |tot AS (SELECT (SELECT CAST(sum(r_cnt) AS BIGINT) FROM r) AS tot_r,
       |    (SELECT CAST(coalesce(sum(t_cnt), 0) AS BIGINT) FROM t) AS tot_t),
       |lw AS (SELECT r.bucket,
       |    round(ln(
       |      (CAST(coalesce(t.t_cnt, 0) + 1 AS DOUBLE)
       |        * CAST(tot.tot_r + $DsirBuckets AS DOUBLE))
       |      / (CAST(r.r_cnt + 1 AS DOUBLE)
       |        * CAST(tot.tot_t + $DsirBuckets AS DOUBLE))), 12) AS lw
       |  FROM r LEFT JOIN t USING (bucket) CROSS JOIN tot)
       |SELECT doc_id, lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |  round(CAST(sum(CAST(cnt * lw AS DECIMAL(28,12))) AS DOUBLE), 6) AS log_weight
       |FROM f JOIN lw USING (bucket) GROUP BY 1, 2""".stripMargin

  // ------------------------------------- q137 temperature mixture
  /** Sampling temperature: 1.0 reproduces the natural mix, 0 is
    * uniform. 0.7 is the published multilingual default. */
  private val MixTau = 0.7

  /** Q137: temperature-scaled mixture weights — the standard recipe for
    * rebalancing a multi-source corpus (mC4 / XLM-R: sample source s
    * with probability ∝ p_s^τ, τ < 1) so head sources stop drowning the
    * tail without the tail being upsampled to parity. Output per
    * source: natural share `p_raw`, normalized sampling `weight`, and
    * `boost` = weight/p_raw — the up/down-sampling factor a sampler
    * (q37's acceptance shape) would apply.
    *
    * Scale: one corpus pass collapses to a |sources|-row relation
    * (persisted; the total, the normalizer, and the readout all derive
    * from it), so the temperature math is driver-free arithmetic over
    * bounded keys. The one transcendental (pow) is rounded to 12 dp and
    * the normalizer sums DECIMAL(28,12) — the q103/q128 portability
    * contract. */
  def q137TempMixture(spark: SparkSession, dir: String): DataFrame =
    tempMixtureOn(Tables(spark, dir, "documents"))

  private[graft] def tempMixtureOn(docRel: DataFrame): DataFrame = {
    val tc = graft.core.Caches.persistTracked(
      docRel
        .select(col("source"),
          size(graft.functions.TextExprs.tokens(col("text"))).cast("long").as("n_tok"))
        .groupBy("source").agg(sum("n_tok").as("n_tokens")))
    val tot = tc.agg(sum("n_tokens").as("n"))
    val p = tc.crossJoin(broadcast(tot))
      .withColumn("p_raw", col("n_tokens").cast("double") / col("n").cast("double"))
      .withColumn("pt", round(pow(col("p_raw"), lit(MixTau)), 12))
    val z = p.agg(sum(col("pt").cast("decimal(28,12)")).cast("double").as("z"))
    p.crossJoin(broadcast(z))
      .select(col("source"), col("n_tokens"),
        round(col("p_raw"), 6).as("p_raw"),
        round(col("pt") / col("z"), 6).as("weight"),
        round(col("pt") / col("z") / col("p_raw"), 6).as("boost"))
  }

  val q137Sql: String =
    s"""WITH tc AS (SELECT source,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS n FROM tc),
       |p AS (SELECT source, n_tokens,
       |    CAST(n_tokens AS DOUBLE) / CAST(n AS DOUBLE) AS p_raw,
       |    round(power(CAST(n_tokens AS DOUBLE) / CAST(n AS DOUBLE), $MixTau), 12) AS pt
       |  FROM tc CROSS JOIN tot),
       |z AS (SELECT CAST(sum(CAST(pt AS DECIMAL(28,12))) AS DOUBLE) AS z FROM p)
       |SELECT source, n_tokens, round(p_raw, 6) AS p_raw,
       |  round(pt / z, 6) AS weight, round(pt / z / p_raw, 6) AS boost
       |FROM p CROSS JOIN z""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q127_dsir_weights" -> q127DsirWeights _,
    "q137_temp_mixture" -> q137TempMixture _,
    "q99_stratified_sample" -> q99StratifiedSample _,
    "q36_hash_sample" -> q36HashSample _,
    "q37_mixture_sample" -> q37MixtureSample _,
    "q74_reservoir_sample" -> q74ReservoirSample _,
    "q78_weighted_sample" -> q78WeightedSample _,
    "q86_epoch_shuffle" -> q86EpochShuffle _,
    "q119_negatives" -> q119Negatives _)

  val oracles: Map[String, String] = Map(
    "q127_dsir_weights" -> q127Sql,
    "q137_temp_mixture" -> q137Sql,
    "q99_stratified_sample" -> q99Sql,
    "q36_hash_sample" -> q36Sql,
    "q37_mixture_sample" -> q37Sql,
    "q74_reservoir_sample" -> q74Sql,
    "q78_weighted_sample" -> q78Sql,
    "q86_epoch_shuffle" -> q86Sql,
    "q119_negatives" -> q119Sql)
}
