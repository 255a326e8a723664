package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{TopKAggregator, VectorExprs}
import graft.functions.VectorExprs.cosine

/** Similarity search over the `embeddings` table (`array<float>` vectors).
  *
  * Three tiers:
  *  - brute-force cosine top-k — the correctness baseline; the query set
  *    is small and broadcast, so the big side streams through one
  *    scan with no shuffle of the corpus;
  *  - IVF (inverted-file) ANN — the 100 TB path: vectors are assigned to
  *    coarse centroids, queries probe only their nearest nprobe centroid
  *    buckets, so per-query work is |corpus|/C × nprobe instead of
  *    |corpus|;
  *  - IVF-bucketed cosine near-dup pairs — embedding-level dedup whose
  *    candidate set is pairs sharing a centroid bucket (multi-assigned),
  *    never the all-pairs cross product.
  *
  * Centroid handling is Faiss-shaped: the codebook ([[NumCentroids]]
  * vectors — at scale the output of a k-means training job) is collected
  * once to the driver and inlined as literals, so centroid scoring is a
  * narrow, whole-stage-codegen'd projection with ZERO shuffle (the
  * literal-side norms constant-fold). Every top-k extraction goes
  * through [[TopKAggregator]] — a bounded-buffer partial aggregation
  * that carries at most k rows per group per partition through the
  * shuffle, instead of a `row_number` window that would shuffle and
  * fully sort every scored row into |queries| partitions.
  */
object SimilarityQueries {

  private val NumQueries = 10
  private val TopK = 5
  private[graft] val NumCentroids = 16
  private val NProbe = 4
  private val NearDupThreshold = 0.4
  private val NearDupProbes = 2

  /** Widened ([[graft.core.Par.widen]]): normalization + codebook
    * scoring cost K dots PER ROW — CPU-bound, so the bytes-sized scan
    * partitioning serializes it on a small-file corpus (r19 profile at
    * sf0.1: q188's √N-codebook assignment ran 9.2 s on ONE task while
    * 31 cores idled). At scale the scan is already wide — identity. */
  private def emb(spark: SparkSession, dir: String): DataFrame =
    graft.core.Par.widen(Tables(spark, dir, "embeddings"))

  // ------------------------------------------------- centroid codebook
  /** Collect the coarse centroids to the driver — [[NumCentroids]] rows,
    * bounded by construction (the IVF codebook is always
    * memory-resident, like a Faiss quantizer; this is NOT a corpus
    * collect). */
  private[graft] def centroidList(e: DataFrame): Seq[(Long, Seq[Double])] =
    e.where(col("vec_id") < NumCentroids)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).toSeq

  /** Bucket-assign an embedding batch against a given codebook —
    * (n_id, n_vec, bkt), the IVF index relation q21/q139 join on and
    * [[graft.sources.VectorIndexStore]] persists per day. */
  private[graft] def ivfAssign(batch: DataFrame,
      cents: Seq[(Long, Seq[Double])]): DataFrame =
    batch
      .withColumn("__c", topCentroids(centroidScores(col("embedding"), cents), 1))
      .select(col("vec_id").as("n_id"), col("embedding").as("n_vec"),
        (-col("__c.negid")).as("bkt"))

  /** Per-row (cosine, -centroid_id) struct per codebook entry — a narrow
    * codegen'd projection against literal centroids; the literal-side
    * norms constant-fold, so each row costs one dot per centroid. */
  private def centroidScores(vec: Column, cents: Seq[(Long, Seq[Double])]): Column =
    array(cents.map { case (cid, cv) =>
      struct(cosine(vec, typedlit(cv)).as("cc"), lit(-cid).as("negid"))
    }: _*)

  /** The m nearest centroids, exploded — ordering is cosine desc then
    * centroid id asc (ascending struct sort on (cc, -id), reversed). */
  private def topCentroids(scores: Column, m: Int): Column =
    explode(slice(reverse(array_sort(scores)), 1, m))

  /** Non-nullable join-key wrapper. Every equi-join makes Catalyst
    * infer `IsNotNull(key)` on both sides, and predicate pushdown
    * SUBSTITUTES a derived key's defining expression into the pushed
    * filter — for keys derived by codebook scoring ([[scaledScores]])
    * or PQ coding ([[pqCode]], a k'-dot CASE chain) the whole scoring
    * pass re-evaluates a second time below the join (r19 plan audit:
    * q188's scan stage carried `isnotnull(<100-centroid transform>)`,
    * q80/q82/q195 carried `isnotnull(CASE WHEN …)` over the full PQ
    * chain — the assignment computed twice per row). The sentinel is
    * unreachable (bucket/code ids are ≥ 0) so values never change; the
    * coalesce only flips nullability, and a non-nullable key infers no
    * filter. Keys produced BY a generator ([[topCentroids]]' explode)
    * don't need this — substitution cannot cross a Generate. Output
    * columns of oracle-checked queries (q79's `code`) are left
    * untouched: this is a join-key-site wrapper, not a pqCode change. */
  private def nnKey(c: Column): Column = coalesce(c, lit(-1L))

  // ------------------------------------------------------- shared top-k
  /** Top-k rows per q_id from (q_id, n_id, cos) via the bounded-buffer
    * [[TopKAggregator]]: partial aggregation keeps ≤ k candidates per
    * group per partition ahead of the shuffle. Ties break on n_id; rank
    * is the buffer position (identical to `row_number` over
    * (cos desc, n_id)). */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    scored.groupBy("q_id")
      .agg(topk(col("cos"), col("n_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col._2").as("n_id"),
        (col("pos") + 1).cast("long").as("rn"),
        round(col("col._1"), 6).as("sim"))
  }

  // ------------------------------------------------- brute-force top-k
  /** Exact cosine top-k: for each of the first [[NumQueries]] vectors,
    * the [[TopK]] nearest others. Queries are broadcast; the corpus
    * streams through one narrow scoring pass into the partial top-k
    * aggregation — no corpus shuffle, no window sort. */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val scored = e.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
      .join(broadcast(q), col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), cosine(col("q_vec"), col("n_vec")).as("cos"))
    topK(scored, TopK)
  }

  val cosineTopKSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NumQueries),
       |p AS (SELECT q_id, e.vec_id AS n_id,
       |    list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS c
       |  FROM q JOIN e ON q.q_id != e.vec_id),
       |r AS (SELECT q_id, n_id, c, row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) AS rn FROM p)
       |SELECT q_id, n_id, rn, round(c, 6) AS sim FROM r WHERE rn <= $TopK""".stripMargin

  // --------------------------------------------------------- IVF ANN
  /** IVF-style approximate nearest neighbor: the first [[NumCentroids]]
    * vectors serve as the codebook (deterministic "training"); every
    * vector is narrowly assigned to its nearest centroid, queries probe
    * their [[NProbe]] nearest buckets only. The corpus is scanned once —
    * assignment is a literal-centroid projection, the probe join is a
    * broadcast hash join on bucket id, and the final top-k is a partial
    * aggregation. Never all-pairs, never a corpus-wide sort. */
  def ivfAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val cents = centroidList(e)
    val assign = e
      .withColumn("__c", topCentroids(centroidScores(col("embedding"), cents), 1))
      .select(col("vec_id").as("n_id"), col("embedding").as("n_vec"),
        (-col("__c.negid")).as("bkt"))
    val probes = e.where(col("vec_id") < NumQueries)
      .withColumn("__c", topCentroids(centroidScores(col("embedding"), cents), NProbe))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        (-col("__c.negid")).as("bkt"))
    val scored = assign.join(broadcast(probes), "bkt")
      .where(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), cosine(col("q_vec"), col("n_vec")).as("cos"))
    topK(scored, TopK)
  }

  val ivfAnnSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NumCentroids),
       |ac AS (SELECT e.vec_id, e.v, c_id,
       |    list_dot_product(v, cv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) AS cc,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      list_dot_product(v, cv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) DESC, c_id) AS arn
       |  FROM e CROSS JOIN cent),
       |assign AS (SELECT vec_id AS n_id, v AS nv, c_id AS bkt FROM ac WHERE arn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NumQueries),
       |qp AS (SELECT q_id, qv, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY
       |      list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) DESC, c_id) AS prn
       |  FROM q CROSS JOIN cent),
       |probes AS (SELECT q_id, qv, c_id AS bkt FROM qp WHERE prn <= $NProbe),
       |p AS (SELECT q_id, n_id,
       |    list_dot_product(qv, nv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS c
       |  FROM probes JOIN assign USING (bkt) WHERE q_id != n_id),
       |r AS (SELECT q_id, n_id, c, row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) AS rn FROM p)
       |SELECT q_id, n_id, rn, round(c, 6) AS sim FROM r WHERE rn <= $TopK""".stripMargin

  // --------------------------------------------------- incremental IVF probe
  /** Q139: the vector-tier DAILY path — q73's incremental shape for
    * embeddings: the corpus side (vec_id % 5 ≠ 0) is the PERSISTED IVF
    * index (bucket assignments computed once at build time; production
    * reads them from parquet exactly like q73 reads the band index),
    * and the day's fresh batch (vec_id % 5 = 0) probes its [[NProbe]]
    * nearest buckets for top-[[TopK]] neighbors — the whole batch, not
    * a query sample: a daily near-dup/link pass probes everything new.
    *
    * The codebook is the model artifact both sides share (first
    * [[NumCentroids]] vectors, the q21 convention): assignments made at
    * index-build time stay valid for every later probe, which is what
    * makes the index INCREMENTAL — day N+1 appends its own assignments
    * without touching day ≤ N. Scale: identical to q21 — narrow
    * literal-codebook assignment, broadcast probe join on bucket id,
    * bounded top-k partial aggregation; the corpus is never rescored,
    * only the probed buckets. */
  def q139IvfProbe(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    ivfProbeOn(e.where(pmod(col("vec_id"), lit(5)) === 0),
      e.where(pmod(col("vec_id"), lit(5)) =!= 0), e)
  }

  /** The probe kernel behind q139, store-aware: when a
    * [[graft.sources.VectorIndexStore]] is configured and fresh for
    * (corpus, idx), the codebook and bucket assignments are READ
    * (codebook = K driver rows, assignments = the persisted index
    * relation) instead of re-derived — the persisted values are the
    * same raw vectors/ids, so the store path stays inside q139's
    * oracle contract. Fallback is the inline derivation: a stale
    * store costs an assignment pass, never a wrong neighbor. */
  private[graft] def ivfProbeOn(fresh: DataFrame, idx: DataFrame,
      corpus: DataFrame): DataFrame = {
    val (cents, assign) =
      graft.sources.VectorIndexStore.openFresh(corpus, idx).getOrElse {
        val c = centroidList(corpus)
        (c, ivfAssign(idx, c))
      }
    val probes = fresh
      .withColumn("__c", topCentroids(centroidScores(col("embedding"), cents), NProbe))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"),
        (-col("__c.negid")).as("bkt"))
    val scored = assign.join(broadcast(probes), "bkt")
      .select(col("q_id"), col("n_id"), cosine(col("q_vec"), col("n_vec")).as("cos"))
    topK(scored, TopK)
  }

  val q139Sql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NumCentroids),
       |idx AS (SELECT vec_id, v FROM e WHERE vec_id % 5 != 0),
       |ac AS (SELECT idx.vec_id, idx.v, c_id,
       |    row_number() OVER (PARTITION BY idx.vec_id ORDER BY
       |      list_dot_product(v, cv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) DESC, c_id) AS arn
       |  FROM idx CROSS JOIN cent),
       |assign AS (SELECT vec_id AS n_id, v AS nv, c_id AS bkt FROM ac WHERE arn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 5 = 0),
       |qp AS (SELECT q_id, qv, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY
       |      list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) DESC, c_id) AS prn
       |  FROM q CROSS JOIN cent),
       |probes AS (SELECT q_id, qv, c_id AS bkt FROM qp WHERE prn <= $NProbe),
       |p AS (SELECT q_id, n_id,
       |    list_dot_product(qv, nv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS c
       |  FROM probes JOIN assign USING (bkt)),
       |r AS (SELECT q_id, n_id, c, row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) AS rn FROM p)
       |SELECT q_id, n_id, rn, round(c, 6) AS sim FROM r WHERE rn <= $TopK""".stripMargin

  // ------------------------------------------- q188 data-scaled-K IVF
  /** Q188: q139's daily IVF probe at DATA-SCALED codebook size
    * K = max(16, ⌈√N⌉) — the Faiss sizing rule (K ∝ √N keeps expected
    * bucket occupancy √N, so probe cost per query is nprobe·√N and the
    * bucket join stays LINEAR in corpus where q139's oracle-pinned
    * K=16 goes quadratic; VERDICT r12 what's-wrong 2: the production
    * plan shape should be a tested artifact, not a SCALE.md paragraph).
    * Rows-only by design — K is data-dependent, so no single SQL text
    * expresses it across SFs; SimilaritySpec pins recall@k against the
    * exact brute-force ground truth instead (the q136 pattern).
    *
    * The K-literal expression tree q21 builds would not survive K=√N
    * (hundreds of struct literals per projection blow past codegen
    * method limits), so scoring here loops at RUNTIME over ONE
    * `typedlit` array-of-centroids via `transform` — still a narrow
    * codegen'd projection with zero shuffle, but the generated code is
    * K-independent. Centroids are unit-normalized ON THE DRIVER (K·D
    * work) and every vector is normalized once, so each score is a
    * plain dot. The probe side broadcasts; the final top-k is the
    * bounded [[TopKAggregator]]. */
  def q188IvfScaled(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    ivfProbeScaledOn(e.where(pmod(col("vec_id"), lit(5)) === 0),
      e.where(pmod(col("vec_id"), lit(5)) =!= 0), e)
  }

  /** Unit-normalized codebook of the corpus's first k vectors —
    * k·D driver floats, the Faiss-quantizer bound. */
  private[graft] def scaledCodebook(e: DataFrame, k: Int): Seq[Seq[Double]] =
    e.where(col("vec_id") < k)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).map { case (_, v) =>
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n > 0) v.map(_ / n) else v
      }.toSeq

  /** (cc, negid) structs for a unit vector against the whole codebook,
    * computed by a runtime loop over one array literal — generated
    * code size independent of K. Ordering convention matches
    * [[topCentroids]]: sort asc on (cc, negid), reverse = cosine desc,
    * centroid id asc. */
  private def scaledScores(nv: Column, cents: Seq[Seq[Double]]): Column = {
    val withIdx = cents.zipWithIndex.map { case (cv, i) => (i.toLong, cv) }
    sort_array(transform(typedlit(withIdx),
      c => struct(VectorExprs.dot(nv, c.getField("_2")).as("cc"),
        (-c.getField("_1")).as("negid"))), asc = false)
  }

  /** The Faiss sizing rule, as a function of the corpus. */
  private[graft] def scaledK(corpus: DataFrame): Int =
    math.max(NumCentroids,
      math.ceil(math.sqrt(corpus.count().toDouble)).toInt)

  /** q188's argmax assignment with the normalized vector carried —
    * (vec_id, nv, bkt), the relation
    * [[graft.sources.VectorIndexStore.buildScaled]] persists per day.
    * The √N-dot assignment is q188's corpus-sided cost — the term the
    * store amortizes (the xsk/q188 bench pair prices the split). */
  private[graft] def scaledAssign(rel: DataFrame,
      cents: Seq[Seq[Double]]): DataFrame =
    VectorExprs.normalized(rel, "embedding", "nv", Seq("vec_id"))
      .withColumn("__s", element_at(scaledScores(col("nv"), cents), 1))
      .select(col("vec_id"), col("nv"), nnKey(-col("__s.negid")).as("bkt"))

  private[graft] def ivfProbeScaledOn(fresh: DataFrame, idx: DataFrame,
      corpus: DataFrame, nprobe: Int = NProbe): DataFrame = {
    // Store-or-inline: a configured-and-fresh scaled face supplies the
    // √N codebook and the persisted assignments (the corpus-sided
    // assignment pass skipped entirely); the stored values are the
    // same deterministic derivation, so results stay byte-identical —
    // spec-pinned. Stale ⇒ inline: cost, never a wrong neighbor.
    val (cents, assign0) =
      graft.sources.VectorIndexStore.openFreshScaled(corpus, idx).getOrElse {
        val c = scaledCodebook(corpus, scaledK(corpus))
        (c, scaledAssign(idx, c))
      }
    ivfProbeScaledWith(fresh, cents, assign0, nprobe)
  }

  /** The scaled probe against an EXPLICIT (codebook, assignments) pair
    * — the kernel [[ivfProbeScaledOn]] dispatches to, split out so a
    * trained codebook ([[scaledCodebookTrained]]) can be compared
    * against the first-K convention on the same index
    * (TrainedCodebookSpec's recall pin). */
  private[graft] def ivfProbeScaledWith(fresh: DataFrame,
      cents: Seq[Seq[Double]], assign0: DataFrame,
      nprobe: Int = NProbe): DataFrame = {
    val assign = assign0.select(col("vec_id").as("n_id"),
      col("nv").as("n_nv"), col("bkt"))
    val probes = VectorExprs.normalized(fresh, "embedding", "nv", Seq("vec_id"))
      .withColumn("__s", explode(slice(scaledScores(col("nv"), cents), 1, nprobe)))
      .select(col("vec_id").as("q_id"), col("nv").as("q_nv"),
        (-col("__s.negid")).as("bkt"))
    val scored = assign.join(broadcast(probes), "bkt")
      .select(col("q_id"), col("n_id"),
        VectorExprs.dot(col("q_nv"), col("n_nv")).as("cos"))
    topK(scored, TopK)
  }

  // --------------------------------------------------- ANN recall eval
  /** Q136: recall@k of the IVF path (q21) against the exact top-k
    * (q20) — the number that justifies running the approximate index at
    * all, and the regression alarm when a codebook retrain or an nprobe
    * cut silently degrades retrieval. Per query: how many of the true
    * [[TopK]] neighbors the probe-limited search found.
    *
    * Scale: both inputs are existing bounded-output operators (queries ×
    * k rows each — [[NumQueries]]·[[TopK]] here, and a recall harness at
    * any scale samples a bounded query set), so the eval itself is a
    * left-semi join plus two tiny aggregations over queries×k rows.
    * The corpus-sized work is q20's one exact scoring pass — the price
    * of ground truth, paid on the SAMPLE, not the corpus. */
  def q136AnnRecall(spark: SparkSession, dir: String): DataFrame =
    annRecallOf(cosineTopK(spark, dir), ivfAnn(spark, dir))

  /** recall@k of `approx` vs ground-truth `exact`, both
    * (q_id, n_id, …) relations. */
  private[graft] def annRecallOf(exact: DataFrame, approx: DataFrame): DataFrame = {
    // Persisted: the truth pair list feeds both the hit join and the
    // denominator count — without it the exact arm's corpus scoring
    // pass runs twice.
    val truth = graft.core.Caches.persistTracked(
      exact.select(col("q_id"), col("n_id")))
    val hits = truth
      .join(approx.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("hits"))
    truth.groupBy("q_id").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)).cast("double")
          / col("n_exact").cast("double"), 6).as("recall"))
  }

  val annRecallSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NumQueries),
       |px AS (SELECT q_id, e.vec_id AS n_id,
       |    list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS c
       |  FROM q JOIN e ON q.q_id != e.vec_id),
       |ex AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) AS rn FROM px)
       |  WHERE rn <= $TopK),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NumCentroids),
       |ac AS (SELECT e.vec_id, e.v, c_id,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      list_dot_product(v, cv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) DESC, c_id) AS arn
       |  FROM e CROSS JOIN cent),
       |assign AS (SELECT vec_id AS n_id, v AS nv, c_id AS bkt FROM ac WHERE arn = 1),
       |qp AS (SELECT q_id, qv, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY
       |      list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) DESC, c_id) AS prn
       |  FROM q CROSS JOIN cent),
       |probes AS (SELECT q_id, qv, c_id AS bkt FROM qp WHERE prn <= $NProbe),
       |pa AS (SELECT q_id, n_id,
       |    list_dot_product(qv, nv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS c
       |  FROM probes JOIN assign USING (bkt) WHERE q_id != n_id),
       |ap AS (SELECT q_id, n_id FROM (SELECT q_id, n_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) AS rn FROM pa)
       |  WHERE rn <= $TopK),
       |h AS (SELECT ex.q_id, count(*) AS hits
       |  FROM ex JOIN ap ON ex.q_id = ap.q_id AND ex.n_id = ap.n_id GROUP BY 1),
       |t AS (SELECT q_id, count(*) AS n_exact FROM ex GROUP BY 1)
       |SELECT t.q_id, coalesce(h.hits, 0) AS hits,
       |  round(CAST(coalesce(h.hits, 0) AS DOUBLE) / CAST(t.n_exact AS DOUBLE), 6) AS recall
       |FROM t LEFT JOIN h ON t.q_id = h.q_id""".stripMargin

  // --------------------------------------------------- cosine near-dup
  /** IVF-bucketed near-duplicate pairs over any (vec_id, embedding)
    * relation: each vector is multi-assigned to its `probes` nearest
    * centroids, candidates are pairs sharing a bucket (equi-join on
    * bucket id — candidate volume ∝ Σ bucket², never N²), and every
    * candidate is exactly verified with a pre-normalized dot product.
    * Multi-assignment is what buys recall: two near-dups whose argmax
    * centroids differ still meet in a shared second-choice bucket when
    * the corpus is cluster-structured (true duplicate embeddings are). */
  def nearDupBucketed(e: DataFrame, threshold: Double,
      probes: Int = NearDupProbes): DataFrame = {
    val cents = centroidList(e)
    val assign = e
      .withColumn("__c", topCentroids(centroidScores(col("embedding"), cents), probes))
      .select(col("vec_id"), (-col("__c.negid")).as("bkt"))
    val cands = assign.select(col("vec_id").as("id1"), col("bkt"))
      .join(assign.select(col("vec_id").as("id2"), col("bkt")), "bkt")
      .where(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    val normed = VectorExprs.normalized(e, "embedding", "nv", Seq("vec_id"))
    cands
      .join(normed.select(col("vec_id").as("id1"), col("nv").as("nv1")), "id1")
      .join(normed.select(col("vec_id").as("id2"), col("nv").as("nv2")), "id2")
      .withColumn("cos", VectorExprs.dot(col("nv1"), col("nv2")))
      .where(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("sim"))
  }

  /** All-pairs exact near-dup — the recall oracle for
    * [[nearDupBucketed]] in tests ONLY. O(N²); never the shipped path. */
  def nearDupBrute(e: DataFrame, threshold: Double): DataFrame = {
    val normed = VectorExprs.normalized(e, "embedding", "nv", Seq("vec_id"))
    val a = normed.select(col("vec_id").as("id1"), col("nv").as("nv1"))
    val b = normed.select(col("vec_id").as("id2"), col("nv").as("nv2"))
    a.join(broadcast(b), col("id1") < col("id2"))
      .withColumn("cos", VectorExprs.dot(col("nv1"), col("nv2")))
      .where(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("sim"))
  }

  /** Q26: bucketed near-dup on the embeddings table. */
  def cosineNearDup(spark: SparkSession, dir: String): DataFrame =
    nearDupBucketed(emb(spark, dir), NearDupThreshold)

  val cosineNearDupSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NumCentroids),
       |ac AS (SELECT e.vec_id, c_id,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      list_dot_product(v, cv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) DESC, c_id) AS arn
       |  FROM e CROSS JOIN cent),
       |assign AS (SELECT vec_id, c_id AS bkt FROM ac WHERE arn <= $NearDupProbes),
       |cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
       |  FROM assign a JOIN assign b ON a.bkt = b.bkt AND a.vec_id < b.vec_id),
       |n AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv FROM e),
       |p AS (SELECT id1, id2, list_dot_product(a.nv, b.nv) AS c
       |  FROM cand JOIN n a ON a.vec_id = id1 JOIN n b ON b.vec_id = id2)
       |SELECT id1, id2, round(c, 6) AS sim FROM p WHERE c >= $NearDupThreshold""".stripMargin

  // --------------------------------------------- q125 SRP-LSH near-dup
  /** Sign-bit count and band width for signed random projection. */
  private val SrpBits = 16
  private val SrpBandBits = 4 // 4 bands × 4 bits — pigeonhole-style recall

  /** Q125: SRP-LSH near-duplicate pairs — the HASH-family counterpart
    * to q26's IVF bucketing (Charikar, "Similarity estimation
    * techniques from rounding algorithms", STOC 2002): each vector gets
    * a [[SrpBits]]-bit signature of sign(v·h_i) projections, signatures
    * band into [[SrpBandBits]]-bit keys, pairs sharing any (band, key)
    * are candidates, and candidates verify with the exact normalized
    * dot. Same output contract as q26; a different — and at 100 TB
    * cheaper — candidate generator: signatures are a narrow codegen'd
    * projection (no centroid argmax), and banding is data-oblivious, so
    * it needs no codebook maintenance as the corpus grows.
    *
    * Projection directions reuse the q21 codebook trick: the first
    * [[SrpBits]] corpus vectors, collected once (bounded, like a Faiss
    * quantizer) and inlined as literals — deterministic and
    * engine-portable where random Gaussian planes would not be.
    *
    * Scale shape: one corpus scan for signatures (persisted — both
    * sides of the band self-join read it), candidate volume ∝
    * Σ bucket², never N², and the exact verify touches only
    * candidates. */
  def q125SrpLsh(spark: SparkSession, dir: String): DataFrame =
    srpLshOn(emb(spark, dir), NearDupThreshold)

  private[graft] def srpLshOn(e: DataFrame, threshold: Double): DataFrame = {
    val planes = e.where(col("vec_id") < SrpBits)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).map(_._2).toSeq
    val v = col("embedding").cast("array<double>")
    val bandKeys = (0 until SrpBits / SrpBandBits).map { b =>
      (0 until SrpBandBits).map { r =>
        when(VectorExprs.dot(v, typedlit(planes(b * SrpBandBits + r))) >= 0,
          lit(1 << r)).otherwise(lit(0))
      }.reduce(_ + _).as(s"bk$b")
    }
    val sig = graft.core.Caches.persistTracked(
      e.select(col("vec_id") +: bandKeys: _*))
    val bands = sig.select(col("vec_id"),
        posexplode(array((0 until SrpBits / SrpBandBits).map(b => col(s"bk$b")): _*)))
      .select(col("vec_id"), col("pos").as("band"), col("col").as("bk"))
    val cands = bands.select(col("vec_id").as("id1"), col("band"), col("bk"))
      .join(bands.select(col("vec_id").as("id2"), col("band"), col("bk")), Seq("band", "bk"))
      .where(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
    val normed = VectorExprs.normalized(e, "embedding", "nv", Seq("vec_id"))
    cands
      .join(normed.select(col("vec_id").as("id1"), col("nv").as("nv1")), "id1")
      .join(normed.select(col("vec_id").as("id2"), col("nv").as("nv2")), "id2")
      .withColumn("cos", VectorExprs.dot(col("nv1"), col("nv2")))
      .where(col("cos") >= threshold)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("sim"))
  }

  val srpLshSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |h AS (SELECT vec_id AS h_id, v AS hv FROM e WHERE vec_id < $SrpBits),
       |bits AS (SELECT e.vec_id, h.h_id,
       |    CASE WHEN list_dot_product(v, hv) >= 0 THEN 1 ELSE 0 END AS bit
       |  FROM e CROSS JOIN h),
       |keys AS (SELECT vec_id, CAST(h_id // $SrpBandBits AS INTEGER) AS band,
       |    CAST(sum(bit << CAST(h_id % $SrpBandBits AS INTEGER)) AS INTEGER) AS bk
       |  FROM bits GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.vec_id AS id1, b.vec_id AS id2
       |  FROM keys a JOIN keys b ON a.band = b.band AND a.bk = b.bk AND a.vec_id < b.vec_id),
       |n AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv FROM e),
       |p AS (SELECT id1, id2, list_dot_product(a.nv, b.nv) AS c
       |  FROM cand JOIN n a ON a.vec_id = id1 JOIN n b ON b.vec_id = id2)
       |SELECT id1, id2, round(c, 6) AS sim FROM p WHERE c >= $NearDupThreshold""".stripMargin

  // ------------------------------------------------ int8 quantization
  /** Q47: symmetric int8 scalar quantization of each embedding — the
    * standard 4× storage/bandwidth shrink before ANN serving. Per-vector
    * scale = max|x|/127; codes are `floor(x/scale + 0.5)` (explicit
    * half-up — identical IEEE ops in any engine, no reliance on a
    * `round()` tie rule), reconstruction error is the mean |x − q·scale|.
    * The error sum goes through DECIMAL(20,12) per element: exact,
    * order-independent addition, so the mean is bit-identical in any
    * engine regardless of its double-summation order. A pure narrow
    * projection: no shuffle, no UDF, whole-stage codegen'd; at 100 TB
    * this is a map-only pass. */
  def quantizeInt8(spark: SparkSession, dir: String): DataFrame =
    quantizeInt8On(emb(spark, dir))

  private[operators] def quantizeInt8On(e: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val scale = (aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x))) / 127.0).as("scale_raw")
    // The raw scale keeps a name distinct from the rounded output column:
    // a shared name would let the output alias capture the references
    // inside q/mae (lateral alias resolution) and quantize against the
    // 6-digit-rounded scale instead of the true one.
    val errs = zip_with(col("v"), col("q"),
      (x, q) => abs(x - q * col("scale_raw")).cast("decimal(20,12)"))
    e.select(col("vec_id"), v.as("v"), scale)
      // Degenerate all-zero vector → scale_raw = 0; dividing would yield
      // 0.0/0.0 = NaN and the ANSI cast of codes to array<int> throws.
      // Zero codes are the correct quantization of a zero vector.
      .withColumn("q", transform(col("v"), x =>
        when(col("scale_raw") === 0d, lit(0.0))
          .otherwise(floor(x / col("scale_raw") + 0.5))))
      .select(
        col("vec_id"),
        round(col("scale_raw"), 6).as("scale"),
        to_json(col("q").cast("array<int>")).as("codes"),
        round(
          aggregate(errs, lit(0).cast("decimal(38,12)"),
            (acc, e) => (acc + e).cast("decimal(38,12)")).cast("double")
            / size(col("v")), 6).as("mae"))
  }

  val quantizeInt8Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (SELECT vec_id, v,
      |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
      |q AS (SELECT vec_id, v, scale,
      |    list_transform(v, x -> CASE WHEN scale = 0 THEN 0.0
      |                           ELSE floor(x / scale + 0.5) END) AS qc FROM s)
      |SELECT vec_id, round(scale, 6) AS scale,
      |  CAST(to_json(CAST(qc AS INT[])) AS VARCHAR) AS codes,
      |  round(CAST(list_sum(list_transform(range(len(v)),
      |          i -> CAST(abs(v[i+1] - qc[i+1] * scale) AS DECIMAL(20,12)))) AS DOUBLE)
      |        / len(v), 6) AS mae
      |FROM q""".stripMargin

  // ----------------------------------------------------- k-means trainer
  private val KmeansK = 8
  private val KmeansIters = 3

  /** Distributed Lloyd's iterations (spherical: cosine assignment) — the
    * training job the IVF codebook comments point at. Each round is one
    * narrow literal-centroid assignment pass over the corpus plus ONE
    * shuffle of (cluster, dim, value) rows for the per-dimension means;
    * only the K×D codebook (never data) is collected per round, so the
    * driver holds exactly what a Faiss quantizer holds. Means use the
    * exact decimal-sum aggregation, which makes the trained codebook
    * bit-identical across partition counts — and therefore across
    * engines, which is what lets a fixed-iteration DuckDB oracle verify
    * a distributed iterative trainer at all. Clusters that lose all
    * members drop out of the codebook (both engines agree). */
  private[operators] def kmeansCodebook(e: DataFrame, k: Int,
      iters: Int): Seq[(Long, Seq[Double])] = {
    var cents = e.where(col("vec_id") < k)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    for (_ <- 0 until iters) {
      val assigned = e
        .withColumn("__c", topCentroids(centroidScores(col("embedding"), cents), 1))
        .select((-col("__c.negid")).as("cluster"),
          posexplode(col("embedding").cast("array<double>")))
      val means = assigned.groupBy("cluster", "pos")
        .agg(graft.functions.AggExprs.decAvg(col("col")).as("mv"))
        .collect()
      cents = means.groupBy(_.getLong(0)).map { case (cid, rows) =>
        (cid, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq)
      }.toSeq.sortBy(_._1)
    }
    cents
  }

  // ------------------------------------------- trained coarse codebooks
  /** The q43 Lloyd trainer as a CODEBOOK factory (VERDICT r13 next-1):
    * the first-K-vectors convention every IVF face defaults to is the
    * fixture's stand-in for "the output of a k-means training job" —
    * this IS that job, [[kmeansCodebook]] at arbitrary (k, iters) with
    * the surviving centroids renumbered to dense ids 0..n−1 (seed
    * vec_ids are training incidentals, not codebook identity; dense
    * ids keep bucket ids meaningless outside the index, like Faiss).
    * On clustered corpora whose low vec_ids happen to sit in one
    * cluster, a first-K codebook leaves other clusters centroid-less
    * and the bucketed candidate joins under-recall in ways a recall
    * spec pinned on THIS corpus cannot see; a trained codebook moves
    * centroids into every mass concentration (TrainedCodebookSpec
    * constructs exactly that failure and pins the repair). Feed the
    * result to [[graft.sources.SemanticDeconStore.build]]
    * (`trained = true`) or anywhere a `Seq[(Long, Seq[Double])]`
    * codebook is consumed. */
  private[graft] def trainedCodebook(e: DataFrame, k: Int,
      iters: Int = KmeansIters): Seq[(Long, Seq[Double])] =
    kmeansCodebook(e, k, iters).map(_._2).zipWithIndex
      .map { case (cv, i) => (i.toLong, cv) }

  /** [[trainedCodebook]] for the data-scaled face: SPHERICAL k-means
    * (Lloyd's over unit-normalized vectors, decimal-exact means
    * re-normalized each round — the cosine-geometry variant) scored
    * with q188's runtime-looped [[scaledScores]], so the generated
    * code stays K-independent at K = ⌈√N⌉ where [[kmeansCodebook]]'s
    * K-literal expression tree would blow past codegen limits. Seeds
    * are the first-k convention; only K·D values ever reach the
    * driver per round. Deterministic, so a store build and a spec
    * re-derivation agree exactly. */
  private[graft] def scaledCodebookTrained(e: DataFrame, k: Int,
      iters: Int = KmeansIters): Seq[Seq[Double]] = {
    var cents = scaledCodebook(e, k)
    val eN = VectorExprs.normalized(e, "embedding", "nv", Seq("vec_id"))
    for (_ <- 0 until iters) {
      val means = eN
        .withColumn("__s", element_at(scaledScores(col("nv"), cents), 1))
        .select((-col("__s.negid")).as("cluster"), posexplode(col("nv")))
        .groupBy("cluster", "pos")
        .agg(graft.functions.AggExprs.decAvg(col("col")).as("mv"))
        .collect()
      cents = means.groupBy(_.getLong(0)).toSeq.sortBy(_._1)
        .map { case (_, rows) =>
          val v = rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
          val n = math.sqrt(v.map(x => x * x).sum)
          if (n > 0) v.map(_ / n) else v
        }
    }
    cents
  }

  /** Q43: k-means cluster assignment after [[KmeansIters]] training
    * rounds from deterministic seeds (the first [[KmeansK]] vectors). */
  def kmeansAssign(spark: SparkSession, dir: String): DataFrame =
    kmeansAssignOn(emb(spark, dir), KmeansK, KmeansIters)

  /** Train on `e` (vec_id, embedding) and assign every vector to its
    * trained cluster. */
  def kmeansAssignOn(e: DataFrame, k: Int, iters: Int): DataFrame = {
    val cents = kmeansCodebook(e, k, iters)
    e.withColumn("__c", topCentroids(centroidScores(col("embedding"), cents), 1))
      .select(col("vec_id"), (-col("__c.negid")).as("cluster"))
  }

  /** The Lloyd's-rounds CTE chain shared by the q43 and q130 oracles:
    * ends with `a${KmeansIters + 1}` holding the final assignment
    * (filter `rn = 1`). */
  private def kmeansCtePrefix: String = {
    val cos = (v: String, c: String) =>
      s"list_dot_product($v, $c) / (sqrt(list_dot_product($v, $v)) * sqrt(list_dot_product($c, $c)))"
    def assignCte(i: Int, cents: String) =
      s"""a$i AS (SELECT vec_id, v, c_id, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ${cos("v", "cv")} DESC, c_id) AS rn FROM e CROSS JOIN $cents)""".stripMargin
    def updateCtes(i: Int) =
      s"""m$i AS (SELECT c_id, d.d AS dim,
         |    CAST(sum(CAST(v[d.d + 1] AS DECIMAL(18, 6))) AS DOUBLE) / count(v[d.d + 1]) AS mv
         |  FROM a$i, dims d WHERE rn = 1 GROUP BY 1, 2),
         |c$i AS (SELECT c_id, list(mv ORDER BY dim) AS cv FROM m$i GROUP BY c_id)""".stripMargin
    val rounds = (1 to KmeansIters)
      .map(i => s"${assignCte(i, s"c${i - 1}")},\n${updateCtes(i)}").mkString(",\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |dims AS (SELECT unnest(range((SELECT CAST(max(len(v)) AS INT) FROM e))) AS d),
       |c0 AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $KmeansK),
       |$rounds,
       |${assignCte(KmeansIters + 1, s"c$KmeansIters")}""".stripMargin
  }

  val kmeansSql: String =
    s"""$kmeansCtePrefix
       |SELECT vec_id, c_id AS cluster FROM a${KmeansIters + 1} WHERE rn = 1""".stripMargin

  // ------------------------------------------------------ q130 SemDedup
  /** Cosine threshold above which two same-cluster vectors are semantic
    * duplicates. Tuned to this corpus's pair-sim distribution (max
    * pairwise cosine ≈ 0.51, 99.9th pct ≈ 0.38) so the decision is
    * exercised on every SF; production corpora with genuinely duplicated
    * content run τ ≈ 0.95+. */
  private val SemDedupTau = 0.35

  /** Q130: semantic deduplication (SemDeDup, Abbas et al. 2023) — the
    * embedding-space analog of q92's "first occurrence wins": train the
    * q43 k-means codebook, assign every vector to its cluster, and
    * within each cluster mark a vector a duplicate iff SOME lower-id
    * vector sits within cosine τ (witnessed by `dup_of`, the smallest
    * such id). Unlike q26 (which LISTS near-dup pairs), this emits the
    * dedup DECISION per vector — the keep/drop column a curation
    * pipeline filters on. The any-lower-neighbor convention is the
    * anti-chaining variant of the paper's greedy sweep: it never keeps
    * a vector that greedy would drop, and is expressible as one join
    * (greedy is inherently sequential per cluster — q123's territory).
    *
    * Scale shape: training is q43's bounded-collect loop; the pairwise
    * stage is CLUSTER-bucketed (candidates ∝ Σ|cluster|², never N² —
    * the paper's own trick, K grows with the corpus so clusters stay
    * bounded), and vectors are unit-normalized ONCE so each candidate
    * costs a single codegen'd dot. */
  def q130SemDedup(spark: SparkSession, dir: String): DataFrame =
    semDedupOn(emb(spark, dir), SemDedupTau)

  private[operators] def semDedupOn(e: DataFrame, tau: Double): DataFrame = {
    val cents = kmeansCodebook(e, KmeansK, KmeansIters)
    val asg = graft.core.Caches.persistTracked(
      VectorExprs.normalized(
        e.withColumn("__c", topCentroids(centroidScores(col("embedding"), cents), 1))
          .select(col("vec_id"), (-col("__c.negid")).as("cluster"), col("embedding")),
        "embedding", "nv", Seq("vec_id", "cluster")))
    val dup = asg.select(col("cluster"), col("vec_id"), col("nv").as("lv"))
      .join(asg.select(col("cluster"), col("vec_id").as("r_id"), col("nv").as("rv")),
        Seq("cluster"))
      .where(col("vec_id") > col("r_id"))
      .where(VectorExprs.dot(col("lv"), col("rv")) >= lit(tau))
      .groupBy("vec_id").agg(min("r_id").as("dup_of"))
    asg.join(dup, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        col("dup_of").isNotNull.cast("int").as("is_dup"), col("dup_of"))
  }

  val semDedupSql: String =
    s"""$kmeansCtePrefix,
       |asg AS (SELECT vec_id, v, c_id AS cluster FROM a${KmeansIters + 1} WHERE rn = 1),
       |n AS (SELECT vec_id, cluster,
       |    list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv FROM asg),
       |dup AS (SELECT l.vec_id, min(r.vec_id) AS dup_of
       |  FROM n l JOIN n r ON l.cluster = r.cluster AND l.vec_id > r.vec_id
       |  WHERE list_dot_product(l.nv, r.nv) >= $SemDedupTau GROUP BY 1)
       |SELECT a.vec_id, a.cluster,
       |  CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup, d.dup_of
       |FROM asg a LEFT JOIN dup d ON a.vec_id = d.vec_id""".stripMargin

  // --------------------------------------------- product quantization
  private val PqSubspaces = 4
  private val PqCodebook = 8
  private val PqIters = 1

  /** Squared L2 expanded to dot products — the same portable primitive
    * the cosine tier uses. The literal-side `dot(c, c)` constant-folds;
    * evaluation order (a − b) + c is pinned to match the oracle. */
  private def sqDist(sv: Column, cv: Seq[Double]): Column = {
    val c = typedlit(cv)
    VectorExprs.dot(sv, sv) - lit(2.0) * VectorExprs.dot(sv, c) +
      VectorExprs.dot(c, c)
  }

  /** Nearest-centroid code for a subvector, per subspace: min over the
    * subspace's codebook of (dist, cid) — ascending struct sort, ties
    * on centroid id, mirroring the oracle's `ORDER BY dist, c_id`. */
  private def pqCode(sv: Column, sub: Column,
      bySub: Map[Int, Seq[(Long, Seq[Double])]]): Column =
    (0 until PqSubspaces).foldLeft(lit(null).cast("long")) { (acc, si) =>
      val scores = array(bySub(si).map { case (cid, cv) =>
        struct(sqDist(sv, cv).as("dist"), lit(cid).as("cid"))
      }: _*)
      when(sub === si, element_at(array_sort(scores), 1).getField("cid"))
        .otherwise(acc)
    }

  /** Q79: product-quantization encoding — the compression step that
    * makes billion-vector ANN storable (IVF-PQ): each vector splits
    * into [[PqSubspaces]] contiguous subvectors, each subspace trains
    * its own [[PqCodebook]]-centroid codebook (Lloyd's from
    * deterministic seeds, decimal-exact means), and a vector's code is
    * its per-subspace nearest centroid — 64 floats become
    * m·log₂k' = 12 bits here.
    *
    * Scale shape: codebooks are m × k' × (d/m) literals — the classic
    * memory-resident quantizer — so both assignment passes are narrow
    * codegen'd projections with ZERO shuffle; the one training shuffle
    * per round is a (sub, cluster, dim)-keyed decimal mean whose
    * output cardinality is k'·d, independent of corpus size. The
    * subvector relation persists: it feeds seeding, training, and the
    * final encode — one corpus scan, not three. */
  def pqEncode(spark: SparkSession, dir: String): DataFrame =
    pqEncodeOn(emb(spark, dir))

  /** (vec_id, sub, sv): the exploded subvector relation both training
    * and encoding run over. Callers persist it. */
  private[operators] def pqSubvectors(e0: DataFrame): DataFrame = {
    val e = e0.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val hd = e.select(size(col("v"))).head(1) // schema-fixed dim, 1-row probe
    if (hd.isEmpty) // empty relation: typed empty output, never a crash
      return e.select(col("vec_id"), lit(0).as("sub"), col("v").as("sv"))
    val w = hd(0).getInt(0) / PqSubspaces
    e.select(col("vec_id"), posexplode(
        array((0 until PqSubspaces).map(s => slice(col("v"), s * w + 1, w)): _*)))
      .select(col("vec_id"), col("pos").as("sub"), col("col").as("sv"))
  }

  /** Per-subspace codebooks: deterministic seeds (the first
    * [[PqCodebook]] vectors' subvectors), then `iters` Lloyd rounds of
    * decimal-exact means. Only k'·d values ever reach the driver. */
  private[operators] def pqTrain(subs: DataFrame, iters: Int): Map[Int, Seq[(Long, Seq[Double])]] = {
    var cents = subs.where(col("vec_id") < PqCodebook)
      .select(col("sub"), col("vec_id"), col("sv")).collect()
      .groupBy(_.getInt(0)).map { case (sub, rs) =>
        sub -> rs.map(r => (r.getLong(1), r.getSeq[Double](2))).sortBy(_._1).toSeq
      }
    for (_ <- 0 until iters) {
      val means = subs
        .withColumn("cluster", pqCode(col("sv"), col("sub"), cents))
        .select(col("sub"), col("cluster"), posexplode(col("sv")))
        .groupBy("sub", "cluster", "pos")
        .agg(graft.functions.AggExprs.decAvg(col("col")).as("mv"))
        .collect()
      cents = means.groupBy(r => (r.getInt(0), r.getLong(1))).toSeq
        .map { case ((sub, cid), rs) =>
          (sub, cid, rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toSeq)
        }
        .groupBy(_._1).map { case (sub, rs) =>
          sub -> rs.sortBy(_._2).map(t => (t._2, t._3))
        }
    }
    cents
  }

  private[operators] def pqEncodeOn(e0: DataFrame): DataFrame = {
    val subs = graft.core.Caches.persistTracked(pqSubvectors(e0))
    val cents = pqTrain(subs, PqIters)
    subs
      .select(col("vec_id"), col("sub").cast("long").as("sub"),
        pqCode(col("sv"), col("sub"), cents).as("code"))
  }

  /** Q80: ADC (asymmetric distance computation) top-k — the search half
    * of IVF-PQ (q79 is the compression half). A query keeps its RAW
    * subvectors; every database vector is represented only by its m
    * codes, so the per-(query, vector) distance is the sum of m
    * query-to-centroid distances — at scale, m table lookups instead of
    * d multiplications, expressed here as a join of the code relation
    * against the broadcast k'·m centroid relation (the executor-local
    * lookup-table idiom in DataFrame form).
    *
    * The per-pair total sums one slot per subspace in fixed expression
    * order (the bm25 move — no float-associativity wobble); selection
    * is the bounded top-k aggregate on negated distance, ties on n_id.
    * The corpus never appears raw on either side of the scoring join —
    * only codes travel. */
  def adcTopK(spark: SparkSession, dir: String): DataFrame =
    adcTopKOn(emb(spark, dir))

  private[operators] def adcTopKOn(e0: DataFrame): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    val subs = graft.core.Caches.persistTracked(pqSubvectors(e0))
    val cents = pqTrain(subs, PqIters)
    val codes = subs.select(col("vec_id"), col("sub"),
      nnKey(pqCode(col("sv"), col("sub"), cents)).as("code"))
    val centDf = cents.toSeq
      .flatMap { case (sub, cs) => cs.map { case (cid, cv) => (sub, cid, cv) } }
      .toDF("csub", "cid", "cv")
    val qsubs = subs.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("sub").as("qsub"), col("sv").as("qv"))
    val d = codes
      .join(broadcast(centDf), col("sub") === col("csub") && col("code") === col("cid"))
      .join(broadcast(qsubs), col("sub") === col("qsub") && col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), col("sub"),
        (VectorExprs.dot(col("qv"), col("qv"))
          - lit(2.0) * VectorExprs.dot(col("qv"), col("cv"))
          + VectorExprs.dot(col("cv"), col("cv"))).as("d"))
    val slots = (0 until PqSubspaces)
      .map(s => sum(when(col("sub") === s, col("d"))).as(s"s_$s"))
    val adc = d.groupBy("q_id", "n_id")
      .agg(slots.head, slots.tail: _*)
      .select(col("q_id"), col("n_id"),
        (0 until PqSubspaces).map(s => coalesce(col(s"s_$s"), lit(0.0)))
          .reduce(_ + _).as("adc"))
    val topk = udaf(new TopKAggregator(TopK),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    adc.groupBy("q_id")
      .agg(topk(-col("adc"), col("n_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col._2").as("n_id"),
        (col("pos") + 1).cast("long").as("rn"),
        round(-col("col._1"), 6).as("adc"))
  }

  val adcTopKSql: String = {
    val slots = (0 until PqSubspaces)
      .map(s => s"sum(CASE WHEN sub = $s THEN d END) AS s_$s").mkString(", ")
    val total = (0 until PqSubspaces).map(s => s"coalesce(s_$s, 0.0)").mkString(" + ")
    s"""WITH $pqCtes,
       |codes AS (SELECT vec_id, sub, c_id AS code FROM a2 WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, sub, sv AS qv FROM s WHERE vec_id < $NumQueries),
       |d AS (SELECT q.q_id, codes.vec_id AS n_id, codes.sub,
       |    list_dot_product(q.qv, q.qv) - 2 * list_dot_product(q.qv, c.cv)
       |      + list_dot_product(c.cv, c.cv) AS d
       |  FROM codes JOIN c1 c ON codes.sub = c.sub AND codes.code = c.c_id
       |  JOIN q ON q.sub = codes.sub AND q.q_id != codes.vec_id),
       |g AS (SELECT q_id, n_id, $slots FROM d GROUP BY 1, 2),
       |t AS (SELECT q_id, n_id, $total AS adc FROM g),
       |r AS (SELECT q_id, n_id, adc,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS rn FROM t)
       |SELECT q_id, n_id, CAST(rn AS BIGINT) AS rn, round(adc, 6) AS adc
       |FROM r WHERE rn <= $TopK""".stripMargin
  }

  // ------------------------------------------------ IVF-PQ combined
  /** Q82: the IVF-PQ capstone — the full billion-scale ANN serving
    * shape, composing the two halves already verified separately:
    * coarse inverted-file pruning (q21) decides WHICH vectors a query
    * scores, PQ codes + ADC (q79/q80) decide HOW each candidate is
    * scored. Every vector is assigned to its nearest coarse centroid
    * (bucket) in the SAME single-pass projection that explodes its PQ
    * subvectors — the bucket tag rides through the explode, so the
    * compressed index (vec_id, bkt, sub, code) is built in one corpus
    * scan with zero shuffle and no vec_id re-join. A query probes its
    * [[NProbe]] nearest buckets and ADC-scores only the codes stored
    * there: per-query work is (|corpus|/C)·nprobe·m lookups, and the
    * raw corpus never appears on either side of the scoring join —
    * only codes travel, exactly what survives when vectors outgrow
    * memory. Probes, the k'·m centroid table, and the query
    * subvectors all broadcast. */
  def ivfPqTopK(spark: SparkSession, dir: String): DataFrame =
    ivfPqTopKOn(emb(spark, dir))

  private[operators] def ivfPqTopKOn(e0: DataFrame): DataFrame = {
    val adc = ivfPqAdc(e0)
    val topk = udaf(new TopKAggregator(TopK),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    adc.groupBy("q_id")
      .agg(topk(-col("adc"), col("n_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), col("col._2").as("n_id"),
        (col("pos") + 1).cast("long").as("rn"),
        round(-col("col._1"), 6).as("adc"))
  }

  /** The shared IVF-PQ candidate-scoring stage: (q_id, n_id, adc) for
    * every code stored in a probed bucket — q82 ranks it directly, q88
    * shortlists then exactly re-ranks. */
  /** The complete PQ index: coarse codebook, per-subspace PQ
    * codebooks, and the coded corpus (vec_id, bkt, sub, code) — the
    * inline derivation [[ivfPqAdc]] uses and
    * [[graft.sources.VectorIndexStore.buildPq]] persists. One corpus
    * scan: the bucket tag rides through the subvector explode. */
  private[graft] def pqIndexArtifacts(e0: DataFrame)
      : (Seq[(Long, Seq[Double])], Map[Int, Seq[(Long, Seq[Double])]], DataFrame) = {
    val coarse = centroidList(e0)
    val e = e0
      .withColumn("__c", topCentroids(centroidScores(col("embedding"), coarse), 1))
      .select(col("vec_id"), (-col("__c.negid")).as("bkt"),
        col("embedding").cast("array<double>").as("v"))
    val d0 = e.select(size(col("v"))).head.getInt(0)
    val w = d0 / PqSubspaces
    val subs = graft.core.Caches.persistTracked(
      e.select(col("vec_id"), col("bkt"), posexplode(
          array((0 until PqSubspaces).map(s => slice(col("v"), s * w + 1, w)): _*)))
        .select(col("vec_id"), col("bkt"), col("pos").as("sub"), col("col").as("sv")))
    val cents = pqTrain(subs, PqIters)
    val codes = subs.select(col("vec_id"), col("bkt"), col("sub"),
      nnKey(pqCode(col("sv"), col("sub"), cents)).as("code"))
    (coarse, cents, codes)
  }

  /** Encode one batch against FROZEN codebooks — the store's
    * advance-day kernel: no training, one batch scan. */
  private[graft] def pqEncodeWith(batch: DataFrame,
      coarse: Seq[(Long, Seq[Double])],
      cents: Map[Int, Seq[(Long, Seq[Double])]]): DataFrame = {
    val e = batch
      .withColumn("__c", topCentroids(centroidScores(col("embedding"), coarse), 1))
      .select(col("vec_id"), (-col("__c.negid")).as("bkt"),
        col("embedding").cast("array<double>").as("v"))
    val hd = e.select(size(col("v"))).head(1)
    if (hd.isEmpty) // empty day: typed empty output, never a crash
      return e.select(col("vec_id"), col("bkt"),
        lit(0).as("sub"), lit(null).cast("long").as("code"))
    val w = hd(0).getInt(0) / PqSubspaces
    e.select(col("vec_id"), col("bkt"), posexplode(
        array((0 until PqSubspaces).map(s => slice(col("v"), s * w + 1, w)): _*)))
      .select(col("vec_id"), col("bkt"), col("pos").as("sub"),
        nnKey(pqCode(col("col"), col("pos"), cents)).as("code"))
  }

  private def ivfPqAdc(e0: DataFrame): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    // Store-or-inline: a configured-and-fresh VectorIndexStore PQ face
    // supplies all three artifacts (codebooks = driver rows, codes =
    // the persisted compressed index) and the training pass is skipped
    // entirely; the stored values are the same deterministic
    // derivation, so q82/q88 stay inside their oracle contracts.
    val (coarse, cents, codes) =
      graft.sources.VectorIndexStore.openFreshPq(e0)
        .getOrElse(pqIndexArtifacts(e0))
    val centDf = cents.toSeq
      .flatMap { case (sub, cs) => cs.map { case (cid, cv) => (sub, cid, cv) } }
      .toDF("csub", "cid", "cv")
    val probes = e0.where(col("vec_id") < NumQueries)
      .withColumn("__c", topCentroids(centroidScores(col("embedding"), coarse), NProbe))
      .select(col("vec_id").as("q_id"), (-col("__c.negid")).as("pbkt"))
    val qsubs = pqSubvectors(e0.where(col("vec_id") < NumQueries))
      .select(col("vec_id").as("qq_id"), col("sub").as("qsub"), col("sv").as("qv"))
    adcOf(codes, probes, centDf, qsubs)
  }

  /** The ADC candidate-scoring stage, coarse-quantizer-agnostic:
    * (q_id, n_id, adc) for every code in a probed bucket. `probes` is
    * (q_id, pbkt), `centDf` the broadcastable k'·m PQ-centroid
    * relation, `qsubs` the raw query subvectors — shared by the K=16
    * oracle faces (q82/q88) and the data-scaled face (q195), which
    * differ ONLY in how buckets were assigned. */
  private def adcOf(codes: DataFrame, probes: DataFrame, centDf: DataFrame,
      qsubs: DataFrame): DataFrame = {
    val d = codes
      .join(broadcast(probes), col("pbkt") === col("bkt") && col("q_id") =!= col("vec_id"))
      .join(broadcast(centDf), col("sub") === col("csub") && col("code") === col("cid"))
      .join(broadcast(qsubs), col("qq_id") === col("q_id") && col("qsub") === col("sub"))
      .select(col("q_id"), col("vec_id").as("n_id"), col("sub"),
        (VectorExprs.dot(col("qv"), col("qv"))
          - lit(2.0) * VectorExprs.dot(col("qv"), col("cv"))
          + VectorExprs.dot(col("cv"), col("cv"))).as("d"))
    val slots = (0 until PqSubspaces)
      .map(s => sum(when(col("sub") === s, col("d"))).as(s"s_$s"))
    d.groupBy("q_id", "n_id")
      .agg(slots.head, slots.tail: _*)
      .select(col("q_id"), col("n_id"),
        (0 until PqSubspaces).map(s => coalesce(col(s"s_$s"), lit(0.0)))
          .reduce(_ + _).as("adc"))
  }

  /** Shared oracle CTE chain ending at `t` = (q_id, n_id, adc) — the
    * SQL mirror of [[ivfPqAdc]]. */
  private def ivfPqCtes: String = {
    val cos =
      "list_dot_product(e.v, cv) / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv, cv)))"
    val slots = (0 until PqSubspaces)
      .map(s => s"sum(CASE WHEN sub = $s THEN d END) AS s_$s").mkString(", ")
    val total = (0 until PqSubspaces).map(s => s"coalesce(s_$s, 0.0)").mkString(" + ")
    s"""$pqCtes,
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NumCentroids),
       |ac AS (SELECT e.vec_id, c_id,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY $cos DESC, c_id) AS crn
       |  FROM e CROSS JOIN cent),
       |bkt AS (SELECT vec_id, c_id AS bkt FROM ac WHERE crn = 1),
       |probes AS (SELECT vec_id AS q_id, c_id AS bkt FROM ac
       |  WHERE crn <= $NProbe AND vec_id < $NumQueries),
       |codes AS (SELECT a2.vec_id, a2.sub, a2.c_id AS code, b.bkt
       |  FROM a2 JOIN bkt b USING (vec_id) WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, sub, sv AS qv FROM s WHERE vec_id < $NumQueries),
       |d AS (SELECT p2.q_id, codes.vec_id AS n_id, codes.sub,
       |    list_dot_product(q.qv, q.qv) - 2 * list_dot_product(q.qv, c.cv)
       |      + list_dot_product(c.cv, c.cv) AS d
       |  FROM codes JOIN probes p2 ON codes.bkt = p2.bkt AND p2.q_id != codes.vec_id
       |  JOIN c1 c ON codes.sub = c.sub AND codes.code = c.c_id
       |  JOIN q ON q.q_id = p2.q_id AND q.sub = codes.sub),
       |g AS (SELECT q_id, n_id, $slots FROM d GROUP BY 1, 2),
       |t AS (SELECT q_id, n_id, $total AS adc FROM g)""".stripMargin
  }

  val ivfPqTopKSql: String =
    s"""WITH $ivfPqCtes,
       |r AS (SELECT q_id, n_id, adc,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc, n_id) AS rn FROM t)
       |SELECT q_id, n_id, CAST(rn AS BIGINT) AS rn, round(adc, 6) AS adc
       |FROM r WHERE rn <= $TopK""".stripMargin

  // ------------------------------------------------- q88 PQ refine
  /** ADC shortlist size ahead of exact re-ranking. */
  private val RefineShortlist = 20

  /** Q88: the refine stage that completes production IVF-PQ serving —
    * ADC distances are quantized, so the top-k they imply can misorder
    * true neighbors; the standard fix is a two-stage search: ADC
    * shortlists [[RefineShortlist]] candidates per query (cheap, codes
    * only), then ONLY those rows fetch their raw vectors for an exact
    * cosine re-rank to the final [[TopK]].
    *
    * Scale shape: the expensive exact math runs on |queries|·R rows —
    * independent of corpus size; the shortlist (a bounded top-k
    * aggregate output) broadcasts into the corpus scan, so fetching
    * raw candidate vectors is one map-side semi-join pass, never a
    * corpus shuffle. */
  def pqRefine(spark: SparkSession, dir: String): DataFrame =
    pqRefineOn(emb(spark, dir))

  private[operators] def pqRefineOn(e0: DataFrame): DataFrame =
    refineOf(ivfPqAdc(e0), e0)

  /** The exact re-rank stage over an ADC relation — q88's second stage,
    * shared with the data-scaled serving face (q195): shortlist
    * [[RefineShortlist]] per query on ADC distance, fetch ONLY those
    * raw vectors (broadcast semi-join into one corpus pass), exact
    * cosine to the final [[TopK]]. */
  private def refineOf(adc: DataFrame, e0: DataFrame): DataFrame = {
    val short = udaf(new TopKAggregator(RefineShortlist),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    val shortlist = adc.groupBy("q_id")
      .agg(short(-col("adc"), col("n_id")).as("top"))
      .select(col("q_id"), explode(col("top._2")).as("n_id"))
    val normed = VectorExprs.normalized(e0, "embedding", "nv", Seq("vec_id"))
    val scored = normed
      .join(broadcast(shortlist), col("vec_id") === col("n_id"))
      .select(col("q_id"), col("n_id"), col("nv").as("n_nv"))
      .join(broadcast(normed.where(col("vec_id") < NumQueries)
        .select(col("vec_id").as("q_id"), col("nv").as("q_nv"))), "q_id")
      .select(col("q_id"), col("n_id"),
        VectorExprs.dot(col("q_nv"), col("n_nv")).as("cos"))
    topK(scored, TopK)
  }

  // ------------------------------------- q195 data-scaled IVF-PQ serving
  /** The complete SCALED compressed index: the K=⌈√N⌉ coarse codebook
    * (unit-normalized, [[scaledCodebook]] — or its trained sibling via
    * the store), the per-subspace PQ codebooks, and the coded corpus
    * (vec_id, bkt, sub, code). One corpus scan: the scaled bucket tag
    * is computed in the same projection that explodes the PQ
    * subvectors, [[pqIndexArtifacts]]'s move at √N K (where the
    * K-literal `centroidScores` tree would blow past codegen limits —
    * bucketing rides [[scaledScores]]' runtime loop instead). */
  private[graft] def pqScaledIndexArtifacts(e0: DataFrame)
      : (Seq[Seq[Double]], Map[Int, Seq[(Long, Seq[Double])]], DataFrame) =
    pqScaledIndexArtifactsWith(e0, scaledCodebook(e0, scaledK(e0)))

  /** The artifacts against an EXPLICIT coarse codebook — the store
    * build's entry point (first-K or trained, its caller's choice). */
  private[graft] def pqScaledIndexArtifactsWith(e0: DataFrame,
      cents: Seq[Seq[Double]])
      : (Seq[Seq[Double]], Map[Int, Seq[(Long, Seq[Double])]], DataFrame) = {
    val subs = graft.core.Caches.persistTracked(
      pqScaledSubvectors(e0, cents))
    val pqCents = pqTrain(subs, PqIters)
    val codes = subs.select(col("vec_id"), col("bkt"), col("sub"),
      nnKey(pqCode(col("sv"), col("sub"), pqCents)).as("code"))
    (cents, pqCents, codes)
  }

  /** (vec_id, bkt, sub, sv) with the SCALED bucket tag riding through
    * the subvector explode — one scan of the batch. */
  private def pqScaledSubvectors(batch: DataFrame,
      cents: Seq[Seq[Double]]): DataFrame = {
    val e = VectorExprs.normalized(
      batch.withColumn("v", col("embedding").cast("array<double>")),
      "embedding", "nv", Seq("vec_id", "v"))
      .withColumn("__s", element_at(scaledScores(col("nv"), cents), 1))
      .select(col("vec_id"), nnKey(-col("__s.negid")).as("bkt"), col("v"))
    // An EMPTY batch has no row to probe the dimension from — serve the
    // typed empty relation instead of crashing `.head` (review r14
    // finding 3: an empty ingest day must advance like every sibling
    // store's, not leave the day half-retired).
    val hd = e.select(size(col("v"))).head(1)
    if (hd.isEmpty)
      return e.select(col("vec_id"), col("bkt"),
        lit(0).as("sub"), col("v").as("sv"))
    val w = hd(0).getInt(0) / PqSubspaces
    e.select(col("vec_id"), col("bkt"), posexplode(
        array((0 until PqSubspaces).map(s => slice(col("v"), s * w + 1, w)): _*)))
      .select(col("vec_id"), col("bkt"), col("pos").as("sub"), col("col").as("sv"))
  }

  /** Encode one batch against FROZEN scaled + PQ codebooks — the
    * advance-day kernel of [[graft.sources.VectorIndexStore]]'s scaled
    * PQ face: no training, one batch scan. */
  private[graft] def pqEncodeScaledWith(batch: DataFrame,
      cents: Seq[Seq[Double]],
      pqCents: Map[Int, Seq[(Long, Seq[Double])]]): DataFrame =
    pqScaledSubvectors(batch, cents)
      .select(col("vec_id"), col("bkt"), col("sub"),
        nnKey(pqCode(col("sv"), col("sub"), pqCents)).as("code"))

  /** Q195: the 100 TB ANN SERVING shape as one tested artifact —
    * IVF-PQ at DATA-SCALED K (VERDICT r13 next-2): q188 fixed the flat
    * index's production geometry (K = ⌈√N⌉ keeps the bucket join
    * linear in corpus where the oracle-pinned K=16 goes
    * fixture-quadratic), q79/q80/q88 fixed the compression (codes
    * travel, never raw vectors), but their composition — the shape a
    * billion-vector deployment actually serves — existed only as a
    * SCALE.md paragraph. Here: scaled coarse pruning decides WHICH
    * codes a query meets, ADC scores them from the broadcast k'·m
    * centroid table, and the [[RefineShortlist]]-deep exact re-rank
    * repairs quantization misordering to the final [[TopK]].
    *
    * Rows-only by design, doubly: K is data-dependent (q188's reason)
    * and ADC distances are quantized (q80's reason would still hold) —
    * no single SQL text expresses it across SFs. SimilaritySpec pins
    * recall@k against the exact brute-force ground truth (the q136
    * pattern) and byte-parity through the store face; the xpk bench
    * pair prices what the store amortizes (the N·√N assignment + PQ
    * train + encode — everything but the probe). */
  def q195IvfPqScaled(spark: SparkSession, dir: String): DataFrame =
    ivfPqScaledOn(emb(spark, dir))

  private[graft] def ivfPqScaledOn(e0: DataFrame): DataFrame = {
    val spark = e0.sparkSession
    import spark.implicits._
    // Store-or-inline, the q82/q88 contract: a configured-and-fresh
    // scaled PQ face supplies all three artifacts and the assignment +
    // training + encode passes are skipped entirely. Stale ⇒ inline.
    // e0 serves as BOTH halves of the two-relation freshness contract
    // here (q195 indexes its whole corpus); a maintenance caller opens
    // with its build-time codebook corpus and the grown index instead.
    val (cents, pqCents, codes) =
      graft.sources.VectorIndexStore.openFreshPqScaled(e0, e0)
        .getOrElse(pqScaledIndexArtifacts(e0))
    val centDf = pqCents.toSeq
      .flatMap { case (sub, cs) => cs.map { case (cid, cv) => (sub, cid, cv) } }
      .toDF("csub", "cid", "cv")
    val q0 = e0.where(col("vec_id") < NumQueries)
    val probes = VectorExprs.normalized(q0, "embedding", "nv", Seq("vec_id"))
      .withColumn("__s", explode(slice(scaledScores(col("nv"), cents), 1, NProbe)))
      .select(col("vec_id").as("q_id"), (-col("__s.negid")).as("pbkt"))
    val qsubs = pqSubvectors(q0)
      .select(col("vec_id").as("qq_id"), col("sub").as("qsub"), col("sv").as("qv"))
    refineOf(adcOf(codes, probes, centDf, qsubs), e0)
  }

  val pqRefineSql: String =
    s"""WITH $ivfPqCtes,
       |sr AS (SELECT q_id, n_id, row_number() OVER (
       |    PARTITION BY q_id ORDER BY adc, n_id) AS srn FROM t),
       |sl AS (SELECT q_id, n_id FROM sr WHERE srn <= $RefineShortlist),
       |n AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv FROM e),
       |x AS (SELECT sl.q_id, sl.n_id, list_dot_product(qn.nv, nn.nv) AS c
       |  FROM sl JOIN n nn ON nn.vec_id = sl.n_id
       |  JOIN n qn ON qn.vec_id = sl.q_id),
       |r AS (SELECT q_id, n_id, c,
       |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) AS rn FROM x)
       |SELECT q_id, n_id, rn, round(c, 6) AS sim FROM r WHERE rn <= $TopK""".stripMargin

  /** The quantization error of the nearest centroid — [[pqCode]]'s
    * companion for measuring codebook quality (spec use). */
  private[operators] def pqMinDist(sv: Column, sub: Column,
      bySub: Map[Int, Seq[(Long, Seq[Double])]]): Column =
    (0 until PqSubspaces).foldLeft(lit(null).cast("double")) { (acc, si) =>
      val scores = array(bySub(si).map { case (cid, cv) =>
        struct(sqDist(sv, cv).as("dist"), lit(cid).as("cid"))
      }: _*)
      when(sub === si, element_at(array_sort(scores), 1).getField("dist"))
        .otherwise(acc)
    }

  /** Shared oracle CTE chain up to the trained codebook (`c1`) and the
    * final assignment (`a2`) — q79 selects the codes, q80 scores ADC
    * distances against them. */
  // a def, not a val: adcTopKSql initializes earlier in the object —
  // a val here would interpolate as "null" into it
  private def pqCtes: String = {
    val dist =
      "list_dot_product(s.sv, s.sv) - 2 * list_dot_product(s.sv, c.cv) + list_dot_product(c.cv, c.cv)"
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |p AS (SELECT CAST(len(v) // $PqSubspaces AS INT) AS w FROM e LIMIT 1),
       |s AS (SELECT vec_id, b.sub AS sub,
       |    list_slice(v, b.sub * w + 1, b.sub * w + w) AS sv
       |  FROM e, p, (SELECT unnest(range($PqSubspaces)) AS sub) b),
       |c0 AS (SELECT sub, vec_id AS c_id, sv AS cv FROM s WHERE vec_id < $PqCodebook),
       |a1 AS (SELECT s.vec_id, s.sub, s.sv, c.c_id, row_number() OVER (
       |    PARTITION BY s.vec_id, s.sub ORDER BY $dist, c.c_id) AS rn
       |  FROM s JOIN c0 c ON s.sub = c.sub),
       |m1 AS (SELECT sub, c_id, d.d AS dim,
       |    CAST(sum(CAST(sv[d.d + 1] AS DECIMAL(18, 6))) AS DOUBLE) / count(sv[d.d + 1]) AS mv
       |  FROM a1, (SELECT unnest(range((SELECT w FROM p))) AS d) d
       |  WHERE rn = 1 GROUP BY 1, 2, 3),
       |c1 AS (SELECT sub, c_id, list(mv ORDER BY dim) AS cv FROM m1 GROUP BY 1, 2),
       |a2 AS (SELECT s.vec_id, s.sub, c.c_id, row_number() OVER (
       |    PARTITION BY s.vec_id, s.sub ORDER BY $dist, c.c_id) AS rn
       |  FROM s JOIN c1 c ON s.sub = c.sub)""".stripMargin
  }

  val pqEncodeSql: String =
    s"""WITH $pqCtes
       |SELECT vec_id, CAST(sub AS BIGINT) AS sub, c_id AS code
       |FROM a2 WHERE rn = 1""".stripMargin

  // -------------------------------------- q123 MMR diverse selection
  /** MMR trade-off weight: score = λ·relevance − (1−λ)·max-sim-to-picked. */
  val MmrLambda = 0.7
  /** Per-group candidate pool cap — bounds the greedy's O(pool²·k)
    * work and the group buffer regardless of bucket size. */
  val MmrPool = 256
  /** Selections per group. */
  val MmrK = 5

  /** Q123: maximal-marginal-relevance selection — the diversity-aware
    * subsampling step of training-data curation (Carbonell & Goldstein,
    * SIGIR'98): per label bucket, greedily pick [[MmrK]] vectors
    * maximizing λ·cos(v, bucket centroid) − (1−λ)·max cos(v, already
    * picked), so the selection covers the bucket instead of k copies
    * of its densest mode. Deterministic: unit-normalized vectors in
    * fixed (vec_id) order, ties broken by (score desc, vec_id asc).
    *
    * Scale shape: ONE shuffle (groupByKey on the bucket key); the
    * group buffer and the greedy are bounded by [[MmrPool]] (candidates
    * pre-ranked by relevance before the quadratic part) — the operator
    * expects PRE-BUCKETED input (a label, an IVF cell from q21's
    * assignment, a stratum), which is how diversity selection runs in
    * production: global MMR over a corpus is not a thing; per-bucket
    * MMR inside a partitioned sweep is. Greedy selection is inherently
    * sequential per bucket — no SQL formulation → rows-only check;
    * SimilaritySpec pins a hand-computed pick order (diversity beating
    * a near-duplicate of the first pick). */
  def q123MmrDiverse(spark: SparkSession, dir: String): DataFrame =
    mmrDiverseOn(Tables(spark, dir, "embeddings"), MmrK)

  private[graft] def mmrDiverseOn(emb: DataFrame, k: Int,
      lambda: Double = MmrLambda, pool: Int = MmrPool): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    emb.select(col("label").cast("int"), col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Int, Long, Array[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (label, it) =>
        val vs = it.map { case (_, id, v) =>
          val n = math.sqrt(dot(v, v))
          (id, if (n > 0) v.map(_ / n) else v)
        }.toArray.sortBy(_._1) // fixed order → deterministic float sums
        if (vs.isEmpty) Iterator.empty
        else {
          val d = vs(0)._2.length
          val mean = new Array[Double](d)
          vs.foreach { case (_, v) =>
            var i = 0; while (i < d) { mean(i) += v(i); i += 1 }
          }
          val mn = math.sqrt(dot(mean, mean))
          val c = if (mn > 0) mean.map(_ / mn) else mean
          val ranked = vs.map { case (id, v) => (id, v, dot(v, c)) }
            .sortBy { case (id, _, rel) => (-rel, id) }.take(pool)
          val selected = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Array[Double], Double, Double)]
          val remaining = scala.collection.mutable.ArrayBuffer(ranked.toSeq: _*)
          while (selected.size < k && remaining.nonEmpty) {
            val best = remaining.map { case (id, v, rel) =>
              val maxSim = if (selected.isEmpty) 0.0
                else selected.iterator.map(s => dot(v, s._2)).max
              (id, v, rel, lambda * rel - (1 - lambda) * maxSim)
            }.minBy { case (id, _, _, sc) => (-sc, id) }
            selected += best
            remaining.remove(remaining.indexWhere(_._1 == best._1))
          }
          selected.iterator.zipWithIndex.map { case ((id, _, rel, sc), i) =>
            (label, i + 1, id,
              math.rint(rel * 1e6) / 1e6, math.rint(sc * 1e6) / 1e6)
          }
        }
      }
      .toDF("label", "rank", "vec_id", "rel", "score")
  }

  // --------------------------------------------- embedding-space outliers
  /** Bottom-K most-outlying vectors — the embedding-space face of q92's
    * scalar MAD audit: vectors least aligned with the corpus centroid
    * are mislabeled/garbage/off-distribution candidates a curation pass
    * reviews before training (SemDedup's complement: q130 removes
    * what's too SIMILAR; this surfaces what's too ALIEN).
    *
    * Spark-first shape, and why it holds at 100 TB:
    *  - The centroid is a per-dimension DECIMAL sum — `posexplode` into
    *    (dim, x) feeds a hash aggregation with map-side combine, so the
    *    shuffle carries ≤ partitions×[[EmbedDim]] partial rows, never
    *    the corpus. Decimal summation makes the centroid bit-identical
    *    under any partitioning (the repo-wide order-independence
    *    contract), and cosine is scale-invariant, so the SUM vector
    *    stands in for the mean — no division, no rounding drift.
    *  - The collected centroid ([[EmbedDim]] doubles — codebook-sized,
    *    like [[centroidList]]) returns as a literal: scoring is one
    *    narrow codegen'd projection over a single corpus scan.
    *  - Bottom-K extraction rides the bounded-buffer [[TopKAggregator]]
    *    on the negated score — ≤ K rows per partition cross the wire,
    *    no corpus-wide sort. */
  private val OutlierK = 20

  def q161EmbedOutliers(spark: SparkSession, dir: String): DataFrame =
    embedOutliersOn(emb(spark, dir), OutlierK)

  /** The corpus centroid as a per-dimension DECIMAL sum (cosine is
    * scale-invariant, so the SUM vector stands in for the mean with no
    * division or rounding drift). Map-side combine bounds the shuffle
    * at partitions×dim partial rows; the result is bit-identical under
    * any partitioning. Shared by the batch outlier audit (q161) and
    * the streaming embedding gate. */
  private[graft] def centroidSum(e: DataFrame): Seq[Double] =
    e.select(posexplode(col("embedding")))
      .groupBy("pos")
      .agg(sum(col("col").cast("double").cast("decimal(28,12)")).as("s"))
      .collect()
      .map(r => (r.getInt(0), r.getDecimal(1).doubleValue()))
      .sortBy(_._1).map(_._2).toSeq

  private[graft] def embedOutliersOn(e: DataFrame, k: Int): DataFrame = {
    val cent = centroidSum(e)
    val scored = e.select(lit(0L).as("q_id"), col("vec_id").as("n_id"),
      (-cosine(col("embedding"), typedlit(cent))).as("cos"))
    topK(scored, k)
      .select(col("n_id").as("vec_id"), col("rn"),
        round(-col("sim"), 6).as("sim"))
  }

  val q161Sql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |d AS (SELECT dim, CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS s
       |      FROM (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS dim FROM e)
       |      GROUP BY dim),
       |c AS (SELECT list(s ORDER BY dim) AS cv FROM d),
       |p AS (SELECT vec_id,
       |        list_dot_product(v, cv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) AS cos
       |      FROM e CROSS JOIN c),
       |r AS (SELECT vec_id, cos, row_number() OVER (ORDER BY cos ASC, vec_id) AS rn FROM p)
       |SELECT vec_id, rn, round(cos, 6) AS sim FROM r WHERE rn <= $OutlierK""".stripMargin

  // -------------------------------------- q185 semantic decontamination
  /** Cosine threshold above which a training vector counts as a
    * semantic copy of an eval vector. Tuned to this corpus's pair-sim
    * distribution exactly like [[SemDedupTau]] (max pairwise cosine
    * ≈ 0.53 at sf0.1) so the decision is exercised at every SF;
    * production corpora with real paraphrased benchmark copies run
    * τ ≈ 0.9+. */
  private[graft] val SemDeconTau = 0.35

  /** Q185: SEMANTIC eval-set decontamination — the decon face the exact
    * K-gram tier (q172–q179) cannot see: a lightly paraphrased benchmark
    * copy shares no 40-char run with the eval set, so it sails through
    * every gram gate, but its EMBEDDING still sits next to the eval
    * doc's. This is the embedding-space probe that closes that hole
    * (the documented failure mode of exact decontamination — Lee et
    * al. 2021 §6 discuss exact-substring misses; SemDeDup's
    * cosine-threshold semantics applied cross-corpus and DIRECTIONALLY,
    * like q172: eval is never modified, train-internal duplication is
    * not this query's business).
    *
    * Shape: one row per (train doc, eval doc) semantic match at
    * τ = [[SemDeconTau]] — the governance relation q179's matrix rolls
    * up, and the flag relation a curation pass anti-joins on.
    *
    * Scale shape, the q26 candidate generator made directional:
    * both sides multi-assign to their [[NearDupProbes]] nearest coarse
    * centroids (narrow literal-codebook projection, zero shuffle);
    * candidates are bucket-equi-join pairs — volume ∝ Σ bucket_t ×
    * bucket_e, never |train| × |eval| — and the eval side (benchmark-
    * sized in production: MBs against TBs) BROADCASTS into both the
    * candidate join and the exact verify, so the train corpus is
    * scanned once and never shuffled. Every candidate is exactly
    * verified with a pre-normalized codegen'd dot. Multi-assignment
    * buys the recall argmax-only bucketing loses (two near vectors
    * whose argmax centroids differ still meet in a second-choice
    * bucket). Oracle-green: the whole pipeline — assignment, banding,
    * verify — is deterministic dot-product math DuckDB reproduces
    * exactly. */
  def q185SemanticDecon(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    semanticDeconOn(
      e.where(col("vec_id") % 10 =!= 0),
      e.where(col("vec_id") % 10 === 0), SemDeconTau)
  }

  /** The kernel behind q185 and [[graft.streaming.DeconGate]]'s
    * semantic face: directional semantic matches of `train` vectors
    * against `evalRel` vectors at cosine ≥ `tau`. The coarse codebook
    * is the union corpus's first [[NumCentroids]] vectors (the q21
    * convention — at scale, a trained k-means artifact both sides
    * share). */
  private[graft] def semanticDeconOn(train: DataFrame, evalRel: DataFrame,
      tau: Double, probes: Int = NearDupProbes): DataFrame = {
    val cents = centroidList(train.unionByName(evalRel))
    def assign(rel: DataFrame, as: String): DataFrame = rel
      .withColumn("__c", topCentroids(centroidScores(col("embedding"), cents), probes))
      .select(col("vec_id").as(as), (-col("__c.negid")).as("bkt"))
    // An empty codebook (a batch whose ids all sit past the codebook
    // convention — possible for the streaming gate, never for q185)
    // must NOT silently prune every candidate: fall back to the exact
    // directional product against the broadcast benchmark-sized eval
    // side — a cost, never a missed leak.
    val cands =
      if (cents.isEmpty)
        train.select(col("vec_id").as("doc_id"))
          .crossJoin(broadcast(evalRel.select(col("vec_id").as("eval_doc"))))
      else assign(train, "doc_id")
        .join(broadcast(assign(evalRel, "eval_doc")), "bkt")
        .select("doc_id", "eval_doc").distinct()
    val tN = VectorExprs.normalized(train, "embedding", "nv", Seq("vec_id"))
    val eN = VectorExprs.normalized(evalRel, "embedding", "nv", Seq("vec_id"))
    cands
      .join(tN.select(col("vec_id").as("doc_id"), col("nv").as("tv")), "doc_id")
      .join(broadcast(eN.select(col("vec_id").as("eval_doc"), col("nv").as("ev"))),
        "eval_doc")
      .withColumn("sim", VectorExprs.dot(col("tv"), col("ev")))
      .where(col("sim") >= tau)
      .select(col("doc_id"), col("eval_doc"), round(col("sim"), 6).as("sim"))
  }

  /** Multi-probe assignment with the unit-normalized vector carried —
    * the relation [[graft.sources.SemanticDeconStore]] persists per
    * benchmark: one row per (vec, probe), (vec_id, nv, bkt).
    * Assignment runs on the RAW embedding exactly like
    * [[semanticDeconOn]]'s (cosine is scale-invariant mathematically,
    * but float op order is not — matching the inline arm bit-for-bit
    * is what makes store/inline parity exact, not approximate). */
  private[graft] def multiAssignWithNv(rel: DataFrame,
      cents: Seq[(Long, Seq[Double])], probes: Int = NearDupProbes): DataFrame = {
    val assigned = rel
      .withColumn("__c", topCentroids(centroidScores(col("embedding"), cents), probes))
      .select(col("vec_id"), (-col("__c.negid")).as("bkt"))
    VectorExprs.normalized(rel, "embedding", "nv", Seq("vec_id"))
      .join(assigned, "vec_id")
      .select("vec_id", "nv", "bkt")
  }

  /** [[semanticDeconOn]] against a PRE-ASSIGNED eval index (frozen
    * codebook + per-benchmark (vec_id, nv, bkt) rows — the
    * SemanticDeconStore face): the batch assigns against the STORED
    * codebook, so two different batches give a shared vector the SAME
    * verdict — the batch-independence the inline union-codebook
    * derivation cannot promise. Result ≡ inline whenever the stored
    * codebook equals the union derivation's (spec-pinned). */
  private[graft] def semanticDeconVia(train: DataFrame,
      cents: Seq[(Long, Seq[Double])], evalIdx: DataFrame, tau: Double,
      probes: Int = NearDupProbes): DataFrame = {
    val tAssign = train
      .withColumn("__c", topCentroids(centroidScores(col("embedding"), cents), probes))
      .select(col("vec_id").as("doc_id"), (-col("__c.negid")).as("bkt"))
    val cands = tAssign
      .join(broadcast(evalIdx.select(col("vec_id").as("eval_doc"), col("bkt"))), "bkt")
      .select("doc_id", "eval_doc").distinct()
    val tN = VectorExprs.normalized(train, "embedding", "nv", Seq("vec_id"))
    val eN = evalIdx.select(col("vec_id").as("eval_doc"), col("nv").as("ev")).distinct()
    cands
      .join(tN.select(col("vec_id").as("doc_id"), col("nv").as("tv")), "doc_id")
      .join(broadcast(eN), "eval_doc")
      .withColumn("sim", VectorExprs.dot(col("tv"), col("ev")))
      .where(col("sim") >= tau)
      .select(col("doc_id"), col("eval_doc"), round(col("sim"), 6).as("sim"))
  }

  /** The q185 match relation at an arbitrary τ — q185's own oracle is
    * the [[SemDeconTau]] instance; q194's sensitivity face needs the
    * grid's floor. */
  private def semanticDeconSqlAt(tau: Double): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NumCentroids),
       |ac AS (SELECT e.vec_id, c_id,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      list_dot_product(v, cv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) DESC, c_id) AS arn
       |  FROM e CROSS JOIN cent),
       |assign AS (SELECT vec_id, c_id AS bkt FROM ac WHERE arn <= $NearDupProbes),
       |cand AS (SELECT DISTINCT t.vec_id AS doc_id, ev.vec_id AS eval_doc
       |  FROM assign t JOIN assign ev ON t.bkt = ev.bkt
       |  WHERE t.vec_id % 10 <> 0 AND ev.vec_id % 10 = 0),
       |n AS (SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv FROM e),
       |p AS (SELECT doc_id, eval_doc, list_dot_product(a.nv, b.nv) AS c
       |  FROM cand JOIN n a ON a.vec_id = doc_id JOIN n b ON b.vec_id = eval_doc)
       |SELECT doc_id, eval_doc, round(c, 6) AS sim FROM p WHERE c >= $tau""".stripMargin

  val semanticDeconSql: String = semanticDeconSqlAt(SemDeconTau)

  // ------------------------------------ q194 τ sensitivity report face
  /** The τ grid the sensitivity report sweeps — brackets [[SemDeconTau]]
    * (0.35) symmetrically so the report shows the decision's
    * neighborhood, floor low enough to expose the match-volume cliff. */
  private[graft] val SemTauGrid = Seq(0.25, 0.3, 0.35, 0.4, 0.45, 0.5)

  /** Q194: semantic-decon τ SENSITIVITY — the report a governance owner
    * reads before moving the threshold (VERDICT r13 next-1: τ = 0.35 is
    * a fixture convention; the way a deployment picks ITS τ is exactly
    * this sweep against its own corpus). Per grid τ: how many
    * (train, eval) matches survive, how many train docs would be
    * dropped, how many eval docs are implicated — zeros reported, not
    * omitted (a τ that kills every match is the finding). One kernel
    * pass at the grid FLOOR feeds every row: the match relation is
    * already bounded (bucket-candidate pairs), so the sweep is a
    * 6×-explode of a bounded relation plus one aggregate — the
    * threshold never re-runs the candidate join. Oracle-green rollup
    * of q185's relation at the floor τ.
    *
    * Grid rows count `round(sim, 6) >= τ` ([[semanticDeconOn]] emits
    * the 6-dp rounded similarity; the oracle rounds identically, so
    * parity is exact) — a boundary pair at c = τ − ε, ε < 5e-7 is
    * counted here but not by q185's unrounded `c >= τ` verdict, so
    * the operating-τ row can exceed q185's volume by such pairs. The
    * report reads as "matches at 6-dp precision", which is what a
    * governance sweep wants; the gate itself stays unrounded. */
  def q194SemTauSensitivity(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val m = semanticDeconOn(
      e.where(col("vec_id") % 10 =!= 0),
      e.where(col("vec_id") % 10 === 0), SemTauGrid.min)
    val agg = m
      .select(explode(typedlit(SemTauGrid)).as("tau"),
        col("doc_id"), col("eval_doc"), col("sim"))
      .where(col("sim") >= col("tau"))
      .groupBy("tau")
      .agg(count(lit(1)).as("n_matches"),
        countDistinct("doc_id").as("n_train_flagged"),
        countDistinct("eval_doc").as("n_eval_hit"))
    // agg is ≤ |grid| rows BY CONSTRUCTION (groupBy on the exploded
    // grid column) — broadcast it explicitly rather than leaving a
    // 6-row relation to a static sort-merge plan.
    spark.createDataFrame(SemTauGrid.map(Tuple1(_))).toDF("tau")
      .join(broadcast(agg), Seq("tau"), "left")
      .select(col("tau"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("n_train_flagged"), lit(0L)).as("n_train_flagged"),
        coalesce(col("n_eval_hit"), lit(0L)).as("n_eval_hit"))
  }

  val semTauSensitivitySql: String = {
    val grid = SemTauGrid.map(t => s"$t::DOUBLE").mkString(", ")
    s"""WITH m AS (${semanticDeconSqlAt(SemTauGrid.min)}),
       |grid AS (SELECT unnest([$grid]) AS tau),
       |f AS (SELECT tau, count(*) AS cnt,
       |        count(DISTINCT doc_id) AS ntf, count(DISTINCT eval_doc) AS neh
       |      FROM grid JOIN m ON m.sim >= grid.tau GROUP BY tau)
       |SELECT g.tau,
       |  CAST(coalesce(f.cnt, 0) AS BIGINT) AS n_matches,
       |  CAST(coalesce(f.ntf, 0) AS BIGINT) AS n_train_flagged,
       |  CAST(coalesce(f.neh, 0) AS BIGINT) AS n_eval_hit
       |FROM grid g LEFT JOIN f ON g.tau = f.tau""".stripMargin
  }

  // -------------------------- q190/q191 semantic decon report + act faces
  /** Q190: per-benchmark SEMANTIC contamination coverage — the q183
    * mirror for the embedding face, and the model-card number exact
    * coverage cannot see: for each eval doc, how many training docs
    * sit within cosine τ of it, and the strongest match. Eval docs
    * with zero semantic matches are reported at 0 — the audit's point
    * is the clean rows as much as the dirty ones. Pure rollup of
    * q185's bounded match relation plus one narrow eval-id scan. */
  def q190SemanticCoverage(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val ev = e.where(col("vec_id") % 10 === 0)
    val m = semanticDeconOn(e.where(col("vec_id") % 10 =!= 0), ev, SemDeconTau)
      .groupBy("eval_doc")
      .agg(count(lit(1)).as("n"), max("sim").as("mx"))
    ev.select(col("vec_id").as("eval_doc")).join(m, Seq("eval_doc"), "left")
      .select(col("eval_doc"),
        coalesce(col("n"), lit(0L)).as("n_matches"),
        coalesce(col("mx"), lit(0.0)).as("max_sim"))
  }

  val semanticCoverageSql: String =
    s"""WITH m AS ($semanticDeconSql)
       |SELECT e.vec_id AS eval_doc,
       |  CAST(coalesce(g.cnt, 0) AS BIGINT) AS n_matches,
       |  coalesce(g.mx, 0.0) AS max_sim
       |FROM (SELECT vec_id FROM embeddings WHERE vec_id % 10 = 0) e
       |LEFT JOIN (SELECT eval_doc, count(*) AS cnt, max(sim) AS mx
       |           FROM m GROUP BY 1) g ON e.vec_id = g.eval_doc""".stripMargin

  /** Q191: the semantic decon ACT face — the keep/drop decision a
    * curation pass filters on, q173's counterpart where excision is
    * impossible (there is no "span" of an embedding: a semantic
    * benchmark copy drops WHOLE, with its witness recorded for the
    * audit trail). One row per training vector: keep = no eval vector
    * within τ; flagged rows carry the smallest witnessing eval id and
    * the strongest similarity. Same bounded shapes as q185 — the
    * decision join is match-relation-sized, the keep column rides a
    * left join over one train scan. */
  def q191SemanticScrub(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val train = e.where(col("vec_id") % 10 =!= 0)
    val m = semanticDeconOn(train, e.where(col("vec_id") % 10 === 0), SemDeconTau)
      .groupBy("doc_id")
      .agg(min("eval_doc").as("w"), count(lit(1)).as("n"), max("sim").as("mx"))
    train.select(col("vec_id").as("doc_id")).join(m, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("w").isNull.as("keep"),
        col("w").as("witness_eval"),
        coalesce(col("mx"), lit(0.0)).as("max_sim"))
  }

  val semanticScrubSql: String =
    s"""WITH m AS ($semanticDeconSql)
       |SELECT t.vec_id AS doc_id,
       |  g.doc_id IS NULL AS keep,
       |  g.w AS witness_eval,
       |  coalesce(g.mx, 0.0) AS max_sim
       |FROM (SELECT vec_id FROM embeddings WHERE vec_id % 10 <> 0) t
       |LEFT JOIN (SELECT doc_id, min(eval_doc) AS w, max(sim) AS mx
       |           FROM m GROUP BY 1) g ON t.vec_id = g.doc_id""".stripMargin

  // ------------------------------------------- ANN ranking-quality eval
  /** Q164: MRR and binary nDCG@k of the IVF path against exact
    * ground truth — the ranking-quality face of q136's recall@k (recall
    * says the right neighbors were FOUND; nDCG says they surfaced in
    * the right ORDER, and MRR says how deep a user digs for the true
    * nearest neighbor). Per query: MRR = 1/rank of the exact top-1 in
    * the IVF list (0 if pruned away); DCG = Σ 1/log2(rank+1) over IVF
    * hits that are true top-k members, normalized by the exact list's
    * own Σ — so a perfect probe scores 1.0 on both.
    *
    * Scale shape: both arms are the already-bounded q20/q21 pipelines
    * (broadcast queries, partial top-k); the eval itself joins two
    * k×|queries| relations — constant-sized work after the scans. The
    * log-discount sums go through DECIMAL(18,12) so the metric is
    * bit-identical under any partitioning (the repo-wide
    * order-independence contract). */
  def q164AnnRankEval(spark: SparkSession, dir: String): DataFrame = {
    val truth = graft.core.Caches.persistTracked(cosineTopK(spark, dir))
    val approx = graft.core.Caches.persistTracked(ivfAnn(spark, dir))
    def discount(rn: Column): Column =
      (lit(1.0) / log2(rn.cast("double") + lit(1.0))).cast("decimal(18,12)")
    val idcg = truth.groupBy("q_id").agg(sum(discount(col("rn"))).as("idcg"))
    val dcg = approx
      .join(truth.select("q_id", "n_id"), Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(sum(discount(col("rn"))).as("dcg"))
    val mrr = truth.where(col("rn") === 1).select(col("q_id"), col("n_id"))
      .join(approx.select(col("q_id"), col("n_id"), col("rn").as("arn")),
        Seq("q_id", "n_id"), "left")
      .select(col("q_id"),
        coalesce(lit(1.0) / col("arn").cast("double"), lit(0.0)).as("mrr"))
    idcg.join(dcg, Seq("q_id"), "left").join(mrr, Seq("q_id"))
      .select(col("q_id"), round(col("mrr"), 6).as("mrr"),
        round(coalesce(col("dcg").cast("double"), lit(0.0))
          / col("idcg").cast("double"), 6).as("ndcg"))
  }

  val q164Sql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NumQueries),
       |px AS (SELECT q_id, e.vec_id AS n_id,
       |    list_dot_product(qv, v) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))) AS c
       |  FROM q JOIN e ON q.q_id != e.vec_id),
       |ex AS (SELECT q_id, n_id, rn FROM (SELECT q_id, n_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) AS rn FROM px)
       |  WHERE rn <= $TopK),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NumCentroids),
       |ac AS (SELECT e.vec_id, e.v, c_id,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      list_dot_product(v, cv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) DESC, c_id) AS arn
       |  FROM e CROSS JOIN cent),
       |assign AS (SELECT vec_id AS n_id, v AS nv, c_id AS bkt FROM ac WHERE arn = 1),
       |qp AS (SELECT q_id, qv, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY
       |      list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) DESC, c_id) AS prn
       |  FROM q CROSS JOIN cent),
       |probes AS (SELECT q_id, qv, c_id AS bkt FROM qp WHERE prn <= $NProbe),
       |pa AS (SELECT q_id, n_id,
       |    list_dot_product(qv, nv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS c
       |  FROM probes JOIN assign USING (bkt) WHERE q_id != n_id),
       |ap AS (SELECT q_id, n_id, rn FROM (SELECT q_id, n_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) AS rn FROM pa)
       |  WHERE rn <= $TopK),
       |idcg AS (SELECT q_id, SUM(CAST(1.0 / log2(rn + 1.0) AS DECIMAL(18,12))) AS idcg
       |  FROM ex GROUP BY q_id),
       |dcg AS (SELECT ap.q_id, SUM(CAST(1.0 / log2(ap.rn + 1.0) AS DECIMAL(18,12))) AS dcg
       |  FROM ap JOIN ex USING (q_id, n_id) GROUP BY ap.q_id),
       |mrr AS (SELECT ex1.q_id, coalesce(1.0 / ap.rn, 0.0) AS mrr
       |  FROM (SELECT q_id, n_id FROM ex WHERE rn = 1) ex1
       |  LEFT JOIN ap USING (q_id, n_id))
       |SELECT idcg.q_id, round(mrr.mrr, 6) AS mrr,
       |  round(CAST(coalesce(dcg.dcg, 0) AS DOUBLE) / CAST(idcg.idcg AS DOUBLE), 6) AS ndcg
       |FROM idcg LEFT JOIN dcg USING (q_id) JOIN mrr USING (q_id)""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_cosine_topk" -> cosineTopK _,
    "q21_ivf_ann" -> ivfAnn _,
    "q26_cosine_neardup" -> cosineNearDup _,
    "q43_kmeans" -> kmeansAssign _,
    "q130_semdedup" -> q130SemDedup _,
    "q79_pq_encode" -> pqEncode _,
    "q80_adc_topk" -> adcTopK _,
    "q82_ivfpq_topk" -> ivfPqTopK _,
    "q88_pq_refine" -> pqRefine _,
    "q47_quantize_int8" -> quantizeInt8 _,
    "q123_mmr_diverse" -> q123MmrDiverse _,
    "q125_srp_lsh" -> q125SrpLsh _,
    "q136_ann_recall" -> q136AnnRecall _,
    "q139_ivf_probe" -> q139IvfProbe _,
    "q161_embed_outliers" -> q161EmbedOutliers _,
    "q164_ann_rank_eval" -> q164AnnRankEval _,
    "q185_semantic_decon" -> q185SemanticDecon _,
    "q188_ivf_scaled" -> q188IvfScaled _,
    "q190_semantic_coverage" -> q190SemanticCoverage _,
    "q191_semantic_scrub" -> q191SemanticScrub _,
    "q194_sem_tau_sensitivity" -> q194SemTauSensitivity _,
    "q195_ivfpq_scaled" -> q195IvfPqScaled _)

  val oracles: Map[String, String] = Map(
    "q20_cosine_topk" -> cosineTopKSql,
    "q21_ivf_ann" -> ivfAnnSql,
    "q26_cosine_neardup" -> cosineNearDupSql,
    "q43_kmeans" -> kmeansSql,
    "q130_semdedup" -> semDedupSql,
    "q79_pq_encode" -> pqEncodeSql,
    "q80_adc_topk" -> adcTopKSql,
    "q82_ivfpq_topk" -> ivfPqTopKSql,
    "q88_pq_refine" -> pqRefineSql,
    "q47_quantize_int8" -> quantizeInt8Sql,
    "q125_srp_lsh" -> srpLshSql,
    "q136_ann_recall" -> annRecallSql,
    "q139_ivf_probe" -> q139Sql,
    "q161_embed_outliers" -> q161Sql,
    "q164_ann_rank_eval" -> q164Sql,
    "q185_semantic_decon" -> semanticDeconSql,
    "q190_semantic_coverage" -> semanticCoverageSql,
    "q191_semantic_scrub" -> semanticScrubSql,
    "q194_sem_tau_sensitivity" -> semTauSensitivitySql)
}
