package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Caches, Tables}
import graft.functions.TextExprs

/** Distributed classifier training — the "quality classifier" tier of a
  * training-data pipeline (the GPT-3/PaLM recipe: train a small linear
  * model to score documents against a reference corpus, then filter or
  * importance-sample on the score; see Brown et al. 2020 §A, which used
  * exactly this shape with hashed text features).
  *
  * The trainer is full-batch gradient descent on logistic loss, run AS
  * DATAFRAME JOBS: the corpus-sized work per round is one per-doc margin
  * aggregation and one per-bucket gradient aggregation — both
  * map-side-combined shuffles over a persisted, docs×buckets-bounded
  * feature relation — and the only driver state is the weight vector
  * itself ([[LrBuckets]]+1 doubles), the same bounded-collect shape as the
  * k-means codebook (q43) and the BPE argmax (q117). Nothing corpus-sized
  * ever reaches the driver, so the round cost is flat in corpus size and
  * the trainer scales exactly like the aggregations it is made of.
  *
  * Determinism contract (the reason a 3-round iterative TRAINER can carry
  * a full DuckDB oracle, unrolled as CTE rounds): every sum is
  * DECIMAL(28,12)-before-sum (partition-order independent), every IEEE
  * mul/div is correctly rounded and thus engine-portable, and the one
  * transcendental (the sigmoid's exp) is applied to an exactly-agreed
  * margin and its output immediately rounded to 12 dp, so a final-ulp
  * disagreement between libm implementations is absorbed unless it
  * straddles a 1e-12 boundary — the same contract every green query in
  * this codebase rides on.
  */
object ClassifierQueries {

  /** Hashed-unigram feature width. 16 is the demo size; the published
    * recipes use 10k–1M hashed buckets — identical shape, one knob.
    * `private[graft]`: the streaming [[graft.streaming.QualityGate]]
    * must bucket with the identical constant. */
  private[graft] val LrBuckets = 16

  /** Full-batch GD rounds. Each round is two shuffles; the oracle SQL
    * unrolls the same count. */
  private val LrRounds = 3

  /** Learning rate. 10.0 is exactly representable, so the scaled
    * gradient stays engine-portable IEEE arithmetic. */
  private val LrRate = 10.0

  /** The positive class: documents in the reference language — the
    * stand-in for "looks like the high-quality corpus". */
  private val LrTargetLang = "en"

  /** Q128: logistic-regression quality classifier — train on hashed
    * unigram term-frequency features (x = cnt/n_tokens per bucket, plus
    * a bias term) with label y = [lang = en], for [[LrRounds]] rounds of
    * full-batch gradient descent, then score every document with the
    * learned weights. Output: (doc_id, label, score, pred).
    *
    * w ← w − η · (1/N) Σ_docs (σ(w·x) − y) · x, from w₀ = 0.
    */
  def q128QualityLr(spark: SparkSession, dir: String): DataFrame =
    qualityLrOn(Tables(spark, dir, "documents"))

  /** Train on a batch corpus and return just the learned weight vector
    * (bucket → weight; −1 is the bias) — the artifact a serving tier
    * ships. [[graft.streaming.QualityGate]] applies it to a live
    * document stream as a stateless narrow map. */
  private[graft] def trainWeights(docRel: DataFrame): Map[Long, Double] = {
    val (_, _, w) = trained(docRel)
    graft.core.Caches.releaseAll()
    w
  }

  private[graft] def qualityLrOn(docRel: DataFrame): DataFrame = {
    val (feat, _, w) = trained(docRel)
    scoresOf(feat, w).select(
      col("doc_id"),
      col("y").cast("bigint").as("label"),
      round(col("p"), 6).as("score"),
      (col("p") >= lit(0.5)).cast("int").as("pred"))
  }

  /** Per-doc sigmoid scores under a given weight vector, over the
    * feature relation. The margin is an exact decimal sum; the sigmoid
    * output is rounded to 12 dp. */
  private def scoresOf(feat: DataFrame, w: Map[Long, Double]): DataFrame = {
    val allBuckets: Seq[Long] = -1L to (LrBuckets - 1).toLong
    val wMap = map(allBuckets.flatMap(b => Seq(lit(b), lit(w(b)))): _*)
    feat
      .select(col("doc_id"), col("y"),
        (col("x") * element_at(wMap, col("bucket")))
          .cast("decimal(28,12)").as("t"))
      .groupBy("doc_id", "y").agg(sum("t").cast("double").as("m"))
      .withColumn("p", round(lit(1.0) / (lit(1.0) + exp(-col("m"))), 12))
  }

  /** Build the persisted feature relation and run the GD rounds;
    * returns (features, N, weights). */
  private def trained(docRel: DataFrame): (DataFrame, Double, Map[Long, Double]) = {
    // Feature relation: (doc_id, y, bucket, x) with x the bucket's share
    // of the doc's tokens, plus one bias row (bucket −1, x = 1) per doc.
    // Persisted: every round's margin AND gradient aggregation reads it.
    val tokCnt = docRel
      .select(col("doc_id"), col("lang"),
        explode(TextExprs.tokens(col("text"))).as("tok"))
      .withColumn("bucket", SamplingQueries.hashBucket(col("tok"), LrBuckets))
      .groupBy("doc_id", "lang", "bucket").agg(count(lit(1)).as("cnt"))
    val tf = tokCnt
      .withColumn("n_tok", sum("cnt").over(Window.partitionBy("doc_id")))
      .select(col("doc_id"), col("lang"), col("bucket"),
        (col("cnt").cast("double") / col("n_tok").cast("double")).as("x"))
    val bias = docRel.select(col("doc_id"), col("lang"))
      .withColumn("bucket", lit(-1L)).withColumn("x", lit(1.0))
    val feat = Caches.persistTracked(
      tf.unionByName(bias)
        .withColumn("y",
          when(col("lang") === LrTargetLang, lit(1.0)).otherwise(lit(0.0)))
        .select("doc_id", "y", "bucket", "x"))

    val n = docRel.count().toDouble
    val allBuckets: Seq[Long] = -1L to (LrBuckets - 1).toLong

    var w: Map[Long, Double] = allBuckets.map(_ -> 0.0).toMap
    for (_ <- 1 to LrRounds) {
      val grad = scoresOf(feat, w)
        .select(col("doc_id"), (col("p") - col("y")).as("resid"))
        .join(feat, "doc_id")
        .groupBy("bucket")
        .agg(round(sum((col("resid") * col("x")).cast("decimal(28,12)"))
          .cast("double") / lit(n), 12).as("g"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      w = w.map { case (b, wb) => b -> (wb - LrRate * grad.getOrElse(b, 0.0)) }
    }
    (feat, n, w)
  }

  /** One unrolled GD round as oracle CTEs: margins under w_k, sigmoid,
    * gradient, w_{k+1}. */
  private def roundSql(k: Int): String =
    s"""m$k AS (SELECT fx.doc_id, fx.y,
       |    CAST(sum(CAST(fx.x * coalesce(w${k - 1}.w, 0.0) AS DECIMAL(28,12))) AS DOUBLE) AS m
       |  FROM fx LEFT JOIN w${k - 1} USING (bucket) GROUP BY 1, 2),
       |p$k AS (SELECT doc_id, y, round(1.0 / (1.0 + exp(-m)), 12) AS p FROM m$k),
       |g$k AS (SELECT fx.bucket,
       |    round(CAST(sum(CAST((p$k.p - p$k.y) * fx.x AS DECIMAL(28,12))) AS DOUBLE)
       |      / (SELECT n FROM n), 12) AS g
       |  FROM fx JOIN p$k USING (doc_id) GROUP BY 1),
       |w$k AS (SELECT w${k - 1}.bucket, w${k - 1}.w - $LrRate * coalesce(g$k.g, 0.0) AS w
       |  FROM w${k - 1} LEFT JOIN g$k USING (bucket))""".stripMargin

  /** The full q128 pipeline as a CTE body ending at
    * `pf(doc_id, y, p)` — shared by the q128 and q133 oracles so the
    * evaluated scores are definitionally the served scores. */
  private val q128Ctes: String = {
    val rounds = (1 to LrRounds).map(roundSql).mkString(",\n")
    s"""tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
       |  FROM documents),
       |tc AS (SELECT doc_id, lang,
       |    ('0x' || substr(md5(tok), 1, 8))::BIGINT % $LrBuckets AS bucket,
       |    count(*) AS cnt
       |  FROM tok GROUP BY 1, 2, 3),
       |nt AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tok FROM tc GROUP BY 1),
       |fx AS (SELECT tc.doc_id,
       |    CASE WHEN tc.lang = '$LrTargetLang' THEN 1.0 ELSE 0.0 END AS y,
       |    tc.bucket, CAST(tc.cnt AS DOUBLE) / CAST(nt.n_tok AS DOUBLE) AS x
       |  FROM tc JOIN nt USING (doc_id)
       |  UNION ALL
       |  SELECT doc_id, CASE WHEN lang = '$LrTargetLang' THEN 1.0 ELSE 0.0 END AS y,
       |    -1 AS bucket, 1.0 AS x
       |  FROM documents),
       |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
       |w0 AS (SELECT DISTINCT bucket, 0.0 AS w FROM fx),
       |$rounds,
       |mf AS (SELECT fx.doc_id, fx.y,
       |    CAST(sum(CAST(fx.x * coalesce(w$LrRounds.w, 0.0) AS DECIMAL(28,12))) AS DOUBLE) AS m
       |  FROM fx LEFT JOIN w$LrRounds USING (bucket) GROUP BY 1, 2),
       |pf AS (SELECT doc_id, y, round(1.0 / (1.0 + exp(-m)), 12) AS p FROM mf)""".stripMargin
  }

  val q128Sql: String =
    s"""WITH $q128Ctes
       |SELECT doc_id, CAST(y AS BIGINT) AS label, round(p, 6) AS score,
       |  CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS pred
       |FROM pf""".stripMargin

  /** Q133: ROC AUC of the q128 classifier — the evaluation leg that
    * closes the train (q128) → serve ([[graft.streaming.QualityGate]])
    * → evaluate loop. Computed in the Mann–Whitney rank form: group by
    * distinct score, running count below each score group, midrank for
    * ties, then AUC = (Σ pos·midrank − n⁺(n⁺+1)/2) / (n⁺·n⁻). One row:
    * (auc, n_pos, n_neg).
    *
    * Scale: the corpus-sized work is one groupBy(score) with map-side
    * combine. The subsequent ordered window runs over DISTINCT scores
    * only — and scores are sigmoids rounded to 6 dp, so there are at
    * most 1,000,001 of them no matter how many documents were scored:
    * the single-partition window is bounded by construction, the same
    * bounded-key contract as the audit tier. Every rank term is exact
    * (integers and halves), summed as DECIMAL(28,12) for partition-order
    * independence; the one inexact IEEE division happens last. */
  def q133Auc(spark: SparkSession, dir: String): DataFrame =
    aucOf(q128QualityLr(spark, dir))

  /** The rank-form AUC over any (label ∈ {0,1}, score) relation. */
  private[graft] def aucOf(scored: DataFrame): DataFrame = {
    val grouped = scored.groupBy("score").agg(
      sum(col("label")).as("pos"), count(lit(1)).as("cnt"))
      .withColumn("neg", col("cnt") - col("pos"))
    val below = coalesce(
      sum(col("cnt")).over(Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    grouped.withColumn("below", below)
      .agg(
        sum(col("pos")).as("np"), sum(col("neg")).as("nn"),
        sum((col("pos") * (col("below") + (col("cnt") + lit(1)) / lit(2.0)))
          .cast("decimal(28,12)")).as("rs"))
      .select(
        round((col("rs").cast("double")
          - col("np").cast("double") * (col("np").cast("double") + lit(1.0)) / lit(2.0))
          / (col("np").cast("double") * col("nn").cast("double")), 6).as("auc"),
        col("np").as("n_pos"), col("nn").as("n_neg"))
  }

  val q133Sql: String =
    s"""WITH $q128Ctes,
       |sc AS (SELECT CAST(y AS BIGINT) AS label, round(p, 6) AS score FROM pf),
       |g AS (SELECT score, CAST(sum(label) AS BIGINT) AS pos, count(*) AS cnt
       |  FROM sc GROUP BY score),
       |r AS (SELECT pos, cnt, cnt - pos AS neg,
       |    coalesce(sum(cnt) OVER (ORDER BY score
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
       |  FROM g),
       |t AS (SELECT CAST(sum(pos) AS BIGINT) AS np, CAST(sum(neg) AS BIGINT) AS nn,
       |    CAST(sum(CAST(pos * (below + (cnt + 1) / 2.0) AS DECIMAL(28,12))) AS DOUBLE) AS rs
       |  FROM r)
       |SELECT round((rs - CAST(np AS DOUBLE) * (CAST(np AS DOUBLE) + 1.0) / 2.0)
       |    / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS auc,
       |  np AS n_pos, nn AS n_neg
       |FROM t""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q128_quality_lr" -> q128QualityLr _,
    "q133_auc" -> q133Auc _)

  val oracles: Map[String, String] = Map(
    "q128_quality_lr" -> q128Sql,
    "q133_auc" -> q133Sql)
}
