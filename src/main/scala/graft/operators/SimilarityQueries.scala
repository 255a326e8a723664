package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.VectorExprs
import graft.functions.VectorExprs.cosine

/** Similarity search over the `embeddings` table (`array<float>` vectors).
  *
  * Three tiers:
  *  - brute-force cosine top-k — the correctness baseline; the query set
  *    is small and broadcast, so the big side streams through one
  *    scan with no shuffle of the corpus;
  *  - IVF (inverted-file) ANN — the 100 TB path: vectors are assigned to
  *    coarse centroids once (one broadcast join), queries probe only
  *    their nearest nprobe centroid buckets, so per-query work is
  *    |corpus|/C × nprobe instead of |corpus|;
  *  - cosine near-dup pairs — threshold-filtered, for embedding-level
  *    dedup of a corpus.
  */
object SimilarityQueries {

  private val NumQueries = 10
  private val TopK = 5
  private val NumCentroids = 16
  private val NProbe = 4
  private val NearDupThreshold = 0.55

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "embeddings")

  // ------------------------------------------------- brute-force top-k
  /** Exact cosine top-k: for each of the first [[NumQueries]] vectors,
    * the [[TopK]] nearest others. Queries are broadcast; ties broken by
    * neighbor id for determinism. */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val base = e.select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    base.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("q_vec"), col("n_vec")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= TopK)
      .select(col("q_id"), col("n_id"), col("rn").cast("long").as("rn"),
        round(col("cos"), 6).as("sim"))
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
    * vectors serve as coarse centroids (deterministic "training"); every
    * vector is assigned to its nearest centroid, queries probe their
    * [[NProbe]] nearest centroid buckets only. Centroids and assignments
    * are broadcast-scale; the corpus is scanned once for assignment and
    * once per probe — never all-pairs. */
  def ivfAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val cent = e.where(col("vec_id") < NumCentroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))

    // corpus → nearest centroid (argmax cosine, ties to lowest centroid)
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("cc").desc, col("c_id"))
    val assign = e.crossJoin(broadcast(cent))
      .withColumn("cc", cosine(col("embedding"), col("c_vec")))
      .withColumn("arn", row_number().over(wAssign))
      .where(col("arn") === 1)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_vec"), col("c_id").as("cluster"))

    // query → nprobe nearest centroids
    val q = e.where(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("qc").desc, col("c_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("qc", cosine(col("q_vec"), col("c_vec")))
      .withColumn("prn", row_number().over(wProbe))
      .where(col("prn") <= NProbe)
      .select(col("q_id"), col("q_vec"), col("c_id").as("cluster"))

    // search only the probed buckets
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    assign.join(broadcast(probes), "cluster")
      .where(col("q_id") =!= col("n_id"))
      .withColumn("cos", cosine(col("q_vec"), col("n_vec")))
      .withColumn("rn", row_number().over(wTop))
      .where(col("rn") <= TopK)
      .select(col("q_id"), col("n_id"), col("rn").cast("long").as("rn"),
        round(col("cos"), 6).as("sim"))
  }

  val ivfAnnSql: String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent AS (SELECT vec_id AS c_id, v AS cv FROM e WHERE vec_id < $NumCentroids),
       |ac AS (SELECT e.vec_id, e.v, c_id,
       |    list_dot_product(v, cv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) AS cc,
       |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |      list_dot_product(v, cv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(cv, cv))) DESC, c_id) AS arn
       |  FROM e CROSS JOIN cent),
       |assign AS (SELECT vec_id AS n_id, v AS nv, c_id AS cluster FROM ac WHERE arn = 1),
       |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < $NumQueries),
       |qp AS (SELECT q_id, qv, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY
       |      list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) DESC, c_id) AS prn
       |  FROM q CROSS JOIN cent),
       |probes AS (SELECT q_id, qv, c_id AS cluster FROM qp WHERE prn <= $NProbe),
       |p AS (SELECT q_id, n_id,
       |    list_dot_product(qv, nv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS c
       |  FROM probes JOIN assign USING (cluster) WHERE q_id != n_id),
       |r AS (SELECT q_id, n_id, c, row_number() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) AS rn FROM p)
       |SELECT q_id, n_id, rn, round(c, 6) AS sim FROM r WHERE rn <= $TopK""".stripMargin

  // --------------------------------------------------- cosine near-dup
  /** Embedding-cosine near-duplicate pairs above a threshold. Brute-force
    * pair enumeration here is the verification baseline; at scale the
    * candidate set would come from the IVF buckets above. */
  def cosineNearDup(spark: SparkSession, dir: String): DataFrame = {
    // Normalize once (N norms, not N² — the norm is the expensive half of
    // pairwise cosine) and repartition the streamed side: a single-file
    // corpus otherwise drives the nested-loop join on ONE task.
    val nParts = spark.sessionState.conf.numShufflePartitions
    val normed = VectorExprs.normalized(
      emb(spark, dir), "embedding", "nv", Seq("vec_id"))
    val a = normed.select(col("vec_id").as("id1"), col("nv").as("nv1")).repartition(nParts)
    val b = normed.select(col("vec_id").as("id2"), col("nv").as("nv2"))
    a.join(broadcast(b), col("id1") < col("id2"))
      .withColumn("cos", VectorExprs.dot(col("nv1"), col("nv2")))
      .where(col("cos") >= NearDupThreshold)
      .select(col("id1"), col("id2"), round(col("cos"), 6).as("sim"))
  }

  val cosineNearDupSql: String =
    s"""WITH e AS (SELECT vec_id,
       |    list_transform(CAST(embedding AS DOUBLE[]),
       |      x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))) AS nv
       |  FROM embeddings),
       |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2, list_dot_product(a.nv, b.nv) AS c
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
       |SELECT id1, id2, round(c, 6) AS sim FROM p WHERE c >= $NearDupThreshold""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_cosine_topk" -> cosineTopK _,
    "q21_ivf_ann" -> ivfAnn _,
    "q26_cosine_neardup" -> cosineNearDup _)

  val oracles: Map[String, String] = Map(
    "q20_cosine_topk" -> cosineTopKSql,
    "q21_ivf_ann" -> ivfAnnSql,
    "q26_cosine_neardup" -> cosineNearDupSql)
}
