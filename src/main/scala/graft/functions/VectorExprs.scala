package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector expression library for the similarity-search surface.
  *
  * Vectors are `array<float>` columns (testdata `embeddings.embedding`);
  * all math is done in double after an explicit upcast so results are
  * bit-comparable with a DuckDB `CAST(... AS DOUBLE[])` oracle, and the
  * left-to-right fold order of `aggregate` is deterministic regardless of
  * partitioning (no shuffle-order-dependent floating point).
  *
  * These are codegen'd catalyst expressions (no UDFs) — the brute-force
  * top-k stays inside whole-stage codegen. For the 100 TB path the IVF
  * variant ([[graft.operators.SimilarityQueries]]) prunes candidates by
  * coarse centroid assignment before any pairwise math.
  */
object VectorExprs {

  /** Element-wise dot product in double precision, sequential fold.
    * Backed by the native codegen'd [[graft.plans.DotProduct]] — same
    * left-to-right order as the composable
    * `aggregate(zip_with(...))` formulation, minus its per-row
    * intermediate array. */
  def dot(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.vectorDot(
      a.cast("array<double>"), b.cast("array<double>"))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Unit-normalize once so pairwise cosine degrades to a single dot —
    * at N² pair volume, recomputing norms per pair is the dominant cost.
    * Cosine of two pre-normalized vectors = dot(na, nb).
    *
    * The norm must be supplied as its own (pre-projected) column:
    * embedding it inside the transform lambda would re-evaluate the
    * O(d) norm for every element — O(d²) per vector. See
    * [[normalized]] for the two-step projection that does it right. */
  def divideBy(a: Column, normCol: Column): Column =
    transform(a.cast("array<double>"), x => x / normCol)

  /** Project `df` to (carryCols..., <out> = unit-normalized `vecCol`),
    * computing each vector's norm exactly once. */
  def normalized(df: org.apache.spark.sql.DataFrame, vecCol: String, out: String,
      carryCols: Seq[String]): org.apache.spark.sql.DataFrame =
    df.withColumn("__norm", norm(col(vecCol)))
      .select(carryCols.map(col) :+
        divideBy(col(vecCol), col("__norm")).as(out): _*)
}
