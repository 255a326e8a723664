package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs.{cosine, dot}
import graft.operators.SimilarityQueries

/** Live embedding-space gating — the serving counterpart of the batch
  * outlier audit (q161, `operators/SimilarityQueries`), completing the
  * batch-train/stream-serve pair the quality tier already has for text
  * ([[QualityGate]] serves q128's LR weights): the corpus centroid is
  * trained in batch, rides into the stream as a literal, and every
  * arriving vector is scored and gated in a STATELESS narrow map —
  * off-distribution vectors (garbage embeddings, wrong-model outputs,
  * corrupted rows) are quarantined at ingest, before they pollute the
  * ANN index or a training batch.
  *
  * Design, Spark-first:
  *  - Train batch, serve stream: [[SimilarityQueries.centroidSum]] is
  *    a per-dimension DECIMAL sum (bit-identical under any
  *    partitioning), and cosine's scale invariance lets the SUM vector
  *    stand in for the mean — the same no-division contract the batch
  *    audit relies on, so batch and stream scores agree exactly.
  *  - The centroid inlines as a `typedlit` array: scoring needs NO
  *    join, NO state, NO watermark, and composes with any downstream
  *    streaming query (Spark's single-aggregation append rule never
  *    triggers because the gate itself is a projection).
  *
  * Scale shape: zero streaming state, zero shuffle — the gate fuses
  * into the ingest scan's whole-stage codegen ([[cosine]] is the
  * codegen'd `vector_dot` family); throughput is the scan's
  * throughput at any executor count.
  */
object EmbeddingGate {

  /** Cosine of `vec` against a trained centroid, as a pure column —
    * usable in batch or streaming plans. A zero/degenerate vector
    * makes cosine 0/0 — an ANSI-mode DIVIDE_BY_ZERO error (and with
    * ANSI off, a NaN that Spark orders ABOVE every number, sailing
    * through any threshold) — so the guard is a short-circuiting CASE
    * on the squared norm: garbage scores 0 and quarantines. */
  def scoreCol(centroid: Seq[Double], vec: Column): Column =
    when(dot(vec, vec) === lit(0.0), lit(0.0))
      .otherwise(cosine(vec, typedlit(centroid)))

  /** Train the gate from a reference corpus: its centroid-sum vector
    * (codebook-sized driver state, like every centroid in the ANN
    * tier). */
  def train(reference: DataFrame): Seq[Double] =
    SimilarityQueries.centroidSum(reference)

  /** Gate a (streaming or batch) embedding relation: adds `sim` and
    * `keep`; rows below `threshold` are the quarantine stream. */
  def gate(vectors: DataFrame, centroid: Seq[Double],
      threshold: Double): DataFrame =
    vectors.withColumn("sim", scoreCol(centroid, col("embedding")))
      .withColumn("keep", col("sim") >= lit(threshold))
}
