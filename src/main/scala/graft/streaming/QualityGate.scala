package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{ClassifierQueries, SamplingQueries}

/** Live document-quality gating — the serving counterpart of the batch
  * LR trainer (q128, `operators/ClassifierQueries`): the trained weight
  * vector rides into the stream as literals and every arriving document
  * is scored and gated in a STATELESS narrow map. The audit tier's
  * monitors (DriftMonitor, VolumeMonitor) tell you the feed went bad;
  * this one acts per document, at ingest, before a low-quality batch
  * ever lands in silver.
  *
  * Design, Spark-first:
  *  - Train batch, serve stream: [[ClassifierQueries.trainWeights]]
  *    produces the [[ClassifierQueries.LrBuckets]]+1 doubles; they are
  *    inlined as a literal map, so scoring needs NO join, NO state, NO
  *    watermark — it composes with any downstream streaming query
  *    (including another aggregation, which Spark's single-agg append
  *    rule would forbid if scoring itself aggregated).
  *  - The margin uses linearity to avoid an explode: w·x for hashed-tf
  *    features is (Σ_tok w[h(tok)])/n_tok + bias, a per-row array fold
  *    over codegen'd expressions — algebraically identical to the batch
  *    trainer's per-bucket formulation (`QualityGateSpec` pins the
  *    agreement to < 1e-9, the IEEE-summation-order residue).
  *
  * Scale shape: zero streaming state, zero shuffle — the gate is a
  * filter fused into the ingest scan's whole-stage codegen; throughput
  * is the scan's throughput at any executor count.
  */
object QualityGate {

  /** Sigmoid score of one document under a trained weight vector, as a
    * pure column over `text` — usable in batch or streaming plans. */
  def scoreCol(w: Map[Long, Double], text: Column): Column = {
    val wMap = map(w.toSeq.sortBy(_._1)
      .flatMap { case (b, v) => Seq(lit(b), lit(v)) }: _*)
    val toks = split(text, " ")
    // Tokens hashing to a bucket the training corpus never populated
    // carry weight 0 — the training-side convention for empty buckets.
    val tokW = transform(toks, t => coalesce(
      element_at(wMap,
        SamplingQueries.hashBucket(t, ClassifierQueries.LrBuckets)),
      lit(0.0)))
    // Null text must score, not propagate null: the batch trainer gives
    // a null-text doc ONLY its bias row (explode of its tokens emits
    // nothing), so the serving-side equivalent is a zero token term —
    // margin = bias. Letting null flow through instead made score and
    // keep null, and the row silently fell out of BOTH the keep and
    // quarantine streams (batch and stream disagreed on the edge).
    val tokTerm = when(text.isNull, lit(0.0))
      .otherwise(aggregate(tokW, lit(0.0), (acc, x) => acc + x) /
        size(toks).cast("double"))
    val margin = tokTerm + lit(w.getOrElse(-1L, 0.0))
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** Gate a (streaming or batch) document relation: adds `score` and
    * `keep`; rows below `threshold` are the quarantine stream. */
  def gate(docs: DataFrame, w: Map[Long, Double],
      threshold: Double = 0.5): DataFrame =
    docs.withColumn("score", scoreCol(w, col("text")))
      .withColumn("keep", col("score") >= lit(threshold))
}
