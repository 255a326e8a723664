package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.RepetitionQueries

/** Live intra-document repetition gating — the streaming counterpart
  * of batch q176 (Gopher repetition filters): every arriving document
  * is scored for self-repetition at ingest, before a degenerate
  * scraper loop ever lands in a training shard. Same tier rules as
  * [[QualityGate]]/[[MediaGate]]:
  *
  *  - **Batch and stream share the kernel semantics.**
  *    [[RepetitionQueries.rowMetrics]] computes the SAME two metrics
  *    as the batch explode-and-aggregate (identical tie-breaks,
  *    identical arithmetic shapes), so the faces can never disagree
  *    on a document — RepetitionSpec pins gate-vs-batch verdict
  *    parity on the real corpus.
  *  - **Stateless, shuffle-free.** Per-row gram sorting + run-length
  *    scans: no state store, no watermark, no aggregation — composes
  *    with any downstream streaming query at scan throughput. (The
  *    lambdas are CodegenFallback; the batch face q176 keeps the
  *    codegen'd explode shape for corpus runs — each face pays the
  *    cost its access pattern can afford.)
  *
  * Input schema: (doc_id, text, …). Output adds `n_words`,
  * `top2_frac`, `dup10_frac`, `keep`; `keep = false` rows are the
  * quarantine stream.
  */
object RepetitionGate {

  /** Gate a (streaming or batch) document relation. */
  def gate(docs: DataFrame): DataFrame = {
    val m = RepetitionQueries.rowMetrics(col("text"))
    docs.withColumn("m", m)
      .select(col("*"), col("m.n_words"), col("m.top2_frac"),
        col("m.dup10_frac"), col("m.keep"))
      .drop("m")
  }
}
