package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.sources.SemanticDeconStore
import graft.state.JdbcStateStore

/** Streaming maintenance of the semantic decontamination store
  * ([[SemanticDeconStore]]) — the [[VideoSegMaintainer]] contract for
  * SUITE EDITS (VERDICT r13 next-5): a benchmark release, revision, or
  * takedown arrives as a micro-batch of edit events, and the store's
  * per-benchmark partitions advance/retire exactly once — so
  * [[DeconGate.flagSemantic]]'s store-served path stays fresh through
  * suite churn without anyone hand-running `advanceBenchmark`.
  *
  * Event schema: `(bench, action, vec_id, embedding)` with `action` ∈
  * {"advance", "retire"}. Within one batch retires apply FIRST, so an
  * edit that replaces a benchmark (retire + advance rows in the same
  * batch) lands as the new content; a retire needs no embeddings
  * (its vec_id/embedding are ignored).
  *
  * Exactly-once by the tier's two moves: [[SemanticDeconStore
  * .advanceBenchmark]] is convergent under replay (retire-then-write
  * against the FROZEN codebook, meta commit point last) and the
  * control-table batch marker skips committed replays. A crash
  * mid-retire leaves metas the combined digest no longer covers →
  * readers fall back inline — cost, never a stale verdict
  * (spec-pinned). Per batch the cost is one bounded distinct over the
  * batch's (bench, action) pairs plus one batch-sized assignment per
  * advanced benchmark — nothing scales with the stored suite.
  */
object SemanticDeconMaintainer {

  /** Apply one micro-batch of suite edits exactly once; returns true
    * when this call applied them (false = committed replay skipped). */
  def applyBatch(batch: DataFrame, store: JdbcStateStore, sinkId: String,
      dir: String, batchId: Long): Boolean =
    if (store.batchCommitted(sinkId, batchId)) false
    else {
      val spark = batch.sparkSession
      val pinned = batch.persist()
      try {
        // Bounded collect: one row per (benchmark, action) in the batch
        // — suite edits are benchmark-sized, never corpus-sized.
        val events = pinned.select("bench", "action").distinct().collect()
          .map(r => (r.getString(0), r.getString(1)))
        events.collect { case (b, "retire") => b }.sorted.foreach(
          SemanticDeconStore.retireBenchmark(_, spark, dir))
        events.collect { case (b, "advance") => b }.sorted.foreach(b =>
          SemanticDeconStore.advanceBenchmark(b,
            pinned.filter(col("bench") === b && col("action") === "advance")
              .select("vec_id", "embedding"), dir))
      } finally pinned.unpersist(blocking = false): Unit
      graft.core.Caches.releaseAll()
      store.markBatch(sinkId, batchId)
    }

  /** Wire a streaming suite-edit DataFrame
    * (bench, action, vec_id, embedding) into the maintainer. Caller
    * starts it (and owns checkpointLocation, trigger, etc.). */
  def exactlyOnce(stream: DataFrame, store: JdbcStateStore, sinkId: String,
      dir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (df: DataFrame, batchId: Long) =>
      applyBatch(df, store, sinkId, dir, batchId)
      ()
    }
}
