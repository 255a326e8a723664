package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.SubstringDedup
import graft.state.JdbcStateStore

/** Live eval-set decontamination gating — the streaming counterpart
  * of the batch decon family (q172–q175): every micro-batch of
  * arriving training documents is probed against the benchmark suite
  * AT INGEST, so a freshly-scraped copy of a held-out benchmark is
  * flagged the day it arrives instead of at the next full corpus
  * decon run.
  *
  * Contract, matching the maintainer/gate tier:
  *
  *  - **Batch and stream share the kernel.** Each micro-batch rides
  *    [[SubstringDedup.deconProbeOn]] — the SAME spans q172/q175
  *    report, including the [[graft.sources.DeconStore]] fast path
  *    when configured and fresh (the store is exactly what makes a
  *    per-batch probe affordable: the eval side is read pre-derived,
  *    never re-winnowed per batch). DeconGateSpec pins verdict parity
  *    with the batch face.
  *  - **Exactly-once verdicts.** The per-batch verdict partition is
  *    written `batch=<id>` with a control-table marker
  *    ([[WinnowMaintainer]]'s two moves): a replayed batch overwrites
  *    its own partition (convergent) and a committed replay skips.
  *  - **Every doc gets a verdict**, not only the contaminated ones: a
  *    downstream shard-builder joins on `keep` without needing to
  *    know which batch a doc arrived in.
  *
  * Per micro-batch the cost is one batch-sized winnow + the matched
  * sliver's gram join (SCALE.md's q175 shape) — nothing scales with
  * the stored suite beyond the shared-fingerprint join.
  *
  * '''Verdict-schema evolution (upgrade note).''' r14 appended a
  * trailing `witness_eval` column to [[flagSemantic]]/[[flagCombined]]
  * (and r15 appends the media-eye columns to [[flagThreeEye]]'s
  * output); a gate `outDir` written before an upgrade therefore mixes
  * schemas across its `batch=` partitions. A whole-directory parquet
  * read resolves the schema from one file unless asked to merge — the
  * new column silently reads absent (or errors, file-order-dependent).
  * Readers of a sink that straddles an upgrade must pass
  * `spark.read.option("mergeSchema", "true")`, or the deployment
  * starts a fresh `outDir` (+ sinkId) at upgrade — the exactly-once
  * markers are per-sinkId, so a fresh sink re-gates history instead of
  * mixing schemas. New sinks need nothing.
  */
object DeconGate {

  /** Batch kernel: per-doc verdict over one batch. `contam_chars` is
    * the total span mass duplicating the eval suite; `keep` = no
    * contamination. */
  def flag(batch: DataFrame, evalRel: DataFrame): DataFrame = {
    val spans = SubstringDedup.deconProbeOn(batch, evalRel)
      .groupBy("doc_id").agg(sum("span_len").as("contam_chars"))
    batch.select("doc_id").join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("contam_chars"), lit(0L)).as("contam_chars"))
      .withColumn("keep", col("contam_chars") === 0L)
  }

  /** Semantic verdict face (r13): the gram kernel above cannot see a
    * PARAPHRASED benchmark copy (no shared 40-char run), so this face
    * probes the batch's EMBEDDINGS against the eval suite's at a
    * cosine threshold — the same kernel as batch q185
    * ([[graft.operators.SimilarityQueries.semanticDeconOn]]: IVF-
    * bucketed candidates, broadcast eval side, exact verify), so
    * stream and batch can never disagree. Per batch vector: how many
    * eval vectors it semantically matches, the strongest match, and
    * `keep` = none. Compose with [[flag]] by AND-ing the two keeps —
    * exact-gram and semantic decon catch disjoint failure modes. */
  def flagSemantic(batchEmb: DataFrame, evalEmb: DataFrame,
      tau: Double = graft.operators.SimilarityQueries.SemDeconTau): DataFrame = {
    // A configured-and-fresh SemanticDeconStore supplies the FROZEN
    // codebook + the pre-assigned eval index: the batch assigns
    // against the stored codebook, so a vector's verdict cannot
    // depend on what else shares its micro-batch (the inline
    // union-codebook derivation cannot promise that); stale/missing
    // store falls back inline — cost, never a missed leak.
    val matches = graft.sources.SemanticDeconStore.openFresh(evalEmb) match {
      case Some((cents, evalIdx)) =>
        graft.operators.SimilarityQueries
          .semanticDeconVia(batchEmb, cents, evalIdx, tau)
      case None =>
        graft.operators.SimilarityQueries.semanticDeconOn(batchEmb, evalEmb, tau)
    }
    val hits = matches
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_hits"), max("sim").as("max_eval_sim"),
        min("eval_doc").as("witness_eval"))
    // witness_eval (the smallest witnessing eval id, q191's convention)
    // rides AFTER keep so existing positional readers are unmoved.
    batchEmb.select(col("vec_id").as("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        coalesce(col("max_eval_sim"), lit(0.0)).as("max_eval_sim"),
        (coalesce(col("n_eval_hits"), lit(0L)) === 0L).as("keep"),
        col("witness_eval"))
  }

  /** The composed verdict — exact-gram AND semantic decon in one
    * relation, because the two faces catch DISJOINT failure modes (a
    * verbatim copy has the grams, a paraphrase has the embedding).
    * One row per batch doc: both faces' evidence columns and
    * `keep` = clean under BOTH. Docs present in only one input (a
    * text-only doc with no embedding yet, or vice versa) keep their
    * available verdict — absence of evidence is not contamination. */
  def flagCombined(batch: DataFrame, evalRel: DataFrame,
      batchEmb: DataFrame, evalEmb: DataFrame,
      tau: Double = graft.operators.SimilarityQueries.SemDeconTau): DataFrame = {
    val g = flag(batch, evalRel)
      .select(col("doc_id"), col("contam_chars"), col("keep").as("gram_keep"))
    val s = flagSemantic(batchEmb, evalEmb, tau)
      .select(col("doc_id"), col("n_eval_hits"), col("max_eval_sim"),
        col("keep").as("sem_keep"), col("witness_eval"))
    g.join(s, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("contam_chars"), lit(0L)).as("contam_chars"),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        coalesce(col("max_eval_sim"), lit(0.0)).as("max_eval_sim"),
        (coalesce(col("gram_keep"), lit(true)) &&
          coalesce(col("sem_keep"), lit(true))).as("keep"),
        col("witness_eval"))
  }

  /** MEDIA verdict face (r15): the third eye — neither grams (verbatim
    * text) nor embeddings (paraphrase) can see a benchmark's IMAGE
    * re-crawled into the training set under a rewritten caption, so
    * this face probes the batch's image HASHES against the eval
    * suite's at Hamming ≤ `maxHamming` — the same kernel as batch q197
    * ([[graft.multimodal.MediaDedup.deconPairs]]: pigeonhole-exact
    * banding, eval side broadcast), so stream and batch can never
    * disagree. Inputs are HASHED relations (media_id, dhash): hashing
    * happens once at ingest (or reads
    * [[graft.sources.MediaHashStore]]), and the gate never touches a
    * payload byte. Per batch image: how many eval images it matches,
    * the STRONGEST match (min hamming — 0 is a verbatim re-crawl), the
    * smallest witnessing eval id, and `keep` = none. */
  def flagMedia(batchHashes: DataFrame, evalHashes: DataFrame,
      maxHamming: Int = graft.operators.MediaQueries.MaxHamming): DataFrame = {
    // Pinned: the hash relation is consumed TWICE (the band join's
    // grouped side and the every-doc verdict base) — unpinned, a
    // hashImages plan upstream would DECODE every payload twice per
    // call (review r15 finding: double the JDK codec work on the
    // streaming hot path). Released by the callers' releaseAll.
    val pinned = graft.core.Caches.persistTracked(batchHashes)
    val hits = graft.multimodal.MediaDedup
      .deconPairs(pinned, evalHashes, maxHamming)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_image_hits"), min("hamming").as("min_hamming"),
        min("eval_doc").as("witness_image"))
    pinned.select(col("media_id").as("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_image_hits"), lit(0L)).as("n_image_hits"),
        col("min_hamming"),
        (coalesce(col("n_image_hits"), lit(0L)) === 0L).as("keep"),
        col("witness_image"))
  }

  /** The THREE-EYE verdict — [[flagCombined]]'s gram + semantic
    * conjunction extended with the media eye (q198's kernel): one row
    * per doc present in ANY input, all three eyes' evidence, and
    * `keep` = clean under every eye that saw the doc. The absence rule
    * is unchanged: a doc with no image (text-only, or its payload not
    * yet hashed) KEEPS its two-eye verdict — absence of evidence is
    * not contamination — and `min_hamming`/`witness_image` stay null
    * rather than coalescing to a value that would read as a hamming-0
    * verbatim hit.
    *
    * Scale shape: the three kernels' own audited shapes (each eval
    * side broadcast; each corpus scanned once) plus doc-keyed
    * full-outer joins of train-sized verdict relations — composing
    * eyes never re-runs an eye. */
  def flagThreeEye(batch: DataFrame, evalRel: DataFrame,
      batchEmb: DataFrame, evalEmb: DataFrame,
      batchImg: DataFrame, evalImg: DataFrame,
      tau: Double = graft.operators.SimilarityQueries.SemDeconTau,
      maxHamming: Int = graft.operators.MediaQueries.MaxHamming): DataFrame = {
    val two = flagCombined(batch, evalRel, batchEmb, evalEmb, tau)
      .select(col("doc_id"), col("contam_chars"), col("n_eval_hits"),
        col("max_eval_sim"), col("keep").as("two_keep"), col("witness_eval"))
    val m = flagMedia(batchImg, evalImg, maxHamming)
      .select(col("doc_id"), col("n_image_hits"), col("min_hamming"),
        col("keep").as("img_keep"), col("witness_image"))
    two.join(m, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("contam_chars"), lit(0L)).as("contam_chars"),
        coalesce(col("n_eval_hits"), lit(0L)).as("n_eval_hits"),
        coalesce(col("max_eval_sim"), lit(0.0)).as("max_eval_sim"),
        coalesce(col("n_image_hits"), lit(0L)).as("n_image_hits"),
        col("min_hamming"),
        (coalesce(col("two_keep"), lit(true)) &&
          coalesce(col("img_keep"), lit(true))).as("keep"),
        col("witness_eval"), col("witness_image"))
  }

  /** The shared exactly-once gate skeleton all three gate faces ride
    * (extracted, review r15): a committed replay skips before any
    * work, the verdict overwrites its OWN batch partition (convergent
    * under replay), tracked caches release, and the control-table
    * marker commits LAST. Any protocol fix lands once, for every eye. */
  private def gated(store: JdbcStateStore, sinkId: String, outDir: String,
      batchId: Long)(verdict: => DataFrame): Boolean =
    if (store.batchCommitted(sinkId, batchId)) false
    else {
      verdict.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      graft.core.Caches.releaseAll()
      store.markBatch(sinkId, batchId)
    }

  /** Gate one micro-batch exactly once into `outDir/batch=<id>`;
    * returns true when this call wrote (false = committed replay
    * skipped). */
  def gateBatch(batch: DataFrame, evalRel: DataFrame,
      store: JdbcStateStore, sinkId: String, outDir: String,
      batchId: Long): Boolean =
    gated(store, sinkId, outDir, batchId)(flag(batch, evalRel))

  /** Wire a streaming document DataFrame (doc_id, text, …) into the
    * gate. Caller starts it (and owns checkpointLocation, trigger). */
  def exactlyOnce(stream: DataFrame, evalRel: DataFrame,
      store: JdbcStateStore, sinkId: String, outDir: String)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (df: DataFrame, batchId: Long) =>
      gateBatch(df, evalRel, store, sinkId, outDir, batchId)
      ()
    }

  /** Gate one micro-batch through the COMPOSED two-eye verdict
    * ([[flagCombined]] — q196's kernel) exactly once into
    * `outDir/batch=<id>`. The batch carries text AND embedding
    * columns (doc_id, text, embedding — an embedding may be null for
    * docs not yet embedded: the doc keeps its gram-only verdict, the
    * flagCombined absence rule); returns true when this call wrote. */
  def gateCombinedBatch(batch: DataFrame, evalRel: DataFrame,
      evalEmb: DataFrame, store: JdbcStateStore, sinkId: String,
      outDir: String, batchId: Long,
      tau: Double = graft.operators.SimilarityQueries.SemDeconTau): Boolean =
    gated(store, sinkId, outDir, batchId)(
      flagCombined(
        batch.select("doc_id", "text"),
        evalRel,
        batch.where(col("embedding").isNotNull)
          .select(col("doc_id").as("vec_id"), col("embedding")),
        evalEmb, tau))

  /** Wire a streaming (doc_id, text, embedding) DataFrame into the
    * composed gate. Caller starts it. */
  def exactlyOnceCombined(stream: DataFrame, evalRel: DataFrame,
      evalEmb: DataFrame, store: JdbcStateStore, sinkId: String,
      outDir: String,
      tau: Double = graft.operators.SimilarityQueries.SemDeconTau)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (df: DataFrame, batchId: Long) =>
      gateCombinedBatch(df, evalRel, evalEmb, store, sinkId, outDir,
        batchId, tau)
      ()
    }

  /** Gate one micro-batch through the THREE-EYE verdict
    * ([[flagThreeEye]] — q198's kernel) exactly once into
    * `outDir/batch=<id>`. The batch carries (doc_id, text, embedding,
    * content): embedding and content may each be null per doc (the
    * absence rule — a doc keeps whatever eyes saw it; a null payload
    * never reads as a hamming-0 hit). The batch's image payloads are
    * hashed HERE, once, at ingest ([[graft.multimodal.MediaDedup
    * .hashImages]] — the bytes never outlive the batch); `evalImg` is
    * the suite's already-HASHED (media_id, dhash) relation, hashed
    * once when the suite was released (or served by
    * [[graft.sources.MediaHashStore]]), never re-decoded per batch.
    * Returns true when this call wrote. */
  def gateThreeEyeBatch(batch: DataFrame, evalRel: DataFrame,
      evalEmb: DataFrame, evalImg: DataFrame, store: JdbcStateStore,
      sinkId: String, outDir: String, batchId: Long,
      tau: Double = graft.operators.SimilarityQueries.SemDeconTau,
      maxHamming: Int = graft.operators.MediaQueries.MaxHamming): Boolean =
    gated(store, sinkId, outDir, batchId)(
      flagThreeEye(
        batch.select("doc_id", "text"),
        evalRel,
        batch.where(col("embedding").isNotNull)
          .select(col("doc_id").as("vec_id"), col("embedding")),
        evalEmb,
        graft.multimodal.MediaDedup.hashImages(
          batch.where(col("content").isNotNull)
            .select(col("doc_id").as("media_id"), col("content"))),
        evalImg, tau, maxHamming))

  /** Wire a streaming (doc_id, text, embedding, content) DataFrame
    * into the three-eye gate. Caller starts it. `evalImg` is pinned
    * HERE for the stream's lifetime (an UNTRACKED persist — the gate's
    * per-batch releaseAll must not drop it): a caller passing a lazy
    * `hashImages(suitePayloads)` plan would otherwise re-DECODE the
    * whole benchmark suite every micro-batch, the exact per-batch
    * suite-scaling cost this gate's docs promise away (review r15).
    * Suite-sized (16 bytes/image), so the pin is bounded. */
  def exactlyOnceThreeEye(stream: DataFrame, evalRel: DataFrame,
      evalEmb: DataFrame, evalImg: DataFrame, store: JdbcStateStore,
      sinkId: String, outDir: String,
      tau: Double = graft.operators.SimilarityQueries.SemDeconTau,
      maxHamming: Int = graft.operators.MediaQueries.MaxHamming)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    val evalPinned = evalImg.persist()
    stream.writeStream.foreachBatch { (df: DataFrame, batchId: Long) =>
      gateThreeEyeBatch(df, evalRel, evalEmb, evalPinned, store, sinkId,
        outDir, batchId, tau, maxHamming)
      ()
    }
  }
}
