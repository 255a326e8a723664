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
  * '''Verdict-schema evolution (mechanized, r16).''' r14 appended a
  * trailing `witness_eval` column to [[flagSemantic]]/[[flagCombined]]
  * (and r15 appended the media-eye columns to [[flagThreeEye]]'s
  * output), so a gate `outDir` that straddles an upgrade mixes
  * schemas across its `batch=` partitions — and a whole-directory
  * parquet read resolves the schema from ONE file unless asked to
  * merge (the new column silently reads absent, or errors,
  * file-order-dependent). The r15 NOTE told operators to pass
  * `mergeSchema`; now the protocol enforces it: every [[gated]] write
  * stamps a [[VerdictSchemaVersion]] column, and [[readVerdicts]] is
  * the reader — mergeSchema'd, with pre-versioning rows surfaced as
  * version 0 — so a sink that straddles an upgrade reads back
  * correctly WITHOUT the caller knowing to pass anything
  * (DeconGateSpec pins the mixed-sink roundtrip). Query-facing
  * relations ([[flag]]/[[flagCombined]]/[[flagThreeEye]] returns) are
  * unchanged — the stamp exists only in the sink files.
  */
object DeconGate {

  /** Version stamped on every verdict row a gate writes — the ROW's
    * schema, not the writer-code era (review r16 finding 5: stamping
    * the current code version on every face would make a two-eye
    * sink's rows claim media columns they never had). Each face stamps
    * its own: 1 = single-eye [[flag]] (r12); 2 = two-eye with
    * `witness_eval` ([[flagCombined]], r14); 3 = three-eye media
    * columns ([[flagThreeEye]], r15). [[VerdictSchemaVersion]] is the
    * current maximum. Bump on ANY verdict-column change. */
  val VerdictSchemaVersion = 3

  /** Read a gate sink written across upgrades: mergeSchema unions the
    * batch partitions' columns (absent ones null — and the
    * [[flagThreeEye]] null conventions mean a null media column reads
    * exactly like an imageless doc, never a hamming-0 lookalike), and
    * rows from before versioning surface as `verdict_schema` 0 so a
    * reader can tell "old write" from "new write with no media". */
  def readVerdicts(spark: org.apache.spark.sql.SparkSession,
      outDir: String): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true").parquet(outDir)
    if (raw.columns.contains("verdict_schema"))
      raw.withColumn("verdict_schema",
        coalesce(col("verdict_schema"), lit(0)))
    else raw.withColumn("verdict_schema", lit(0))
  }

  // ------------------------------------------------- rollup halves
  // Each eye factors into KERNEL (the expensive probe producing a
  // match-sized evidence relation) + ROLLUP (evidence → per-doc
  // verdict over a base id set). Extracted (r16) so the
  // [[graft.sources.VerdictStore]]'s serve path — which reads the
  // evidence relations from parquet instead of running the kernels —
  // rolls up through the SAME code, making store ≡ inline a property
  // of construction rather than of two copies staying in sync.

  /** Gram-eye rollup: per-doc verdict from a span relation
    * (doc_id, span_start, span_len) over a base (doc_id) set. */
  private[graft] def flagFromSpans(docIds: DataFrame,
      spanRel: DataFrame): DataFrame = {
    val spans = spanRel
      .groupBy("doc_id").agg(sum("span_len").as("contam_chars"))
    docIds.select("doc_id").join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("contam_chars"), lit(0L)).as("contam_chars"))
      .withColumn("keep", col("contam_chars") === 0L)
  }

  /** Batch kernel: per-doc verdict over one batch. `contam_chars` is
    * the total span mass duplicating the eval suite; `keep` = no
    * contamination. */
  def flag(batch: DataFrame, evalRel: DataFrame): DataFrame =
    flagFromSpans(batch, SubstringDedup.deconProbeOn(batch, evalRel))

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
    flagSemanticFromMatches(
      batchEmb.select(col("vec_id").as("doc_id")), matches)
  }

  /** Semantic-eye rollup: per-doc verdict from a match relation
    * (doc_id, eval_doc, sim) over a base (doc_id) set. witness_eval
    * (the smallest witnessing eval id, q191's convention) rides AFTER
    * keep so existing positional readers are unmoved. */
  private[graft] def flagSemanticFromMatches(docIds: DataFrame,
      matches: DataFrame): DataFrame = {
    val hits = matches
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_hits"), max("sim").as("max_eval_sim"),
        min("eval_doc").as("witness_eval"))
    docIds.join(hits, Seq("doc_id"), "left")
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
      tau: Double = graft.operators.SimilarityQueries.SemDeconTau): DataFrame =
    composeTwoEye(flag(batch, evalRel), flagSemantic(batchEmb, evalEmb, tau))

  /** The two-eye composition over already-rolled-up per-eye verdicts
    * ([[flag]]'s and [[flagSemantic]]'s output shapes) — the full-outer
    * doc-keyed join with the absence rule. */
  private[graft] def composeTwoEye(gram: DataFrame, sem: DataFrame): DataFrame = {
    val g = gram
      .select(col("doc_id"), col("contam_chars"), col("keep").as("gram_keep"))
    val s = sem
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
    flagMediaFromPairs(
      pinned.select(col("media_id").as("doc_id")),
      graft.multimodal.MediaDedup.deconPairs(pinned, evalHashes, maxHamming))
  }

  /** Media-eye rollup: per-doc verdict from a pair relation
    * (doc_id, eval_doc, hamming) over a base (doc_id) set. */
  private[graft] def flagMediaFromPairs(docIds: DataFrame,
      pairs: DataFrame): DataFrame = {
    val hits = pairs
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_image_hits"), min("hamming").as("min_hamming"),
        min("eval_doc").as("witness_image"))
    docIds.join(hits, Seq("doc_id"), "left")
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
      maxHamming: Int = graft.operators.MediaQueries.MaxHamming): DataFrame =
    composeThreeEye(
      flagCombined(batch, evalRel, batchEmb, evalEmb, tau),
      flagMedia(batchImg, evalImg, maxHamming))

  /** The three-eye composition over an already-composed two-eye
    * verdict ([[flagCombined]]'s shape) and a media verdict
    * ([[flagMedia]]'s shape) — full-outer doc-keyed join, absence
    * rule, media nulls never coalesced to hamming-0 lookalikes. */
  private[graft] def composeThreeEye(twoEye: DataFrame,
      media: DataFrame): DataFrame = {
    val two = twoEye
      .select(col("doc_id"), col("contam_chars"), col("n_eval_hits"),
        col("max_eval_sim"), col("keep").as("two_keep"), col("witness_eval"))
    val m = media
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
    * marker commits LAST. Any protocol fix lands once, for every eye.
    *
    * The verdict write runs inside [[graft.core.Caches.scoped]]
    * (ADVICE r15): the batch's tracked pins (flagMedia's hash
    * relation, the probe kernels' winnow/shared-fp relations) release
    * on FAILURE too — a stream stuck retrying a poison batch no longer
    * accumulates a pinned relation per attempt — and the release is
    * scope-private, so several graft streams sharing one SparkSession
    * cannot unpin each other's in-flight batches mid-flight. */
  private def gated(store: JdbcStateStore, sinkId: String, outDir: String,
      batchId: Long, schemaVersion: Int)(verdict: => DataFrame): Boolean =
    if (store.batchCommitted(sinkId, batchId)) false
    else {
      graft.core.Caches.scoped {
        verdict.withColumn("verdict_schema", lit(schemaVersion))
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      store.markBatch(sinkId, batchId)
    }

  /** Gate one micro-batch exactly once into `outDir/batch=<id>`;
    * returns true when this call wrote (false = committed replay
    * skipped). */
  def gateBatch(batch: DataFrame, evalRel: DataFrame,
      store: JdbcStateStore, sinkId: String, outDir: String,
      batchId: Long): Boolean =
    gated(store, sinkId, outDir, batchId, schemaVersion = 1)(
      flag(batch, evalRel))

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
    gated(store, sinkId, outDir, batchId, schemaVersion = 2)(
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
    gated(store, sinkId, outDir, batchId,
        schemaVersion = VerdictSchemaVersion)(
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
