package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.GraphOps
import graft.multimodal.MediaDedup

/** The multimodal tier's query surface: image near-dup dedup and the
  * image/caption alignment audit, run end-to-end from the parquet
  * testdata. The testdata ships no binary column (TESTDATA.md), so both
  * queries first materialize an image column deterministically from the
  * documents table via [[MediaDedup.renderImage]] — the adapter a real
  * lake replaces with its media table scan. Everything downstream of
  * that scan is the production dataflow: real PNG decode on executors,
  * perceptual hashing, banded candidate joins, payload-vs-caption
  * verification.
  */
object MediaQueries {

  /** Docs eligible for the media tier: captions long enough that the
    * rendered histogram is non-degenerate. Both oracles repeat the
    * same predicate. */
  private val MinChars = 50

  private def eligibleDocs(spark: SparkSession, dir: String): DataFrame =
    spread(Tables(spark, dir, "documents")
      .filter(length(col("text")) >= MinChars)
      .select(col("doc_id"), col("text")))

  /** The codec tier is CPU-bound PER ROW (render + decode dwarf the
    * bytes scanned), but Spark sizes scan partitions by BYTES — a
    * small-file corpus packs into a couple of partitions
    * (maxPartitionBytes/openCostInBytes) and the whole decode tier runs
    * on two cores: measured 9.5 s → 1.9 s at the 10× point from this
    * one repartition. One narrow shuffle of (id, text) buys full-width
    * parallelism for every downstream mapPartitions. */
  private[graft] def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Q153: image near-duplicate pairs by perceptual hash — dHash over
    * real decoded pixels, multi-index pigeonhole-exact Hamming join at
    * radius [[MaxHamming]]. The documents table's planted near-dup
    * texts render to near-dup images ([[MediaDedup.renderImage]] is
    * smooth under small edits), so the output is the image-modality
    * face of the q17/q18 family: measured at sf0.001, the planted
    * prefix-edit pairs sit at Hamming 0–2 and only 0.03% of unrelated
    * pairs do. No SQL oracle — DuckDB cannot decode PNG;
    * MediaDedupSpec pins brute-force parity (the banding is exact,
    * not probabilistic, so parity is equality not a recall floor).
    */
  val MaxHamming = 2

  def q153ImageNearDup(spark: SparkSession, dir: String): DataFrame = {
    val media = eligibleDocs(spark, dir)
      .select(col("doc_id").as("media_id"), col("text"))
    val hashed = MediaDedup.hashImages(renderAll(media))
    MediaDedup.nearDupPairs(hashed, MaxHamming)
      .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  /** Render the image column: one deterministic PNG per caption. */
  private def renderAll(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, MediaDedup.renderImage(text))
      })
      .toDF("media_id", "content")
  }

  /** Q154: cross-modal alignment audit with a planted corruption — the
    * LAION-style "does this image match its caption" gate. The query
    * CONSTRUCTS the corrupted corpus (docs with `doc_id % 7 = 3` get an
    * all-white decoy payload instead of their caption's rendering — a
    * stand-in for upstream pairing bugs / dead image links), then runs
    * [[MediaDedup.alignmentDistances]], which sees only (caption,
    * payload bytes) and never the plant rule, and flags every pairing
    * whose payload-decoded features sit further than
    * [[AlignThreshold]] from the caption's reference rendering. Intact
    * pairs score exactly 0.0 and the decoy ≈4.0, so the threshold has
    * ~4× margin on both sides — the gate is deterministic, not tuned.
    *
    * The DuckDB oracle is the planted ground truth (`doc_id % 7 = 3`
    * over the same eligible set): it verifies the detector RECOVERS the
    * corruption from payload bytes alone, the constructed-positive
    * pattern of q146/q149.
    */
  val AlignThreshold = 1.0

  def q154AlignmentAudit(spark: SparkSession, dir: String): DataFrame = {
    val corpus = plantedCorpus(eligibleDocs(spark, dir))
    MediaDedup.alignmentDistances(corpus)
      .filter(col("align_dist") > AlignThreshold)
      .select(col("doc_id"))
      .orderBy("doc_id")
  }

  /** The corrupted-pairing plant, kept OUTSIDE the audit op: payloads
    * are decided here, and [[MediaDedup.alignmentDistances]] receives
    * only (doc_id, text, content). */
  private def plantedCorpus(docRel: DataFrame): DataFrame = {
    val spark = docRel.sparkSession
    import spark.implicits._
    docRel.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val content =
          if (id % 7 == 3) MediaDedup.whiteDecoy()
          else MediaDedup.renderImage(text)
        (id, text, content)
      })
      .toDF("doc_id", "text", "content")
  }

  /** Q157: image-dedup canonical keep — the ACT face of q153's detect
    * (the image-modality twin of q42's transitive text clusters and
    * q150's canonical-keeping scrub): near-dup image pairs at the q153
    * radius are closed transitively (perceptual similarity is not
    * transitive, so A~B~C must dedup as ONE family or a re-encoded
    * chain survives pairwise dedup), each cluster keeps its minimum
    * doc_id as canonical, and the query returns the surviving corpus.
    * Clustering rides [[GraphOps.connectedComponents]] — the same
    * driver-union-find/pointer-jumping hybrid the text tier uses, the
    * cross-tier reuse being the point. Rows-only like q153 (DuckDB
    * cannot decode PNG); MediaDedupSpec pins survivor parity against a
    * brute-force union-find over the exact pair set.
    */
  def q157ImageScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = eligibleDocs(spark, dir)
      .select(col("doc_id").as("media_id"), col("text"))
    val hashed = MediaDedup.hashImages(renderAll(docs))
    val pairs = MediaDedup.nearDupPairs(hashed, MaxHamming)
      .select(col("media_a").as("src"), col("media_b").as("dst"))
    val labels = GraphOps.connectedComponents(pairs)
    docs.select(col("media_id").as("doc_id"))
      .join(labels.select(col("id").as("doc_id"), col("lbl")), Seq("doc_id"), "left")
      .filter(col("lbl").isNull || col("lbl") === col("doc_id"))
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** Q155: segment-level video dedup — documents become animated GIFs
    * (one frame per q85 CDC segment, REAL `javax.imageio` sequence
    * encode), frames are decoded back and their segment fingerprints
    * recovered from the PIXELS, and video pairs sharing ≥1 non-trivial,
    * non-viral segment surface with their shared count. See
    * [[graft.multimodal.VideoSegDedup]] for why every byte of the
    * answer survives the container roundtrip.
    *
    * The DuckDB oracle never sees a GIF: it re-derives the same answer
    * from q85's SQL chunking — the oracle-checked claim is that the
    * whole render→encode→decode→recover pipeline is lossless AND the
    * JVM chunker matches the SQL chunker token-for-token.
    */
  def q155VideoSegdup(spark: SparkSession, dir: String): DataFrame = {
    val docs = spread(Tables(spark, dir, "documents").select("doc_id", "text"))
    val videos = graft.multimodal.VideoSegDedup.renderVideos(docs)
    val fps = graft.multimodal.VideoSegDedup.segmentFingerprints(videos)
    graft.multimodal.VideoSegDedup.sharedSegmentPairs(fps)
      .orderBy("video_a", "video_b")
  }

  private val videoSegdupSql: String =
    s"""WITH w0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |w AS (SELECT doc_id, CAST(unnest(range(len(ws))) AS BIGINT) AS pos,
       |    unnest(ws) AS word FROM w0),
       |b AS (SELECT doc_id, pos, word,
       |    CASE WHEN ('0x' || substr(md5(word), 1, 8))::BIGINT % 16 = 0
       |      THEN 1 ELSE 0 END AS bf FROM w),
       |c AS (SELECT doc_id, pos, word,
       |    sum(bf) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk FROM b),
       |ch AS (SELECT doc_id, chunk, count(*) AS n_tokens,
       |    md5(string_agg(word, ' ' ORDER BY pos)) AS seg_fp
       |  FROM c GROUP BY 1, 2),
       |big AS (SELECT DISTINCT doc_id, seg_fp FROM ch
       |  WHERE n_tokens >= ${graft.multimodal.VideoSegDedup.MinTokens}),
       |ok AS (SELECT seg_fp FROM big GROUP BY 1
       |  HAVING count(*) BETWEEN 2 AND ${graft.multimodal.VideoSegDedup.DfCap})
       |SELECT a.doc_id AS video_a, b.doc_id AS video_b,
       |  count(*) AS shared_segs
       |FROM big a JOIN big b USING (seg_fp) JOIN ok USING (seg_fp)
       |WHERE a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |""".stripMargin

  private val alignmentAuditSql: String =
    s"""SELECT doc_id
       |FROM documents
       |WHERE length(text) >= $MinChars AND doc_id % 7 = 3
       |""".stripMargin

  /** Q156: audio-integrity audit (dead-air detection) with a planted
    * corruption — the audio-modality twin of q154. The query renders a
    * WAV per caption, swaps in pure digital silence for docs with
    * `doc_id % 9 = 4` (the stand-in for muxing bugs / DRM-stripped
    * tracks whose metadata still looks healthy), then flags every row
    * whose DECODED loudest envelope bin ([[graft.multimodal.AudioIntegrity.loudestBin]],
    * real `javax.sound.sampled` PCM decode) is indistinguishable from
    * silence. Rendered clips are floored at RMS 0.25, silence decodes
    * to exactly -1 — the gate is deterministic with ≥0.4 margin on both
    * sides. The DuckDB oracle is the planted ground truth, verifying
    * the detector recovers the corruption from payload bytes alone.
    */
  def q156AudioAudit(spark: SparkSession, dir: String): DataFrame = {
    val corpus = plantedAudio(eligibleDocs(spark, dir))
    graft.multimodal.AudioIntegrity.loudestBin(corpus)
      .filter(col("max_env") < graft.multimodal.AudioIntegrity.SilenceThreshold)
      .select(col("doc_id"))
      .orderBy("doc_id")
  }

  private def plantedAudio(docRel: DataFrame): DataFrame = {
    val spark = docRel.sparkSession
    import spark.implicits._
    docRel.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val content =
          if (id % 9 == 4) graft.multimodal.AudioIntegrity.silence()
          else graft.multimodal.AudioIntegrity.renderAudio(text)
        (id, content)
      })
      .toDF("doc_id", "content")
  }

  private val audioAuditSql: String =
    s"""SELECT doc_id
       |FROM documents
       |WHERE length(text) >= $MinChars AND doc_id % 9 = 4
       |""".stripMargin

  /** Q178: audio near-duplicate pairs — the audio-modality face of the
    * q153/q17/q18 family, completing the dedup tier's modality
    * symmetry. Captions render to WAV
    * ([[graft.multimodal.AudioIntegrity.renderAudio]]), payloads are
    * decoded back through the REAL `javax.sound.sampled` path, and each
    * clip gets [[graft.multimodal.AudioDedup]]'s 64-bit
    * amplitude-distribution hash; pairs within Hamming ≤ [[MaxHamming]]
    * surface through the SAME multi-index pigeonhole-exact banding as
    * images ([[MediaDedup.nearDupPairs]] — the relation is
    * modality-agnostic). Planted near-dup captions land at Hamming 0-2;
    * measured at sf0.001, <1% of unrelated pairs do.
    *
    * UNLIKE q153 (PNG decode is not SQL-expressible), this one is
    * oracle-green in the q155 pattern: the render→WAV-encode→JDK-
    * decode→quantize pipeline is exact integer math over the caption,
    * so the DuckDB oracle re-derives every fingerprint from the TEXT
    * alone and brute-forces the pairs — the oracle-checked claim is
    * that the whole codec roundtrip is lossless and the banding exact.
    */
  def q178AudioNearDup(spark: SparkSession, dir: String): DataFrame = {
    val media = eligibleDocs(spark, dir)
      .select(col("doc_id").as("media_id"), col("text"))
    val hashed = graft.multimodal.AudioDedup.hashAudio(renderAllAudio(media))
    MediaDedup.nearDupPairs(hashed, MaxHamming)
      .select(col("media_a").as("doc_a"), col("media_b").as("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  /** Render the audio column: one deterministic WAV per caption. */
  private def renderAllAudio(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, graft.multimodal.AudioIntegrity.renderAudio(text))
      })
      .toDF("media_id", "content")
  }

  private val audioNearDupSql: String = {
    val n = graft.multimodal.AudioIntegrity.Samples
    s"""WITH el AS (SELECT doc_id, text, len(text) AS lt
       |            FROM documents WHERE len(text) >= $MinChars),
       |idx AS (SELECT unnest(range($n)) AS i),
       |q AS (SELECT doc_id, i,
       |        CAST(round((0.25 + 0.5 * (ascii(substr(text,
       |            CAST(i % lt AS INTEGER) + 1, 1)) / 255.0)) * 32767)
       |          AS BIGINT) // 128 AS lv
       |      FROM el CROSS JOIN idx),
       |p AS (SELECT doc_id,
       |        (31 * lag(lv) OVER (PARTITION BY doc_id ORDER BY i) + lv)
       |          % 64 AS bucket
       |      FROM q),
       |hist AS (SELECT doc_id, bucket, count(*) AS c
       |         FROM p WHERE bucket IS NOT NULL GROUP BY 1, 2),
       |hb AS (SELECT e.doc_id, bb.b, coalesce(h.c, 0) AS c
       |       FROM (SELECT DISTINCT doc_id FROM el) e
       |       CROSS JOIN (SELECT unnest(range(64)) AS b) bb
       |       LEFT JOIN hist h ON h.doc_id = e.doc_id AND h.bucket = bb.b),
       |fp AS (SELECT a.doc_id,
       |         bit_or(CASE WHEN a.c > nx.c THEN
       |           CASE WHEN a.b = 63 THEN (-9223372036854775807 - 1)::BIGINT
       |                ELSE 1::BIGINT << CAST(a.b AS INTEGER) END
       |           ELSE 0::BIGINT END) AS ahash
       |       FROM hb a JOIN hb nx
       |         ON nx.doc_id = a.doc_id AND nx.b = (a.b + 1) % 64
       |       GROUP BY 1)
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       |  CAST(bit_count(xor(x.ahash, y.ahash)) AS BIGINT) AS hamming
       |FROM fp x JOIN fp y ON x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.ahash, y.ahash)) <= $MaxHamming
       |""".stripMargin
  }

  /** Q197: MEDIA eval-set decontamination — the third eye of the decon
    * tier (q172's grams see verbatim text, q185's embeddings see
    * paraphrase; NEITHER sees a benchmark's IMAGE re-crawled into the
    * training set with its caption rewritten). Directional: every
    * (train image, eval image) pair within [[MaxHamming]] of each
    * other by dHash over real decoded pixels, eval = doc_id % 10 == 0
    * (the decon tier's suite convention). Rows-only like q153 (DuckDB
    * cannot decode PNG); MediaDedupSpec pins exact parity with
    * oracle-parity-pinned q153's pairs restricted to the cross-split
    * orientation, plus a constructed verbatim re-crawl at hamming 0.
    *
    * Scale shape: both sides hash in one decode pass each;
    * [[MediaDedup.deconPairs]] bands the benchmark-sized eval side and
    * BROADCASTS it into the band join — the train corpus is decoded
    * and hashed once, never shuffled (q185's eval-broadcast argument,
    * modality three). A takedown of eval images retires through
    * [[graft.sources.MediaHashStore]] exactly as dedup's do.
    *
    * Store-or-inline (r15, the q82/q195 dispatch): a configured-and-
    * fresh [[graft.sources.MediaHashStore]] sourced face serves the
    * TRAIN corpus's day-partitioned hashes, so the corpus decode — the
    * media tier's dominant cost, and at 100 TB the one you never re-run
    * per suite edit — is paid at ingest, not per probe. Freshness is
    * one xxhash64 scan of the offered captions (decode-free by
    * construction); stale/missing ⇒ inline, cost never a missed pair.
    * The benchmark-sized eval side always renders inline (MBs — the
    * suite is the thing that CHANGED when this query runs). The xmd
    * bench pair prices the serve vs the inline suite entry. */
  def q197MediaDecon(spark: SparkSession, dir: String): DataFrame =
    mediaDeconPairs(spark, dir).orderBy("doc_id", "eval_doc")

  /** The (train, eval, hamming) media decon pair relation — q197's
    * body, shared with the q199 coverage rollup so the two reports can
    * never disagree on a pair. */
  private def mediaDeconPairs(spark: SparkSession, dir: String): DataFrame = {
    val train = trainHashesOf(deconTrainDocs(spark, dir))
    val eval = MediaDedup.hashImages(renderAll(deconEvalDocs(spark, dir)))
    // Store-or-inline (r16): the VerdictStore's img evidence IS this
    // pair relation, so q197/q199/q200 all serve from it through this
    // one shared body when it is fresh — per-modality freshness, two
    // hash scans, zero band joins. Stale/missing ⇒ the inline exact
    // banding; the MediaHashStore dispatch above keeps even the
    // freshness digest decode-free on the train side.
    graft.sources.VerdictStore.openFreshMediaPairs(train, eval, MaxHamming) match {
      case Some(served) =>
        graft.sources.VerdictStore.recordArm(spark, "q197", "store"); served
      case None =>
        graft.sources.VerdictStore.recordArm(spark, "q197", "inline")
        MediaDedup.deconPairs(train, eval, MaxHamming)
    }
  }

  /** The decon tier's TRAIN image-source relation (media_id, text) —
    * the exact relation q197/q198 offer to [[graft.sources
    * .MediaHashStore.openFreshFor]]. Exposed (package-private) so a
    * store BUILD — Bench's xmd probe, an ingest job — digests this
    * same object rather than a re-derived copy of the private
    * eligibility/split predicates: a drifted copy would digest-mismatch
    * and silently demote every timed/served open to inline hashing
    * (review r15 finding 3). */
  private[graft] def deconTrainDocs(spark: SparkSession, dir: String): DataFrame =
    eligibleDocs(spark, dir)
      .select(col("doc_id").as("media_id"), col("text"))
      .filter(col("media_id") % 10 =!= 0)

  /** The decon tier's EVAL image-source relation — [[deconTrainDocs]]'
    * suite-side twin, exposed for the same drift argument (a store
    * build digesting a re-derived copy of the eligibility/split
    * predicates would silently demote every served open to inline). */
  private[graft] def deconEvalDocs(spark: SparkSession, dir: String): DataFrame =
    eligibleDocs(spark, dir)
      .select(col("doc_id").as("media_id"), col("text"))
      .filter(col("media_id") % 10 === 0)

  /** The train side's hashes, store-served when fresh (see q197). */
  private def trainHashesOf(train: DataFrame): DataFrame =
    graft.sources.MediaHashStore.openFreshFor(train)
      .getOrElse(MediaDedup.hashImages(renderAll(train)))

  /** Q198: the THREE-EYE decontamination verdict — q196's composed
    * gram + semantic relation extended with the media eye (VERDICT r14
    * next-1b): one row per training doc, all three eyes' evidence
    * (gram span mass; semantic hit count / strongest sim / witness;
    * image hit count / MIN hamming / witness), and keep = clean under
    * every eye that saw the doc. The ABSENCE rule carries: a doc too
    * short to render an image ([[MinChars]]) — or, in a real lake, one
    * with no image attachment — keeps its two-eye verdict, with the
    * media columns at 0/null, never coalesced to a value that would
    * read as a hamming-0 verbatim hit.
    *
    * Rows-only by composition: the gram + semantic half IS q196's
    * oracle-green relation (ThreeEyeDeconSpec pins column-for-column
    * equality), and the media half is q197's rows-only rollup (DuckDB
    * cannot decode PNG; the same spec pins it against q197's pairs) —
    * the per-protocol parity pins, not a weaker claim. Scale shape:
    * the three audited kernels plus doc-keyed full-outer joins; the
    * train corpus's image hashes ride the same
    * [[graft.sources.MediaHashStore]] dispatch as q197, so the
    * three-eye verdict re-decodes nothing when the store is fresh. */
  def q198ThreeEyeDecon(spark: SparkSession, dir: String): DataFrame = {
    // Widened like [[spread]]'s render inputs (graft.core.Par.widen,
    // r19): the gram eye's winnow chain and the semantic eye's
    // normalization are CPU-bound per row, and the bytes-sized scan of
    // a small-file corpus serialized both on one task (profiled: two
    // concurrent 2.85 s single-task jobs — the two eyes racing the
    // same one-partition scan). At scale this is the identity.
    val d = graft.core.Par.widen(Tables(spark, dir, "documents"))
    val e = graft.core.Par.widen(Tables(spark, dir, "embeddings"))
    // Store-or-inline (r16): a configured-and-fresh VerdictStore
    // serves the whole three-eye relation from its per-(benchmark,
    // day) evidence — digest scans + match-sized rollups instead of
    // the three-kernel corpus sweep. The train img side rides the
    // MediaHashStore dispatch EITHER way, so a fresh hash store keeps
    // even the freshness digest decode-free; the benchmark-sized eval
    // side renders inline (the suite is what changed when this runs).
    val train = graft.sources.VerdictStore.Corpus(
      d.filter(col("doc_id") % 10 =!= 0),
      e.filter(col("vec_id") % 10 =!= 0),
      trainHashesOf(deconTrainDocs(spark, dir)))
    val suite = graft.sources.VerdictStore.Corpus(
      d.filter(col("doc_id") % 10 === 0),
      e.filter(col("vec_id") % 10 === 0),
      MediaDedup.hashImages(renderAll(deconEvalDocs(spark, dir))))
    // The two arms are result-identical only under the first-K fixture
    // convention; a deployed store's trained codebook and the inline
    // sweep's first-K union derivation can legitimately disagree on
    // near-τ semantic verdicts — so the chosen arm is stamped as a
    // STRUCTURED signal (r17 advice), not just a stderr line:
    // spark.conf "spark.graft.verdictstore.arm.q198" = store | inline.
    graft.sources.VerdictStore.openFreshThreeEye(train, suite) match {
      case Some(served) =>
        graft.sources.VerdictStore.recordArm(spark, "q198", "store"); served
      case None =>
        graft.sources.VerdictStore.recordArm(spark, "q198", "inline")
        graft.streaming.DeconGate.flagThreeEye(
          train.txt, suite.txt, train.emb, suite.emb, train.img, suite.img)
    }
  }

  /** Q199: per-benchmark MEDIA contamination coverage — the q183/q190
    * mirror for the third eye, completing the coverage-report symmetry
    * (one per modality a model card cites): for each eval doc, how many
    * TRAINING images sit within dHash hamming [[MaxHamming]] of its
    * image, the strongest match (min hamming — 0 is a verbatim
    * re-crawl), and the smallest witnessing train doc. Every eval doc
    * gets a row — zero matches reported at 0 with null min_hamming
    * (q190's convention: the audit's point is the clean rows as much
    * as the dirty ones; an eval doc too short to render an image is
    * trivially clean on this eye and reports the same 0/null).
    *
    * Pure rollup of q197's pair relation ([[mediaDeconPairs]] — shared
    * body, the two reports cannot disagree) plus one narrow eval-id
    * scan; rides the same [[graft.sources.MediaHashStore]] dispatch,
    * so a fresh store makes this report decode-free on the train side.
    * Rows-only (q197's reason: DuckDB cannot decode PNG);
    * ThreeEyeDeconSpec pins it against q197's pairs rolled up by
    * eval_doc plus the zero rows. */
  def q199MediaCoverage(spark: SparkSession, dir: String): DataFrame = {
    val hits = mediaDeconPairs(spark, dir)
      .groupBy("eval_doc")
      .agg(count(lit(1)).as("n_train_hits"), min("hamming").as("min_hamming"),
        min("doc_id").as("witness_train"))
    Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("eval_doc"))
      .join(hits, Seq("eval_doc"), "left")
      .select(col("eval_doc"),
        coalesce(col("n_train_hits"), lit(0L)).as("n_train_hits"),
        col("min_hamming"), col("witness_train"))
      .orderBy("eval_doc")
  }

  /** Q200: media-decon SCRUB verdict — the ACT face of the media eye,
    * completing per-modality act symmetry (q173 excises gram spans,
    * q191 drops semantic copies whole, and an image has no excisable
    * span either: a re-crawled benchmark image drops its training doc
    * WHOLE, witness recorded for the audit trail). One row per
    * training doc of the corpus: keep = no eval image within
    * [[MaxHamming]] of the doc's image; flagged rows carry the
    * smallest witnessing eval id and the STRONGEST match (min
    * hamming). A doc with no image (too short to render — or, in a
    * real lake, no attachment) keeps trivially with null evidence,
    * the q198 absence rule.
    *
    * Pure rollup of q197's shared pair relation ([[mediaDeconPairs]])
    * over one narrow train-id scan — the decision join is
    * match-relation-sized (q191's shapes), and the train side rides
    * the same [[graft.sources.MediaHashStore]] dispatch, so a fresh
    * store makes the scrub decode-free. Rows-only (q197's reason:
    * DuckDB cannot decode PNG); ThreeEyeDeconSpec pins survivors =
    * train minus q197's flagged docs, evidence = the pair rollup, and
    * the imageless-keep rule. */
  def q200MediaScrub(spark: SparkSession, dir: String): DataFrame = {
    val hits = mediaDeconPairs(spark, dir)
      .groupBy("doc_id")
      .agg(min("eval_doc").as("witness_eval"), min("hamming").as("min_hamming"))
    Tables(spark, dir, "documents")
      .filter(col("doc_id") % 10 =!= 0)
      .select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("witness_eval").isNull.as("keep"),
        col("witness_eval"), col("min_hamming"))
      .orderBy("doc_id")
  }

  /** Q201: the EYE-OVERLAP summary — the model-card table the per-doc
    * verdict relation (q198) rolls up to: for every combination of the
    * three eyes (gram / semantic / media dirty), how many training
    * docs that combination flags, with the two masses a governance
    * owner reads next to the counts (total contaminated chars for the
    * gram-dirty rows; strongest semantic match for the sem-dirty
    * ones). All 8 combinations are reported — zeros included, from a
    * static 8-row grid left-joined with the rollup — because "no doc
    * is media-only dirty" is exactly the kind of finding the report
    * exists to state, and a combination silently absent reads as
    * unmeasured. The overlap structure is the actionable part: docs
    * caught by ONE eye only are the proof each eye pays its way (the
    * disjoint-failure-modes argument made measurable), and the
    * all-three row sizes the verbatim re-crawl population.
    *
    * Pure 8-way rollup of q198's relation (shared body — the summary
    * and the per-doc verdicts cannot disagree), so it rides the same
    * VerdictStore dispatch: with a fresh store this model-card table
    * costs evidence-sized rollups, zero corpus probes. Rows-only
    * (q198's reason: the media columns have no SQL oracle);
    * ThreeEyeDeconSpec pins it cell-for-cell against q198's collected
    * relation rolled up in memory. */
  def q201EyeOverlap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = q198ThreeEyeDecon(spark, dir)
      .select((col("contam_chars") > 0L).as("gram_dirty"),
        (col("n_eval_hits") > 0L).as("sem_dirty"),
        (col("n_image_hits") > 0L).as("img_dirty"),
        col("contam_chars"), col("max_eval_sim"))
      .groupBy("gram_dirty", "sem_dirty", "img_dirty")
      .agg(count(lit(1)).as("n_docs"),
        sum("contam_chars").as("contam_chars"),
        max("max_eval_sim").as("max_eval_sim"))
    val grid = (for { g <- Seq(false, true); s <- Seq(false, true)
      i <- Seq(false, true) } yield (g, s, i))
      .toDF("gram_dirty", "sem_dirty", "img_dirty")
    // ≤8 rows by construction — broadcast rather than leaving a
    // static sort-merge plan (q194's grid argument).
    grid.join(broadcast(v), Seq("gram_dirty", "sem_dirty", "img_dirty"), "left")
      .select(col("gram_dirty"), col("sem_dirty"), col("img_dirty"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("contam_chars"), lit(0L)).as("contam_chars"),
        coalesce(col("max_eval_sim"), lit(0.0)).as("max_eval_sim"))
      .orderBy("gram_dirty", "sem_dirty", "img_dirty")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q153_image_neardup" -> q153ImageNearDup _,
    "q154_alignment_audit" -> q154AlignmentAudit _,
    "q155_video_segdup" -> q155VideoSegdup _,
    "q156_audio_audit" -> q156AudioAudit _,
    "q157_image_scrub" -> q157ImageScrub _,
    "q178_audio_neardup" -> q178AudioNearDup _,
    "q197_media_decon" -> q197MediaDecon _,
    "q198_three_eye_decon" -> q198ThreeEyeDecon _,
    "q199_media_coverage" -> q199MediaCoverage _,
    "q200_media_scrub" -> q200MediaScrub _,
    "q201_eye_overlap" -> q201EyeOverlap _)

  val oracles: Map[String, String] = Map(
    "q154_alignment_audit" -> alignmentAuditSql,
    "q155_video_segdup" -> videoSegdupSql,
    "q156_audio_audit" -> audioAuditSql,
    "q178_audio_neardup" -> audioNearDupSql)
}
