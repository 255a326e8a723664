package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextExprs

/** The curation layer of a training-data pipeline — the queries that
  * turn per-document SIGNALS (quality, language, repetition, duplicate
  * cluster) into per-document DECISIONS, and documents into
  * training-shaped units (chunks, histograms for mixture dashboards).
  *
  * Everything is deterministic and engine-portable (same contract as
  * [[CorpusQueries]]): content-hash splits, no `rand()`, exact integer /
  * decimal arithmetic where results feed comparisons.
  *
  * Scale shapes: q60 is narrow per-row signal computation plus ONE
  * fingerprint groupBy (uniform md5 keys — no skew); q61 is a
  * bounded-key aggregation (≤ [[HistBuckets]] groups); q63 is a pure
  * explode of per-row windows — map-only, no shuffle at all.
  */
object CurationQueries {

  private val Stopwords = Seq("the", "a")
  private val EvalBucketFrom = 90 // hash buckets 90..99 → 10% eval split

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  // ----------------------------------------------------- q60 curation
  /** Q60: the end-to-end curation decision record — one row per
    * document: every rejection signal, the FIRST failing filter as the
    * reject reason (filter order: quality → language → repetition →
    * duplicate, the order a production pipeline applies them in, cheap
    * narrow signals before the dedup join), the keep verdict, and the
    * train/eval split + token budget for kept documents.
    *
    * Signals reuse the exact definitions of q22 (quality score), q23
    * (language heuristic), q51 (duplicate-token ratio) and q25
    * (normalized fingerprint keeper) — this query is their composition,
    * which is precisely what "a curation pipeline" is. Duplicate keepers
    * are chosen among the documents that SURVIVE the narrow filters
    * (min doc_id of the cluster's surviving members): fingerprinting
    * normalizes case/whitespace but the quality signals see the raw
    * text, so the corpus-wide min-id copy of a cluster can fail quality
    * while a sibling passes — a corpus-wide keeper would then reject
    * every copy and silently delete the content. Filter-then-dedup (the
    * production order) keeps exactly one surviving copy instead. */
  def curation(spark: SparkSession, dir: String): DataFrame =
    curationOn(docs(spark, dir))

  private[operators] def curationOn(docRel: DataFrame): DataFrame = {
    val w = TextExprs.tokens(col("text"))
    val base = docRel.select(
      col("doc_id"), col("lang"), col("text"), col("n_chars"),
      size(w).cast("long").as("n_tokens"),
      size(array_distinct(w)).cast("long").as("n_types"),
      TextExprs.markerCount(w, Stopwords).cast("long").as("n_stop"),
      TextExprs.fingerprint(col("text")).as("fp"))
    // The one-definition signal expressions (TextExprs) — q60 IS the
    // composition of q22/q23/q51, so it must share their code, not
    // paraphrase it.
    val quality = TextExprs.qualityScore(col("n_tokens"), col("n_types"), col("n_stop"))
    val markerRate = col("n_stop") * lit(1.0) / col("n_tokens")
    val langPred = TextExprs.langPred(markerRate, TextExprs.thRate(col("text")))
    val dupRatio = TextExprs.dupRatio(col("n_tokens"), col("n_types"))
    // One scan computes every narrow signal; the persisted signal
    // relation then feeds both the keeper aggregation and the join probe
    // (without it Catalyst plans two independent corpus scans, each
    // re-fingerprinting — the pattern core/Caches exists to kill).
    val signals = graft.core.Caches.persistTracked(
      base.select(col("doc_id"), col("fp"), col("n_chars"),
        quality.as("quality_score"), langPred.as("lang_pred"), dupRatio.as("dup_ratio")))
    val pass = col("quality_score") >= 2 && col("lang_pred") === "en" && col("dup_ratio") <= 0.5
    val keepers = signals.where(pass).groupBy("fp").agg(min("doc_id").as("keeper"))
    // left join: a cluster with no surviving member has no keeper row,
    // but all its docs were already rejected by a narrow filter, so the
    // duplicate branch (null-safe: null keeper never matches) is moot.
    signals.join(keepers, Seq("fp"), "left")
      .withColumn("reason",
        when(col("quality_score") < 2, "low_quality")
          .when(col("lang_pred") =!= "en", "non_english")
          .when(col("dup_ratio") > 0.5, "repetitious")
          .when(col("doc_id") =!= col("keeper"), "duplicate")
          .otherwise("keep"))
      .withColumn("keep", col("reason") === "keep")
      .withColumn("split",
        when(!col("keep"), lit("none"))
          .when(SamplingQueries.hashBucket(col("doc_id")) >= EvalBucketFrom, lit("eval"))
          .otherwise(lit("train")))
      .select(col("doc_id"), col("quality_score"), col("lang_pred"), col("dup_ratio"),
        col("reason"), col("keep"), col("split"),
        call_function("div", col("n_chars") + 3, lit(4L)).as("est_tokens"))
  }

  val curationSql: String = {
    val bucket = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"
    s"""WITH b AS (SELECT doc_id, lang, text, n_chars, string_split(text, ' ') AS w,
       |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp FROM documents),
       |m AS (SELECT doc_id, lang, text, n_chars, fp, len(w) AS n_tokens,
       |    len(list_distinct(w)) AS n_types,
       |    len(list_filter(w, x -> x IN ('the', 'a'))) AS n_stop FROM b),
       |s AS (SELECT doc_id, fp, n_chars,
       |    CAST((CASE WHEN n_tokens BETWEEN 20 AND 400 THEN 1 ELSE 0 END +
       |          CASE WHEN n_types * 1.0 / n_tokens >= 0.3 THEN 1 ELSE 0 END +
       |          CASE WHEN n_stop * 1.0 / n_tokens BETWEEN 0.01 AND 0.3 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS quality_score,
       |    CASE WHEN n_stop * 1.0 / n_tokens >= 0.05
       |           AND (len(text) - len(replace(text, ' th', ''))) * 1.0 / len(text) >= 0.01
       |         THEN 'en' ELSE 'other' END AS lang_pred,
       |    round(1.0 - CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS dup_ratio
       |  FROM m),
       |k AS (SELECT fp, min(doc_id) AS keeper FROM s
       |  WHERE quality_score >= 2 AND lang_pred = 'en' AND dup_ratio <= 0.5 GROUP BY fp),
       |r AS (SELECT doc_id, quality_score, lang_pred, dup_ratio, n_chars,
       |    CASE WHEN quality_score < 2 THEN 'low_quality'
       |         WHEN lang_pred <> 'en' THEN 'non_english'
       |         WHEN dup_ratio > 0.5 THEN 'repetitious'
       |         WHEN doc_id <> keeper THEN 'duplicate'
       |         ELSE 'keep' END AS reason FROM s LEFT JOIN k USING (fp))
       |SELECT doc_id, quality_score, lang_pred, dup_ratio, reason,
       |  reason = 'keep' AS keep,
       |  CASE WHEN reason <> 'keep' THEN 'none'
       |       WHEN $bucket >= $EvalBucketFrom THEN 'eval' ELSE 'train' END AS split,
       |  (n_chars + 3) // 4 AS est_tokens
       |FROM r""".stripMargin
  }

  // ---------------------------------------------------- q61 histogram
  private val HistWidth = 16
  private val HistBuckets = 32 // top bucket is open-ended

  /** Q61: token-count histogram — the length-distribution panel of every
    * corpus dashboard, and the input to choosing packing budgets.
    * Fixed-width buckets (top bucket open-ended), each with doc count,
    * min/max, total tokens, and corpus share. One aggregation over a
    * key space bounded by [[HistBuckets]]; the share is a window over
    * ≤ 32 rows — nothing here grows with the corpus except the single
    * map-side-combined pass. */
  def tokenHistogram(spark: SparkSession, dir: String): DataFrame = {
    val agg = docs(spark, dir)
      .select(size(TextExprs.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("bucket",
        least(call_function("div", col("n_tokens"), lit(HistWidth.toLong)),
          lit(HistBuckets - 1L)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("n_tokens").as("min_tokens"),
        max("n_tokens").as("max_tokens"),
        sum("n_tokens").as("total_tokens"))
    agg
      .withColumn("lo", col("bucket") * HistWidth)
      .withColumn("share", round(col("n_docs") * lit(1.0) /
        sum("n_docs").over(org.apache.spark.sql.expressions.Window.partitionBy()), 6))
      .select("bucket", "lo", "n_docs", "min_tokens", "max_tokens", "total_tokens", "share")
  }

  val tokenHistogramSql: String =
    s"""WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
       |b AS (SELECT least(n_tokens // $HistWidth, ${HistBuckets - 1}) AS bucket, n_tokens FROM d),
       |g AS (SELECT bucket, count(*) AS n_docs, min(n_tokens) AS min_tokens,
       |    max(n_tokens) AS max_tokens, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
       |  FROM b GROUP BY bucket)
       |SELECT bucket, bucket * $HistWidth AS lo, n_docs, min_tokens, max_tokens, total_tokens,
       |  round(n_docs * 1.0 / sum(n_docs) OVER (), 6) AS share
       |FROM g""".stripMargin

  // ----------------------------------------------------- q63 chunking
  private val ChunkTokens = 128
  private val ChunkStride = 96 // 32-token overlap between neighbors

  /** Q63: overlapping token-window chunking — long documents become
    * [[ChunkTokens]]-token training units with [[ChunkStride]] stride
    * (32-token overlap keeps context across boundaries), each with a
    * content fingerprint for downstream chunk-level dedup. A pure
    * per-row explode — zero shuffle, fully codegen'd; chunk boundaries
    * depend only on the document itself, so the operator is
    * embarrassingly parallel at any corpus size. */
  def chunk(spark: SparkSession, dir: String): DataFrame =
    chunkOn(docs(spark, dir))

  /** `carry` threads extra per-document columns (provenance: lang,
    * split, …) through the explode unchanged — q75 uses this instead of
    * re-joining chunks back to documents, keeping the whole chunking
    * stage map-only even inside the composition. */
  private[operators] def chunkOn(docRel: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val cc = carry.map(col)
    val starts = sequence(lit(0), greatest(size(col("w")) - 1, lit(0)), lit(ChunkStride))
    val piece = slice(col("w"), col("start") + 1,
      least(lit(ChunkTokens), size(col("w")) - col("start")))
    docRel
      .select((col("doc_id") +: cc) :+ TextExprs.tokens(col("text")).as("w"): _*)
      .select((col("doc_id") +: cc) ++ Seq(col("w"),
        posexplode(starts).as(Seq("chunk_idx", "start"))): _*)
      .select((col("doc_id") +: cc) ++ Seq(
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("start").cast("long").as("start"),
        size(piece).cast("long").as("chunk_tokens"),
        md5(concat_ws(" ", piece).cast("binary")).as("chunk_fp")): _*)
  }

  val chunkSql: String =
    s"""WITH b AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |s AS (SELECT doc_id, w, unnest(range(0, len(w), $ChunkStride)) AS start FROM b)
       |SELECT doc_id, start // $ChunkStride AS chunk_idx, start,
       |  CAST(len(list_slice(w, start + 1, least(start + $ChunkTokens, len(w)))) AS BIGINT)
       |    AS chunk_tokens,
       |  md5(array_to_string(list_slice(w, start + 1, least(start + $ChunkTokens, len(w))), ' '))
       |    AS chunk_fp
       |FROM s""".stripMargin

  // -------------------------------------- q85 content-defined chunks
  /** Boundary modulus: a token starts a new chunk when its 32-bit
    * md5-derived hash ≡ 0 (mod [[CdcMod]]) → expected chunk length
    * [[CdcMod]] tokens. */
  private val CdcMod = 16

  /** Q85: content-defined chunking — the dedup-stable alternative to
    * q63's fixed windows. Boundaries are decided by the CONTENT (a
    * token whose hash hits the modulus opens a chunk), not by offsets,
    * so inserting a paragraph into a document only re-chunks the
    * region around the edit: every chunk outside it keeps its exact
    * fingerprint, which is what lets chunk-level dedup (q63's `chunk_fp`
    * consumers) recognize shared content ACROSS revisions — the
    * rolling-hash trick storage dedup and CDC-for-text both rely on.
    *
    * Scale: one explode, then per-document windows (cumulative
    * boundary count) and a per-(doc, chunk) aggregation — all
    * partitioned by doc_id, uniform keys, one shuffle reused by window
    * and groupBy; chunk text reassembles via an order-pinned
    * collect_list inside bounded per-chunk groups, never corpus-wide. */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame =
    cdcChunksOn(docs(spark, dir))

  private[operators] def cdcChunksOn(docRel: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(col("word").cast("binary")), 1, 8), 16, 10).cast("long")
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val ordered = transform(
      array_sort(collect_list(struct(col("pos"), col("word")))),
      s => s.getField("word"))
    docRel
      .select(col("doc_id"), posexplode(TextExprs.tokens(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("word"))
      .withColumn("b", when(pmod(h, lit(CdcMod.toLong)) === 0L, 1L).otherwise(0L))
      .withColumn("chunk",
        sum(col("b")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "chunk")
      .agg(count(lit(1)).as("n_tokens"), min(col("pos")).as("start_pos"),
        md5(concat_ws(" ", ordered).cast("binary")).as("chunk_fp"))
  }

  val cdcChunksSql: String =
    s"""WITH w0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |w AS (SELECT doc_id, CAST(unnest(range(len(ws))) AS BIGINT) AS pos,
       |    unnest(ws) AS word FROM w0),
       |b AS (SELECT doc_id, pos, word,
       |    CASE WHEN ('0x' || substr(md5(word), 1, 8))::BIGINT % $CdcMod = 0
       |      THEN 1 ELSE 0 END AS bf FROM w),
       |c AS (SELECT doc_id, pos, word,
       |    sum(bf) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS chunk FROM b)
       |SELECT doc_id, CAST(chunk AS BIGINT) AS chunk, count(*) AS n_tokens,
       |  min(pos) AS start_pos,
       |  md5(string_agg(word, ' ' ORDER BY pos)) AS chunk_fp
       |FROM c GROUP BY 1, 2""".stripMargin

  // ------------------------------------------- q75 training units
  /** Salt for the mixture-acceptance hash. The mixture decision MUST be
    * hash-independent of the eval-split decision: both are percentiles
    * of a doc_id hash, and with the SAME hash the eval split lives in
    * buckets 90..99 while every mixture rate is ≤ 80 — the mixture
    * would silently delete the entire eval split. Salting the id gives
    * an independent uniform draw (the standard fix for correlated
    * hash-based decisions in a pipeline). */
  private val MixSalt = "|mix"

  /** Salt for the pack-group shard hash. grp = hash(doc_id) % 8 and
    * split = hash(doc_id) % 100 share gcd(8, 100) = 4 when drawn from
    * the same unsalted hash, so a doc's split bucket fixes grp mod 4 —
    * within the eval split (buckets 90..99) pack groups would skew
    * ~1.5x. Same correlated-hash issue [[MixSalt]] fixes; same fix. */
  private val GrpSalt = "|grp"

  /** Q75: the end-to-end training-units artifact — the query a
    * training-data pipeline actually ships, composing the green stages
    * end to end: q60 curation decisions → keep survivors → q37-style
    * per-language mixture acceptance (salted hash, see [[MixSalt]]) →
    * q63 overlapping chunking (provenance carried through the explode,
    * no re-join) → q49-style sequence packing of chunks into
    * [[CorpusQueries.TokenBudget]]-token bins, partitioned so a pack
    * never mixes train and eval chunks.
    *
    * One row per packed training chunk: provenance (doc_id, chunk_idx,
    * lang, split), content (chunk_tokens, chunk_fp), and pack
    * coordinates (grp, pack_bin, pack_offset). This is where
    * column-contract drift between the stages would surface — the
    * composition is the test.
    *
    * Scale shape: curation is one corpus scan + one fingerprint groupBy
    * (q60's shape); mixture is a map-side filter; chunking is a pure
    * explode; packing is a window cumulative sum within
    * (split, grp) shards — [[CorpusQueries.PackGroups]] independent
    * groups locally, thousands on a cluster. The only joins are the
    * curation keeper join (uniform fp keys) and the decisions join
    * (uniform doc_id keys); nothing is all-pairs, nothing collects. */
  def trainingUnits(spark: SparkSession, dir: String): DataFrame =
    trainingUnitsOn(docs(spark, dir))

  private[operators] def trainingUnitsOn(docRel: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mixRate = when(col("lang") === "en", 80)
      .when(col("lang") === "de", 50)
      .otherwise(20)
    val decisions = curationOn(docRel).where(col("keep")).select("doc_id", "split")
    // Mixture filters the raw relation BEFORE the decisions join — the
    // acceptance test only needs (doc_id, lang), so applying it first
    // shrinks the join's probe side for free.
    val kept = docRel
      .where(SamplingQueries.hashBucket(
        concat(col("doc_id").cast("string"), lit(MixSalt))) < mixRate)
      .select(col("doc_id"), col("lang"), col("text"))
      .join(decisions, Seq("doc_id"))
    val chunks = chunkOn(kept, carry = Seq("lang", "split"))
    val w = Window.partitionBy("split", "grp").orderBy("doc_id", "chunk_idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunks
      .withColumn("grp", SamplingQueries.hashBucket(
        concat(col("doc_id").cast("string"), lit(GrpSalt)), CorpusQueries.PackGroups))
      .withColumn("cum", sum(col("chunk_tokens")).over(w))
      .select(col("doc_id"), col("chunk_idx"), col("lang"), col("split"),
        col("chunk_tokens"), col("chunk_fp"), col("grp"),
        call_function("div", col("cum") - col("chunk_tokens"),
          lit(CorpusQueries.TokenBudget.toLong)).as("pack_bin"),
        (col("cum") - col("chunk_tokens")).as("pack_offset"))
  }

  val trainingUnitsSql: String = {
    val bucket = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"
    val mixBucket =
      s"(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '$MixSalt'), 1, 8))::BIGINT % 100)"
    val grpBucket =
      s"(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '$GrpSalt'), 1, 8))::BIGINT % ${CorpusQueries.PackGroups})"
    s"""WITH b AS (SELECT doc_id, lang, text, string_split(text, ' ') AS w,
       |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp FROM documents),
       |m AS (SELECT doc_id, lang, text, fp, w, len(w) AS n_tokens,
       |    len(list_distinct(w)) AS n_types,
       |    len(list_filter(w, x -> x IN ('the', 'a'))) AS n_stop FROM b),
       |s AS (SELECT doc_id, lang, w, fp,
       |    CAST((CASE WHEN n_tokens BETWEEN 20 AND 400 THEN 1 ELSE 0 END +
       |          CASE WHEN n_types * 1.0 / n_tokens >= 0.3 THEN 1 ELSE 0 END +
       |          CASE WHEN n_stop * 1.0 / n_tokens BETWEEN 0.01 AND 0.3 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS quality_score,
       |    CASE WHEN n_stop * 1.0 / n_tokens >= 0.05
       |           AND (len(text) - len(replace(text, ' th', ''))) * 1.0 / len(text) >= 0.01
       |         THEN 'en' ELSE 'other' END AS lang_pred,
       |    round(1.0 - CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS dup_ratio
       |  FROM m),
       |k AS (SELECT fp, min(doc_id) AS keeper FROM s
       |  WHERE quality_score >= 2 AND lang_pred = 'en' AND dup_ratio <= 0.5 GROUP BY fp),
       |kept AS (SELECT s.doc_id, lang, w,
       |    CASE WHEN $bucket >= $EvalBucketFrom THEN 'eval' ELSE 'train' END AS split
       |  FROM s JOIN k USING (fp)
       |  WHERE quality_score >= 2 AND lang_pred = 'en' AND dup_ratio <= 0.5
       |    AND s.doc_id = k.keeper
       |    AND $mixBucket <
       |      CASE WHEN lang = 'en' THEN 80 WHEN lang = 'de' THEN 50 ELSE 20 END),
       |c AS (SELECT doc_id, lang, split, w,
       |    unnest(range(0, len(w), $ChunkStride)) AS start FROM kept),
       |ch AS (SELECT doc_id, lang, split,
       |    CAST(start // $ChunkStride AS BIGINT) AS chunk_idx,
       |    CAST(len(list_slice(w, start + 1, least(start + $ChunkTokens, len(w)))) AS BIGINT)
       |      AS chunk_tokens,
       |    md5(array_to_string(list_slice(w, start + 1, least(start + $ChunkTokens, len(w))), ' '))
       |      AS chunk_fp,
       |    $grpBucket AS grp
       |  FROM c),
       |p AS (SELECT *, CAST(sum(chunk_tokens) OVER (PARTITION BY split, grp
       |    ORDER BY doc_id, chunk_idx
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM ch)
       |SELECT doc_id, chunk_idx, lang, split, chunk_tokens, chunk_fp, grp,
       |  (cum - chunk_tokens) // ${CorpusQueries.TokenBudget} AS pack_bin,
       |  cum - chunk_tokens AS pack_offset
       |FROM p""".stripMargin
  }

  // -------------------------------------------------- q96 source cap
  /** Max documents kept per source. */
  private val CapPerSource = 20

  /** Q96: per-source document cap — keep the [[CapPerSource]] "best"
    * documents of each source (longest first, doc_id tiebreak). The
    * anti-over-representation control every web-scale corpus applies
    * per domain/crawl so no single source dominates the mixture.
    *
    * Scale shape: a rank window partitioned by source. Per-source
    * partitions only ever sort their own rows, and AQE's skew split
    * handles a hot source's sort spill; for pathologically hot
    * domains the two-phase variant (per-partition local top-K via
    * [[graft.functions.TopKAggregator]], then a merge — q08's
    * pattern) swaps in without changing the contract, since only the
    * top [[CapPerSource]] of any source ever leave the first stage. */
  def sourceCap(spark: SparkSession, dir: String): DataFrame =
    sourceCapOn(docs(spark, dir))

  private[operators] def sourceCapOn(docRel: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    docRel
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= CapPerSource)
  }

  val sourceCapSql: String =
    s"""WITH r AS (SELECT doc_id, source, n_chars,
       |    row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
       |  FROM documents)
       |SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS rk
       |FROM r WHERE rk <= $CapPerSource""".stripMargin

  // ------------------------------------------------ q105 pad waste
  /** Power-of-two length-bucket boundaries for batch padding; documents
    * longer than the last bucket train truncated to it (chunking longer
    * documents instead is q63's business — this operator audits the
    * SHORT tail, where padding is the waste). */
  val PadBuckets: Seq[Int] = Seq(32, 64, 128, 256, 512, 1024, 2048)

  /** Q105: padding-waste audit for length-bucketed batching — every
    * batching scheme pads each sequence to its bucket's boundary, and
    * the fraction of padded positions is pure wasted compute. Per
    * bucket: documents, real tokens (post-truncation), padded slots,
    * and the waste ratio the batcher's bucket geometry produces.
    * The number that decides whether [[PadBuckets]] needs re-tuning
    * before a training run burns a cluster-month on pad tokens.
    *
    * Exactness: everything is integer until the single final division
    * (the q58 moments argument), so the report is engine-identical.
    *
    * Scale shape: a narrow map-only bucket classification (a CASE
    * chain — no sort, no histogram pass) into a map-side-combined
    * aggregation with ≤ |[[PadBuckets]]| groups. One scan, one
    * bounded-key shuffle. */
  def padWaste(spark: SparkSession, dir: String): DataFrame =
    padWasteOn(docs(spark, dir))

  private[operators] def padWasteOn(docRel: DataFrame): DataFrame = {
    val maxB = PadBuckets.last
    val n = size(TextExprs.tokens(col("text")))
    val bucket = PadBuckets.init.reverse.foldLeft(lit(maxB)) { (acc, b) =>
      when(n <= b, b).otherwise(acc)
    }
    docRel
      .select(bucket.cast("long").as("bucket"),
        least(n, lit(maxB)).cast("long").as("used"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("used").as("tokens_used"))
      .withColumn("tokens_padded", col("n_docs") * col("bucket"))
      .select(col("bucket"), col("n_docs"), col("tokens_used"), col("tokens_padded"),
        round((col("tokens_padded") - col("tokens_used")).cast("double")
          / col("tokens_padded").cast("double"), 6).as("waste_ratio"))
  }

  val padWasteSql: String = {
    val maxB = PadBuckets.last
    val caseChain = PadBuckets.init
      .map(b => s"WHEN n <= $b THEN $b").mkString(" ")
    s"""WITH t AS (SELECT len(string_split(text, ' ')) AS n FROM documents),
       |b AS (SELECT CAST(CASE $caseChain ELSE $maxB END AS BIGINT) AS bucket,
       |    CAST(least(n, $maxB) AS BIGINT) AS used FROM t),
       |g AS (SELECT bucket, count(*) AS n_docs, CAST(sum(used) AS BIGINT) AS tokens_used,
       |    count(*) * bucket AS tokens_padded
       |  FROM b GROUP BY 1)
       |SELECT bucket, n_docs, tokens_used, tokens_padded,
       |  round(CAST(tokens_padded - tokens_used AS DOUBLE)
       |    / CAST(tokens_padded AS DOUBLE), 6) AS waste_ratio
       |FROM g""".stripMargin
  }

  // ----------------------------------------- q106 score calibration
  /** Q106: per-source score calibration — a raw quality score (q97's
    * character entropy) is not comparable ACROSS sources: wiki text and
    * web scrape have different entropy baselines, so one global
    * threshold over-filters one source and under-filters the other.
    * The standard fix is rank normalization: each document's
    * percent_rank WITHIN its source, giving every source a uniform
    * [0,1] calibrated score — "keep the top 60% of each source" becomes
    * one global predicate on `pct`.
    *
    * Determinism: percent_rank is (rank−1)/(n−1) over the 6-decimal
    * rounded entropy — ties share a rank in both engines, and the one
    * division is a pinned IEEE op; n=1 sources get 0.0 by definition.
    *
    * Scale shape: q97's bounded-key entropy aggregation, a broadcast
    * doc_id→source join back to the (tiny, pre-aggregated) per-doc
    * relation, then ONE rank window partitioned by source — per-source
    * partitions sort only their own rows, AQE splits a hot source, and
    * the two-phase TopK swap-in (q96's note) applies if a single
    * source ever dwarfs an executor. */
  def scoreCalibration(spark: SparkSession, dir: String): DataFrame =
    scoreCalibrationOn(docs(spark, dir))

  private[operators] def scoreCalibrationOn(docRel: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ent = TextQueries.charEntropyOn(docRel)
      .select(col("doc_id"), col("entropy"))
    val w = Window.partitionBy("source").orderBy("entropy")
    docRel.select(col("doc_id"), col("source"))
      .join(ent, "doc_id")
      .select(col("doc_id"), col("source"), col("entropy"),
        count(lit(1)).over(Window.partitionBy("source")).as("n_source"),
        round(percent_rank().over(w), 6).as("pct"))
  }

  val scoreCalibrationSql: String =
    s"""WITH e AS (${TextQueries.charEntropySql})
       |SELECT d.doc_id, d.source, e.entropy,
       |  count(*) OVER (PARTITION BY d.source) AS n_source,
       |  round(percent_rank() OVER (PARTITION BY d.source ORDER BY e.entropy), 6) AS pct
       |FROM documents d JOIN e ON d.doc_id = e.doc_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_curation" -> curation _,
    "q61_token_histogram" -> tokenHistogram _,
    "q63_chunks" -> chunk _,
    "q75_training_units" -> trainingUnits _,
    "q85_cdc_chunks" -> cdcChunks _,
    "q96_source_cap" -> sourceCap _,
    "q105_pad_waste" -> padWaste _,
    "q106_score_calibration" -> scoreCalibration _)

  val oracles: Map[String, String] = Map(
    "q60_curation" -> curationSql,
    "q61_token_histogram" -> tokenHistogramSql,
    "q63_chunks" -> chunkSql,
    "q75_training_units" -> trainingUnitsSql,
    "q85_cdc_chunks" -> cdcChunksSql,
    "q96_source_cap" -> sourceCapSql,
    "q105_pad_waste" -> padWasteSql,
    "q106_score_calibration" -> scoreCalibrationSql)
}
