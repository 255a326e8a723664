package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextExprs

/** Corpus-preparation operators — the steps between "deduped documents"
  * and "training batches" in an LLM data pipeline: decontamination
  * against an eval split, packing documents into fixed token budgets,
  * PII/blocklist scrubbing, and intra-document repetition metrics.
  *
  * Everything is deterministic (content-hash splits, no `rand()`) and
  * engine-portable, same contract as [[SamplingQueries]]. All joins are
  * equi-joins on uniformly-distributed keys; all per-document work is a
  * narrow codegen'd projection.
  */
object CorpusQueries {

  private val ShingleN = 3
  private val TestBucketFrom = 90 // hash buckets 90..99 → 10% eval split
  // Shared with q75's composed packing stage — one definition of the
  // packing geometry, so the composition can't drift from q49.
  private[operators] val PackGroups = 8 // packing parallelism (→ thousands on a cluster)
  private[operators] val TokenBudget = 512 // tokens per packed sequence

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  // ------------------------------------------------- q48 contamination
  /** Q48: train/eval contamination check (decontamination pass). The
    * corpus is hash-split exactly like q36 (buckets ≥ [[TestBucketFrom]]
    * are the eval side); each eval document reports how many of its
    * distinct word-[[ShingleN]]-grams also occur anywhere in the train
    * side.
    *
    * Scale shape: the train side collapses to a DISTINCT shingle set
    * before the join, so the probe is one equi-join whose output is
    * bounded by |eval shingles| — never a posting-list product. Both
    * sides hash-partition on the shingle; no skew cap is needed because
    * the train side carries one row per shingle by construction. */
  def contamination(spark: SparkSession, dir: String): DataFrame =
    contaminationOn(docs(spark, dir))

  private[operators] def contaminationOn(docRel: DataFrame): DataFrame = {
    val d = docRel
      .withColumn("bucket", SamplingQueries.hashBucket(col("doc_id")))
      // shingles() requires >= ShingleN tokens (below that, Spark's
      // sequence() walks backwards into element_at(toks, 0) and throws
      // under ANSI; DuckDB's range() just yields nothing).
      .where(size(TextExprs.tokens(col("text"))) >= ShingleN)
    // Persisted: the shingle relation feeds BOTH the train-side distinct
    // and the eval-side probe — unmaterialized, the corpus-wide
    // tokenize+shingle+explode would run twice (the shinglesOf lesson).
    val sh = graft.core.Caches.persistTracked(
      d.select(col("doc_id"), col("bucket"),
        explode(array_distinct(
          TextExprs.shingles(TextExprs.tokens(col("text")), ShingleN))).as("sh")))
    val train = sh.where(col("bucket") < TestBucketFrom).select("sh").distinct()
    sh.where(col("bucket") >= TestBucketFrom)
      .join(train.withColumn("hit", lit(1)), Seq("sh"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_contaminated"))
      .withColumn("contamination",
        round(col("n_contaminated").cast("double") / col("n_shingles").cast("double"), 6))
  }

  val contaminationSql: String = {
    val bucket = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"
    s"""WITH d AS (SELECT doc_id, $bucket AS bucket,
       |    string_split(text, ' ') AS toks FROM documents
       |  WHERE len(string_split(text, ' ')) >= $ShingleN),
       |s AS (SELECT doc_id, bucket,
       |    unnest(list_distinct(list_transform(range(len(toks) - ${ShingleN - 1}),
       |      i -> concat_ws(' ', ${(1 to ShingleN).map(k => s"toks[i+$k]").mkString(", ")})))) AS sh
       |  FROM d),
       |tr AS (SELECT DISTINCT sh FROM s WHERE bucket < $TestBucketFrom),
       |te AS (SELECT doc_id, s.sh, tr.sh AS hit FROM s LEFT JOIN tr ON s.sh = tr.sh
       |  WHERE bucket >= $TestBucketFrom)
       |SELECT doc_id, count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN hit IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
       |  round(CAST(sum(CASE WHEN hit IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE), 6) AS contamination
       |FROM te GROUP BY doc_id""".stripMargin
  }

  // ------------------------------------------------------ q49 packing
  /** Q49: sequence packing — documents are packed head-to-tail into
    * fixed [[TokenBudget]]-token bins, the batch-shaping step before
    * tokenized training shards are written. A document's bin is the one
    * its *starting* offset falls in (straddle-allowed packing, the
    * deterministic distributed variant).
    *
    * Scale shape: packing is sequential by nature, so parallelism comes
    * from sharding — documents hash into [[PackGroups]] independent
    * packing groups (thousands on a real cluster), and the running token
    * offset is a window cumulative sum *within* a group. No global
    * order, no single-partition window. */
  def packing(spark: SparkSession, dir: String): DataFrame =
    packingOn(docs(spark, dir))

  private[operators] def packingOn(docRel: DataFrame): DataFrame = {
    val ntok = size(TextExprs.tokens(col("text")))
    // The shared deterministic hash-split primitive, just with a
    // different modulus — not a private re-implementation that could
    // drift from the q36 split.
    val grp = SamplingQueries.hashBucket(col("doc_id"), PackGroups)
    val w = Window.partitionBy("grp").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docRel
      .select(col("doc_id"), ntok.as("ntok"), grp.as("grp"))
      .withColumn("cum", sum(col("ntok")).over(w))
      .withColumn("bin", call_function("div", col("cum") - col("ntok"), lit(TokenBudget.toLong)))
      .groupBy("grp", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("n_tokens"))
      .withColumn("fill",
        round(col("n_tokens").cast("double") / lit(TokenBudget.toDouble), 6))
  }

  val packingSql: String =
    s"""WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS ntok,
       |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % $PackGroups) AS grp
       |  FROM documents),
       |c AS (SELECT doc_id, ntok, grp,
       |    sum(ntok) OVER (PARTITION BY grp ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d)
       |SELECT grp, CAST((CAST(cum AS BIGINT) - ntok) // $TokenBudget AS BIGINT) AS bin,
       |  count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS n_tokens,
       |  round(CAST(sum(ntok) AS DOUBLE) / $TokenBudget.0, 6) AS fill
       |FROM c GROUP BY 1, 2""".stripMargin

  // -------------------------------------------------------- q50 scrub
  /** Blocklist terms + digit runs; stands in for the email/phone/ID
    * regexes of a production scrubber (the testdata corpus has no real
    * PII, the operator shape is identical). */
  private val ScrubPattern = "\\b(customer|vector)\\b|[0-9]+"

  /** Q50: PII / blocklist scrubbing — replace every match with a
    * redaction token, report per-document match counts and the scrubbed
    * content fingerprint (the value downstream exact-dedup keys on).
    * Narrow map-only projection; regex runs inside whole-stage codegen. */
  def scrub(spark: SparkSession, dir: String): DataFrame =
    scrubOn(docs(spark, dir))

  private[operators] def scrubOn(docRel: DataFrame): DataFrame = {
    val scrubbed = regexp_replace(col("text"), ScrubPattern, "[PII]")
    docRel.select(
      col("doc_id"),
      regexp_count(col("text"), lit(ScrubPattern)).cast("long").as("n_redacted"),
      (length(col("text")) - length(scrubbed)).cast("long").as("chars_delta"),
      md5(scrubbed.cast("binary")).as("scrubbed_fp"))
  }

  val scrubSql: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$ScrubPattern')) AS BIGINT) AS n_redacted,
       |  CAST(length(text) - length(regexp_replace(text, '$ScrubPattern', '[PII]', 'g')) AS BIGINT)
       |    AS chars_delta,
       |  md5(regexp_replace(text, '$ScrubPattern', '[PII]', 'g')) AS scrubbed_fp
       |FROM documents""".stripMargin

  // --------------------------------------------------- q51 repetition
  /** Q51: intra-document repetition — duplicate-token ratio per
    * document (the Gopher-style "repetitious text" quality signal).
    * Pure array math per row: no explode, no shuffle. */
  def repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionOn(docs(spark, dir))

  private[operators] def repetitionOn(docRel: DataFrame): DataFrame = {
    val toks = TextExprs.tokens(col("text"))
    docRel
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .withColumn("dup_ratio",
        TextExprs.dupRatio(col("n_tokens"), col("n_distinct")))
      .withColumn("repetitious", (col("dup_ratio") > 0.5).cast("boolean"))
  }

  val repetitionSql: String =
    """WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
      |    len(list_distinct(string_split(text, ' '))) AS n_distinct FROM documents)
      |SELECT doc_id, n_tokens, n_distinct,
      |  round(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS dup_ratio,
      |  (round(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) > 0.5) AS repetitious
      |FROM d""".stripMargin

  // ------------------------------------------ q90 duplicate coverage
  private val DupShingleN = 5

  /** Q90: cross-document duplicate-shingle coverage — for each doc, the
    * share of its distinct word-5-grams that occur in ANY other
    * document. This is the continuous "how much of me is boilerplate"
    * signal behind exact-substring dedup decisions (near-1.0 → mirror /
    * template; mid-range → quoted or syndicated content): unlike the
    * pair-producing q17/q18 tier it never enumerates pairs, so it runs
    * as a pre-filter at full corpus scale.
    *
    * Scale shape: distinct (doc, shingle) → shingle document-frequency
    * (uniform-ish text keys, map-side combined) → join df back to the
    * (doc, shingle) relation (same cardinality as its input — an
    * inverted-index lookup, NO pair blowup) → per-doc aggregate.
    * Cross-doc repeats are counted with df ≥ 2 on DISTINCT per-doc
    * shingles, so a doc repeating its own phrase doesn't count itself. */
  def dupCoverage(spark: SparkSession, dir: String): DataFrame =
    dupCoverageOn(docs(spark, dir))

  private[operators] def dupCoverageOn(docRel: DataFrame): DataFrame = {
    val sh = docRel
      .select(col("doc_id"), TextExprs.tokens(col("text")).as("w"))
      .where(size(col("w")) >= DupShingleN)
      .select(col("doc_id"),
        explode(TextExprs.shingles(col("w"), DupShingleN)).as("sh"))
      .distinct()
    val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    sh.join(df, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_shingles").cast("double"), 6)
          .as("dup_share"))
  }

  val dupCoverageSql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |x AS (SELECT doc_id, ws, unnest(range(len(ws) - ${DupShingleN - 1})) AS i
       |  FROM w WHERE len(ws) >= $DupShingleN),
       |sh AS (SELECT DISTINCT doc_id,
       |    array_to_string(list_slice(ws, i + 1, i + $DupShingleN), ' ') AS sh FROM x),
       |df AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1)
       |SELECT doc_id, count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  round(CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE), 6) AS dup_share
       |FROM sh JOIN df USING (sh) GROUP BY 1""".stripMargin

  // ------------------------------------------- q92 segment-level dedup
  /** Words per segment — the "line" unit of corpus-level segment dedup.
    * The testdata corpus has no newlines, so fixed 8-word windows stand
    * in for the line/sentence split of a production pipeline; the
    * operator shape is identical. */
  private val SegWords = 8

  /** Q92: corpus-level duplicate-segment removal — the C4/RefinedWeb
    * "remove repeated lines across the whole corpus" pass. Every
    * document is cut into [[SegWords]]-word segments; a segment
    * survives only at its FIRST occurrence corpus-wide (ordered by
    * doc_id, then position), and each document reports how many of its
    * segments survived plus the fingerprint of its reassembled
    * (surviving-segments-only) text — the content that would flow to
    * the next pipeline stage.
    *
    * Scale shape: one shuffle keyed by segment text to elect the
    * first occurrence (row_number over a key whose per-group size is
    * the duplicate count — bounded, and exactly the thing being
    * removed), then one shuffle back on doc_id to reassemble. No
    * pair enumeration: cost is linear in corpus segments, so unlike
    * the q17/q18 pair tier this runs corpus-wide at 100 TB. The
    * reassembly keeps segments in document order via an in-group
    * array_sort on (idx, seg) — per-document state only. */
  def segmentDedup(spark: SparkSession, dir: String): DataFrame =
    segmentDedupOn(docs(spark, dir))

  /** (doc_id, idx, seg): every document cut into [[SegWords]]-word
    * segments — the shared front of q92 and q108. */
  private def segmentsOf(docRel: DataFrame): DataFrame = {
    val nseg = ceil(size(col("ws")).cast("double") / SegWords).cast("int")
    docRel
      .select(col("doc_id"), TextExprs.tokens(col("text")).as("ws"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nseg - 1),
          i => concat_ws(" ", slice(col("ws"), i * SegWords + 1, lit(SegWords))))))
      .withColumnsRenamed(Map("pos" -> "idx", "col" -> "seg"))
  }

  private[operators] def segmentDedupOn(docRel: DataFrame): DataFrame = {
    val segs = segmentsOf(docRel)
    val firstWins = Window.partitionBy("seg").orderBy("doc_id", "idx")
    segs
      .withColumn("rn", row_number().over(firstWins))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_seg"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        array_sort(collect_list(when(col("rn") === 1, struct(col("idx"), col("seg")))))
          .as("kept"))
      .select(col("doc_id"), col("n_seg"), col("n_kept"),
        // A doc whose every segment lost elsewhere keeps NULL (not
        // md5("")) — matches SQL's FILTERed string_agg convention.
        when(col("n_kept") > 0,
          md5(array_join(transform(col("kept"), x => x.getField("seg")), " ")
            .cast("binary"))).as("kept_md5"))
  }

  val segmentDedupSql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |x AS (SELECT doc_id, ws,
       |    unnest(range(CAST(ceil(len(ws) / $SegWords.0) AS BIGINT))) AS i FROM w),
       |s AS (SELECT doc_id, i AS idx,
       |    array_to_string(list_slice(ws, i * $SegWords + 1, i * $SegWords + $SegWords), ' ') AS seg
       |  FROM x),
       |r AS (SELECT doc_id, idx, seg,
       |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, idx) AS rn FROM s)
       |SELECT doc_id, count(*) AS n_seg,
       |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  md5(string_agg(seg, ' ' ORDER BY idx) FILTER (WHERE rn = 1)) AS kept_md5
       |FROM r GROUP BY 1""".stripMargin

  // ------------------------------------------ q108 boilerplate strip
  /** Distinct-document frequency at or above which a segment is
    * boilerplate. */
  private val BoilerplateDf = 3

  /** Q108: corpus-frequency boilerplate removal — the OTHER half of the
    * C4 recipe next to q92's first-occurrence dedup. A segment that
    * appears in ≥ [[BoilerplateDf]] distinct documents (cookie banners,
    * nav chrome, license footers) is template noise, and EVERY copy is
    * removed — including the first, which is exactly where this differs
    * from q92 (dedup keeps one canonical copy; boilerplate stripping
    * keeps none). Per document: segments, removed count, and the
    * fingerprint of the surviving reassembled text.
    *
    * Scale shape: one groupBy(seg) for the document-frequency relation
    * (per-group cost = the duplicate count, same argument as q92), one
    * join back on seg, one groupBy(doc) to reassemble. Linear in corpus
    * segments, no pair enumeration — runs corpus-wide at 100 TB as a
    * standard pre-dedup pass. The df relation is also broadcastable
    * when the boilerplate vocabulary is known-small; left as a hash
    * join so AQE decides from real sizes. */
  def boilerplateStrip(spark: SparkSession, dir: String): DataFrame =
    boilerplateStripOn(docs(spark, dir))

  private[operators] def boilerplateStripOn(docRel: DataFrame): DataFrame = {
    // Persisted for the same reason as the q39 fingerprints: the segment
    // relation feeds BOTH the df aggregation and the join-back — left
    // lazy, the tokenize+slice segmentation runs twice (two corpus scans).
    val segs = graft.core.Caches.persistTracked(segmentsOf(docRel))
    val df = segs.groupBy("seg")
      .agg(countDistinct(col("doc_id")).as("seg_df"))
    segs.join(df, "seg")
      .withColumn("drop", col("seg_df") >= BoilerplateDf)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_seg"),
        sum(when(col("drop"), 1L).otherwise(0L)).as("n_removed"),
        array_sort(collect_list(when(!col("drop"), struct(col("idx"), col("seg")))))
          .as("kept"))
      .select(col("doc_id"), col("n_seg"), col("n_removed"),
        when(col("n_seg") > col("n_removed"),
          md5(array_join(transform(col("kept"), x => x.getField("seg")), " ")
            .cast("binary"))).as("kept_md5"))
  }

  val boilerplateStripSql: String =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |x AS (SELECT doc_id, ws,
       |    unnest(range(CAST(ceil(len(ws) / $SegWords.0) AS BIGINT))) AS i FROM w),
       |s AS (SELECT doc_id, i AS idx,
       |    array_to_string(list_slice(ws, i * $SegWords + 1, i * $SegWords + $SegWords), ' ') AS seg
       |  FROM x),
       |f AS (SELECT seg, count(DISTINCT doc_id) AS seg_df FROM s GROUP BY 1),
       |j AS (SELECT s.doc_id, s.idx, s.seg, f.seg_df >= $BoilerplateDf AS drop
       |  FROM s JOIN f ON s.seg = f.seg)
       |SELECT doc_id, count(*) AS n_seg,
       |  CAST(sum(CASE WHEN drop THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |  md5(string_agg(seg, ' ' ORDER BY idx) FILTER (WHERE NOT drop)) AS kept_md5
       |FROM j GROUP BY 1""".stripMargin

  // --------------------------------------- q115 source overlap
  /** Q115: pairwise token-set Jaccard BETWEEN sources — the mixture
    * redundancy audit: two sources with high vocabulary overlap
    * contribute less diversity than their row counts suggest, and the
    * mixture weights (q37/q96) should know. Each source collapses to
    * its distinct token set; pairs share a token via an inverted-index
    * join (never a doc-level pair enumeration), and |A∪B| comes from
    * the sizes identity |A|+|B|−|A∩B|.
    *
    * Scale shape: the (source, token) relation is vocab×|sources|
    * bounded — the corpus-sized explode collapses FIRST (distinct),
    * then every join is over that bounded relation; per-token fanout
    * in the pair join is ≤ |sources|², and the output is |sources|²/2
    * rows. Safe at any corpus size because nothing after the first
    * distinct scales with rows. */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame =
    sourceOverlapOn(docs(spark, dir))

  private[graft] def sourceOverlapOn(docRel: DataFrame): DataFrame = {
    val st = graft.core.Caches.persistTracked(docRel
      .select(col("source"), explode(TextExprs.tokens(col("text"))).as("tok"))
      .distinct())
    val sizes = st.groupBy("source").agg(count(lit(1)).as("n_tok"))
    val inter = st.select(col("source").as("s1"), col("tok"))
      .join(st.select(col("source").as("s2"), col("tok")), "tok")
      .where(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("source").as("s1"), col("n_tok").as("n1"))), "s1")
      .join(broadcast(sizes.select(col("source").as("s2"), col("n_tok").as("n2"))), "s2")
      .select(col("s1"), col("s2"), col("n1"), col("n2"), col("inter"),
        round(col("inter").cast("double") /
          (col("n1") + col("n2") - col("inter")).cast("double"), 6).as("jaccard"))
  }

  val sourceOverlapSql: String =
    """WITH st AS (SELECT DISTINCT source, unnest(string_split(text, ' ')) AS tok
      |  FROM documents),
      |sz AS (SELECT source, count(*) AS n_tok FROM st GROUP BY 1),
      |i AS (SELECT a.source AS s1, b.source AS s2, count(*) AS inter
      |  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT i.s1, i.s2, z1.n_tok AS n1, z2.n_tok AS n2, i.inter,
      |  round(CAST(i.inter AS DOUBLE) / CAST(z1.n_tok + z2.n_tok - i.inter AS DOUBLE), 6)
      |    AS jaccard
      |FROM i JOIN sz z1 ON i.s1 = z1.source JOIN sz z2 ON i.s2 = z2.source""".stripMargin

  // ------------------------------------- q144/q145 lexical audits
  /** Corpus-prefix checkpoints for the Heaps'-law curve, as fractions
    * of the max doc_id (scale-free: the same five points at any SF). */
  private val HeapsCheckpoints = Seq(0.2, 0.4, 0.6, 0.8, 1.0)

  /** Q144: Heaps'-law vocabulary growth — distinct-token count at five
    * corpus prefixes (by doc_id order), with the token volume of each
    * prefix. The curve answers the tokenizer-budget question (how fast
    * does vocabulary still grow if we ingest more of this feed?) and
    * flags template floods (a flattening curve long before English
    * flattens = the tail is duplicated boilerplate, not new language).
    *
    * Scale: ONE pass — each (token, prefix) membership is a conditional
    * count inside a single vocabulary-keyed aggregation (checkpoint
    * count is a constant 5, so state is |vocab|×1 row with 5 flags,
    * never 5 corpus scans), then a 5-row rollup. */
  def q144Heaps(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val maxId = d.agg(max("doc_id").as("m"))
    val frac = col("doc_id").cast("double") / col("m").cast("double")
    val tok = d.crossJoin(broadcast(maxId))
      .select(frac.as("frac"), explode(TextExprs.tokens(col("text"))).as("tok"))
    // ONE vocabulary-keyed aggregation carries everything: the token's
    // first-appearance fraction (vocab membership per checkpoint) AND
    // its occurrence count within each prefix (token volume). The
    // corpus is exploded exactly once; all later math runs on the
    // |vocab|×(1+5)-column relation.
    val occAggs = HeapsCheckpoints.zipWithIndex.map { case (c, i) =>
      sum(when(col("frac") <= c, 1L).otherwise(0L)).as(s"occ$i")
    }
    val perTok = tok.groupBy("tok")
      .agg(min(col("frac")).as("first_frac"), occAggs: _*)
    val cps = HeapsCheckpoints.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("frac"),
        sum(col(s"occ$i")).as("n_tokens"),
        sum(when(col("first_frac") <= c, 1L).otherwise(0L)).as("vocab"))
    }
    perTok.agg(array(cps: _*).as("v"))
      .select(explode(col("v")).as("x"))
      .select(col("x.frac").as("prefix_frac"),
        col("x.n_tokens").as("n_tokens"), col("x.vocab").as("vocab"))
  }

  val q144Sql: String = {
    val cpRows = HeapsCheckpoints.map(c =>
      s"""SELECT $c AS prefix_frac,
         |  (SELECT CAST(count(*) AS BIGINT) FROM tok WHERE frac <= $c) AS n_tokens,
         |  (SELECT CAST(count(*) AS BIGINT) FROM pt WHERE first_frac <= $c) AS vocab""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH m AS (SELECT CAST(max(doc_id) AS DOUBLE) AS mx FROM documents),
       |tok AS (SELECT doc_id, CAST(doc_id AS DOUBLE) / mx AS frac,
       |    unnest(string_split(text, ' ')) AS tok
       |  FROM documents CROSS JOIN m),
       |pt AS (SELECT tok, min(frac) AS first_frac FROM tok GROUP BY 1)
       |$cpRows""".stripMargin
  }

  /** Q145: hapax legomena rate per source — the fraction of a source's
    * vocabulary that occurs exactly once IN THAT SOURCE. Natural text
    * sits near 0.4–0.6 (Zipf); a template flood crushes it toward 0, a
    * random-id/spam feed pushes it toward 1 — the lexical-richness
    * audit next to q97's character entropy, at vocabulary level.
    *
    * Scale: one (source, token) count — vocab-bounded keys, map-side
    * combined — then a \|sources\| rollup. */
  def q145Hapax(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("source"), explode(TextExprs.tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_types"), col("n_hapax"),
        round(col("n_hapax").cast("double") / col("n_types").cast("double"), 6)
          .as("hapax_rate"))

  val q145Sql: String =
    """WITH st AS (SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents),
      |c AS (SELECT source, tok, count(*) AS c FROM st GROUP BY 1, 2)
      |SELECT source, count(*) AS n_types,
      |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE), 6) AS hapax_rate
      |FROM c GROUP BY 1""".stripMargin

  // --------------------------------------------------- q165 corpus card
  /** Q165: the per-source DATA CARD — the one-page summary a corpus
    * owner reads before training: volume (docs/words/chars), exact-dup
    * exposure (the q16 measure folded in as a rate), and language
    * makeup (distinct langs + dominant lang). This is the capstone
    * audit a daily pipeline lands next to the corpus itself.
    *
    * Scale shape: every aggregate is bounded-key (|sources|,
    * |sources|×|langs|); dup detection is q16's md5 hash-groupBy with
    * only (hash) rows shuffling; the dominant-lang argmax is a window
    * over the bounded (source, lang) count relation with a
    * deterministic (count desc, lang asc) tie-break. Three narrow
    * column-pruned corpus scans, nothing corpus-proportional persisted
    * or collected. */
  def q165CorpusCard(spark: SparkSession, dir: String): DataFrame =
    corpusCardOn(Tables(spark, dir, "documents"))

  private[operators] def corpusCardOn(d: DataFrame): DataFrame = {
    val base = d.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), "\\s+")).cast("long")).as("n_words"),
      sum(length(col("text")).cast("long")).as("n_chars"))
    val hashes = d.select(col("source"), md5(col("text").cast("binary")).as("h"))
    val dupHashes = hashes.groupBy("h").agg(count(lit(1)).as("c"))
      .where(col("c") > 1).select("h")
    val dup = hashes.join(dupHashes, Seq("h"), "left_semi")
      .groupBy("source").agg(count(lit(1)).as("dup_docs"))
    val langCounts = d.groupBy("source", "lang").agg(count(lit(1)).as("c"))
    val top = langCounts
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(desc("c"), asc_nulls_last("lang"))))
      .where(col("rn") === 1).select(col("source"), col("lang").as("top_lang"))
    val nLangs = langCounts.groupBy("source").agg(count(lit(1)).as("n_langs"))
    base.join(dup, Seq("source"), "left")
      .join(nLangs, Seq("source")).join(top, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_words"), col("n_chars"),
        round(col("n_words").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_words"),
        coalesce(col("dup_docs"), lit(0L)).as("dup_docs"),
        round(coalesce(col("dup_docs"), lit(0L)).cast("double")
          / col("n_docs").cast("double"), 6).as("dup_rate"),
        col("n_langs"), col("top_lang"))
      .orderBy("source")
  }

  val q165Sql: String =
    """WITH base AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_words,
      |    CAST(SUM(len(text)) AS BIGINT) AS n_chars
      |  FROM documents GROUP BY source),
      |h AS (SELECT source, md5(text) AS h FROM documents),
      |dh AS (SELECT h FROM (SELECT h, count(*) AS c FROM h GROUP BY h) WHERE c > 1),
      |dup AS (SELECT source, count(*) AS dup_docs FROM h JOIN dh USING (h) GROUP BY source),
      |lc AS (SELECT source, lang, count(*) AS c FROM documents GROUP BY source, lang),
      |top AS (SELECT source, lang AS top_lang FROM (
      |    SELECT source, lang, row_number() OVER (PARTITION BY source ORDER BY c DESC, lang NULLS LAST) AS rn
      |    FROM lc) WHERE rn = 1),
      |nl AS (SELECT source, count(*) AS n_langs FROM lc GROUP BY source)
      |SELECT base.source, n_docs, n_words, n_chars,
      |  round(CAST(n_words AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS mean_words,
      |  coalesce(dup_docs, 0) AS dup_docs,
      |  round(CAST(coalesce(dup_docs, 0) AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS dup_rate,
      |  n_langs, top_lang
      |FROM base LEFT JOIN dup USING (source)
      |JOIN nl USING (source) JOIN top USING (source)""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q48_contamination" -> contamination _,
    "q49_packing" -> packing _,
    "q50_scrub" -> scrub _,
    "q51_repetition" -> repetition _,
    "q90_dup_coverage" -> dupCoverage _,
    "q92_segment_dedup" -> segmentDedup _,
    "q108_boilerplate" -> boilerplateStrip _,
    "q115_source_overlap" -> sourceOverlap _,
    "q144_heaps" -> q144Heaps _,
    "q145_hapax" -> q145Hapax _,
    "q165_corpus_card" -> q165CorpusCard _)

  val oracles: Map[String, String] = Map(
    "q48_contamination" -> contaminationSql,
    "q49_packing" -> packingSql,
    "q50_scrub" -> scrubSql,
    "q51_repetition" -> repetitionSql,
    "q90_dup_coverage" -> dupCoverageSql,
    "q92_segment_dedup" -> segmentDedupSql,
    "q108_boilerplate" -> boilerplateStripSql,
    "q115_source_overlap" -> sourceOverlapSql,
    "q144_heaps" -> q144Sql,
    "q145_hapax" -> q145Sql,
    "q165_corpus_card" -> q165Sql)
}
