package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Data-layout operators — the physical-design side of the engine: how
  * rows are ORDERED into files so that later scans skip most of them.
  * At 100 TB the dominant cost of an interactive query is the bytes the
  * scan cannot prune; multi-dimensional clustering (z-order) is the
  * standard answer when queries filter on more than one column and a
  * single sort key can only serve one of them.
  */
object LayoutQueries {

  /** Bits per dimension (two 8-bit dims → 16-bit z-value). */
  private val ZBits = 8
  /** Rows-per-file proxy: the 16-bit z-space splits into 256 "files". */
  private val FileBuckets = 256

  /** Morton interleave of two [[ZBits]]-bit ints: bit i of `x` lands at
    * position 2i, bit i of `y` at 2i+1. Pure integer shift/mask
    * arithmetic — identical in any engine, fully codegen'd. */
  private[graft] def zValue(x: Column, y: Column): Column =
    (0 until ZBits).map { i =>
      (shiftleft(shiftright(x, i).bitwiseAND(lit(1)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1)), 2 * i + 1)): Column
    }.reduce(_ + _)

  /** Q98: z-order layout audit — cluster events by the Morton
    * interleave of two independent filter dimensions (user bucket ×
    * event-id bucket), split the z-ordered corpus into
    * [[FileBuckets]] equal z-ranges ("files"), and report each file's
    * bounding box in both dimensions. The bounding boxes ARE the
    * min/max column statistics a parquet footer would carry: tight
    * boxes on BOTH dims is the property that lets a scan with a
    * predicate on either column prune most files — the audit that
    * tells you whether re-clustering is worth the write cost.
    *
    * Scale shape: the z-value is a narrow per-row projection; the
    * audit is one map-side-combined aggregation on a bounded key
    * (≤ [[FileBuckets]] groups). The real write path is
    * `repartitionByRange(zval)` + sortWithinPartitions — same
    * expression, no new machinery. */
  def q98ZOrder(spark: SparkSession, dir: String): DataFrame = {
    val lim = (1 << ZBits).toLong
    val z = Tables(spark, dir, "events")
      .select(pmod(col("user_id"), lit(lim)).cast("int").as("qx"),
        pmod(col("event_id"), lit(lim)).cast("int").as("qy"))
      .withColumn("z", zValue(col("qx"), col("qy")).cast("long"))
    z.groupBy(call_function("div", col("z"),
        lit((lim * lim / FileBuckets))).as("zfile"))
      .agg(count(lit(1)).as("n_rows"),
        min("qx").as("qx_min"), max("qx").as("qx_max"),
        min("qy").as("qy_min"), max("qy").as("qy_max"))
      // the prunability metric: fraction of each dim's domain a file's
      // bounding box spans (1/16 per dim is ideal for 256 files over
      // two 8-bit dims)
      .withColumn("qx_span",
        round((col("qx_max") - col("qx_min") + 1).cast("double") / lim.toDouble, 6))
      .withColumn("qy_span",
        round((col("qy_max") - col("qy_min") + 1).cast("double") / lim.toDouble, 6))
  }

  val q98Sql: String = {
    val lim = 1 << ZBits
    val zExpr = (0 until ZBits).map { i =>
      s"((((qx >> $i) & 1) << ${2 * i}) + (((qy >> $i) & 1) << ${2 * i + 1}))"
    }.mkString(" + ")
    s"""WITH q AS (SELECT CAST(user_id % $lim AS INTEGER) AS qx,
       |    CAST(event_id % $lim AS INTEGER) AS qy FROM events),
       |z AS (SELECT qx, qy, CAST($zExpr AS BIGINT) AS z FROM q),
       |g AS (SELECT z // ${lim.toLong * lim / FileBuckets} AS zfile,
       |    count(*) AS n_rows,
       |    min(qx) AS qx_min, max(qx) AS qx_max,
       |    min(qy) AS qy_min, max(qy) AS qy_max
       |  FROM z GROUP BY 1)
       |SELECT zfile, n_rows, qx_min, qx_max, qy_min, qy_max,
       |  round(CAST(qx_max - qx_min + 1 AS DOUBLE) / $lim.0, 6) AS qx_span,
       |  round(CAST(qy_max - qy_min + 1 AS DOUBLE) / $lim.0, 6) AS qy_span
       |FROM g""".stripMargin
  }

  // -------------------------------------------- q118 join-skew audit
  /** Q118: join-key skew audit over `lineitem.l_partkey` — the
    * pre-flight check that decides whether a join needs salting
    * ([[Skew]]) or AQE's skew split before a 1000-executor run finds
    * out the hard way. One summary row: distinct keys, total rows, the
    * share held by the hottest key and the hottest 10, and the exact
    * Gini coefficient of the key-frequency distribution.
    *
    * The Gini uses the frequency-of-frequencies trick to stay BOTH
    * exact and distributed: keys with equal count occupy a contiguous
    * rank run, so Σ rank·count folds to Σ over the (count, k)
    * HISTOGRAM — cnt·(k·p + k(k−1)/2) per run — and the only window
    * orders that histogram, whose size is the number of DISTINCT
    * frequency values (heavy-tail small at any scale), never the key
    * relation. Rank sums go through DECIMAL(38,0) (a billion keys
    * overflow a long), shares are single pinned IEEE divisions.
    *
    * Scale shape: one map-side-combined key count, one bounded-key
    * histogram aggregation, a tiny-window pass over the histogram, a
    * TakeOrdered(10) for the hot-key share. Nothing corpus-sized ever
    * sorts. */
  def q118SkewAudit(spark: SparkSession, dir: String): DataFrame =
    skewAuditOn(Tables(spark, dir, "lineitem").select(col("l_partkey").as("k")))

  private[graft] def skewAuditOn(keyed: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = graft.core.Caches.persistTracked(
      keyed.groupBy("k").agg(count(lit(1)).as("cnt")))
    val ff = counts.groupBy("cnt").agg(count(lit(1)).as("nk"))
    val w = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // 2·Σ rank·cnt, folded per equal-count run: cnt·(2·k·p + k·(k−1)).
    // Doubling up front keeps everything INTEGER (no k(k−1)/2 division
    // — Spark's `/` on longs is IEEE division, a silent parity trap);
    // decimal factors before the multiplies so billion-key runs can't
    // overflow a long.
    val nkD = col("nk").cast("decimal(38,0)")
    val ranked = ff
      .withColumn("cum_nk", sum(col("nk")).over(w))
      .withColumn("p", col("cum_nk") - col("nk") + 1) // first rank of this run
      .select((col("cnt").cast("decimal(38,0)") *
        (nkD * col("p") * lit(2) + nkD * (col("nk") - 1))).as("s2"))
      .agg(sum(col("s2")).as("rank_sum2"))
    val top = counts.orderBy(desc("cnt")).limit(10)
      .agg(max("cnt").as("top1"), sum("cnt").as("top10"))
    val totals = counts.agg(count(lit(1)).as("n_keys"), sum("cnt").as("total_rows"))
    val n = col("n_keys").cast("double"); val t = col("total_rows").cast("double")
    totals.crossJoin(broadcast(top)).crossJoin(broadcast(ranked))
      .select(col("n_keys"), col("total_rows"),
        round(col("top1").cast("double") / t, 6).as("top1_share"),
        round(col("top10").cast("double") / t, 6).as("top10_share"),
        round(col("rank_sum2").cast("double") / (n * t) - (n + lit(1.0)) / n, 6)
          .as("gini"))
  }

  val q118Sql: String =
    """WITH c AS (SELECT l_partkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1),
      |ff AS (SELECT cnt, count(*) AS nk FROM c GROUP BY 1),
      |r AS (SELECT cnt, nk,
      |    sum(nk) OVER (ORDER BY cnt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      - nk + 1 AS p
      |  FROM ff),
      |s AS (SELECT CAST(sum(CAST(cnt AS DECIMAL(38,0))
      |    * (CAST(nk AS DECIMAL(38,0)) * p * 2 + CAST(nk AS DECIMAL(38,0)) * (nk - 1)))
      |    AS DECIMAL(38,0)) AS rank_sum2
      |  FROM r),
      |top AS (SELECT CAST(max(cnt) AS BIGINT) AS top1, CAST(sum(cnt) AS BIGINT) AS top10
      |  FROM (SELECT cnt FROM c ORDER BY cnt DESC LIMIT 10)),
      |tot AS (SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total_rows FROM c)
      |SELECT n_keys, total_rows,
      |  round(CAST(top1 AS DOUBLE) / CAST(total_rows AS DOUBLE), 6) AS top1_share,
      |  round(CAST(top10 AS DOUBLE) / CAST(total_rows AS DOUBLE), 6) AS top10_share,
      |  round(CAST(rank_sum2 AS DOUBLE)
      |      / (CAST(n_keys AS DOUBLE) * CAST(total_rows AS DOUBLE))
      |    - (CAST(n_keys AS DOUBLE) + 1.0) / CAST(n_keys AS DOUBLE), 6) AS gini
      |FROM tot CROSS JOIN top CROSS JOIN s""".stripMargin

  // --------------------------------------------- rendezvous sharding
  /** Shard count for the q134 oracle face. Production would use the
    * output-file or consumer count; the operator is shard-count-generic
    * via [[hrwShard]]. */
  private val HrwShards = 8

  /** Rendezvous (highest-random-weight) shard assignment: every key
    * scores all `shards` candidates with an independent 60-bit hash of
    * (key, shard) and picks the argmax (Thaler & Ravishankar 1998 — the
    * scheme behind consistent cache/shard routing). The property that
    * matters for a 100 TB corpus: when a shard is added or removed,
    * ONLY the keys whose argmax was that shard move — every other key's
    * preference ordering over the surviving shards is unchanged — so a
    * reshard touches 1/K of the data instead of rewriting everything
    * (mod-K moves (K−1)/K of all keys).
    *
    * Pure per-row arithmetic, ZERO shuffle — the assignment rides along
    * any existing scan. The K candidates unroll at plan time into
    * `greatest` over (hash, shard) structs rather than a higher-order
    * `transform` lambda: lambda functions are CodegenFallback, and the
    * unrolled form keeps the whole assignment inside whole-stage
    * codegen (plan-pinned). 60-bit hashes (15 md5 hex chars, exact in
    * a long) make score ties astronomically unlikely; the struct
    * comparison breaks them by shard id, mirrored exactly in the
    * oracle's ORDER BY. */
  private[graft] def hrwShard(id: Column, shards: Int): Column = {
    require(shards >= 1, s"need at least one shard, got $shards")
    val cands = (0 until shards).map { k =>
      struct(
        conv(substring(md5(concat(id.cast("string"), lit(s"#$k"))
          .cast("binary")), 1, 15), 16, 10).cast("long").as("h"),
        lit(k.toLong).as("shard"))
    }
    // greatest() requires ≥2 args; a 1-shard fleet is the head itself
    (if (cands.size == 1) cands.head else greatest(cands: _*)).getField("shard")
  }

  /** Q134: rendezvous shard assignment over the documents table —
    * (doc_id, shard) for [[HrwShards]] shards. The write-side
    * counterpart of the audit tier: q118 tells you the keys are skewed,
    * q134 is the deterministic, coordination-free routing that stays
    * stable as the shard fleet changes. */
  def q134RendezvousShard(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), hrwShard(col("doc_id"), HrwShards).as("shard"))

  val q134Sql: String =
    s"""WITH s AS (SELECT doc_id, CAST(k AS BIGINT) AS shard,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(k AS VARCHAR)),
       |      1, 15))::BIGINT AS h
       |  FROM documents CROSS JOIN (SELECT unnest(range($HrwShards)) AS k))
       |SELECT doc_id, shard FROM s
       |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, shard DESC) = 1""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q98_zorder" -> q98ZOrder _,
    "q118_skew_audit" -> q118SkewAudit _,
    "q134_rendezvous_shard" -> q134RendezvousShard _)

  val oracles: Map[String, String] = Map(
    "q98_zorder" -> q98Sql,
    "q118_skew_audit" -> q118Sql,
    "q134_rendezvous_shard" -> q134Sql)
}
