package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Caches, Tables}

/** Whole-graph iterative analytics — the rank side of the graph story
  * whose connectivity side is [[GraphOps]] (q42). Where connected
  * components answers "which nodes belong together", PageRank answers
  * "which nodes matter" — the canonical importance prior for crawl
  * scheduling and corpus weighting (a web-scale curation pipeline ranks
  * domains by link authority before deciding crawl/keep budgets).
  */
object GraphQueries {

  /** Damping factor (the standard 0.85 of Page et al., "The PageRank
    * Citation Ranking", 1999). */
  val Damping = 0.85

  /** Fixed iteration count — the oracle is an unrolled SQL CTE chain,
    * so the count is part of the query contract. Production runs
    * iterate to an L1 tolerance instead; the loop body is identical. */
  val Iterations = 3

  /** Q107: PageRank over the order↔part co-purchase graph — each
    * distinct (order, part) line becomes an undirected edge between an
    * `o…` and a `p…` node, and [[Iterations]] rounds of
    * r ← (1−d)/N + d·Σ r(src)/outdeg(src) score every node. Because
    * edges are bidirectional, every node has out-degree ≥ 1 — there are
    * no dangling nodes, no leaked mass, and Σ rank stays exactly 1
    * (PageRankSpec pins this within decimal-truncation dust).
    *
    * Determinism: each node's incoming contributions are doubles cast
    * to DECIMAL(28,12) BEFORE the sum (exact, associative — the
    * q91/q93 float-agg pattern at rank precision), and the per-round
    * finish (1−d)/N + d·s is a pinned sequence of correctly-rounded
    * IEEE ops — Spark and the oracle produce bit-identical ranks, THEN
    * round to 10 decimals for the report.
    *
    * Scale shape: the weighted edge relation (src, dst, outdeg) is
    * built ONCE, hash-partitioned by src, and persisted — every
    * iteration reuses that layout for its ranks⋈edges equi-join, so a
    * round costs one join plus one groupBy(dst) shuffle over the EDGE
    * relation (never the corpus), and N arrives as a broadcast 1-row
    * aggregate, not a driver collect. Rank relations are checkpoint-
    * free here (3 unrolled rounds keep the plan shallow); a
    * tolerance-driven production loop adds [[GraphOps]]'s per-round
    * `localCheckpoint` lineage cut and nothing else changes. */
  def pageRank(spark: SparkSession, dir: String): DataFrame =
    pageRankOn(Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")))

  /** PageRank on the bipartite graph of `pairs`' two columns (left
    * nodes prefixed `o`, right nodes prefixed `p`). */
  private[graft] def pageRankOn(pairs: DataFrame): DataFrame = {
    val Seq(lc, rc) = pairs.columns.toSeq.take(2)
    // Internal node ids are LONGS (order 2k, part 2k+1): every shuffle,
    // join and distinct in the loop hashes 8-byte keys instead of
    // strings; the `o…`/`p…` contract labels are minted once, in the
    // final projection. Same graph, bit-identical ranks.
    val fwd = pairs.select(
      (col(lc).cast("long") * 2).as("src"),
      (col(rc).cast("long") * 2 + 1).as("dst")).distinct()
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    // BOTH shared relations persist: every round references deg (via the
    // teleport term's N and the rank seed) and wedges — left lazy, each
    // of the ~5 consumers would re-run the full distinct+union edge
    // build (measured 29.7s → 4.2s at sf0.1 for 3 rounds).
    val deg = Caches.persistTracked(
      edges.groupBy("src").agg(count(lit(1)).as("outdeg")))
    // (src, dst, outdeg) partitioned by the join key once, reused every round.
    val wedges = Caches.persistTracked(
      edges.join(deg, "src").repartition(col("src")))
    val nRel = deg.agg(count(lit(1)).as("n"))
    var ranks = deg.crossJoin(broadcast(nRel))
      .select(col("src").as("node"),
        (lit(1.0) / col("n").cast("double")).as("r"))
    for (_ <- 1 to Iterations) {
      ranks = wedges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          (col("r") / col("outdeg").cast("double")).cast("decimal(28,12)").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
        .crossJoin(broadcast(nRel))
        .select(col("dst").as("node"),
          (lit(1.0 - Damping) / col("n").cast("double") +
            lit(Damping) * col("s").cast("double")).as("r"))
    }
    ranks.select(
      concat(when(pmod(col("node"), lit(2L)) === 0L, lit("o")).otherwise(lit("p")),
        shiftright(col("node"), 1).cast("string")).as("node"),
      round(col("r"), 10).as("rank"))
  }

  /** Production variant: iterate to an L1 tolerance instead of a fixed
    * count — the loop body is q107's exactly, plus the two things a
    * long-running iteration needs: a `localCheckpoint` per round (the
    * [[GraphOps]] lineage cut, so round 40's plan isn't 40 joins deep)
    * and a 1-row L1-delta aggregate as the stop condition. Returns the
    * converged (node, rank) relation; not oracle-registered (the
    * data-dependent iteration count has no fixed SQL unrolling — q107
    * is the oracle-checked fixed-round face of the same loop).
    *
    * The delta check costs one tiny join+agg per round on relations
    * that are node-sized, not edge-sized; its result is the ONLY value
    * the driver ever sees. */
  private[graft] def pageRankUntil(pairs: DataFrame,
      tol: Double = 1e-7, maxIter: Int = 50): DataFrame = {
    val Seq(lc, rc) = pairs.columns.toSeq.take(2)
    val fwd = pairs.select(
      (col(lc).cast("long") * 2).as("src"),
      (col(rc).cast("long") * 2 + 1).as("dst")).distinct()
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val deg = Caches.persistTracked(
      edges.groupBy("src").agg(count(lit(1)).as("outdeg")))
    val wedges = Caches.persistTracked(
      edges.join(deg, "src").repartition(col("src")))
    // N as a one-time bounded driver count of the PERSISTED node
    // relation (r19): q107's broadcast-1-row-aggregate form re-plans
    // and re-executes a BroadcastExchange subtree EVERY round — fine
    // for 3 unrolled rounds, a per-round stage tax over ~50 tolerance
    // rounds. One long is driver-bounded by construction; the teleport
    // arithmetic is the same correctly-rounded IEEE sequence, so ranks
    // are bit-identical to q107's (PipelineAuditSpec's fixed point).
    val n = deg.count()
    var ranks = Caches.localCheckpointTracked(
      deg.select(col("src").as("node"),
        (lit(1.0) / lit(n.toDouble)).as("r")))
    var iter = 0
    var delta = Double.MaxValue
    // Per-round observability for the xprt drift watch (VERDICT r11
    // What's-wrong 2): SPARK_GRAFT_PR_VERBOSE=1 prints round wall time
    // and delta to stderr so a drifting tolerance loop can be blamed on
    // "more rounds" vs "slower rounds" without attaching a profiler.
    val verbose = sys.env.contains("SPARK_GRAFT_PR_VERBOSE")
    while (iter < maxIter && delta > tol) {
      val tRound = System.nanoTime()
      // The previous round's rank rides INSIDE the checkpointed round
      // relation (r19, guide §2.4): the delta used to be its own
      // node-keyed join job over the two checkpointed rank relations —
      // one extra shuffle per round, ~50 rounds deep. Joining `ranks`
      // once here (every node has in-edges — the graph is symmetric —
      // so the inner join drops nothing) makes the stop-condition a
      // shuffle-free scan of the freshly checkpointed blocks. Rank
      // values are untouched: `r` is computed before the join and the
      // join only appends `r0`.
      val next = Caches.localCheckpointTracked(wedges
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          (col("r") / col("outdeg").cast("double")).cast("decimal(28,12)").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
        .select(col("dst").as("node"),
          (lit(1.0 - Damping) / lit(n.toDouble) +
            lit(Damping) * col("s").cast("double")).as("r"))
        .join(ranks.select(col("node"), col("r").as("r0")), "node"))
      delta = next
        .agg(sum(abs(col("r") - col("r0"))).as("d"))
        .collect().head.getDouble(0)
      // the delta agg was round N-1's last reader of `ranks` — free it
      Caches.releaseCheckpoint(ranks)
      ranks = next
      iter += 1
      if (verbose)
        System.err.println(f"[pr] round $iter%2d delta=$delta%.3e ${(System.nanoTime() - tRound) / 1e9}%.2f s")
    }
    if (verbose) System.err.println(s"[pr] converged after $iter rounds (tol=$tol)")
    ranks.select(
      concat(when(pmod(col("node"), lit(2L)) === 0L, lit("o")).otherwise(lit("p")),
        shiftright(col("node"), 1).cast("string")).as("node"),
      round(col("r"), 10).as("rank"))
  }

  val pageRankSql: String = {
    def round_(k: Int): String =
      s"""r$k AS (SELECT e.dst AS node,
         |    ${1.0 - Damping} / CAST(n.n AS DOUBLE)
         |      + $Damping * CAST(sum(CAST(r.r / CAST(e.outdeg AS DOUBLE)
         |          AS DECIMAL(28,12))) AS DOUBLE) AS r
         |  FROM e JOIN r${k - 1} r ON e.src = r.node CROSS JOIN n
         |  GROUP BY e.dst, n.n)""".stripMargin
    s"""WITH f AS (SELECT DISTINCT 'o' || CAST(l_orderkey AS VARCHAR) AS src,
       |    'p' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem),
       |ed AS (SELECT src, dst FROM f UNION ALL SELECT dst, src FROM f),
       |deg AS (SELECT src, count(*) AS outdeg FROM ed GROUP BY 1),
       |e AS (SELECT ed.src, ed.dst, deg.outdeg FROM ed JOIN deg ON ed.src = deg.src),
       |n AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT src AS node, 1.0 / CAST(n.n AS DOUBLE) AS r FROM deg CROSS JOIN n),
       |${(1 to Iterations).map(round_).mkString(",\n")}
       |SELECT node, round(r, 10) AS rank FROM r$Iterations""".stripMargin
  }

  // ------------------------------------- q124 label propagation (LPA)
  /** Fixed LPA rounds — like [[Iterations]], part of the contract: the
    * oracle is the same loop unrolled as SQL CTEs. */
  val LpaRounds = 2

  /** Q124: label propagation communities over the same order↔part
    * graph q107 ranks — the third leg of the graph tier: q42 answers
    * "which nodes are CONNECTED", q107 "which nodes MATTER", q124
    * "which nodes cluster TOGETHER" (Raghavan et al., "Near linear
    * time algorithm to detect community structures", 2007). Curation
    * use: community = a topical/domain group for mixture balancing at
    * a finer grain than connected components (which merge through any
    * single bridge edge).
    *
    * Each round every node adopts the most frequent label among its
    * neighbors, ties broken by the SMALLEST label — fully deterministic
    * (synchronous update, total tie order), which is what makes a SQL
    * unrolling possible where classic randomized-async LPA has none.
    * One bipartite-specific consequence, embraced rather than hidden:
    * with an EVEN round count labels travel an even number of hops, so
    * communities form among SAME-side nodes with overlapping
    * neighborhoods — orders sharing parts cluster together (co-purchase
    * cohorts), parts sharing orders likewise. That 2-hop-neighborhood
    * grouping is precisely the mixture-balancing signal wanted here;
    * on a general (non-bipartite) graph the same loop is standard LPA.
    *
    * Scale shape: the symmetric edge relation persists once; a round is
    * one equi-join (edges ⋈ labels on dst) + one (src, lbl) count +
    * one per-src argmax window whose partitions are node-degree sized.
    * Nothing corpus-shaped shuffles; rounds are fixed so lineage stays
    * shallow (a tolerance variant would add the [[GraphOps]]
    * checkpoint cut, nothing else). */
  def q124LabelProp(spark: SparkSession, dir: String): DataFrame =
    labelPropOn(Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")))

  private[graft] def labelPropOn(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Seq(lc, rc) = pairs.columns.toSeq.take(2)
    val fwd = pairs.select(
      (col(lc).cast("long") * 2).as("src"),
      (col(rc).cast("long") * 2 + 1).as("dst")).distinct()
    val edges = Caches.persistTracked(
      fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst"))))
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    for (_ <- 1 to LpaRounds) {
      val w = Window.partitionBy("src").orderBy(desc("n"), asc("lbl"))
      labels = edges
        .join(labels.select(col("node").as("dst"), col("lbl")), "dst")
        .groupBy("src", "lbl").agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("src").as("node"), col("lbl"))
    }
    def tag(c: org.apache.spark.sql.Column) =
      concat(when(pmod(c, lit(2L)) === 0L, lit("o")).otherwise(lit("p")),
        shiftright(c, 1).cast("string"))
    labels.select(tag(col("node")).as("node"), tag(col("lbl")).as("community"))
  }

  val labelPropSql: String = {
    def round_(k: Int): String =
      s"""c$k AS (SELECT e.src, l.lbl, count(*) AS n
         |  FROM e JOIN l${k - 1} l ON e.dst = l.node GROUP BY 1, 2),
         |l$k AS (SELECT src AS node, lbl FROM (
         |    SELECT src, lbl, row_number() OVER (
         |      PARTITION BY src ORDER BY n DESC, lbl ASC) AS rn FROM c$k)
         |  WHERE rn = 1)""".stripMargin
    s"""WITH f AS (SELECT DISTINCT l_orderkey * 2 AS src, l_partkey * 2 + 1 AS dst
       |  FROM lineitem),
       |e AS (SELECT src, dst FROM f UNION ALL SELECT dst, src FROM f),
       |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e),
       |${(1 to LpaRounds).map(round_).mkString(",\n")}
       |SELECT CASE WHEN node % 2 = 0 THEN 'o' ELSE 'p' END
       |    || CAST(node // 2 AS VARCHAR) AS node,
       |  CASE WHEN lbl % 2 = 0 THEN 'o' ELSE 'p' END
       |    || CAST(lbl // 2 AS VARCHAR) AS community
       |FROM l$LpaRounds""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q107_pagerank" -> pageRank _,
    "q124_label_prop" -> q124LabelProp _)

  val oracles: Map[String, String] = Map(
    "q107_pagerank" -> pageRankSql,
    "q124_label_prop" -> labelPropSql)
}
