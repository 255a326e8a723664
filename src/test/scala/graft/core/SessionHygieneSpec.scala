package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{GraphOps, GraphQueries}

/** Long-session hygiene: the engine's production shape is a long-lived
  * process running queries forever (the reference's polling loop —
  * `gzip-to-parquet-etl.py:345-347`), and round 7 proved the failure
  * mode is real: localCheckpoint blocks accumulate OUTSIDE the
  * CacheManager, invisible to both `Dataset.unpersist` and
  * `spark.catalog.clearCache()`, and a ~366-execution bench degraded
  * late queries up to 180×. These tests pin the fix: after every
  * query boundary (`Caches.releaseAll()` + `clearCache()`), the
  * session must be back at baseline — zero persistent RDDs, zero
  * RDD storage blocks. Each test FAILS on pre-fix HEAD (the
  * iterative loops checkpointed via raw `localCheckpoint()`).
  */
class SessionHygieneSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.001"

  private def boundary(): Unit = {
    Caches.releaseAll()
    spark.catalog.clearCache()
  }

  private def assertBaseline(ctx: String): Unit = {
    val persistent = spark.sparkContext.getPersistentRDDs
    assert(persistent.isEmpty,
      s"$ctx left ${persistent.size} persistent RDD(s): " +
        persistent.values.map(r => s"id=${r.id} ${r.name}").mkString(", "))
    val stored = spark.sparkContext.getRDDStorageInfo
    assert(stored.isEmpty,
      s"$ctx left ${stored.length} RDD storage block group(s): " +
        stored.map(i => s"id=${i.id} mem=${i.memSize}").mkString(", "))
  }

  // Start each test from a clean slate — an earlier suite in the shared
  // JVM may have pinned blocks of its own.
  private def fresh(): Unit = {
    boundary()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
  }

  test("distributed CC loop releases every checkpoint block at releaseAll") {
    fresh()
    // maxDriverEdges=0 forces the distributed pointer-jumping path (the
    // sf0.001 pair list would otherwise take the driver union-find,
    // which checkpoints nothing). A 3-chain × 300 graph converges in a
    // few rounds — several checkpoint generations.
    val edges = spark.range(900)
      .select((col("id") * 10).as("src"), (col("id") * 10 + 3).as("dst"))
      .union(spark.range(300).select((col("id") * 30 + 3).as("src"), (col("id") * 30 + 6).as("dst")))
    val labels = GraphOps.connectedComponents(edges, maxDriverEdges = 0L)
    assert(labels.count() > 0)
    boundary()
    assertBaseline("connectedComponents(distributed)")
  }

  test("pageRankUntil releases every per-round checkpoint at releaseAll") {
    fresh()
    val pairs = spark.read.parquet(s"$Dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).limit(2000)
    val ranks = GraphQueries.pageRankUntil(pairs, tol = 1e-4, maxIter = 8)
    assert(ranks.count() > 0)
    boundary()
    assertBaseline("pageRankUntil")
  }

  test("soak: hundreds of mixed queries return the session to baseline each boundary") {
    fresh()
    // A rotation over the state-heavy tiers: checkpointing graph ops,
    // Caches-persisted dedup/index builders, window/agg relational, ANN.
    // SPARK_GRAFT_SOAK_ROUNDS scales it up for a full multi-hundred
    // soak; the default keeps `sbt test` under a minute for this suite
    // while still crossing enough boundaries to catch accumulation.
    val sample = Seq(
      "q03_window_agg", "q17_ngram_jaccard", "q18_minhash_lsh",
      "q21_ivf_ann", "q42_dedup_clusters", "q70_bm25",
      "q73_incremental_neardup", "q75_training_units", "q107_pagerank",
      "q121_absence_audit", "q122_bpe_encode", "q123_mmr_diverse")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_SOAK_ROUNDS", "6").toInt
    val qs = graft.SparkEntry.queries
    for (r <- 1 to rounds; name <- sample) {
      qs(name)(spark, Dir).count()
      boundary()
      assertBaseline(s"round $r $name")
    }
  }
}
