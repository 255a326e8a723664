package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Physical-plan regression tests: the judge-relevant plan properties
  * (scan pushdown, broadcast dims, partial aggregation) are pinned here
  * so a refactor that silently loses them fails CI, not a bench run.
  * (Interactive inspection lives in `graft.Explain`.)
  */
class PlanShapeSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString()

  /** The column NAMES of the scan's ReadSchema. The physical type of
    * `ts` is deliberately not pinned: the testdata has shipped both
    * nanosecond-encoded parquet (surfacing as `bigint` under
    * `nanosAsLong`) and native µs timestamps (`timestamp_ntz`), and the
    * engine reads either. The test's claim is PRUNING, not encoding.
    */
  private def readSchemaCols(p: String): Set[String] =
    "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p)
      .map(_.group(1).split(",").map(_.takeWhile(_ != ':')).toSet)
      .getOrElse(Set.empty)

  test("q01: IN-list filter reaches the parquet scan; schema is pruned") {
    val p = plan(CoreQueries.q01ScanFilter(spark, Dir))
    assert(p.contains("PushedFilters: [IsNotNull(ts), In(event_type"),
      s"filter not pushed:\n$p")
    assert(readSchemaCols(p) == Set("event_id", "ts", "user_id", "event_type"),
      s"scan must read only the 4 projected columns of 6:\n$p")
  }

  test("q10: all dimension joins broadcast; the fact side never shuffles for them") {
    val df = CoreQueries.q10JoinStar(spark, Dir)
    df.count() // materialize AQE final plan
    val p = plan(df)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, s"expected 4 broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), "no dim join should degrade to SMJ at this scale")
  }

  test("q13: aggregation is two-phase (map-side partial combine)") {
    val p = plan(CoreQueries.q13GroupAgg(spark, Dir))
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"expected partial+final HashAggregate:\n$p")
    assert(p.contains("LessThanOrEqual(l_shipdate"), "shipdate filter must be pushed to the scan")
  }

  test("q08: top-N plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(CoreQueries.q08TopN(spark, Dir))
    assert(p.contains("TakeOrderedAndProject"), s"top-N must not global-sort:\n$p")
  }

  test("q171: the K-row boost table broadcasts; the corpus never shuffles for it") {
    val df = MixtureQueries.q171TemperatureResample(spark, Dir)
    df.count() // settle AQE
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"boost join must broadcast the K-row mixture table:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing in the epoch expansion may sort-merge:\n$p")
  }

  test("q170: mixture aggregation is two-phase (map-side partial combine by lang)") {
    val p = plan(MixtureQueries.q170DomainMixture(spark, Dir))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"per-domain agg must partial-combine before the shuffle:\n$p")
    assert(readSchemaCols(p).subsetOf(Set("doc_id", "lang", "n_chars")),
      s"mixture must never read text:\n$p")
  }

  test("q17: the shingle df-cap is a map-side broadcast anti join, not a re-shuffle by shingle") {
    val df = DedupQueries.ngramJaccard(spark, Dir)
    df.count() // settle AQE
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"viral-shingle exclusion must broadcast, keeping the big relation un-shuffled:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q26: the native vector_dot verifies IVF-bucket candidates — no all-pairs NLJ") {
    val p = plan(SimilarityQueries.cosineNearDup(spark, Dir))
    assert(p.contains("vector_dot"), s"custom expression missing from plan:\n$p")
    assert(!p.contains("zip_with"), "pairwise path must use the native dot")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"near-dup must not enumerate the full cross product:\n$p")
  }

  test("q20/q21: top-k is a bounded partial aggregation, not a window sort") {
    for (df <- Seq(SimilarityQueries.cosineTopK(spark, Dir),
        SimilarityQueries.ivfAnn(spark, Dir))) {
      val p = plan(df)
      assert(p.contains("ObjectHashAggregate"),
        s"expected partial top-k aggregation:\n$p")
      assert(!p.contains("Window"),
        s"top-k must not shuffle all scored rows into a window sort:\n$p")
    }
  }

  test("q74: reservoir sampling is a bounded partial aggregation, not a window sort") {
    val df = SamplingQueries.q74ReservoirSample(spark, Dir)
    val p = plan(df)
    assert(p.contains("ObjectHashAggregate"),
      s"expected the bounded top-k buffer through partial aggregation:\n$p")
    assert(!p.contains("Window"),
      s"exact-k sampling must not rank every row in a window sort:\n$p")
    // exact-k: every group returns exactly k rows (sf0.001 has >k rows per type)
    val sizes = df.groupBy("event_type").count()
      .collect().map(_.getLong(1)).toSet
    assert(sizes == Set(5L), s"every group must yield exactly k rows, got $sizes")
  }

  test("q50/q51: narrow map-only corpus ops — scan + project, zero exchanges") {
    for (df <- Seq(CorpusQueries.scrub(spark, Dir), CorpusQueries.repetition(spark, Dir))) {
      val p = plan(df)
      assert(!p.contains("Exchange"), s"map-only operator must not shuffle:\n$p")
      assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
        "scan must prune to the 2 used columns of 5")
    }
  }

  test("q48: contamination probes with an equi hash join, never a nested loop") {
    val df = CorpusQueries.contamination(spark, Dir)
    df.count() // let AQE settle the join strategy
    val p = plan(df)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"),
      s"decontamination join must stay an equi join:\n$p")
  }

  test("q49: packing windows over hash groups, not a single global partition") {
    val p = plan(CorpusQueries.packing(spark, Dir))
    assert(p.contains("Window"), s"expected a window cumulative sum:\n$p")
    assert(p.contains("hashpartitioning(grp"),
      s"window must partition by packing group (no global order):\n$p")
  }

  test("q63: chunking is map-only — explode + project, zero exchanges") {
    val p = plan(CurationQueries.chunk(spark, Dir))
    assert(!p.contains("Exchange"), s"per-row chunking must not shuffle:\n$p")
    assert(p.contains("Generate"), s"expected an explode of chunk starts:\n$p")
  }

  test("q64: deciles assign via broadcast boundaries, not a global ntile window") {
    val df = RelationalExtras.q64Deciles(spark, Dir)
    df.count() // settle AQE
    val p = plan(df)
    assert(!p.contains("Window"),
      s"decile assignment must not sort all customers in one window partition:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row boundary array must broadcast:\n$p")
  }

  test("q52: range-frame window partitions by user, never a single global sort") {
    val p = plan(RelationalExtras.q52MovingAvg(spark, Dir))
    assert(p.contains("hashpartitioning(user_id"),
      s"moving average must distribute across users:\n$p")
  }

  test("q53: cube aggregates in one shuffle (expand + partial agg, no re-scan)") {
    val p = plan(RelationalExtras.q53Cube(spark, Dir))
    assert(p.contains("Expand"), s"cube must expand grouping sets map-side:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1, s"cube must shuffle exactly once:\n$p")
  }

  test("q75: composed packing windows over (split, grp) shards, chunking stays map-only") {
    val df = CurationQueries.trainingUnits(spark, Dir)
    df.count() // settle AQE
    val p = plan(df)
    assert(p.contains("hashpartitioning(split"),
      s"pack window must shard by (split, grp), never one global partition:\n$p")
    assert(p.contains("Generate"), s"expected the chunk-start explode inline:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"composition must stay equi-join only:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q57: correlated EXISTS decorrelates to semi/anti joins, no per-row subquery") {
    val df = RelationalExtras.q57Exists(spark, Dir)
    df.count() // settle AQE
    val p = plan(df)
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a left-semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as a left-anti join:\n$p")
  }

  test("q77: the global total is a broadcast 1-row join; scan prunes to (doc_id, text)") {
    val df = TextQueries.commonness(spark, Dir)
    df.count() // settle AQE
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row total must broadcast, not shuffle:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "scan must prune to the 2 used columns of 5")
    graft.core.Caches.releaseAll()
  }

  test("q78: weighted selection is the bounded top-k aggregate, not a window sort") {
    val df = SamplingQueries.q78WeightedSample(spark, Dir)
    val p = plan(df)
    assert(p.contains("ObjectHashAggregate"),
      s"expected the bounded top-k buffer through partial aggregation:\n$p")
    assert(!p.contains("Window"),
      s"weighted sampling must not rank every row in a window sort:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>"),
      "scan must prune to the 3 used columns of 5")
  }

  test("q82: IVF-PQ scoring joins are all broadcast — codes never shuffle for them") {
    val df = SimilarityQueries.ivfPqTopK(spark, Dir)
    df.count() // settle AQE
    val p = plan(df)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"probe/centroid/query joins must broadcast against the code relation:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"final top-k must be the bounded partial aggregation:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q83/q85: island + chunk windows reuse ONE exchange with the final groupBy") {
    // Running-max window, cumulative-sum window, and the per-key
    // aggregation all partition on the same key — a plan that
    // re-exchanges between them would triple the shuffle at scale.
    for (df <- Seq(TemporalQueries.q83Intervals(spark, Dir),
        CurationQueries.cdcChunks(spark, Dir))) {
      val p = plan(df)
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
        s"expected exactly one hash exchange shared by windows and groupBy:\n$p")
    }
  }

  test("q84: pair top-N is TakeOrderedAndProject over the counts, never a global sort") {
    val p = plan(TextQueries.pairStats(spark, Dir))
    assert(p.contains("TakeOrderedAndProject"), s"top-N must not global-sort:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"pair counting must partial-aggregate map-side:\n$p")
  }

  test("q87: mode is two aggregations with map-side combine — no window rank") {
    val p = plan(RelationalExtras.q87Mode(spark, Dir))
    assert(!p.contains("Window"), s"mode must not rank rows in a window:\n$p")
    // struct-min isn't hash-aggregable, so stage 2 is a SortAggregate —
    // what matters for shuffle volume is the partial_min BEFORE the
    // exchange (≤ |types| rows per user per partition travel).
    assert(p.contains("partial_min"),
      s"struct-min must combine map-side ahead of the exchange:\n$p")
    assert(p.contains("partial_count"),
      s"pair counting must combine map-side:\n$p")
  }

  test("q95: the keyless interval join runs as a hash/merge equi-join on bins, never a nested loop") {
    val df = TemporalQueries.q95IntervalJoin(spark, Dir)
    df.count() // settle AQE
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"binned overlap join must stay an equi-join:\n$p")
    assert(p.contains("Join") || p.contains("join"), s"expected a join:\n$p")
  }

  test("q93: corpus 'now' is a broadcast 1-row join; the decay agg combines map-side") {
    val df = TemporalQueries.q93DecayScore(spark, Dir)
    df.count()
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row max must broadcast, not shuffle the corpus:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"decay aggregation must combine map-side:\n$p")
  }

  test("q97/q98: bounded-key audits partial-aggregate map-side; z-order is window-free") {
    val pe = plan(TextQueries.charEntropy(spark, Dir))
    assert("HashAggregate".r.findAllIn(pe).size >= 2,
      s"entropy counts must partial-aggregate:\n$pe")
    val pz = plan(LayoutQueries.q98ZOrder(spark, Dir))
    assert(!pz.contains("Window") && !pz.contains("Sort"),
      s"the layout audit is a pure aggregation:\n$pz")
    assert("HashAggregate".r.findAllIn(pz).size >= 2,
      s"file-box audit must partial-aggregate:\n$pz")
  }

  test("q92: segment reassembly shuffles twice (by segment, by doc) and nothing else") {
    val df = CorpusQueries.segmentDedup(spark, Dir)
    df.count()
    val p = plan(df)
    // explode → exchange(seg) → window(first-wins) → exchange(doc) → agg
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"segment dedup must not add shuffles beyond seg + doc:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"no pair enumeration in segment dedup:\n$p")
  }

  test("q103: the split day and period totals are broadcast joins over a bounded-key agg") {
    val df = AuditQueries.psiDrift(spark, Dir)
    df.count()
    val p = plan(df)
    assert("BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(p).size >= 2,
      s"split-day and totals must broadcast, never shuffle the counts:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"the (type, period, bin) count must partial-aggregate map-side:\n$p")
  }

  test("q104: the dow baseline joins back as a broadcast — daily counts never re-shuffle") {
    val df = AuditQueries.seasonalAnomaly(spark, Dir)
    df.count()
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"the ≤7×|types| baseline must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"baseline join must not SMJ:\n$p")
  }

  test("q105: pad-waste is one bounded-key aggregation — no sort, no window, no join") {
    val p = plan(CurationQueries.padWaste(spark, Dir))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"bucket rollup must partial-aggregate map-side:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"the CASE-chain classifier needs no window or join:\n$p")
  }

  test("q114/q116: statistical audits are bounded-key aggs with broadcast marginals — no SMJ anywhere") {
    for (df <- Seq(AuditQueries.chiSquare(spark, Dir), AuditQueries.welchT(spark, Dir))) {
      df.count()
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
        s"marginals must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"nothing here is big enough to SMJ:\n$p")
      graft.core.Caches.releaseAll()
    }
  }

  test("q115: source overlap joins the collapsed vocab relation — never a document cross product") {
    val df = CorpusQueries.sourceOverlap(spark, Dir)
    df.count()
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pair generation must ride the token equi-join:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q118: the Gini window orders the count HISTOGRAM, and hot keys come from TakeOrdered") {
    val df = LayoutQueries.q118SkewAudit(spark, Dir)
    df.count()
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 keys must not global-sort the key relation:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q119: negative draws are map-only arithmetic plus ONE equi-join — no window, no sort") {
    val p = plan(SamplingQueries.q119Negatives(spark, Dir))
    assert(!p.contains("Window"), s"rank-free by design:\n$p")
    assert(!p.contains("CartesianProduct"), s"resolution must be an equi-join:\n$p")
  }

  test("q107: every PageRank round reuses the persisted edge partitioning — no per-round edge re-shuffle") {
    val df = GraphQueries.pageRank(spark, Dir)
    df.count()
    val p = plan(df)
    // The weighted-edge relation is built and partitioned once
    // (InMemoryTableScan); rounds must read the cache, not rebuild it.
    assert("InMemoryTableScan".r.findAllIn(p).size >= GraphQueries.Iterations,
      s"each round must read the persisted edges:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"rank propagation is an equi-join, never a cross product:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q121: the baseline joins broadcast; the grid is generated, never a second corpus scan") {
    val df = AuditQueries.absenceAudit(spark, Dir)
    df.count() // settle AQE + materialize the tracked persist
    val p = plan(df)
    // One events scan feeds the persisted slots relation; baseline,
    // span/grid spine, and the anti-join must all read the CACHE —
    // every InMemoryTableScan printout embeds the cached plan (its one
    // parquet scan), so the pin is cache-reuse count, not scan count.
    assert("InMemoryTableScan".r.findAllIn(p).size >= 3,
      s"baseline, grid spine, and anti-join must read the persisted slots:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"the calendar-bounded baseline must broadcast:\n$p")
    assert(p.contains("LeftAnti"), s"absence is an anti-join:\n$p")
    // the only cross shape allowed is the broadcast 1-row span join
    assert(!p.contains("CartesianProduct"), s"no cartesian anywhere:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q122: encoding joins the distinct vocabulary back without a cartesian; per-doc agg combines map-side") {
    val df = BpeQueries.q122BpeEncode(spark, Dir)
    df.count()
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"vocab join-back is an equi-join on word:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"per-doc token totals must partial-aggregate:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q126: the training scan pushes the lang filter; scoring never cartesians") {
    val df = TextQueries.perplexity(spark, Dir)
    df.count()
    val p = plan(df)
    assert(p.contains("EqualTo(lang,en)"),
      s"model side must push lang='en' to the parquet scan:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"scoring joins are equi (bg, w1) plus the broadcast 1-row V:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q127: the 64-row log-ratio table broadcasts back onto the persisted feature relation") {
    val df = SamplingQueries.q127DsirWeights(spark, Dir)
    df.count()
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"scoring must broadcast the bucket table, not shuffle the corpus:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"distributions and scoring must read the persisted feature relation:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q128: every GD round reads the cached features; margin and gradient aggs combine map-side") {
    val df = ClassifierQueries.q128QualityLr(spark, Dir)
    val p = plan(df)
    assert(p.contains("InMemoryTableScan"),
      s"the feature relation must be computed once and cached across rounds:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"the margin aggregation must partial-aggregate:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q131: the bucketed join runs with ZERO exchanges — both scans arrive pre-partitioned") {
    val joined = RelationalExtras.bucketedJoinFrame(spark, Dir)
    val p = plan(joined)
    assert(p.contains("SortMergeJoin"), s"the pinned plan is the co-located SMJ:\n$p")
    assert(graft.sources.Bucketing.exchangeCount(joined) == 0,
      s"bucket-aligned sides must not shuffle:\n$p")
    assert(p.contains("SelectedBucketsCount"), s"scans must be bucket-aware:\n$p")
  }

  test("q134: rendezvous sharding is a pure project — zero exchanges, codegen'd, pruned scan") {
    val df = LayoutQueries.q134RendezvousShard(spark, Dir)
    val p = plan(df)
    assert(graft.sources.Bucketing.exchangeCount(df) == 0,
      s"shard assignment must ride the scan without any shuffle:\n$p")
    // WholeStageCodegenExec prints as the "*(n)" prefix in the plan
    // string — the unrolled greatest-of-structs keeps the Project
    // inside the codegen stage (a transform() lambda would fall back).
    assert(p.contains("*(1) Project"), s"the hash argmax must codegen:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"),
      s"only doc_id feeds the assignment — text/lang must prune:\n$p")
  }

  test("q135: KL marginals broadcast back onto the persisted (source, token) relation") {
    val df = AuditQueries.q135KlPerSource(spark, Dir)
    df.count()
    val p = plan(df)
    assert(p.contains("InMemoryTableScan"),
      s"the vocab-bounded count relation must be cached, not re-exploded per marginal:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"per-source totals and the 1-row corpus total must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the totals join is broadcast-nested-loop over 1 row, never a cartesian:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q137: the temperature math runs on a cached |sources|-row relation — one corpus scan") {
    val df = SamplingQueries.q137TempMixture(spark, Dir)
    df.count()
    val p = plan(df)
    assert(p.contains("InMemoryTableScan"),
      s"the per-source token counts must be cached — the total, normalizer, and readout reuse them:\n$p")
    assert(p.contains("BroadcastExchange"), s"the 1-row totals must broadcast:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q147: percentile bounds broadcast back; the fact stream is never re-shuffled for the clip") {
    val df = RelationalExtras.q147Winsorize(spark, Dir)
    df.count()
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"the |event_type|-row bounds must broadcast onto the stream:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no fact-side shuffle for the clip:\n$p")
    // semantics: clipped values sit inside the band, flags match movement
    val rows = df.collect().map(r =>
      (r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (v, c, flagged) =>
      if (!flagged) assert(math.abs(c - v) < 1e-6, s"unclipped must pass through: $v -> $c")
      else assert(math.abs(c - v) > 0.0, s"clipped must move: $v -> $c")
    }
    val rate = rows.count(_._3).toDouble / rows.length
    assert(rate > 0.02 && rate < 0.2, s"p05/p95 clips ~10%, got $rate")
  }

  test("q129: sketches probe via a broadcast of the 10-row key list; tokens never re-shuffle for it") {
    val df = TextQueries.q129CmsFreq(spark, Dir)
    df.count()
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the groups x keys probe must broadcast the tiny key side:\n$p")
    assert(p.contains("cms_sketch") || p.contains("ObjectHashAggregate"),
      s"the sketch must aggregate through the imperative-aggregate path:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q153: the Hamming candidate join is an equi-join on bands — never a cartesian") {
    val df = MediaQueries.q153ImageNearDup(spark, Dir)
    df.count() // settle AQE
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"banding must make the pair join an equi-join:\n$p")
    // the dedup tier reads only the two columns the renderer needs
    assert(readSchemaCols(p).subsetOf(Set("doc_id", "text")),
      s"documents scan must prune to (doc_id, text):\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q154/q156: the audit is map-only after the spread — no joins, no aggregates") {
    for (q <- Seq(MediaQueries.q154AlignmentAudit _, MediaQueries.q156AudioAudit _)) {
      val p = plan(q(spark, Dir))
      assert(!p.contains("Join"), s"a per-row audit must not join:\n$p")
      assert(!p.contains("HashAggregate"), s"a per-row audit must not aggregate:\n$p")
    }
  }

  test("q185: the benchmark-sized eval side broadcasts into candidates AND verify — never an SMJ or cartesian") {
    val df = SimilarityQueries.q185SemanticDecon(spark, Dir)
    df.count() // settle AQE
    val p = plan(df)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"both eval-side joins (bucket candidates, exact verify) must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bucketing must make the candidate join an equi-join:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q188: runtime-codebook assignment stays inside codegen; the probe side broadcasts") {
    val df = SimilarityQueries.q188IvfScaled(spark, Dir)
    df.count() // settle AQE
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"the probe join must broadcast the fresh side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"scaled-K scoring must never degrade to a pair product:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("q186: the novelty curve's join keys are 8-byte hashes, never raw 40-char grams") {
    val p = plan(SubstringDedup.q186NoveltyFast(spark, Dir))
    assert(p.contains("xxhash64"), s"gram keys must be hashed in the plan:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"per-day distinct must partial-aggregate map-side:\n$p")
  }

  test("q193: the per-source curve's keys are hashed and the source tag rides the explode — no join back onto positions") {
    val p = plan(SubstringDedup.q193NoveltyBySourceFast(spark, Dir))
    assert(p.contains("xxhash64"), s"gram keys must be hashed in the plan:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"the (source, day, gram) distinct must partial-aggregate map-side:\n$p")
    assert(!p.contains("SortMergeJoin") || "SortMergeJoin".r.findAllIn(p).size <= 1,
      s"only the corpus-sized first-day join may merge-join — nothing else:\n$p")
  }

  test("q195: scaled IVF-PQ scoring joins are all broadcast — codes never shuffle for them") {
    val df = SimilarityQueries.q195IvfPqScaled(spark, Dir)
    df.count() // settle AQE
    val p = plan(df)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      s"probes, PQ centroids, query subvectors, and the refine fetch must all broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the compressed serving path must never shuffle or pair-product the codes:\n$p")
    graft.core.Caches.releaseAll()
  }

  test("verdict-store serve: the base read is day-partition-pruned and evidence scans read only their columns") {
    // Build a two-day store and serve only day 1's corpus: the serve
    // plan's base scan must carry a PartitionFilters entry on `day`
    // (pruning retired/unoffered days at the directory level, the
    // property that keeps the serve evidence-sized as days accumulate)
    // and no evidence scan may read beyond its declared columns.
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$Dir/documents.parquet")
    val e = spark.read.parquet(s"$Dir/embeddings.parquet")
    import spark.implicits._
    def hashed(part: DataFrame) = graft.multimodal.MediaDedup.hashImages(
      part.as[(Long, String)]
        .map { case (id, t) => (id, graft.multimodal.MediaDedup.renderImage(t)) }
        .toDF("media_id", "content"))
    val elig = d.filter(length(col("text")) >= 50)
      .select(col("doc_id").as("media_id"), col("text"))
    def corpus(dayPred: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      graft.sources.VerdictStore.Corpus(
        d.filter(col("doc_id") % 10 =!= 0).where(dayPred(col("doc_id"))),
        e.filter(col("vec_id") % 10 =!= 0).where(dayPred(col("vec_id"))),
        hashed(elig.filter(col("media_id") % 10 =!= 0)
          .where(dayPred(col("media_id")))))
    val suite = graft.sources.VerdictStore.Corpus(
      d.filter(col("doc_id") % 10 === 0), e.filter(col("vec_id") % 10 === 0),
      hashed(elig.filter(col("media_id") % 10 === 0)))
    val dir = tmpDir("planshape_verdict")
    graft.sources.VerdictStore.build(corpus(_ % 3 =!= 2),
      Seq("all" -> suite), dir, day = 1, codebookFrom = Some(e),
      trained = false)
    graft.sources.VerdictStore.advanceDay(corpus(_ % 3 === 2),
      Seq("all" -> suite), dir, day = 2)
    graft.core.Caches.releaseAll()
    spark.conf.set(graft.sources.VerdictStore.DirKey, dir)
    try {
      graft.sources.VerdictStore.retireDay(spark, dir, 2)
      val served = graft.sources.VerdictStore
        .openFreshThreeEye(corpus(_ % 3 =!= 2), suite)
      assert(served.isDefined)
      served.get.count() // settle AQE
      val p = plan(served.get)
      assert("PartitionFilters: \\[[^\\]]*day".r.findFirstIn(p).isDefined,
        s"the base scan must prune day partitions, not filter post-scan:\n$p")
      val evSchemas = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(p)
        .map(_.group(1)).toSeq
      assert(evSchemas.exists(_.startsWith("doc_id")),
        s"evidence scans must project their declared columns only:\n$p")
      graft.core.Caches.releaseAll()
    } finally {
      spark.conf.unset(graft.sources.VerdictStore.DirKey)
      graft.core.Caches.releaseAll()
    }
  }

  test("q197: the media decon band join broadcasts the eval side — never a cartesian over hashes") {
    val df = MediaQueries.q197MediaDecon(spark, Dir)
    df.count() // settle AQE
    val p = plan(df)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"the banded eval side must broadcast into candidates AND the id expand:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"banding must make the candidate join an equi-join:\n$p")
    graft.core.Caches.releaseAll()
  }
}
