package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Constructed-positive semantics for the substring-dedup tier that the
  * oracle compare can't pin: exact span boundaries around an injected
  * shared passage, canonical-copy preservation, and the short-document
  * pass-through.
  */
class SubstringDedupSpec extends SparkSpec {

  private val K = SubstringDedup.K

  // A 3×K shared passage embedded in three documents at different
  // offsets, flanked by per-document unique filler so no gram straddling
  // a passage boundary is itself duplicated — which makes the expected
  // span EXACTLY the passage, not passage ± slack. The filler's LAST
  // char is tag-specific: a shared trailing space before the passage
  // would make "␣ + 39 passage chars" a duplicated gram of its own and
  // legitimately widen the span by one (observed before the fix).
  private val passage =
    "all rights reserved worldwide under the berne convention and " +
      "no part of this publication may be reproduced without permission "

  private def filler(tag: String, n: Int): String = {
    val s = Iterator.from(0).map(i => s"$tag$i ").take(n).mkString.take(n)
    s.dropRight(1) + tag.head
  }

  private lazy val fixture: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, filler("ua", 60) + passage + filler("ub", 80)),
      (2L, passage + filler("vc", 95)),
      (3L, filler("wd", 200) + passage),
      (4L, "too short to gram"),                  // < K chars
      (5L, filler("xe", 150))                     // unique, no dup spans
    ).toDF("doc_id", "text")
  }

  private def spans(df: DataFrame): Map[Long, Seq[(Long, Long)]] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (d, rs) => d -> rs.map(r => (r._2, r._3)).toSeq.sorted }

  test("q149 finds exactly the injected passage at each offset") {
    val got = spans(SubstringDedup.substringSpansOn(fixture))
    val L = passage.length.toLong
    assert(got == Map(
      1L -> Seq((61L, L)),   // 1-based: passage starts after 60 filler chars
      2L -> Seq((1L, L)),
      3L -> Seq((201L, L))))
  }

  test("q150 keeps the canonical copy and excises the rest, exactly") {
    val got = SubstringDedup.substringScrubOn(fixture).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 1 is the minimum doc_id for every passage gram → untouched
    assert(got(1L) == (filler("ua", 60) + passage + filler("ub", 80), 0L))
    val L = passage.length.toLong
    assert(got(2L) == (filler("vc", 95), L))
    assert(got(3L) == (filler("wd", 200), L))
    // short and unique docs pass through
    assert(got(4L) == ("too short to gram", 0L))
    assert(got(5L) == (filler("xe", 150), 0L))
  }

  test("spans are maximal: disjoint, sorted, each at least K chars") {
    val real = SubstringDedup.q149SubstringSpans(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(real.forall(_._3 >= K), "a span shorter than the gram length")
    real.groupBy(_._1).values.foreach { ss =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, s1, l1), (_, s2, _)) =>
          // maximality: a gap of ≤ K between spans would have merged
          assert(s2 > s1 + l1, s"overlapping spans in ${ss.head._1}")
        case _ =>
      }
    }
  }

  test("q151 fast path returns exactly q149's spans (fixture + sf0.001 + sf0.01)") {
    assert(spans(SubstringDedup.substringSpansFastOn(fixture)) ==
      spans(SubstringDedup.substringSpansOn(fixture)))
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val fast = SubstringDedup.q151SubstringFast(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val exact = SubstringDedup.q149SubstringSpans(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fast == exact, s"fast/exact divergence at $dir")
    }
  }

  test("winnow prefilter keeps every passage holder and prunes unique docs") {
    val cand = SubstringDedup.substringCandidatesOn(fixture)
      .collect().map(_.getLong(0)).toSet
    // the winnowing guarantee: every doc sharing a >=K-char run survives
    assert(Set(1L, 2L, 3L).subsetOf(cand))
    // doc 4 is shorter than K, doc 5 shares no 30-gram with anyone
    assert(!cand.contains(4L) && !cand.contains(5L))
  }

  test("q152 probe equals full recompute restricted to the fresh batch") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val probe = SubstringDedup.q152SubstringProbe(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val full = SubstringDedup.q149SubstringSpans(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(_._1 % 2 == 1).toSet
      assert(probe == full, s"probe/full divergence at $dir")
    }
  }

  test("q168 hashed-key probe returns exactly q152's spans (fixture + sf0.001 + sf0.01)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val fast = SubstringDedup.q168SubstringProbeFast(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val exact = SubstringDedup.q152SubstringProbe(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fast == exact, s"hashed/raw probe divergence at $dir")
    }
  }

  test("the probe fetches only index-matched history docs") {
    import spark.implicits._
    // history: doc 10 shares the passage with fresh doc 1; docs 12/14
    // duplicate a DIFFERENT passage only between themselves; doc 16 is
    // unique. A probe for the fresh batch must fetch ONLY doc 10 —
    // history-internal duplication is yesterday's already-answered
    // question, not part of today's batch delta.
    val histPassage = filler("hp", 90)
    val hist = Seq(
      (10L, filler("ha", 50) + passage),
      (12L, histPassage + filler("hb", 60)),
      (14L, histPassage + filler("hc", 60)),
      (16L, filler("hd", 120))).toDF("doc_id", "text")
    val fresh = Seq(
      (1L, filler("fa", 40) + passage + filler("fb", 40)),
      (3L, filler("fc", 130))).toDF("doc_id", "text")
    val idx = SubstringDedup.charWinnowOf(hist)
    val fetched = SubstringDedup.matchedHistoryOf(fresh, idx)
      .collect().map(_.getLong(0)).toSet
    assert(fetched == Set(10L))
    // and the probe's spans for the batch: exactly the passage in doc 1
    val got = spans(SubstringDedup.substringProbeOn(fresh, hist, idx))
    assert(got == Map(1L -> Seq((41L, passage.length.toLong))))
  }

  test("arm picker: a sparse batch dispatches to the probe, a saturated one to the recompute — same spans either way") {
    import spark.implicits._
    // SPARSE regime (the realistic daily shape): the fresh batch shares
    // a passage with ONE history doc, while the history carries plenty
    // of internal duplication of its own (four pairs sharing per-pair
    // passages) — yesterday's already-answered question, which the
    // recompute re-grams and the probe skips. The probe's gram set is a
    // small fraction of the recompute's char mass → probe arm.
    val histPassages = (1 to 4).map(i => filler(s"hq$i", 200))
    val sparseHist = ((10L, filler("ha", 50) + passage) +:
      (1 to 4).flatMap(i => Seq(
        (10L + 2 * i, histPassages(i - 1) + filler(s"hx$i", 60)),
        (20L + 2 * i, histPassages(i - 1) + filler(s"hy$i", 60))))
      :+ (40L, filler("hz", 140))).toDF("doc_id", "text")
    // SATURATED regime (this repo's dedup testdata in miniature): every
    // history doc carries the passage, so the probe would gram the same
    // char mass the recompute would (ratio ≈ 1) while paying the probe
    // machinery on top → recompute arm.
    val satHist = (0 until 10)
      .map(i => (10L + 2 * i, filler(s"s$i", 30 + 7 * i) + passage))
      .toDF("doc_id", "text")
    val fresh = Seq(
      (1L, filler("fa", 40) + passage + filler("fb", 40)),
      (3L, filler("fc", 130))).toDF("doc_id", "text")

    for ((hist, arm, ratioCheck) <- Seq(
        (sparseHist, "probe", (f: Double) => f > 0.0 && f <= 0.3),
        (satHist, "recompute", (f: Double) => f >= 0.9))) {
      val picked = spans(SubstringDedup.probeOrRecompute(fresh, hist))
      val (chosen, ratio) = SubstringDedup.lastArm.get()
      assert(chosen == arm, s"expected $arm at char-mass ratio $ratio")
      assert(ratioCheck(ratio), s"ratio $ratio out of the $arm regime's band")
      // Result parity with BOTH fixed arms — the picker changes cost,
      // never a span. (The economics claim lives where wall-clock is
      // measurable: the xsp bench entry and SCALE.md's sf10 rows —
      // sparse probe ≪ recompute, saturated recompute 190.9→138.6 s.)
      val viaProbe = spans(SubstringDedup.substringProbeOn(
        fresh, hist, SubstringDedup.charWinnowOf(hist), hashedKeys = true))
      val union = fresh.unionByName(hist)
      val viaRecompute = spans(SubstringDedup.substringSpansFastOn(union)
        .join(fresh.select("doc_id"), Seq("doc_id"), "left_semi"))
      assert(picked == viaProbe, s"$arm regime: picker != probe arm")
      assert(picked == viaRecompute, s"$arm regime: picker != recompute arm")
      assert(picked.contains(1L), "fixture must surface doc 1's planted span")
    }
  }

  test("q169 auto picker returns exactly q152's spans (sf0.001 + sf0.01)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val auto = SubstringDedup.q169SubstringAuto(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val exact = SubstringDedup.q152SubstringProbe(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(auto == exact, s"picker/probe divergence at $dir")
      // dedup testdata is saturated by construction — the honest arm
      assert(SubstringDedup.lastArm.get()._1 == "recompute")
    }
  }

  test("decontamination excises ONLY eval-duplicated spans; train-internal dups survive") {
    import spark.implicits._
    // train docs 1 and 3 contain the benchmark passage (doc 20, eval);
    // train docs 5 and 7 share a passage ONLY with each other — q150
    // would scrub it, decontamination must NOT (train-internal dup is
    // q149/q150's job, not contamination); doc 9 is clean.
    val trainPassage = filler("tp", 90)
    val train = Seq(
      (1L, filler("da", 50) + passage + filler("db", 30)),
      (3L, passage + filler("dc", 60)),
      (5L, trainPassage + filler("dd", 40)),
      (7L, filler("de", 55) + trainPassage),
      (9L, filler("df", 120))).toDF("doc_id", "text")
    val ev = Seq(
      (20L, filler("ea", 35) + passage + filler("eb", 25)),
      (30L, filler("ec", 100))).toDF("doc_id", "text")
    val L = passage.length.toLong

    val got = spans(SubstringDedup.deconSpansOn(train, ev))
    assert(got == Map(1L -> Seq((51L, L)), 3L -> Seq((1L, L))),
      s"decon spans must be exactly the benchmark passage: $got")

    // hashed fast face: identical span set
    assert(spans(SubstringDedup.deconSpansOn(train, ev, hashedKeys = true)) == got)

    // scrub: passage excised from 1 and 3 (BOTH — eval wins, no
    // canonical keep), 5/7/9 byte-identical pass-through, eval absent
    val out = SubstringDedup.deconScrubOn(train, ev).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) == (filler("da", 50) + filler("db", 30), L))
    assert(out(3L) == (filler("dc", 60), L))
    assert(out(5L) == (trainPassage + filler("dd", 40), 0L))
    assert(out(7L) == (filler("de", 55) + trainPassage, 0L))
    assert(out(9L) == (filler("df", 120), 0L))
    assert(!out.contains(20L) && !out.contains(30L), "eval docs must not be output")
  }

  test("q175 probe rides a fresh DeconStore, matches inline exactly, and falls back when stale") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, when}
    import graft.sources.DeconStore
    val fresh = Seq(
      (1L, filler("da", 50) + passage + filler("db", 30)),
      (11L, filler("dz", 130))).toDF("doc_id", "text")
    val ev = Seq(
      (20L, filler("ea", 35) + passage + filler("eb", 25)),
      (30L, filler("ec", 100))).toDF("doc_id", "text")
    val inline = spans(SubstringDedup.deconProbeOn(fresh, ev))
    assert(inline == Map(1L -> Seq((51L, passage.length.toLong))))
    graft.core.Caches.releaseAll()
    val dir = tmpDir("deconstore")
    DeconStore.build(ev, dir)
    graft.core.Caches.releaseAll()
    spark.conf.set(DeconStore.DirKey, dir)
    try {
      assert(DeconStore.openFresh(ev).isDefined, "store must be fresh for its own corpus")
      assert(spans(SubstringDedup.deconProbeOn(fresh, ev)) == inline,
        "the store-served probe must reproduce the inline spans exactly")
      // a mutated eval suite (same row count) is stale: digest catches
      // it and the probe recomputes inline — same answer for the
      // OFFERED corpus, never stale spans from the stored one.
      val mutated = ev.withColumn("text",
        when(col("doc_id") === 30L, lit(filler("mm", 90))).otherwise(col("text")))
      assert(DeconStore.openFresh(mutated).isEmpty, "digest must catch eval mutation")
      assert(spans(SubstringDedup.deconProbeOn(fresh, mutated)) == inline,
        "fallback must compute for the offered eval corpus")
    } finally {
      spark.conf.unset(DeconStore.DirKey)
      graft.core.Caches.releaseAll()
    }
  }

  test("q184 novelty: first day is all-new; a re-fetching day's fraction is exact") {
    import spark.implicits._
    // sf0.001 smoke: 10 day rows, novelty in [0,1], day 0 (the first
    // time every one of its grams can appear) is NOT forced to 1 —
    // day = doc_id % 10, so "earlier day" is corpus order, not time
    // order of ingestion; but day 0 has no earlier day by definition.
    val rows = SubstringDedup.q184NoveltyCurve(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    graft.core.Caches.releaseAll()
    assert(rows.size == 10)
    assert(rows(0L)._2 == 0L && rows(0L)._3 == 1.0,
      "day 0 has no earlier day — everything it holds is first-seen")
    rows.values.foreach { case (n, seen, nov) =>
      assert(seen <= n && nov >= 0.0 && nov <= 1.0)
      assert(math.abs(nov - (1.0 - seen.toDouble / n)) < 1e-12)
    }
  }

  test("q183 coverage: contaminated eval docs report exact char fractions, clean ones 0.0") {
    import spark.implicits._
    val train = Seq(
      (1L, filler("da", 50) + passage + filler("db", 30)),
      (3L, filler("dz", 130))).toDF("doc_id", "text")
    val ev = Seq(
      (20L, filler("ea", 35) + passage + filler("eb", 25)), // passage leaked
      (30L, filler("ec", 100)))                             // clean
      .toDF("doc_id", "text")
    graft.core.Caches.releaseAll()
    val got = SubstringDedup.deconCoverageOn(train, ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val len20 = 35 + passage.length + 25
    assert(got(20L) == ((len20.toLong, passage.length.toLong,
      passage.length.toDouble / len20)),
      s"the leaked benchmark's covered fraction must be exactly the passage: $got")
    assert(got(30L) == ((100L, 0L, 0.0)), "clean eval docs report 0.0, not absence")
  }

  test("q179 matrix attributes each leak to its (source, benchmark) cell, multi-matched spans to both") {
    import spark.implicits._
    val passage2 =
      "this work is licensed under a creative commons attribution " +
        "share alike international license see the legal code for details "
    // eval: two benchmarks; train: src1 leaks passage (two docs), src2
    // leaks passage2 (one doc), src3 is clean. Doc 5 contains BOTH
    // passages → attributed to both benchmarks.
    val train = Seq(
      (1L, "src1", filler("da", 50) + passage + filler("db", 30)),
      (2L, "src1", passage + filler("dc", 40)),
      (3L, "src2", filler("dd", 35) + passage2 + filler("de", 20)),
      (5L, "src1", passage + filler("df", 25) + passage2),
      (7L, "src3", filler("dg", 150))).toDF("doc_id", "source", "text")
    val ev = Seq(
      (20L, filler("ea", 35) + passage + filler("eb", 25)),
      (30L, filler("ec", 30) + passage2 + filler("ed", 20)))
      .toDF("doc_id", "text")
    graft.core.Caches.releaseAll()
    val got = SubstringDedup.deconMatrixOn(train, ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val L = passage.length.toLong
    val L2 = passage2.length.toLong
    assert(got == Map(
      ("src1", 20L) -> (3L, 3 * L), // docs 1, 2, 5 each leak passage once
      ("src1", 30L) -> (1L, L2),    // doc 5 also leaks passage2
      ("src2", 30L) -> (1L, L2)),
      s"matrix cells must be exactly the planted leaks: $got")
  }

  test("DeconStore advance/retire: per-benchmark maintenance ≡ rebuild, orphans never serve") {
    import spark.implicits._
    import graft.sources.DeconStore
    // Two benchmarks with disjoint passages; train docs hit each.
    val passage2 =
      "this work is licensed under a creative commons attribution " +
        "share alike international license see the legal code for details "
    val benchA = Seq((20L, filler("ea", 35) + passage + filler("eb", 25))).toDF("doc_id", "text")
    val benchB = Seq((30L, filler("ec", 30) + passage2 + filler("ed", 20))).toDF("doc_id", "text")
    val suite = benchA.unionByName(benchB)
    val fresh = Seq(
      (1L, filler("da", 50) + passage + filler("db", 30)),
      (2L, filler("dc", 40) + passage2 + filler("dd", 35)),
      (3L, filler("dz", 130))).toDF("doc_id", "text")
    def probe(ev: org.apache.spark.sql.DataFrame) = {
      graft.core.Caches.releaseAll()
      spans(SubstringDedup.deconProbeOn(fresh, ev))
    }
    val inlineSuite = probe(suite) // DirKey unset → inline
    val inlineA = probe(benchA)
    assert(inlineSuite == Map(
      1L -> Seq((51L, passage.length.toLong)),
      2L -> Seq((41L, passage2.length.toLong))), s"fixture sanity: $inlineSuite")
    assert(inlineA == Map(1L -> Seq((51L, passage.length.toLong))))

    val dir = tmpDir("deconstore_maint")
    DeconStore.advanceBenchmark("a", benchA, dir)
    DeconStore.advanceBenchmark("b", benchB, dir) // never re-reads A's source
    spark.conf.set(DeconStore.DirKey, dir)
    try {
      // combined metas == the union corpus digest; probe ≡ inline
      assert(DeconStore.openFresh(suite).isDefined, "advanced store must be fresh for the suite")
      assert(probe(suite) == inlineSuite, "store-served suite probe must equal inline")

      // retire one benchmark: fresh for the remainder, exact spans,
      // stale for the retired suite
      DeconStore.retireBenchmark("b", spark, dir)
      assert(DeconStore.openFresh(benchA).isDefined, "XOR-healed digest must match the remainder")
      assert(DeconStore.openFresh(suite).isEmpty, "retired suite must read stale")
      assert(probe(benchA) == inlineA, "post-retire probe ≡ rebuild without the benchmark")

      // crash mid-retire: meta gone, fps/grams orphaned — the orphan
      // partitions must not leak spans into a fresh open
      DeconStore.advanceBenchmark("b", benchB, dir)
      val fsys = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fsys.delete(new org.apache.hadoop.fs.Path(s"$dir/meta/bench=b"), true): Unit
      assert(DeconStore.openFresh(benchA).isDefined)
      assert(probe(benchA) == inlineA, "orphan b partitions must not serve")

      // retire everything: the empty store serves empty relations for
      // an empty suite (no schema error), and reads stale otherwise
      DeconStore.retireBenchmark("a", spark, dir)
      DeconStore.retireBenchmark("b", spark, dir)
      val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
      val opened = DeconStore.openFresh(empty)
      assert(opened.isDefined, "zero live benchmarks + empty corpus = fresh empty store")
      val (fps, grams) = opened.get
      assert(fps.count() == 0 && grams.count() == 0)
      assert(DeconStore.openFresh(benchA).isEmpty, "empty store is stale for a non-empty corpus")
    } finally {
      spark.conf.unset(DeconStore.DirKey)
      graft.core.Caches.releaseAll()
    }
  }

  test("q174 hashed decon face returns exactly q172's spans (sf0.001 + sf0.01)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val fast = SubstringDedup.q174DeconSpansFast(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val exact = SubstringDedup.q172DeconSpans(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fast == exact, s"hashed/raw decon divergence at $dir")
    }
  }

  test("q186 hashed novelty curve equals oracle-green q184's exactly (sf0.001 + sf0.01)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val fast = SubstringDedup.q186NoveltyFast(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val exact = SubstringDedup.q184NoveltyCurve(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fast == exact, s"hashed/raw novelty divergence at $dir")
      graft.core.Caches.releaseAll()
    }
  }

  test("q193 hashed per-source curve equals oracle-green q192's exactly (sf0.001 + sf0.01)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val fast = SubstringDedup.q193NoveltyBySourceFast(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val exact = SubstringDedup.q192NoveltyBySource(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(fast == exact, s"hashed/raw per-source novelty divergence at $dir")
      graft.core.Caches.releaseAll()
    }
  }

  test("q187 capped matrix: cap-off ≡ exact; a binding cap bounds attribution and LOGS the truncation") {
    import spark.implicits._
    // The q179 fixture: with a cap that never binds, the capped face
    // must be ROW-IDENTICAL to the exact matrix (and report zero
    // truncation) — the realistic-corpus regime, where measured
    // per-gram eval fanout is 1-2.
    val passage2 =
      "this work is licensed under a creative commons attribution " +
        "share alike international license see the legal code for details "
    val train = Seq(
      (1L, "src1", filler("da", 50) + passage + filler("db", 30)),
      (2L, "src1", passage + filler("dc", 40)),
      (3L, "src2", filler("dd", 35) + passage2 + filler("de", 20)),
      (5L, "src1", passage + filler("df", 25) + passage2),
      (7L, "src3", filler("dg", 150))).toDF("doc_id", "source", "text")
    val ev = Seq(
      (20L, filler("ea", 35) + passage + filler("eb", 25)),
      (30L, filler("ec", 30) + passage2 + filler("ed", 20)))
      .toDF("doc_id", "text")
    def cells(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    graft.core.Caches.releaseAll()
    val exact = cells(SubstringDedup.deconMatrixOn(train, ev))
    graft.core.Caches.releaseAll()
    val uncapped = cells(SubstringDedup.deconMatrixCappedOn(train, ev, cap = 100))
    assert(uncapped == exact, "a non-binding cap must not change a cell")
    assert(SubstringDedup.lastMatrixTruncated.get() == 0L)

    // The replication-saturated regime in miniature: FIVE eval docs all
    // carry the passage (the sf10 ScaleUp shape that killed q179 at
    // >600 s). With cap=2 each matching gram attributes to only the two
    // lowest eval ids — the position fanout is bounded by the cap, the
    // dropped attributions are counted, and surviving cells keep their
    // exact span mass.
    // tag HEADS must differ per doc (filler's last char is tag.head —
    // a shared head would make "head + 39 passage chars" one more
    // duplicated gram, the exact trap the fixture header documents)
    val evSat = (0 until 5)
      .map(i => (20L + 10 * i, filler(s"${i}e", 20 + 3 * i) + passage))
      .toDF("doc_id", "text")
    graft.core.Caches.releaseAll()
    val capped = cells(SubstringDedup.deconMatrixCappedOn(train, evSat, cap = 2))
    val truncated = SubstringDedup.lastMatrixTruncated.get()
    assert(truncated > 0L, "a binding cap must report its truncation count")
    val L = passage.length.toLong
    assert(capped == Map(
      ("src1", 20L) -> (3L, 3 * L),
      ("src1", 30L) -> (3L, 3 * L)),
      s"cap=2 must keep exactly the two lowest eval ids' cells, exact: $capped")
    // every (gram, eval_doc) pair beyond rank 2 was dropped: 3 extra
    // eval docs × the passage's gram count (passage.length − K + 1)
    assert(truncated == 3L * (passage.length - K + 1),
      s"truncation count must be exactly the planted overflow: $truncated")
  }

  test("decon arm picker: a sliver-matched suite dispatches to recompute, a saturated one to the store — same spans either way") {
    import spark.implicits._
    import graft.sources.DeconStore
    val fresh = Seq(
      (1L, filler("fa", 40) + passage + filler("fb", 40)),
      (3L, filler("fc", 130))).toDF("doc_id", "text")
    // SATURATED suite: every eval doc carries the passage → the matched
    // sliver IS the suite (ratio ≈ 1); re-deriving ~all its distinct
    // grams inline is pure loss → store arm.
    val satSuite = (0 until 4)
      .map(i => (20L + 10 * i, filler(s"se$i", 25 + 4 * i) + passage))
      .toDF("doc_id", "text")
    // SLIVER suite: one small matched benchmark inside a large suite of
    // unmatched ones (ratio ≪ 1) → exploding the sliver inline beats
    // dragging every live benchmark's grams through the join.
    val sliverSuite = ((20L, filler("se", 25) + passage) +:
      (1 to 6).map(i => (30L + 10 * i, filler(s"su$i", 900))))
      .toDF("doc_id", "text")
    def viaInline(ev: org.apache.spark.sql.DataFrame) = {
      graft.core.Caches.releaseAll()
      spans(SubstringDedup.deconSpansOn(fresh, ev))
    }
    for ((suite, arm, ratioCheck) <- Seq(
        (satSuite, "store", (f: Double) => f >= 0.9),
        (sliverSuite, "recompute", (f: Double) => f > 0.0 && f <= 0.3))) {
      val expected = viaInline(suite)
      assert(expected == Map(1L -> Seq((41L, passage.length.toLong))),
        s"fixture sanity: $expected")
      val dir = tmpDir(s"deconarm_$arm")
      DeconStore.build(suite, dir)
      spark.conf.set(DeconStore.DirKey, dir)
      try {
        graft.core.Caches.releaseAll()
        val picked = spans(SubstringDedup.deconProbeOrRecompute(fresh, suite))
        val (chosen, ratio) = SubstringDedup.lastDeconArm.get()
        assert(chosen == arm, s"expected $arm at matched-mass ratio $ratio")
        assert(ratioCheck(ratio), s"ratio $ratio out of the $arm regime's band")
        assert(picked == expected, s"$arm regime: picker != inline decon spans")
      } finally {
        spark.conf.unset(DeconStore.DirKey)
        graft.core.Caches.releaseAll()
      }
    }
    // No store configured: the recompute arm is unconditionally correct
    graft.core.Caches.releaseAll()
    val unstored = spans(SubstringDedup.deconProbeOrRecompute(fresh, satSuite))
    assert(SubstringDedup.lastDeconArm.get()._1 == "recompute")
    assert(unstored == viaInline(satSuite))
  }

  test("q189 auto picker returns exactly q175's spans, store configured or not (sf0.001 + sf0.01)") {
    import graft.sources.DeconStore
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = SubstringDedup.q175DeconProbe(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      graft.core.Caches.releaseAll()
      val unstored = SubstringDedup.q189DeconAuto(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(unstored == exact, s"picker/probe divergence at $dir (no store)")
      assert(SubstringDedup.lastDeconArm.get()._1 == "recompute")
      graft.core.Caches.releaseAll()
      val ev = graft.core.Tables(spark, dir, "documents")
        .filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
      val storeDir = tmpDir(s"deconauto_${new java.io.File(dir).getName}")
      DeconStore.build(ev, storeDir)
      spark.conf.set(DeconStore.DirKey, storeDir)
      try {
        graft.core.Caches.releaseAll()
        val stored = SubstringDedup.q189DeconAuto(spark, dir).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        assert(stored == exact, s"picker/probe divergence at $dir (store)")
      } finally {
        spark.conf.unset(DeconStore.DirKey)
        graft.core.Caches.releaseAll()
      }
    }
  }

  test("q192: a stuck source's collapsed novelty is invisible in q184's corpus average") {
    import spark.implicits._
    // srcA fetches fresh content both days; srcB re-fetches day 0's
    // passage on day 1 (the stuck crawler). The corpus-wide day-1
    // novelty stays high; srcB's day-1 row must read exactly 0.
    val fresh0 = filler("na", 120)
    val fresh1 = filler("nb", 120)
    val d = Seq(
      (10L, "srcA", fresh0),              // day 0
      (20L, "srcB", passage),             // day 0
      (11L, "srcA", fresh1),              // day 1
      (21L, "srcB", passage))             // day 1: pure re-fetch
      .toDF("doc_id", "source", "text")
    // run the declared kernel by writing the fixture as a one-off table
    val dir = tmpDir("q192_fixture")
    d.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SubstringDedup.q192NoveltyBySource(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    graft.core.Caches.releaseAll()
    assert(out(("srcB", 1L))._2 == 0.0 && out(("srcB", 1L))._1 > 0L,
      s"the stuck source's day-1 novelty must be exactly 0: $out")
    assert(out(("srcA", 1L))._2 == 1.0,
      s"the healthy source's day-1 novelty must stay 1.0: $out")
    // and the per-source rows partition q184's corpus day totals is
    // NOT generally true (two sources sharing a gram on one day each
    // count it once) — pin the relationship on sf0.001 instead:
    // per-day corpus n_grams ≤ Σ per-source n_grams, novelty bounds hold
    val corpus = SubstringDedup.q184NoveltyCurve(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.Caches.releaseAll()
    val bySrc = SubstringDedup.q192NoveltyBySource(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    graft.core.Caches.releaseAll()
    val sums = bySrc.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    corpus.foreach { case (day, n) =>
      assert(sums(day) >= n, s"day $day: per-source distincts must cover the corpus distinct count")
    }
  }

  test("scrub conserves characters: removed = original - clean, never negative") {
    val rows = SubstringDedup.q150SubstringScrub(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L)
      assert(!r.isNullAt(1))
    }
  }
}
