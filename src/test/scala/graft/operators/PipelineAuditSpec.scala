package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed semantics for the audit/graph operator batch — the
  * cases the uniform sf0.01 oracle diff can't stress: exact PSI values
  * for identical and fully-shifted distributions (q103), a z-score
  * boundary that only a correct (n−1) variance hits (q104), padding
  * bucket boundaries and the truncation cap (q105), percent_rank tie
  * and single-row-partition conventions (q106), and a 3-iteration
  * PageRank a star graph makes checkable by hand (q107).
  */
class PipelineAuditSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: String): Timestamp = Timestamp.valueOf(s"$day 12:00:00")

  // ----------------------------------------------------------- q103
  private def psiOf(rows: Seq[(String, Timestamp, Double)]) = {
    val out = AuditQueries.psiDriftOn(rows.toDF("event_type", "ts", "value"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    graft.core.Caches.releaseAll()
    out
  }

  test("q103: identical base/cur distributions give PSI exactly 0; full shift gives the closed-form max") {
    // Window 2026-01-01..01-04 → split day 01-02: day 1 is base, days 2-4 cur.
    val steady = for {
      day <- Seq("2026-01-01", "2026-01-02", "2026-01-03", "2026-01-04")
      v <- Seq(50.0, 150.0, 250.0)
    } yield ("steady", ts(day), v)
    // shifted: base mass all in bin 0, cur mass all in bin 9.
    val shifted = Seq(
      ("shifted", ts("2026-01-01"), 50.0),
      ("shifted", ts("2026-01-02"), 950.0),
      ("shifted", ts("2026-01-03"), 950.0))
    val got = psiOf(steady ++ shifted)
    val (nb, nc, psiSteady) = got("steady")
    assert((nb, nc) == ((3L, 9L)))
    assert(psiSteady == 0.0, s"equal shares must cancel exactly, got $psiSteady")
    // Two nonzero terms, symmetric: (1−ε)·ln(1/ε) + (ε−1)·ln(ε/1).
    val eps = AuditQueries.PsiEps
    val expected = 2.0 * (1.0 - eps) * math.log(1.0 / eps)
    val psiShifted = got("shifted")._3
    assert(math.abs(psiShifted - expected) < 1e-6, s"$psiShifted vs $expected")
  }

  test("q103: out-of-range values clamp into edge bins instead of vanishing") {
    val got = psiOf(Seq(
      ("t", ts("2026-01-01"), -500.0), ("t", ts("2026-01-01"), 99999.0),
      ("t", ts("2026-01-03"), -500.0), ("t", ts("2026-01-03"), 99999.0)))
    // Same clamped bins {0, 9} with the same shares on both sides → 0 drift.
    assert(got("t") == ((2L, 2L, 0.0)))
  }

  // ----------------------------------------------------------- q104
  test("q104: day-of-week baseline flags the spike, spares the same count on its own merits") {
    // Ten consecutive Mondays: nine 10-event days and one 100-event day.
    // Baseline: n=10, Σ=190, Σ²=10900 → µ=19, σ²=(10900−3610)/9=810,
    // σ=28.4605 → z(100)=2.8460 (anomaly), z(10)=−0.3162 (not).
    val mondays = (0 until 10)
      .map(k => java.time.LocalDate.parse("2026-01-05").plusDays(7L * k).toString)
    val rows = mondays.zipWithIndex.flatMap { case (d, i) =>
      Seq.fill(if (i == 9) 100 else 10)(("purchase", ts(d)))
    }
    val got = AuditQueries.seasonalAnomalyOn(rows.toDF("event_type", "ts"))
      .collect().map(r => r.getDate(1).toString ->
        (r.getLong(3), r.getDouble(6), r.getBoolean(7))).toMap
    graft.core.Caches.releaseAll()
    assert(got(mondays.last) == ((100L, 2.84605, true)))
    val (cnt, z, flagged) = got(mondays.head)
    assert(cnt == 10L && !flagged && math.abs(z - -0.316228) < 1e-9)
  }

  test("q104: constant series (sigma 0) and 1-day baselines never flag — z is NULL, not a crash") {
    val rows = Seq.fill(5)(("flat", ts("2026-01-05"))) ++
      Seq.fill(5)(("flat", ts("2026-01-12"))) ++ // two equal Mondays → σ=0
      Seq(("lone", ts("2026-01-06"))) // a single Tuesday → n_days=1
    val got = AuditQueries.seasonalAnomalyOn(rows.toDF("event_type", "ts"))
      .select("event_type", "z", "is_anomaly").collect()
      .map(r => (r.getString(0), r.isNullAt(1), r.getBoolean(2)))
    graft.core.Caches.releaseAll()
    assert(got.forall { case (_, zNull, flagged) => zNull && !flagged })
  }

  // ----------------------------------------------------------- q105
  test("q105: bucket boundaries are inclusive, the overflow tail truncates to the cap") {
    def doc(id: Long, n: Int) = (id, Seq.fill(n)("w").mkString(" "))
    val got = CurationQueries.padWasteOn(
      Seq(doc(1, 32), doc(2, 33), doc(3, 5000)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    graft.core.Caches.releaseAll()
    assert(got(32L) == ((1L, 32L, 32L)))    // exactly-at-boundary: zero waste
    assert(got(64L) == ((1L, 33L, 64L)))    // one past: next bucket
    assert(got(2048L) == ((1L, 2048L, 2048L))) // 5000 tokens truncate to the cap
  }

  test("q105: waste ratio is the padded-minus-used share") {
    val got = CurationQueries.padWasteOn(
      Seq((1L, Seq.fill(16)("w").mkString(" "))).toDF("doc_id", "text"))
      .collect().head
    graft.core.Caches.releaseAll()
    assert(got.getLong(0) == 32L && got.getDouble(4) == 0.5)
  }

  // ----------------------------------------------------------- q106
  test("q106: per-source percent_rank — ties share a rank, a 1-doc source gets 0") {
    val docs = Seq(
      (1L, "aaaaaaaa", "web"),  // entropy 0 — rank floor of `web`
      (2L, "abababab", "web"),  // entropy 1
      (3L, "babababa", "web"),  // entropy 1 — tie with doc 2
      (4L, "abcdabcd", "web"),  // entropy 2 — rank ceiling
      (5L, "whatever", "wiki")  // alone in its source
    ).toDF("doc_id", "text", "source")
    val got = CurationQueries.scoreCalibrationOn(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4))).toMap
    graft.core.Caches.releaseAll()
    assert(got(1L) == ((4L, 0.0)))
    assert(got(2L) == ((4L, 0.333333)) && got(3L) == ((4L, 0.333333)))
    assert(got(4L) == ((4L, 1.0)))
    assert(got(5L) == ((1L, 0.0)))
  }

  // ----------------------------------------------------------- q107
  private def ranksOf(pairs: Seq[(Long, Long)]): Map[String, Double] = {
    val out = GraphQueries.pageRankOn(pairs.toDF("l_orderkey", "l_partkey"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    graft.core.Caches.releaseAll()
    out
  }

  test("q107: star graph ranks match the hand-unrolled 3 iterations; mass is conserved") {
    // o1—p1, o1—p2: N=3, deg(o1)=2, deg(p)=1.
    // r1 = (0.6166667, 0.1916667²), r2 = (0.3758333, 0.3120833²),
    // r3 = (0.5805417, 0.2097292²).
    val got = ranksOf(Seq((1L, 1L), (1L, 2L)))
    assert(math.abs(got("o1") - 0.5805417) < 1e-6, got.toString)
    assert(math.abs(got("p1") - 0.2097292) < 1e-6)
    assert(got("p1") == got("p2"), "symmetric leaves must tie exactly")
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "no dangling mass on a bidirected graph")
  }

  test("q107: a single edge is a fixed point — both endpoints hold rank 1/2") {
    val got = ranksOf(Seq((7L, 9L)))
    assert(got == Map("o7" -> 0.5, "p9" -> 0.5))
  }

  test("q107: duplicate (order, part) lines collapse to one edge") {
    val got = ranksOf(Seq((1L, 1L), (1L, 1L), (1L, 2L)))
    assert(math.abs(got("o1") - 0.5805417) < 1e-6,
      "re-listed line items must not double an edge's weight")
  }

  test("q107: the tolerance-driven loop converges to the closed-form fixed point") {
    // Star fixed point: c = 0.05 + 1.7·l, l = 0.05 + 0.425·c
    // → c = 0.135/0.2775 = 0.486486…, l = 0.256757….
    // Bipartite graphs contract at |λ| = d = 0.85 per round, so an L1
    // delta of 1e-4 leaves a residual ≤ delta·d/(1−d) ≈ 5.7e-4.
    val got = GraphQueries.pageRankUntil(
      Seq((1L, 1L), (1L, 2L)).toDF("l_orderkey", "l_partkey"),
      tol = 1e-4, maxIter = 60)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    graft.core.Caches.releaseAll()
    assert(math.abs(got("o1") - 0.135 / 0.2775) < 1e-3, got.toString)
    assert(math.abs(got("p1") - (0.05 + 0.425 * 0.135 / 0.2775)) < 1e-3)
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "mass is conserved at every iterate")
  }

  // ----------------------------------------------------------- q108
  private def md5Of(s: String): String = {
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("q108: a df>=3 segment is removed EVERYWHERE — including its first occurrence (contrast with q92)") {
    val segA = (1 to 8).map(i => s"a$i").mkString(" ")
    val segB = (1 to 8).map(i => s"b$i").mkString(" ")
    val got = CorpusQueries.boilerplateStripOn(Seq(
      1L -> s"$segA $segB", 2L -> segA, 3L -> segA).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    graft.core.Caches.releaseAll()
    assert(got(1L) == ((2L, 1L, md5Of(segB))), "first occurrence must NOT survive")
    assert(got(2L) == ((1L, 1L, null)) && got(3L) == ((1L, 1L, null)))
  }

  test("q108: a df=2 segment is below the threshold and survives in both documents") {
    val segA = (1 to 8).map(i => s"a$i").mkString(" ")
    val got = CorpusQueries.boilerplateStripOn(Seq(
      1L -> segA, 2L -> segA).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getString(3))).toMap
    graft.core.Caches.releaseAll()
    assert(got(1L) == ((0L, md5Of(segA))) && got(2L) == ((0L, md5Of(segA))))
  }

  // ----------------------------------------------------------- q109
  test("q109: PMI from in-pair marginals; the support floor drops the 4-count pair") {
    // "a b a b a b a b a b": (a b)×5, (b a)×4 → T=9, c1(a)=5, c2(b)=5.
    val text = Seq.fill(5)("a b").mkString(" ")
    val got = TextQueries.pmiOn(Seq(1L -> text).toDF("doc_id", "text")).collect()
    graft.core.Caches.releaseAll()
    assert(got.length == 1, "only (a b) reaches the 5-occurrence floor")
    val r = got.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) == (("a b", 5L, 5L, 5L)))
    assert(r.getDouble(4) == BigDecimal(math.log(5.0 * 9.0 / 25.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  // ----------------------------------------------------------- q110
  test("q110: transitions count per ordered user stream; probabilities are per-from-state shares") {
    def e(id: Long, u: Long, t: String, day: Int) =
      (id, ts(f"2026-01-$day%02d"), u, t)
    val rows = Seq(
      e(1, 1, "view", 1), e(2, 1, "click", 2), e(3, 1, "purchase", 3), e(4, 1, "click", 4),
      e(5, 2, "view", 1), e(6, 2, "click", 2),
      e(7, 3, "click", 1), e(8, 3, "view", 2))
    val got = SessionQueries.transitionsOn(
      rows.toDF("event_id", "ts", "user_id", "event_type"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    graft.core.Caches.releaseAll()
    assert(got(("view", "click")) == ((2L, 1.0)))
    assert(got(("click", "purchase")) == ((1L, 0.5)))
    assert(got(("click", "view")) == ((1L, 0.5)))
    assert(got(("purchase", "click")) == ((1L, 1.0)))
    assert(got.size == 4)
  }

  test("q110: equal timestamps order by event_id, so the pairing is deterministic") {
    val t0 = ts("2026-01-01")
    val rows = Seq((1L, t0, 9L, "error"), (2L, t0, 9L, "view"))
    val got = SessionQueries.transitionsOn(
      rows.toDF("event_id", "ts", "user_id", "event_type"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    graft.core.Caches.releaseAll()
    assert(got.toSeq == Seq(("error", "view")))
  }

  // ----------------------------------------------------------- q111
  test("q111: digits are dense 1..9; zeros, negatives and sub-rounding values are excluded") {
    val rows = Seq(
      ("m", ts("2026-01-01"), 10.0), ("m", ts("2026-01-01"), 12.5),
      ("m", ts("2026-01-01"), 199.0), ("m", ts("2026-01-01"), 900.0),
      ("m", ts("2026-01-01"), -5.0), ("m", ts("2026-01-01"), 0.0),
      ("m", ts("2026-01-01"), 4e-7)) // rounds to v6=0 → no leading digit
    val got = AuditQueries.benfordOn(rows.toDF("event_type", "ts", "value"))
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(5))).toMap
    graft.core.Caches.releaseAll()
    assert(got.keySet == (1L to 9L).toSet, "spine must be dense")
    assert(got(1L)._1 == 3L && got(1L)._2 == 0.75)
    assert(got(9L)._1 == 1L && got(9L)._2 == 0.25)
    assert(got(2L) == ((0L, 0.0, 0.176091)), "absent digit: zero share, full Benford deviation")
  }

  // ----------------------------------------------------------- q113
  test("q113: the rolling median smooths a one-day spike that a mean would chase") {
    val rows = Seq(
      (1L, ts("2026-01-01"), 51L, "purchase", 70.0), // series 1: spike day 1
      (2L, ts("2026-01-08"), 99L, "view", 0.0)) // widens the spine to day 8
    val got = TemporalQueries.rollingMedianOn(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .where(col("series_id") === 1L)
      .collect().map(r => r.getDate(1).toString -> r.getDouble(3)).toMap
    graft.core.Caches.releaseAll()
    assert(got("2026-01-01") == 70.0, "1-row warm-up frame is the value itself")
    assert(got("2026-01-02") == 35.0, "even frame interpolates the two middles")
    assert(got("2026-01-03") == 0.0, "by day 3 the zero-fill majority owns the median")
    assert(got("2026-01-08") == 0.0, "the spike ages out of the 7-day frame")
  }

  // ----------------------------------------------------------- q114
  test("q114: a perfectly dependent 2x2 table puts equal chi2 mass in every cell") {
    def e(id: Long, u: Long, t: String, k: Int) = Seq.fill(k)((id, ts("2026-01-01"), u, t))
    val rows = e(1, 0L, "a", 30) ++ e(2, 1L, "a", 10) ++ e(3, 0L, "b", 10) ++ e(4, 1L, "b", 30)
    val got = AuditQueries.chiSquareOn(
      rows.zipWithIndex.map { case ((_, t, u, ty), i) => (i.toLong, t, u, ty) }
        .toDF("event_id", "ts", "user_id", "event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    graft.core.Caches.releaseAll()
    assert(got(("a", 0L)) == ((30L, 20.0, 5.0)))
    assert(got(("a", 1L)) == ((10L, 20.0, 5.0)))
    assert(got(("b", 0L)) == ((10L, 20.0, 5.0)))
    assert(got(("b", 1L)) == ((30L, 20.0, 5.0)))
  }

  // ----------------------------------------------------------- q115
  test("q115: identical vocabularies score 1; disjoint sources produce no pair row") {
    val got = CorpusQueries.sourceOverlapOn(Seq(
      (1L, "x y", "A"), (2L, "y x x", "B"), (3L, "z", "C"))
      .toDF("doc_id", "text", "source"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    graft.core.Caches.releaseAll()
    assert(got(("A", "B")) == ((2L, 2L, 2L, 1.0)))
    assert(got.size == 1, "zero-overlap pairs must be absent, not 0-scored rows")
  }

  // ----------------------------------------------------------- q116
  test("q116: hand-computed Welch t on unit-variance halves; 1-row sides go NULL") {
    val rows = Seq(
      // window 01-01..01-04 → split 01-02: base = day 1, cur = days 2-4
      ("m", ts("2026-01-01"), 1.0), ("m", ts("2026-01-01"), 2.0), ("m", ts("2026-01-01"), 3.0),
      ("m", ts("2026-01-02"), 5.0), ("m", ts("2026-01-03"), 6.0), ("m", ts("2026-01-04"), 7.0),
      // lone: one value per side → NULL t
      ("lone", ts("2026-01-01"), 1.0), ("lone", ts("2026-01-04"), 9.0))
    val got = AuditQueries.welchTOn(rows.toDF("event_type", "ts", "value"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    graft.core.Caches.releaseAll()
    val (nb, nc, m1, m2, t) = got("m")
    assert((nb, nc, m1, m2) == ((3L, 3L, 2.0, 6.0)))
    // t = (2−6)/√(1/3 + 1/3) = −4.898979 at 6 decimals
    assert(t.contains(BigDecimal(-4.0 / math.sqrt(2.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble), t.toString)
    assert(got("lone")._5.isEmpty, "n=1 sides must yield NULL, not a crash")
  }

  // ----------------------------------------------------------- q118
  test("q118: hand-computed Gini — one hot key vs a uniform key set") {
    def audit(keys: Seq[Long]) = {
      val r = LayoutQueries.skewAuditOn(keys.toDF("k")).collect().head
      graft.core.Caches.releaseAll()
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    }
    // counts [8,1,1,1,1] sorted asc → Σ rank·cnt = 1+2+3+4+40 = 50;
    // G = 2·50/(5·12) − 6/5 = 0.466667
    val hot = audit(Seq.fill(8)(1L) ++ Seq(2L, 3L, 4L, 5L))
    assert(hot == ((5L, 12L, 0.666667, 1.0, 0.466667)), hot.toString)
    // perfectly uniform → Gini exactly 0
    val flat = audit((1L to 4L).flatMap(k => Seq(k, k)))
    assert(flat == ((4L, 8L, 0.25, 1.0, 0.0)), flat.toString)
  }

  // ----------------------------------------------------------- q119
  test("q119: negatives are deterministic, in-range, and partitioning-independent") {
    val docs = (0L until 10L).map(i => (i, s"text $i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val a = SamplingQueries.negativesOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sortBy(x => (x._1, x._2))
    val b = SamplingQueries.negativesOn(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).sortBy(x => (x._1, x._2))
    assert(a.length == SamplingQueries.NegativesK, s"one query doc (0) × k draws: ${a.toSeq}")
    assert(a.toSeq == b.toSeq, "draws must not depend on partitioning")
    assert(a.forall(x => x._3 >= 0 && x._3 < 10), "every draw must resolve to a real doc")
    assert(a.forall(x => x._4 == s"src${x._3 % 3}"), "the join must fetch the right doc's source")
  }

  // ----------------------------------------------------------- q120
  test("q120: latency percentiles interpolate over converts only; pre-signup purchases don't count") {
    val rows = Seq(
      (1L, Timestamp.valueOf("2026-01-05 10:00:00"), 1L, "signup"),
      (2L, Timestamp.valueOf("2026-01-05 10:01:40"), 1L, "purchase"), // +100 s
      (3L, Timestamp.valueOf("2026-01-05 09:00:00"), 2L, "purchase"), // BEFORE signup — ignored
      (4L, Timestamp.valueOf("2026-01-05 11:00:00"), 2L, "signup"),
      (5L, Timestamp.valueOf("2026-01-05 11:05:00"), 2L, "purchase"), // +300 s
      (6L, Timestamp.valueOf("2026-01-05 12:00:00"), 3L, "signup")) // never converts
    // stage a tiny events.parquet so the PUBLIC (spark, dir) query runs
    val dir = new java.io.File(tmpDir("ttc")).getParent
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = FunnelQueries.q120TimeToConvert(spark, dir).collect()
    graft.core.Caches.releaseAll()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "2026-01" && r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 0.666667)
    assert(r.getDouble(4) == 200.0, "p50 of {100 s, 300 s} interpolates to 200")
    assert(r.getDouble(5) == 280.0, "p90 = 100 + 0.9·200")
  }

  // ----------------------------------------------------------- q112
  test("q112: interior gaps interpolate linearly; beyond the endpoints stays NULL") {
    val rows = Seq(
      (1L, ts("2026-01-02"), 51L, "purchase", 10.0), // series 1 (51 % 50)
      (2L, ts("2026-01-05"), 51L, "purchase", 40.0),
      (3L, ts("2026-01-01"), 99L, "view", 0.0)) // widens the spine to 01-01
    val got = TemporalQueries.lerpOn(
      rows.toDF("event_id", "ts", "user_id", "event_type", "value"))
      .where(col("series_id") === 1L)
      .collect().map(r => r.getDate(1).toString ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    graft.core.Caches.releaseAll()
    assert(got("2026-01-01").isEmpty, "no extrapolation before the first observation")
    assert(got("2026-01-02").contains(10.0))
    assert(got("2026-01-03").contains(20.0))
    assert(got("2026-01-04").contains(30.0))
    assert(got("2026-01-05").contains(40.0))
  }

  // ----------------------------------------------------------- q124
  test("q124: LPA cohorts — shared-neighborhood nodes merge, disjoint components never do") {
    // Square A (o1, o2 × p10, p11), star B (o5, o6 × p20). Hand-unroll
    // (ids: o_k → 2k, p_k → 2k+1; ties → smallest label):
    // R1: every o in A adopts min(p10, p11) = p10's id; every p in A
    //     adopts min(o1, o2) = o1's id; in B both o's adopt p20, p20
    //     adopts o5. R2: labels hop back — o-side converges to o1 (via
    //     the shared parts), p-side to p10; in B o's → o5, p20 → p20.
    val pairs = Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (5L, 20L), (6L, 20L)).toDF("l_orderkey", "l_partkey")
    val got = GraphQueries.labelPropOn(pairs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    graft.core.Caches.releaseAll()
    assert(got == Map(
      "o1" -> "o1", "o2" -> "o1", "p10" -> "p10", "p11" -> "p10",
      "o5" -> "o5", "o6" -> "o5", "p20" -> "p20"), got.toString)
  }

  // ----------------------------------------------------------- q121
  test("q121: only the absent slot with a confident baseline pages; noisy and unknown slots stay quiet") {
    def hourTs(day: String, h: Int): Timestamp =
      Timestamp.valueOf(f"$day $h%02d:30:00")
    // Four Mondays span the window 2026-01-05..01-26. The 09:00 slot is
    // steady (8, 10, 12 → µ=10, σ=2, µ/σ=5 > 2) but has NO events on
    // 01-19 → must page with z0 = -5. The 03:00 slot is noisy (1, 5, 9
    // → µ=5, σ=4, µ/σ=1.25 < 2): its 01-19 absence is tolerable. Every
    // non-Monday hour in the span has no baseline at all and must not
    // appear even though the grid covers it.
    val rows = (
      Seq.fill(8)(hourTs("2026-01-05", 9)) ++ Seq.fill(10)(hourTs("2026-01-12", 9)) ++
        Seq.fill(12)(hourTs("2026-01-26", 9)) ++
        Seq(hourTs("2026-01-05", 3)) ++ Seq.fill(5)(hourTs("2026-01-12", 3)) ++
        Seq.fill(9)(hourTs("2026-01-26", 3)))
      .map(t => ("purchase", t)).toDF("event_type", "ts")
    val got = AuditQueries.absenceAuditOn(rows).collect()
    graft.core.Caches.releaseAll()
    assert(got.length == 1, s"exactly the silent busy slot: ${got.mkString("; ")}")
    val r = got.head
    assert(r.getString(0) == "purchase" && r.getDate(1).toString == "2026-01-19" &&
      r.getLong(2) == 9L && r.getLong(3) == 3L, s"got $r")
    assert(r.getDouble(4) == 10.0 && r.getDouble(5) == 2.0 && r.getDouble(6) == -5.0,
      s"got $r")
  }

  // ----------------------------------------------------------- q135
  private def klOf(rows: (Long, String, String)*): Map[String, (Long, Double)] = {
    val got = AuditQueries.klPerSourceOn(rows.toDF("doc_id", "text", "source"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    graft.core.Caches.releaseAll()
    got
  }

  test("q135: sources with identical token distributions sit at KL exactly 0") {
    val got = klOf((1L, "a a b", "s1"), (2L, "a a b", "s2"))
    assert(got.keySet == Set("s1", "s2"))
    got.values.foreach { case (n, kl) => assert(n == 3L && kl == 0.0, got.toString) }
  }

  test("q135: divergence orders sources — disjoint vocabulary beats a shared mix") {
    // Global over {s1: "a b", s2: "a b", s3: "c c"}: p_g = {a:1/3, b:1/3, c:1/3}.
    // s1 = s2 = {a:.5, b:.5} → KL = ln(1.5) ≈ 0.405; s3 = {c:1} → KL = ln 3 ≈ 1.099.
    val got = klOf((1L, "a b", "s1"), (2L, "a b", "s2"), (3L, "c c", "s3"))
    assert(got("s1") == got("s2"), got.toString)
    assert(math.abs(got("s1")._2 - math.log(1.5)) < 1e-6, got.toString)
    assert(math.abs(got("s3")._2 - math.log(3.0)) < 1e-6, got.toString)
    assert(got("s3")._2 > got("s1")._2 && got("s1")._2 > 0.0, got.toString)
  }

  // ----------------------------------------------------------- q140
  private def kappaOf(rows: (String, String)*) = {
    val r = AuditQueries.kappaOf(rows.toDF("pred", "truth")).collect().head
    graft.core.Caches.releaseAll()
    (r.getLong(0), r.getDouble(1), r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))
  }

  test("q140: perfect agreement is kappa 1; a constant predictor is kappa 0 despite high accuracy") {
    val (n, po, _, k) = kappaOf(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
    assert(n == 4 && po == 1.0 && k.contains(1.0), s"$po $k")
    // 9 of 10 truths are 'a'; always answering 'a' scores 90% accuracy
    // but exactly chance-level agreement: p_e = p_o = 0.9 → κ = 0.
    val rows = Seq.fill(9)(("a", "a")) :+ (("a", "b"))
    val (_, po2, pe2, k2) = kappaOf(rows: _*)
    assert(po2 == 0.9 && pe2 == 0.9 && k2.contains(0.0),
      s"the imbalance case kappa must vanish: $po2 $pe2 $k2")
    // degenerate: everything one class on both sides → κ undefined (NULL)
    val (_, _, _, k3) = kappaOf(("a", "a"), ("a", "a"))
    assert(k3.isEmpty, s"p_e = 1 must yield NULL, not a division blow-up: $k3")
  }

  test("q140: the hand-computed 2x2 case") {
    // Confusion: aa=4, ab=1, ba=2, bb=3 → n=10, p_o=0.7,
    // p_e = (5·6 + 5·4)/100 = 0.5, κ = 0.2/0.5 = 0.4.
    val rows = Seq.fill(4)(("a", "a")) ++ Seq.fill(1)(("a", "b")) ++
      Seq.fill(2)(("b", "a")) ++ Seq.fill(3)(("b", "b"))
    val (n, po, pe, k) = kappaOf(rows: _*)
    assert(n == 10 && po == 0.7 && pe == 0.5 && k.contains(0.4), s"$n $po $pe $k")
  }
}
