package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Hand-computed semantics for the domain-mixture tier (q170/q171):
  * exact temperature weights on a two-domain fixture, the per-doc
  * copy-count contract (floor(boost) or ceil(boost), md5-decided,
  * deterministic), and the realized epoch's concentration at the
  * tempered shares on real data.
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private val Alpha = 0.3

  // Two domains, 90%/10% char mass — hand computation:
  //   p = (0.9, 0.1); p^0.3 = (0.968886…, 0.501187…); Z = 1.470073…
  //   p_temp = (0.659073…, 0.340927…); boost = (0.732303…, 3.409268…)
  // the rare domain upsamples 3.4x, the common one downsamples 0.73x.
  private def fixture: DataFrame = {
    val rows = (1 to 9).map(i => (i.toLong, "big", "x" * 100, 100L)) :+
      (10L, "rare", "y" * 100, 100L)
    rows.toDF("doc_id", "lang", "text", "n_chars")
  }

  test("q170 weights match the closed-form hand computation") {
    val got = MixtureQueries.mixtureOn(fixture).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val z = math.pow(0.9, Alpha) + math.pow(0.1, Alpha)
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    val (nBig, cBig, pBig, qBig, bBig) = got("big")
    assert(nBig == 9L && cBig == 900L)
    assert(close(pBig, 0.9) && close(qBig, math.pow(0.9, Alpha) / z))
    assert(close(bBig, math.pow(0.9, Alpha) / z / 0.9))
    val (nRare, cRare, pRare, qRare, bRare) = got("rare")
    assert(nRare == 1L && cRare == 100L)
    assert(close(qRare, math.pow(0.1, Alpha) / z))
    assert(bRare > 3.4 && bRare < 3.42, s"rare-domain boost $bRare")
    // tempered shares are a distribution; boosts conserve mass
    assert(close(qBig + qRare, 1.0))
    assert(close(pBig * bBig + pRare * bRare, 1.0))
  }

  test("q171 copies are floor(boost) or ceil(boost) per doc, md5-decided, deterministic") {
    val boosts = MixtureQueries.mixtureOn(fixture).collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    def run(): Map[Long, (String, Long)] =
      MixtureQueries.temperatureResampleOn(fixture).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .groupBy(_._1)
        .map { case (id, rs) =>
          // copy indices must be exactly 1..n
          val copies = rs.map(_._3).sorted.toSeq
          assert(copies == (1L to copies.size).toSeq, s"doc $id copies $copies")
          id -> (rs.head._2, copies.size.toLong)
        }
    val epoch = run()
    for ((id, (lang, n)) <- epoch) {
      val b = boosts(lang)
      assert(n == math.floor(b).toLong || n == math.ceil(b).toLong,
        s"doc $id: $n copies outside {floor,ceil}($b)")
    }
    // the rare doc must be upsampled (3 or 4 copies); a missing big doc
    // is legal (boost 0.73 → 0 or 1 copies)
    assert(epoch.get(10L).exists(e => e._2 == 3L || e._2 == 4L))
    assert(run() == epoch, "epoch must be deterministic run-to-run")
  }

  test("the realized epoch's char mass concentrates at the tempered shares (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val mix = MixtureQueries.q170DomainMixture(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(4))).toMap
    val docs = graft.core.Tables(spark, dir, "documents")
    val realized = MixtureQueries.q171TemperatureResample(spark, dir)
      .join(docs.select("doc_id", "n_chars"), "doc_id")
      .groupBy("lang").sum("n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = realized.values.sum.toDouble
    mix.foreach { case (lang, (_, pTemp)) =>
      val share = realized.getOrElse(lang, 0L) / tot
      // per-doc Bernoulli rounding keeps the realized share within a
      // few percent of the target at this corpus size
      assert(math.abs(share - pTemp) < 0.05,
        s"$lang realized $share vs target $pTemp")
    }
  }

  // ------------------------------------------------- q177 waterfilling

  private def capped(budgetMult: Double, epochCap: Double) =
    MixtureQueries.cappedMixtureOn(fixture, budgetMult, epochCap)
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3),
        r.getBoolean(4), r.getDouble(5), r.getDouble(6))).toMap

  test("q177 hand computation: rare domain caps, freed budget flows to big") {
    // fixture: chars (900, 100), tot 1000, B = 2000, cap = 2.5x chars.
    //   w = (0.9^a, 0.1^a)/Z; ratio = cap/w -> rare saturates first
    //   (250/0.341 = 733 < lam_1 = 2000), big does not
    //   (2250/0.659 = 3414 > lam_2 = (2000-250)/0.659 = 2655).
    //   big's alloc is exactly the leftover budget: 2000 - 250 = 1750.
    val got = capped(2.0, 2.5)
    val z = math.pow(0.9, Alpha) + math.pow(0.1, Alpha)
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9
    val (wR, capR, satR, allocR, epR) = got("rare")
    assert(close(wR, math.pow(0.1, Alpha) / z))
    assert(satR && close(capR, 250.0) && close(allocR, 250.0)
      && close(epR, 2.5))
    val (wB, capB, satB, allocB, epB) = got("big")
    assert(!satB && close(capB, 2250.0))
    assert(close(allocB, 1750.0), s"big alloc $allocB")
    assert(close(epB, 1750.0 / 900.0))
    // conservation: allocations exhaust the budget exactly
    assert(close(allocR + allocB, 2000.0))
  }

  test("q177 all-saturated: budget above total capacity allocates every cap") {
    // B = 10x tot = 10000 > total cap 2500: both domains cap out and
    // the lam* guard must not divide by the zero unsaturated weight.
    val got = capped(10.0, 2.5)
    assert(got.values.forall(_._3), "all domains must saturate")
    assert(math.abs(got("big")._4 - 2250.0) < 1e-9)
    assert(math.abs(got("rare")._4 - 250.0) < 1e-9)
  }

  test("q177 no-saturation: a loose cap reproduces the pure tempered split") {
    // epoch cap 100 binds nothing: alloc_d = w_d * B.
    val got = capped(2.0, 100.0)
    assert(got.values.forall(!_._3))
    got.foreach { case (lang, (w, _, _, alloc, _)) =>
      assert(math.abs(alloc - w * 2000.0) < 1e-9, s"$lang alloc $alloc")
    }
  }

  test("q181 dedup shift: cross-domain keepers move mass; shifts sum to zero") {
    // big: two unique docs (200 chars). rare: one doc whose text
    // DUPLICATES a big doc (keeper is the big copy, rare loses all
    // mass) plus one unique doc.
    val docs = Seq(
      (1L, "big", "u" * 100, 100L),
      (2L, "big", "v" * 100, 100L),
      (3L, "rare", "u" * 100, 100L), // dup of doc 1 under another lang
      (4L, "rare", "w" * 50, 50L)).toDF("doc_id", "lang", "text", "n_chars")
    val got = MixtureQueries.dedupMixtureShiftOn(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-12
    val (cbB, caB, sbB, saB, shB) = got("big")
    assert(cbB == 200L && caB == 200L)
    assert(close(sbB, 200.0 / 350) && close(saB, 200.0 / 250))
    assert(close(shB, 200.0 / 250 - 200.0 / 350) && shB > 0)
    val (cbR, caR, _, saR, shR) = got("rare")
    assert(cbR == 150L && caR == 50L, "the cross-lang dup's mass goes to the keeper's domain")
    assert(close(saR, 50.0 / 250) && shR < 0)
    // shares are distributions on both sides → shifts sum to zero
    assert(close(got.values.map(_._5).sum, 0.0))
  }

  test("q177 real corpus: both regimes occur and the budget is conserved (sf0.001)") {
    val rows = MixtureQueries.q177CappedMixture(spark, "/root/testdata/sf0.001")
      .collect()
    val sat = rows.count(_.getBoolean(4))
    assert(sat > 0 && sat < rows.length,
      s"expected a regime split, got $sat/${rows.length} saturated")
    val totChars = rows.map(_.getLong(1)).sum.toDouble
    val alloc = rows.map(_.getDouble(5)).sum
    assert(math.abs(alloc - 2.0 * totChars) / totChars < 1e-9,
      "unsaturated domains must absorb the full budget")
    rows.foreach { r =>
      assert(r.getDouble(6) <= 2.5 + 1e-9,
        s"${r.getString(0)} exceeds the epoch cap: ${r.getDouble(6)}")
    }
  }
}
