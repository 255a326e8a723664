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
}
