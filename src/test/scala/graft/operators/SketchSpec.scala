package graft.operators

import graft.SparkSpec

/** Sketch accuracy: q55's Greenwald-Khanna approximate quantiles have no
  * oracle row (engine-specific by design), so their error bound against
  * q35's exact percentiles is pinned here instead.
  */
class SketchSpec extends SparkSpec {

  private val Dir = "/root/testdata/sf0.01"

  test("q55 approx quantiles land within 2% rank error of the exact q35 values") {
    val exact = RelationalExtras.q35Percentiles(spark, Dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap // median, p90
    val approx = CoreQueries.q55ApproxQuantiles(spark, Dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap // p50, p90
    assert(approx.keySet == exact.keySet)
    // value-space tolerance derived from the data range (values ~0..100):
    // accuracy=1000 → rank error <= 0.1%, but allow 2% of range for interpolation
    // differences between the exact (linear-interp) and GK (sample) definitions.
    for ((t, (p50a, p90a)) <- approx) {
      val (p50e, p90e) = exact(t)
      assert(math.abs(p50a - p50e) <= 0.02 * math.max(1.0, math.abs(p50e)) + 2.0,
        s"$t p50 approx=$p50a exact=$p50e")
      assert(math.abs(p90a - p90e) <= 0.02 * math.max(1.0, math.abs(p90e)) + 2.0,
        s"$t p90 approx=$p90a exact=$p90e")
    }
  }

  test("q15_approx HLL estimates land within the declared rsd of the exact distinct counts") {
    // The q15_approx entry is rows-only (sketch estimates are
    // engine-specific by design); this is its DIRECT accuracy pin —
    // the declared rsd is 0.02, checked at 3 sigma against the exact
    // countDistinct the q15_dedup oracle path computes.
    import org.apache.spark.sql.functions._
    val approx = CoreQueries.q15ApproxDistinct(spark, Dir).head()
    val exact = graft.core.Tables(spark, Dir, "events")
      .agg(countDistinct(col("user_id")), countDistinct(col("event_id"))).head()
    for ((i, what) <- Seq(0 -> "users", 1 -> "events")) {
      val (a, e) = (approx.getLong(i), exact.getLong(i))
      assert(math.abs(a - e) <= math.max(3L, (3 * 0.02 * e).toLong),
        s"$what: approx=$a exact=$e outside 3x the declared rsd")
    }
  }

  test("q58 closed-form moments agree with Spark's streaming stddev_samp") {
    import org.apache.spark.sql.functions._
    val ours = RelationalExtras.q58Stats(spark, Dir).collect()
      .map(r => r.getString(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    val ref = graft.core.Tables(spark, Dir, "events")
      .groupBy("event_type")
      .agg(avg(col("value")).as("m"), stddev_samp(col("value")).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(ours.keySet == ref.keySet)
    for ((t, (m, s)) <- ours) {
      assert(math.abs(m - ref(t)._1) < 1e-4, s"$t mean $m vs ${ref(t)._1}")
      assert(math.abs(s - ref(t)._2) < 1e-4, s"$t stddev $s vs ${ref(t)._2}")
    }
  }
}
