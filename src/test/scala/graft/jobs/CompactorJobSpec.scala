package graft.jobs

import java.sql.Timestamp

import graft.{Fixtures, SparkSpec}
import graft.sources.BronzeReader
import graft.state.JdbcStateStore

/** End-to-end bronze→silver pipeline (SURVEY §5 item 4): schema drift,
  * malformed lines, mixed epoch precisions, zero-row file, partition
  * layout, corrupt-row quarantine, and claim-pattern idempotency
  * (second run is a no-op; failed runs are re-claimable). */
class CompactorJobSpec extends SparkSpec {

  private def newStore(): JdbcStateStore = {
    val db = s"memory:db${scala.util.Random.nextInt(1000000)};create=true"
    val s = new JdbcStateStore(s"jdbc:derby:$db")
    s.ensureTable()
    s
  }

  test("bronze→silver end-to-end with drift, corruption, and claim/ack") {
    val dir = tmpDir("bronze")
    val target = tmpDir("silver")
    val (keys, expectClean, expectCorrupt) = Fixtures.bronzeBatch(dir)
    val store = newStore()
    keys.zipWithIndex.foreach { case (k, i) =>
      store.register(k, "DISTRICTB", new Timestamp(1704067200000L + i))
    }

    val r1 = CompactorJob.run(spark, store, "run-1", "DISTRICTB", target)
    assert(r1.claimed == 4)
    assert(r1.rows == expectClean)
    assert(r1.quarantined == expectCorrupt)

    // partition layout: hiveperiod (WITA date) × dstrct_code
    val silver = spark.read.parquet(target)
    assert(silver.count() == expectClean)
    val parts = silver.select("hiveperiod", "dstrct_code").distinct()
      .collect().map(r => (r.get(0).toString, r.getString(1))).toSet
    assert(parts.contains(("2024-01-01", "DISTRICTB"))) // +8h of 00:xx UTC
    assert(parts.contains(("2023-12-31", "DISTRICTB"))) // the late row
    // drifted column survives with nulls where absent
    assert(silver.columns.contains("fuel_level"))
    assert(silver.where("fuel_level IS NOT NULL").count() == 2)
    // provenance column
    assert(silver.where("source_file LIKE '%dev2%'").count() == 2)

    // idempotency: everything acked, a second run claims nothing
    val r2 = CompactorJob.run(spark, store, "run-2", "DISTRICTB", target)
    assert(r2.claimed == 0 && r2.rows == 0)
    assert(spark.read.parquet(target).count() == expectClean)
    store.close()
  }

  test("failed runs release their claims for retry") {
    val dir = tmpDir("bronze2")
    val target = tmpDir("silver2")
    Fixtures.bronzeBatch(dir)
    val store = newStore()
    // register a key that does not exist on disk → read fails
    store.register(s"file:$dir/site/devX/missing.txt.gz", "DISTRICTB",
      new Timestamp(1704067200000L))

    intercept[Throwable] {
      CompactorJob.run(spark, store, "run-fail", "DISTRICTB", target)
    }
    assert(store.claimedKeys("run-fail").isEmpty) // released
    assert(store.pendingCount() == 1) // claimable again
    store.close()
  }

  test("district filter scopes claims") {
    val store = newStore()
    store.register("file:/a", "DISTRICTB", new Timestamp(1L))
    store.register("file:/b", "DISTRICTG", new Timestamp(2L))
    val claimed = store.claim("run-d", 10, Some("DISTRICTG"))
    assert(claimed == Seq("file:/b"))
    store.close()
  }

  test("racing runs claim disjoint key sets") {
    val store = newStore()
    (1 to 6).foreach(i => store.register(s"file:/r$i", "D", new Timestamp(i * 1000L)))
    val a = store.claim("run-A", 3, None)
    val b = store.claim("run-B", 3, None)
    assert(a.size == 3 && b.size == 3)
    assert(a.toSet.intersect(b.toSet).isEmpty, "a key must never be claimed twice")
    assert(store.pendingCount() == 0)
    // releasing A puts only A's keys back
    store.release("run-A")
    assert(store.pendingCount() == 3)
    val c = store.claim("run-C", 10, None)
    assert(c.toSet == a.toSet)
    store.close()
  }

  test("releaseAbandoned reaps stale claims back into the pool") {
    val store = newStore()
    (1 to 3).foreach(i => store.register(s"file:/ab$i", "D", new Timestamp(i * 1000L)))
    val claimed = store.claim("run-dead", 2, None)
    assert(claimed.size == 2 && store.pendingCount() == 1)
    // the claiming run is hard-killed: no ack, no release, runId never reused
    val reaped = store.releaseAbandoned(new Timestamp(System.currentTimeMillis() + 1))
    assert(reaped == 2)
    assert(store.pendingCount() == 3, "abandoned keys must be claimable again")
    val c2 = store.claim("run-new", 10, None)
    assert(c2.size == 3)
    // a LIVE claim (claimed_at after the cutoff) must not be reaped
    assert(store.releaseAbandoned(new Timestamp(0L)) == 0)
    store.close()
  }

  test("claims are newest-first and bounded by the limit") {
    val store = newStore()
    (1 to 5).foreach(i => store.register(s"file:/k$i", "D", new Timestamp(i * 1000L)))
    val claimed = store.claim("run-l", 2, None)
    assert(claimed.toSet == Set("file:/k5", "file:/k4"))
    store.close()
  }

  test("drift-tolerant union across pre-read batches") {
    import org.apache.spark.sql.functions.col
    val a = spark.range(2).select(col("id"), col("id").cast("double").as("x"))
    val b = spark.range(2).select(col("id"), col("id").cast("string").as("y"))
    val u = BronzeReader.unionDrifted(Seq(a, b))
    assert(u.columns.toSet == Set("id", "x", "y"))
    assert(u.count() == 4)
    assert(u.where("x IS NULL").count() == 2)
  }
}
