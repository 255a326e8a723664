package graft.operators

import graft.SparkSpec

/** Q73's engine: incremental near-dup of a fresh batch against a corpus
  * band index — cross-slice pairs only, true (uncapped) Jaccard, and
  * the index usable after a round-trip through parquet storage. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // doc_ids ≡ 0 mod 5 are the fresh batch; texts built so near-dup pairs
  // exist fresh↔corpus (10~1), corpus↔corpus (1~2, must NOT be reported),
  // and fresh↔fresh (10~15 via shared base, must NOT be reported).
  private val base = (1 to 40).map(i => s"w$i").mkString(" ")
  private def docsDf = Seq(
    (1L, base + " tail one"),
    (2L, base + " tail two"),
    (3L, "completely different text about nothing shared at all here"),
    (10L, base + " tail one x"),
    (15L, base + " tail one y"),
    (20L, "another unrelated fresh document with its own words entirely"))
    .toDF("doc_id", "text")

  test("probe reports only fresh-vs-corpus pairs at true Jaccard") {
    val got = DedupQueries.incrementalNearDupOn(docsDf)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    graft.core.Caches.releaseAll()
    assert(got.forall { case (d1, d2) => d1 % 5 == 0 && d2 % 5 != 0 },
      s"only cross-slice pairs allowed: $got")
    assert(got.contains((10L, 1L)) && got.contains((15L, 1L)), s"missed planted pairs: $got")
    assert(!got.exists { case (d1, d2) => d1 == d2 }, "no self pairs")
  }

  test("the band index survives a parquet round-trip and probes identically") {
    val bands = DedupQueries.bandsOf(DedupQueries.shinglesOf(docsDf), fastHash = false)
    val idxPath = tmpDir("band_index")
    bands.where(col("doc_id") % 5 =!= 0)
      .write.partitionBy("band").parquet(idxPath)
    val storedIdx = spark.read.parquet(idxPath)
      .select(col("doc_id"), col("band").cast("int"), col("bk"))
    val fresh = bands.where(col("doc_id") % 5 === 0)
    val viaStore = DedupQueries.probeIndex(docsDf, fresh, storedIdx)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val direct = DedupQueries.incrementalNearDupOn(docsDf)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    graft.core.Caches.releaseAll()
    assert(viaStore == direct, s"stored-index probe must match direct: $viaStore vs $direct")
    assert(viaStore.nonEmpty)
  }

  test("verification Jaccard is the raw-set value, not the capped approximation") {
    // The planted pair shares a VIRAL shingle ("all rights reserved",
    // df = 142 > MaxShingleDf): candidate generation drops it from the
    // capped sets, but verification must still count it — capped
    // verification would report 40/41, raw reports 41/42.
    val viral = (1 to 200).filter(_ % 5 != 0).take(140)
      .map(i => (1000L + i, s"u${i}a u${i}b all rights reserved"))
    val fixture = (viral ++ Seq(
      (1L, base + " all rights reserved"),
      (10L, base + " all rights reserved x")))
      .toDF("doc_id", "text")
    val r = DedupQueries.incrementalNearDupOn(fixture)
      .where(col("d1") === 10L && col("d2") === 1L)
      .select("inter", "un", "jaccard").collect()
    graft.core.Caches.releaseAll()
    assert(r.length == 1, "the planted pair must band-collide via its unique overlap")
    val (inter, un) = (r(0).getLong(0), r(0).getLong(1))
    assert(inter == 41L && un == 42L,
      s"expected raw 41/42 (capped verification would give 40/41), got $inter/$un")
  }
}
