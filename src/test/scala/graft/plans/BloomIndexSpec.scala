package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BloomIndex primitive (q72's engine): no false negatives, mergeable
  * union, and the bloom-pruned anti join agreeing with the exact one. */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def buildIndex(values: Seq[Long], expected: Long): Array[Byte] =
    values.toDF("v").select(BloomIndex.bloomAgg(col("v"), expected).as("bf"))
      .head.getAs[Array[Byte]](0)

  test("no false negatives: every inserted value probes true") {
    val vals = (0L until 1000L).map(_ * 7919L)
    val idx = buildIndex(vals, 1000L)
    val misses = vals.toDF("v")
      .where(!BloomIndex.mightContain(idx, col("v"))).count()
    assert(misses == 0, "a bloom filter must never forget an inserted value")
  }

  test("false positives stay near the configured rate") {
    val idx = buildIndex((0L until 1000L).toSeq, 1000L)
    val fp = (1000000L until 1010000L).toDF("v")
      .where(BloomIndex.mightContain(idx, col("v"))).count()
    assert(fp < 1000, s"~3% fpp expected over 10k unseen values, got $fp")
  }

  test("union is bitwise: merged index answers for both builds") {
    val a = buildIndex(Seq(1L, 2L, 3L), 100L)
    val b = buildIndex(Seq(100L, 200L), 100L)
    val u = BloomIndex.union(a, b)
    val hits = Seq(1L, 2L, 3L, 100L, 200L).toDF("v")
      .where(BloomIndex.mightContain(u, col("v"))).count()
    assert(hits == 5, "the merged index must cover both input sketches")
  }

  test("q72 engine: bloom-pruned new-content detection equals the exact anti join") {
    // doc_ids ≡ 0 mod 5 are "fresh"; duplicates planted both ways:
    // fresh 10 duplicates corpus 3's text, fresh 20 is genuinely new,
    // corpus-only dup (2,7) must not affect the answer.
    val docsDf = Seq(
      (1L, "alpha bravo"), (2L, "charlie delta"), (3L, "echo foxtrot"),
      (7L, "charlie delta"), (9L, "golf hotel"),
      (10L, "echo foxtrot"), (20L, "india juliet"), (15L, "alpha bravo"))
      .toDF("doc_id", "text")
    val got = graft.operators.DedupQueries.bloomNewContentOn(docsDf)
      .as[Long].collect().toSet
    assert(got == Set(20L), s"only the never-seen fresh doc is new, got $got")
    graft.core.Caches.releaseAll()
  }

  test("q72 engine: empty corpus means everything fresh is new") {
    val docsDf = Seq((0L, "a"), (5L, "b"), (10L, "c")).toDF("doc_id", "text")
    val got = graft.operators.DedupQueries.bloomNewContentOn(docsDf)
      .as[Long].collect().toSet
    assert(got == Set(0L, 5L, 10L))
    graft.core.Caches.releaseAll()
  }
}
