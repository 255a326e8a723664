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

  test("day-over-day: carried index maintained by union; prior days are never re-read") {
    import graft.operators.DedupQueries.bloomAdvanceDay
    def h = xxhash64(col("text"))
    // Day 0 lives in parquet; after its sketch is taken the FILES ARE
    // DELETED — if any later day's plan touched the day-0 relation, the
    // scan would fail loudly. Days 1 and 2 must run purely off the
    // carried few-MB bitmap.
    val day0Path = tmpDir("bloom_day0")
    Seq((1L, "alpha"), (2L, "bravo")).toDF("doc_id", "text")
      .write.parquet(day0Path)
    val day0 = spark.read.parquet(day0Path)
    val (new0, maybe0, idx0) = bloomAdvanceDay(day0, h, None, 100L)
    assert(new0.count() == 2 && maybe0.count() == 0,
      "first day: everything is new, nothing to verify")

    import scala.reflect.io.Directory
    assert(new Directory(new java.io.File(day0Path)).deleteRecursively(),
      "test setup: day-0 files must be deletable")

    val day1 = Seq((3L, "alpha"), (4L, "charlie")).toDF("doc_id", "text")
    val (new1, maybe1, idx1) = bloomAdvanceDay(day1, h, Some(idx0), 100L)
    assert(new1.select("doc_id").as[Long].collect().toSet == Set(4L))
    assert(maybe1.select("doc_id").as[Long].collect().toSet == Set(3L),
      "the day-0 duplicate must be routed to exact verification")

    // Day 2 duplicates content from day 0 AND day 1 — the carried index
    // must answer for both generations even though neither batch still
    // exists anywhere but inside the bitmap.
    val day2 = Seq((5L, "bravo"), (6L, "charlie"), (7L, "delta")).toDF("doc_id", "text")
    val (new2, maybe2, idx2) = bloomAdvanceDay(day2, h, Some(idx1), 100L)
    assert(new2.select("doc_id").as[Long].collect().toSet == Set(7L))
    assert(maybe2.select("doc_id").as[Long].collect().toSet == Set(5L, 6L))

    // The final index remembers every generation (no false negatives
    // survive any number of unions).
    val all = Seq("alpha", "bravo", "charlie", "delta").toDF("text")
    assert(all.where(BloomIndex.mightContain(idx2, h)).count() == 4)
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
