package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q77/q78 semantics the sf0.01 oracle rows can't demonstrate by hand:
  * the exact commonness arithmetic on a corpus built to make the rare
  * threshold fire, and the weighted top-k agreeing with a full
  * window-sort reference (the bounded-buffer aggregate must select and
  * order identically, ties included).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("q77 commonness: exact arithmetic on a corpus with a genuinely rare token") {
    // 50 docs of 4×'c' (200 occurrences) + one doc "c r": f(c)=201,
    // f(r)=1, total=202. Rare iff f*200 <= total → only 'r'.
    val docRel = ((1L to 50L).map(i => (i, "c c c c")) :+ (51L, "c r"))
      .toDF("doc_id", "text")
    val rows = TextQueries.commonnessOn(docRel).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 51: sum_f = 201 + 1 = 202 → 202/2/202 = 0.5, one rare occurrence
    assert(rows(51L) == ((2L, 1L, 0.5)), s"got ${rows(51L)}")
    // bulk docs: 4·201/4/202 = 201/202 ≈ 0.995050 (round half-up at 1e-6)
    assert(rows(1L) == ((4L, 0L, 0.99505)), s"got ${rows(1L)}")
    assert(rows.values.forall(v => v._3 > 0 && v._3 <= 1.0))
    graft.core.Caches.releaseAll()
  }

  test("q78 weighted sample: bounded top-k agrees with the full window-sort reference") {
    // 30 docs over 2 langs, n_chars spanning the weight ladder 1..6.
    val docRel = (1L to 30L)
      .map(i => (i, if (i % 2 == 0) "en" else "de", s"t$i", 48L + i * 17L))
      .toDF("doc_id", "lang", "text", "n_chars")
    val got = SamplingQueries.q78WeightedSampleOn(docRel)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // Reference: identical draw expressions, selection by window sort.
    val d = docRel.select(col("lang"), col("doc_id"),
      least(floor(col("n_chars") / 100) + 1, lit(8)).cast("int").as("w"))
    val prio = d
      .select(col("lang"), col("doc_id"), explode(sequence(lit(0), col("w") - 1)).as("i"))
      .select(col("lang"), col("doc_id"),
        conv(substring(md5(concat(col("doc_id").cast("string"), lit("#"),
          col("i").cast("string")).cast("binary")), 1, 8), 16, 10)
          .cast("long").as("u"))
      .groupBy("lang", "doc_id").agg(max("u").as("prio"))
    val expect = prio
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("prio").desc, col("doc_id"))))
      .where(col("rn") <= 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3).toLong, r.getLong(2)))

    assert(got.toSet == expect.toSet,
      s"aggregate selection diverged from window reference: " +
        s"missing=${expect.toSet -- got.toSet} extra=${got.toSet -- expect.toSet}")
    assert(got.groupBy(_._1).forall(_._2.length == 5), "exactly k rows per group")
    graft.core.Caches.releaseAll()
  }

  test("q78 weight ladder: max-of-w-hashes makes heavier docs win proportionally") {
    // Same content-length for every doc so ONLY the weight differs: docs
    // 1..400 weight 1, docs 401..500 weight 8 (via n_chars). Expected
    // win share for the heavy 20%: 800/1200 = 2/3. The draw is a fixed
    // hash, so this is a deterministic regression pin, not a flaky
    // statistical test — recorded share asserted with wide margins.
    val docRel = (1L to 500L)
      .map(i => (i, "xx", s"t$i", if (i > 400) 999L else 1L))
      .toDF("doc_id", "lang", "text", "n_chars")
    val winners = SamplingQueries.q78WeightedSampleOn(docRel)
      .select("doc_id").as[Long].collect()
    val heavy = winners.count(_ > 400)
    assert(winners.length == 5)
    assert(heavy >= 2,
      s"heavy docs (expected ~2/3 of slots) won only $heavy of 5 slots")
    graft.core.Caches.releaseAll()
  }

  test("q86 epoch shuffle: matches a driver-side md5 reference permutation exactly") {
    // Replicate the salted-hash priority in plain Scala and derive the
    // expected (shard, ord) for every doc — the distributed row_number
    // over per-shard priority order must reproduce it bit-for-bit
    // (pins both the md5 portability and the window ordering).
    def u(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id#ep0".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(8), 16)
    }
    val ids = (1L to 200L).toSeq
    val expected = ids.map(i => (i, u(i)))
      .groupBy(_._2 % SamplingQueries.ShuffleShards)
      .flatMap { case (shard, rows) =>
        rows.sortBy { case (id, pri) => (pri, id) }.zipWithIndex
          .map { case ((id, _), k) => id -> ((shard, k + 1L)) }
      }
    val docRel = ids.map(i => (i, s"t$i")).toDF("doc_id", "text")
    val got = SamplingQueries.q86EpochShuffleOn(docRel).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  // ----------------------------------------------------------- q137
  test("q137: temperature < 1 downweights the head, boosts the tail, keeps the ranking") {
    // 80/20 token split: p = (0.8, 0.2); τ=0.7 → pt = (0.855, 0.324),
    // weights ≈ (0.725, 0.275): the head is still the head, but its
    // boost dips below 1 while the tail's rises above.
    val d = (Seq.fill(8)(("big", "a b c d e f g h i j")) ++
      Seq.fill(2)(("small", "a b c d e f g h i j")))
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, t, s) }
      .toDF("doc_id", "text", "source")
    val got = SamplingQueries.tempMixtureOn(d).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    graft.core.Caches.releaseAll()
    val (nBig, pBig, wBig, bBig) = got("big")
    val (nSmall, pSmall, wSmall, bSmall) = got("small")
    assert(nBig == 80L && nSmall == 20L, got.toString)
    assert(pBig == 0.8 && pSmall == 0.2, got.toString)
    assert(math.abs(wBig + wSmall - 1.0) < 2e-6, s"weights must normalize: $got")
    assert(wBig > wSmall, s"temperature 0.7 preserves the ranking: $got")
    assert(bBig < 1.0 && bSmall > 1.0, s"head damped, tail boosted: $got")
    val expectedWBig = math.pow(0.8, 0.7) / (math.pow(0.8, 0.7) + math.pow(0.2, 0.7))
    assert(math.abs(wBig - expectedWBig) < 1e-5, s"$wBig vs $expectedWBig")
  }
}
