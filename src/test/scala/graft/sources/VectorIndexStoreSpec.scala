package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SimilarityQueries

/** The IVF index store's maintenance contract: day advance assigns
  * only its batch against the FROZEN stored codebook, retire
  * XOR-heals, freshness covers both the index digest and the
  * codebook, the probe rides the store byte-identically, and a fully
  * retired store serves an empty index rather than a schema error.
  */
class VectorIndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private val sf0001 = "/root/testdata/sf0.001"

  private def emb: DataFrame =
    spark.read.parquet(s"$sf0001/embeddings.parquet")

  private def assignSet(df: DataFrame): Set[(Long, Long)] =
    df.select("n_id", "bkt").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("probe rides a fresh store byte-identically; stale index or codebook falls back") {
    val e = emb
    val idx = e.where(pmod(col("vec_id"), lit(5)) =!= 0)
    val inline = SimilarityQueries.q139IvfProbe(spark, sf0001).collect()
      .map(_.toString).toSet
    val dir = tmpDir("vectorstore")
    VectorIndexStore.build(e, idx, dir)
    spark.conf.set(VectorIndexStore.DirKey, dir)
    try {
      assert(VectorIndexStore.openFresh(e, idx).isDefined,
        "store must be fresh for its own (corpus, index)")
      val stored = SimilarityQueries.q139IvfProbe(spark, sf0001).collect()
        .map(_.toString).toSet
      assert(stored == inline,
        "the store-served probe must reproduce the inline result exactly")

      // index mutation (same count): digest catches it
      val mutated = idx.withColumn("embedding",
        when(col("vec_id") === 17L,
          transform(col("embedding"), x => x * lit(2.0f)))
          .otherwise(col("embedding")))
      assert(VectorIndexStore.openFresh(e, mutated).isEmpty,
        "index digest must catch vector mutation")

      // codebook drift: same index side, different corpus low-ids
      val corpusDrift = e.withColumn("embedding",
        when(col("vec_id") === 3L,
          transform(col("embedding"), x => x * lit(2.0f)))
          .otherwise(col("embedding")))
      assert(VectorIndexStore.openFresh(corpusDrift, idx).isEmpty,
        "codebook comparison must catch quantizer drift")
    } finally spark.conf.unset(VectorIndexStore.DirKey)
  }

  test("PQ face: q82 rides the stored compressed index exactly; advance ≡ build; stale falls back") {
    val e = emb
    val inline = SimilarityQueries.ivfPqTopK(spark, sf0001).collect()
      .map(_.toString).toSet
    graft.core.Caches.releaseAll()
    val dir = tmpDir("pqstore")
    VectorIndexStore.buildPq(e, dir)
    spark.conf.set(VectorIndexStore.DirKey, dir)
    try {
      assert(VectorIndexStore.openFreshPq(e).isDefined,
        "PQ store must be fresh for its own corpus")
      val stored = SimilarityQueries.ivfPqTopK(spark, sf0001).collect()
        .map(_.toString).toSet
      graft.core.Caches.releaseAll()
      assert(stored == inline,
        "q82 through the stored codes must equal the inline derivation")

      // two-day advance against the frozen codebooks ≡ the one-shot build
      val dir2 = tmpDir("pqstore_incr")
      val day0 = e.where(col("vec_id") % 2 === 1)
      val day1 = e.where(col("vec_id") % 2 === 0)
      // codebooks must come from the FULL corpus for q82 parity — build
      // with the corpus, then replace the day with incremental advances
      VectorIndexStore.buildPq(e, dir2, day = 0)
      VectorIndexStore.retireDay(spark, dir2, 0)
      VectorIndexStore.advanceDayPq(day0, dir2, day = 1)
      VectorIndexStore.advanceDayPq(day1, dir2, day = 2)
      spark.conf.set(VectorIndexStore.DirKey, dir2)
      assert(VectorIndexStore.openFreshPq(e).isDefined,
        "XOR-composed day digests must cover the union")
      val incr = SimilarityQueries.ivfPqTopK(spark, sf0001).collect()
        .map(_.toString).toSet
      graft.core.Caches.releaseAll()
      assert(incr == inline, "incremental PQ days must serve the same index")

      // stale: a mutated corpus recomputes inline (same answer for the
      // offered corpus, never stale codes)
      val mutated = e.withColumn("embedding",
        when(col("vec_id") === 21L,
          transform(col("embedding"), x => x * lit(2.0f)))
          .otherwise(col("embedding")))
      assert(VectorIndexStore.openFreshPq(mutated).isEmpty,
        "digest must catch corpus mutation")
    } finally {
      spark.conf.unset(VectorIndexStore.DirKey)
      graft.core.Caches.releaseAll()
    }
  }

  test("advance/retire: incremental days ≡ one build; the codebook stays frozen") {
    val e = emb
    val idx = e.where(pmod(col("vec_id"), lit(5)) =!= 0)
    val day0 = idx.where(col("vec_id") % 2 === 1)
    val day1 = idx.where(col("vec_id") % 2 === 0)
    val dir = tmpDir("vectorstore_incr")
    VectorIndexStore.build(e, day0, dir, day = 0)
    VectorIndexStore.advanceDay(day1, dir, day = 1)

    val dirFull = tmpDir("vectorstore_full")
    VectorIndexStore.build(e, idx, dirFull)

    spark.conf.set(VectorIndexStore.DirKey, dir)
    try {
      val opened = VectorIndexStore.openFresh(e, idx)
      assert(opened.isDefined, "XOR-composed day digests must cover the union")
      val (cents, assign) = opened.get
      spark.conf.set(VectorIndexStore.DirKey, dirFull)
      val (cents2, assign2) = VectorIndexStore.openFresh(e, idx).get
      assert(cents == cents2, "codebook must be the same frozen artifact")
      assert(assignSet(assign) == assignSet(assign2),
        "two-day advance must equal the one-shot build")

      // frozen-quantizer invariant: day1's batch contains vec_ids < 16
      // (a would-be different codebook source); its stored assignments
      // must come from the BUILD-time codebook, not a batch-local one
      val expected = assignSet(SimilarityQueries.ivfAssign(day1, cents))
      spark.conf.set(VectorIndexStore.DirKey, dir)
      val day1Stored = assignSet(VectorIndexStore.openFresh(e, idx).get._2)
        .filter(p => expected.exists(_._1 == p._1))
      assert(day1Stored == expected, "advance must assign against the stored codebook")

      // retire day1: fresh for day0 alone, stale for the union
      VectorIndexStore.retireDay(spark, dir, 1)
      assert(VectorIndexStore.openFresh(e, day0).isDefined)
      assert(VectorIndexStore.openFresh(e, idx).isEmpty)

      // retire the last day: empty index for an empty offered relation
      VectorIndexStore.retireDay(spark, dir, 0)
      val empty = idx.where(lit(false))
      val openedEmpty = VectorIndexStore.openFresh(e, empty)
      assert(openedEmpty.isDefined, "zero live days + empty index = legal empty store")
      assert(openedEmpty.get._2.count() == 0)
      assert(VectorIndexStore.openFresh(e, idx).isEmpty,
        "an empty store is stale for a non-empty index")
    } finally spark.conf.unset(VectorIndexStore.DirKey)
  }

  test("scaled-K face: q188 rides the stored √N index byte-identically; growth and mutation read stale; advance ≡ build") {
    val e = emb
    val idx = e.where(pmod(col("vec_id"), lit(5)) =!= 0)
    val inline = SimilarityQueries.q188IvfScaled(spark, sf0001).collect()
      .map(_.toString).toSet
    graft.core.Caches.releaseAll()
    val dir = tmpDir("vectorstore_scaled")
    VectorIndexStore.buildScaled(e, idx, dir, trained = false)
    spark.conf.set(VectorIndexStore.DirKey, dir)
    try {
      assert(VectorIndexStore.openFreshScaled(e, idx).isDefined,
        "scaled face must be fresh for its own (corpus, index)")
      val stored = SimilarityQueries.q188IvfScaled(spark, sf0001).collect()
        .map(_.toString).toSet
      graft.core.Caches.releaseAll()
      assert(stored == inline,
        "the store-served scaled probe must reproduce the inline result exactly")

      // index mutation (same count): the digest catches it
      val mutated = idx.withColumn("embedding",
        when(col("vec_id") === 17L,
          transform(col("embedding"), x => x + lit(1.0f)))
          .otherwise(col("embedding")))
      assert(VectorIndexStore.openFreshScaled(e, mutated).isEmpty,
        "a mutated index must read stale")

      // corpus growth changes ⌈√N⌉ → the implied codebook differs →
      // stale, forcing the retrain (the Faiss rebuild event)
      val grown = e.unionByName(e.withColumn("vec_id", col("vec_id") + 100000L))
      assert(VectorIndexStore.openFreshScaled(grown, idx).isEmpty,
        "a corpus past its build-time √N must read stale")

      // two-day advance against the FROZEN scaled codebook ≡ one build
      val day0 = idx.where(col("vec_id") % 2 === 1)
      val day1 = idx.where(col("vec_id") % 2 === 0)
      val dirIncr = tmpDir("vectorstore_scaled_incr")
      VectorIndexStore.buildScaled(e, day0, dirIncr, day = 0, trained = false)
      VectorIndexStore.advanceDayScaled(day1, dirIncr, day = 1)
      spark.conf.set(VectorIndexStore.DirKey, dirIncr)
      val incr = VectorIndexStore.openFreshScaled(e, idx)
      assert(incr.isDefined, "XOR-composed scaled-day digests must cover the union")
      spark.conf.set(VectorIndexStore.DirKey, dir)
      val full = VectorIndexStore.openFreshScaled(e, idx).get
      assert(incr.get._1 == full._1, "scaled codebook must be the same frozen artifact")
      def aset(df: org.apache.spark.sql.DataFrame) =
        df.select("vec_id", "bkt").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(aset(incr.get._2) == aset(full._2),
        "two-day scaled advance must equal the one-shot build")

      // orphan-day hazard (ADVICE r13): a crashed advanceDayScaled
      // writes assign_scaled/day=N but never its meta row. A reader
      // offering the PRE-advance index passes the digest check (the
      // meta still describes exactly that index) — it must be served
      // ONLY the live-meta days, never the orphan's extra neighbors.
      val orphan = e.where(pmod(col("vec_id"), lit(5)) === 0)
      graft.operators.SimilarityQueries
        .scaledAssign(orphan, VectorIndexStore.storedScaledCodebook(spark, dirIncr))
        .withColumn("day", lit(7))
        .write.mode("append").partitionBy("day").parquet(s"$dirIncr/assign_scaled")
      spark.conf.set(VectorIndexStore.DirKey, dirIncr)
      val afterOrphan = VectorIndexStore.openFreshScaled(e, idx)
      assert(afterOrphan.isDefined,
        "the pre-advance index is still exactly covered by the live metas")
      assert(aset(afterOrphan.get._2) == aset(full._2),
        "an orphan day (partition without meta) must not be served")
    } finally {
      spark.conf.unset(VectorIndexStore.DirKey)
      graft.core.Caches.releaseAll()
    }
  }

  test("scaled-PQ face: q195 rides the stored compressed index exactly; advance ≡ build; stale falls back") {
    val e = emb
    val inline = SimilarityQueries.q195IvfPqScaled(spark, sf0001).collect()
      .map(_.toString).toSet
    graft.core.Caches.releaseAll()
    val dir = tmpDir("pqstore_scaled")
    VectorIndexStore.buildPqScaled(e, e, dir, trained = false)
    // One build, ONE encode: the self-indexing build must reuse the
    // artifact pass's codes (same reference), never re-run the N·√N
    // assignment + subvector explode (VERDICT r15 next-4).
    assert(VectorIndexStore.lastPqBuildReusedCodes.get(),
      "a same-reference build must reuse the artifact codes")
    spark.conf.set(VectorIndexStore.DirKey, dir)
    try {
      assert(VectorIndexStore.openFreshPqScaled(e, e).isDefined,
        "scaled-PQ store must be fresh for its own corpus")
      val stored = SimilarityQueries.q195IvfPqScaled(spark, sf0001).collect()
        .map(_.toString).toSet
      graft.core.Caches.releaseAll()
      assert(stored == inline,
        "q195 through the stored scaled codes must equal the inline derivation")

      // two-day advance against BOTH frozen codebooks ≡ the one-shot
      // build (codebooks from the FULL corpus, then day replacement)
      val dir2 = tmpDir("pqstore_scaled_incr")
      VectorIndexStore.buildPqScaled(e, e, dir2, day = 0, trained = false)
      VectorIndexStore.retireDayPqScaled(spark, dir2, 0)
      VectorIndexStore.advanceDayPqScaled(e.where(col("vec_id") % 2 === 1), dir2, day = 1)
      VectorIndexStore.advanceDayPqScaled(e.where(col("vec_id") % 2 === 0), dir2, day = 2)
      spark.conf.set(VectorIndexStore.DirKey, dir2)
      assert(VectorIndexStore.openFreshPqScaled(e, e).isDefined,
        "XOR-composed scaled-PQ day digests must cover the union")
      val incr = SimilarityQueries.q195IvfPqScaled(spark, sf0001).collect()
        .map(_.toString).toSet
      graft.core.Caches.releaseAll()
      assert(incr == inline, "incremental scaled-PQ days must serve the same index")

      // MAINTENANCE stays servable (review r14 finding 1): a day of NEW
      // vectors advances against the frozen codebooks, and a reader
      // offering (build corpus, grown index) reads FRESH — the codes
      // changing is maintenance, not staleness — while the grown index
      // offered as the codebook corpus reads stale (the retrain event).
      val newDay = e.withColumn("vec_id", col("vec_id") + 500000L)
      VectorIndexStore.advanceDayPqScaled(newDay, dir2, day = 3)
      val grown = e.unionByName(newDay)
      val grownOpen = VectorIndexStore.openFreshPqScaled(e, grown)
      assert(grownOpen.isDefined,
        "an advanced day of new vectors must stay servable against the build corpus")
      assert(grownOpen.get._3.select("vec_id").distinct().count() == 2 * e.count(),
        "the served codes must cover the grown index")
      assert(VectorIndexStore.openFreshPqScaled(grown, grown).isEmpty,
        "a grown CODEBOOK corpus must read stale (forcing the retrain)")
      VectorIndexStore.retireDayPqScaled(spark, dir2, 3)
      assert(VectorIndexStore.openFreshPqScaled(e, e).isDefined,
        "takedown of the advanced day restores freshness for the original index")
      // an EMPTY ingest day advances like every sibling store's —
      // no crash, zero digest contribution, store still fresh
      VectorIndexStore.advanceDayPqScaled(e.where(lit(false)), dir2, day = 4)
      assert(VectorIndexStore.openFreshPqScaled(e, e).isDefined,
        "an empty advanced day must not unfreshen or crash the store")
      graft.core.Caches.releaseAll()

      // stale: a mutated corpus digests differently on BOTH checks
      val mutated = e.withColumn("embedding",
        when(col("vec_id") === 21L,
          transform(col("embedding"), x => x * lit(2.0f)))
          .otherwise(col("embedding")))
      assert(VectorIndexStore.openFreshPqScaled(mutated, mutated).isEmpty,
        "digest must catch corpus mutation")
    } finally {
      spark.conf.unset(VectorIndexStore.DirKey)
      graft.core.Caches.releaseAll()
    }
  }
}
