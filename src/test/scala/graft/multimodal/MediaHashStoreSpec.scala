package graft.multimodal

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.core.Caches
import graft.operators.MediaQueries
import graft.sources.MediaHashStore

/** Takedown parity for the image dHash index: day-partitioned
  * maintenance with the same XOR-digest algebra as SignatureStore —
  * retiring a day serves probes EXACTLY as an index rebuilt without
  * that day, with zero image decodes.
  */
class MediaHashStoreSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(rows: (Long, String)*): DataFrame = {
    val df = rows.toSeq.map { case (id, t) =>
      (id, MediaDedup.renderImage(t))
    }.toDF("media_id", "content")
    MediaDedup.hashImages(df)
  }

  // day 0 and day 1 each contain one near-dup of a fresh image
  // (identical caption → identical render → Hamming 0).
  private def day0 = hashed(
    (10L, "a red barn beside a quiet country road at dawn with mist"),
    (11L, "an entirely unrelated picture of machinery in a factory hall"))
  private def day1 = hashed(
    (20L, "a small boat crossing a calm lake under an overcast sky"),
    (21L, "yet another unrelated frame of dense city traffic at night"))
  private def fresh = hashed(
    (1L, "a red barn beside a quiet country road at dawn with mist"),
    (2L, "a small boat crossing a calm lake under an overcast sky"))

  private def probePairs(idx: DataFrame): Set[(Long, Long)] = {
    val out = MediaDedup.nearDupProbe(fresh, idx, MediaQueries.MaxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Caches.releaseAll()
    out
  }

  test("advance appends days; retire serves probes as if the day never existed") {
    val dir = tmpDir("mediastore")
    MediaHashStore.build(day0, dir, day = 0)
    MediaHashStore.advanceDay(day1, dir, day = 1)

    // The composed index finds both cross-day pairs.
    val both = probePairs(MediaHashStore.open(spark, dir))
    assert(both.contains((1L, 10L)) && both.contains((2L, 20L)), both.toString)

    // Retire day 0 (takedown): the probe result equals a probe against
    // an index REBUILT from day 1 alone — no decode, no rebuild.
    MediaHashStore.retireDay(spark, dir, day = 0)
    val retired = probePairs(MediaHashStore.open(spark, dir))
    val rebuiltDir = tmpDir("mediastore_rebuilt")
    MediaHashStore.build(day1, rebuiltDir, day = 1)
    assert(retired == probePairs(MediaHashStore.open(spark, rebuiltDir)),
      "retired-day probe must equal a from-scratch index without that day")
    assert(!retired.exists(_._2 == 10L), "the retired day's media must be unfindable")

    // advanceDay is convergent under replay: re-advancing day 1 leaves
    // the index (and its digest check) intact.
    MediaHashStore.advanceDay(day1, dir, day = 1)
    assert(probePairs(MediaHashStore.open(spark, dir)) == retired)
  }

  test("open verifies the meta digest against the stored partitions") {
    val dir = tmpDir("mediastore_torn")
    MediaHashStore.build(day0, dir)
    MediaHashStore.advanceDay(day1, dir, day = 1)
    // Tamper: drop one data partition but keep its meta row.
    val fsys = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fsys.delete(new org.apache.hadoop.fs.Path(s"$dir/hashes/day=0"), true)
    intercept[Exception] { MediaHashStore.open(spark, dir).count() }
    // Trusted fast path: same store, verification explicitly skipped —
    // the probe deployment's lever when integrity is guaranteed
    // upstream. It serves whatever partitions remain, no index scan.
    spark.conf.set(MediaHashStore.TrustKey, "true")
    try assert(MediaHashStore.open(spark, dir).count() == day1.count())
    finally spark.conf.unset(MediaHashStore.TrustKey)
  }

  test("retiring the last live day serves an empty index, not a schema error") {
    val dir = tmpDir("mediastore_empty")
    MediaHashStore.build(day0, dir)
    MediaHashStore.retireDay(spark, dir, day = 0)
    val idx = MediaHashStore.open(spark, dir)
    assert(idx.columns.toSeq == Seq("media_id", "dhash"))
    assert(idx.count() == 0)
    assert(probePairs(idx).isEmpty)
  }

  test("sourced face: openFreshFor serves on a caption-digest match, reads stale on source drift, and ignores orphan days") {
    import spark.implicits._
    val src0 = Seq(
      (10L, "a red barn beside a quiet country road at dawn with mist"),
      (11L, "an entirely unrelated picture of machinery in a factory hall"))
    val src1 = Seq(
      (20L, "a small boat crossing a calm lake under an overcast sky"))
    def sdf(rows: Seq[(Long, String)]) = rows.toDF("media_id", "text")
    val dir = tmpDir("mediastore_sourced")
    MediaHashStore.buildSourced(sdf(src0), hashed(src0: _*), dir, day = 0)
    MediaHashStore.advanceDaySourced(sdf(src1), hashed(src1: _*), dir, day = 1)
    spark.conf.set(MediaHashStore.DirKey, dir)
    try {
      // fresh for the exact union source, byte-identical hashes served
      val served = MediaHashStore.openFreshFor(sdf(src0 ++ src1))
      assert(served.isDefined, "store must be fresh for its own source days")
      val inline = hashed((src0 ++ src1): _*).collect().map(_.toString).toSet
      assert(served.get.collect().map(_.toString).toSet == inline,
        "served hashes must equal the inline render+hash, zero decodes paid")

      // one edited caption → digest drift → inline fallback, never a
      // stale pair
      val drifted = src0.updated(0, (10L, "a red barn EDITED at dusk")) ++ src1
      assert(MediaHashStore.openFreshFor(sdf(drifted)).isEmpty,
        "an edited caption must read stale")
      // TrustKey alone no longer skips freshness (ADVICE r15: the
      // integrity and freshness levers are split — a trusted store may
      // still be STALE, and staleness is a silent decon miss)…
      spark.conf.set(MediaHashStore.TrustKey, "true")
      try assert(MediaHashStore.openFreshFor(sdf(drifted)).isEmpty,
        "TrustKey must not skip the caption-digest freshness check")
      finally spark.conf.unset(MediaHashStore.TrustKey)
      // …freshness-skipping needs its OWN explicit lever
      spark.conf.set(MediaHashStore.TrustFreshKey, "true")
      try assert(MediaHashStore.openFreshFor(sdf(drifted)).isDefined)
      finally spark.conf.unset(MediaHashStore.TrustFreshKey)

      // a crashed advance (hashes/meta written, source meta NOT — the
      // sourced face's commit point is the source meta) leaves an
      // orphan day invisible: the pre-crash source still opens and the
      // orphan rows are not served
      hashed((30L, "yet another unrelated frame of dense city traffic at night"))
        .withColumn("day", org.apache.spark.sql.functions.lit(9))
        .write.partitionBy("day").mode("append").parquet(s"$dir/hashes")
      val afterOrphan = MediaHashStore.openFreshFor(sdf(src0 ++ src1))
      assert(afterOrphan.isDefined, "pre-crash source must still open")
      assert(!afterOrphan.get.collect().exists(_.getLong(0) == 30L),
        "the orphan day must not be served")
      // the replayed advance converges: retire-then-write, then serve
      MediaHashStore.advanceDaySourced(
        sdf(Seq((30L, "caption thirty"))), hashed((30L, "caption thirty")), dir, day = 9)
      val repaired = MediaHashStore.openFreshFor(
        sdf(src0 ++ src1 ++ Seq((30L, "caption thirty"))))
      assert(repaired.isDefined &&
        repaired.get.collect().count(_.getLong(0) == 30L) == 1,
        "a replayed advance must converge and serve the day exactly once")

      // an EMPTY ingest day advances like every sibling store's — no
      // crash on the absent partition, zero digest contribution, the
      // store stays fresh for the unchanged source (review r15)
      MediaHashStore.advanceDaySourced(
        sdf(Seq.empty), Seq.empty[(Long, Long)].toDF("media_id", "dhash"),
        dir, day = 12)
      assert(MediaHashStore.openFreshFor(
        sdf(src0 ++ src1 ++ Seq((30L, "caption thirty")))).isDefined,
        "an empty advanced day must not unfreshen or crash the store")

      // retire heals the source meta too: day 1's takedown serves day 0
      // + 9 only, and the retired source reads stale
      MediaHashStore.retireDay(spark, dir, day = 1)
      assert(MediaHashStore.openFreshFor(
        sdf(src0 ++ Seq((30L, "caption thirty")))).isDefined,
        "post-takedown source must open without the retired day")
      assert(MediaHashStore.openFreshFor(
        sdf(src0 ++ src1 ++ Seq((30L, "caption thirty")))).isEmpty,
        "the retired day's source must read stale")
    } finally {
      spark.conf.unset(MediaHashStore.DirKey)
      graft.core.Caches.releaseAll()
    }
  }

  test("q197 dispatches through the sourced store: served pairs equal inline; an unconfigured session hashes inline") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val inline = MediaQueries.q197MediaDecon(spark, sf).collect()
      .map(_.toString).toSet
    Caches.releaseAll()
    // Build the sourced store from the exact train relation q197
    // derives (eligible docs, train split) — a real deployment's
    // ingest-time build.
    val train = spark.read.parquet(s"$sf/documents.parquet")
      .filter(length(col("text")) >= 50)
      .select(col("doc_id").as("media_id"), col("text"))
      .where(col("media_id") % 10 =!= 0)
    import spark.implicits._
    val trainHashes = MediaDedup.hashImages(
      train.as[(Long, String)]
        .map { case (id, t) => (id, MediaDedup.renderImage(t)) }
        .toDF("media_id", "content"))
    val dir = tmpDir("mediastore_q197")
    MediaHashStore.buildSourced(train, trainHashes, dir)
    Caches.releaseAll()
    spark.conf.set(MediaHashStore.DirKey, dir)
    try {
      assert(MediaHashStore.openFreshFor(train).isDefined,
        "the store must be fresh for q197's own train relation")
      val served = MediaQueries.q197MediaDecon(spark, sf).collect()
        .map(_.toString).toSet
      assert(served == inline,
        "q197 through the sourced store must equal the inline derivation")
    } finally {
      spark.conf.unset(MediaHashStore.DirKey)
      Caches.releaseAll()
    }
  }

  test("zero-meta with orphan day partitions is torn, not an empty index") {
    // A crashed advanceDay (hashes written, meta row not) after every
    // prior day was retired leaves a zero-sum meta over live data —
    // serving the empty index would silently drop dedup candidates.
    val dir = tmpDir("mediastore_orphan")
    MediaHashStore.build(day0, dir)
    MediaHashStore.retireDay(spark, dir, day = 0)
    day1.withColumn("day", org.apache.spark.sql.functions.lit(2))
      .write.partitionBy("day").mode("append").parquet(s"$dir/hashes")
    intercept[Exception] { MediaHashStore.open(spark, dir).count() }
    // the trusted lever still opts out of the check
    spark.conf.set(MediaHashStore.TrustKey, "true")
    try assert(MediaHashStore.open(spark, dir).count() == 0)
    finally spark.conf.unset(MediaHashStore.TrustKey)
  }
}
