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
