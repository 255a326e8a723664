package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StreamingNearDup._

/** Incremental LSH near-dup: exact clones and near-clones must pair
  * across micro-batches (state carries the bucket members), unrelated
  * text must not, and the signature must agree with the batch q40
  * pipeline's (same hashes, same minima — the streaming operator is the
  * same math evaluated per-row).
  *
  * Runs against the RocksDB state store provider — the off-heap,
  * spill-capable configuration a large deployment uses — so the suite
  * proves the operator works beyond the default in-memory HDFS store.
  */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val CloneText =
    "the quick brown fox jumps over the lazy dog tonight again and again"
  private val NearCloneText =
    "the quick brown fox jumps over the lazy dog tonight again and tomorrow"

  test("clones and near-clones pair across micro-batches under RocksDB state") {
    implicit val sqlCtx = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Long, String)]
      val pairs = candidates(input.toDF().toDF("doc_id", "text"))
      val q = pairs.writeStream.format("memory").queryName("near_dup_pairs")
        .outputMode("append").start()

      // batch 1: one future-clone, one unrelated doc
      input.addData((1L, CloneText), (2L, "completely different words about silver parquet lakes"))
      q.processAllAvailable()
      assert(spark.table("near_dup_pairs").count() == 0)

      // batch 2: an exact clone of doc 1 and a fresh unrelated doc
      input.addData((3L, CloneText), (4L, "yet another unrelated document body entirely"))
      q.processAllAvailable()
      val got = spark.table("near_dup_pairs").as[Candidate].collect()
      val pairSet = got.map(c => (c.d1, c.d2)).toSet
      assert(pairSet == Set((1L, 3L)), s"got $pairSet")
      assert(got.forall(_.est_jaccard == 1.0), "exact clone must match on every minimum")
      assert(got.forall(!_.bucket_full))

      // batch 3: a near-clone (one token differs) still pairs with doc 1
      input.addData((5L, NearCloneText))
      q.processAllAvailable()
      val all = spark.table("near_dup_pairs").as[Candidate].collect()
      val withNear = all.map(c => (c.d1, c.d2)).toSet
      assert(withNear.contains((1L, 5L)) || withNear.contains((3L, 5L)),
        s"near-clone must collide in at least one band: $withNear")
      q.stop()
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming signature equals the batch fast-path signature") {
    // The banded() signature and the batch minhashLshOn(fastHash) both
    // compute min((h1 + i·h2) mod p) over the doc's shingles with the
    // same xxhash64 base hashes — one per-row, one via groupBy. Any
    // drift between them would make streaming and batch dedup disagree
    // on the same corpus.
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, CloneText), (2L, NearCloneText))
      .toDF("doc_id", "text")
    val sigs = banded(docs).collect()
    assert(sigs.length == 2 * (MinhashSeeds / BandRows), "10 bands per doc")
    // recompute one signature position the slow way: min over per-shingle
    // (h1 + 0*h2) mod p = min(h1)
    val shingleH1 = docs.where(col("doc_id") === 1L)
      .select(explode(graft.functions.TextExprs.shingles(
        graft.functions.TextExprs.tokens(col("text")), ShingleN)).as("sh"))
      .select(pmod(xxhash64(col("sh")), lit(1125899906842597L)).as("h1"))
      .agg(min("h1")).head().getLong(0)
    val sig0 = sigs.filter(_.doc_id == 1L).head.sig.head
    assert(sig0 == shingleH1, "signature position 0 must be min(h1) over shingles")
  }

  test("a bucket past its member cap reports bucket_full instead of growing state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val pairs = candidates(input.toDF().toDF("doc_id", "text"), minEstJaccard = 0.0)
    val q = pairs.writeStream.format("memory").queryName("full_bucket")
      .outputMode("append").start()
    // identical docs all land in the same buckets; ids beyond the cap
    // must see full=true on their emitted candidates
    input.addData((0L until (MaxBucketMembers + 2L)).map(i => (i, CloneText)): _*)
    q.processAllAvailable()
    val got = spark.table("full_bucket").as[Candidate].collect()
    assert(got.nonEmpty)
    val overflowPairs = got.filter(c => c.d2 >= MaxBucketMembers)
    assert(overflowPairs.nonEmpty && overflowPairs.forall(_.bucket_full),
      "members beyond the cap must flag bucket_full")

    // Redelivery of a rejected overflow doc (at-least-once source) must
    // NOT re-emit its candidate pairs: the rejected-id memory gives
    // overflow arrivals the same idempotency members get for free.
    val before = spark.table("full_bucket").count()
    input.addData((MaxBucketMembers + 1L, CloneText))
    q.processAllAvailable()
    assert(spark.table("full_bucket").count() == before,
      "replayed overflow doc must not duplicate its candidate pairs")
    q.stop()
  }
}
