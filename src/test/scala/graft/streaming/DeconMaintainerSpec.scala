package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.core.Caches
import graft.sources.DeconStore
import graft.state.JdbcStateStore

/** Streaming maintenance of the GRAM decon store through suite edits:
  * a benchmark release advances its own (fps, grams) partitions, a
  * replacement (retire + advance in one batch) lands as the new
  * content, committed replays skip, uncommitted replays converge, and
  * the store-served gate verdicts equal the inline ones — so suite
  * churn flows into the exact-match eye exactly as it already does
  * into the semantic eye, and the composed gates never read one stale
  * store.
  */
class DeconMaintainerSpec extends SparkSpec {
  import spark.implicits._

  private val passage1 =
    "all rights reserved worldwide under the berne convention and " +
      "no part of this publication may be reproduced without permission "
  private val passage2 =
    "the quick brown fox jumps over the lazy dog while the band plays " +
      "an entirely different forty character tune nobody has heard before "
  private def filler(tag: String, n: Int): String =
    Iterator.from(0).map(i => s"$tag$i ").take(n).mkString.take(n)
      .dropRight(1) + tag.head

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")
  private def events(action: String, bench: String,
      rows: Seq[(Long, String)]): Seq[(String, String, Long, String)] =
    rows.map { case (id, t) => (bench, action, id, t) }

  private lazy val rel1 = Seq((20L, filler("ea", 30) + passage1 + filler("eb", 20)))
  private lazy val rel2 = Seq((30L, filler("ec", 25) + passage2 + filler("ed", 25)))

  test("suite edits advance/retire the gram store exactly once; the gate rides it; replays behave") {
    implicit val sqlCtx = spark.sqlContext
    val ctl = new JdbcStateStore("jdbc:derby:memory:deconmaint1;create=true")
    ctl.ensureTable()
    val dir = tmpDir("deconmaint_store")
    DeconStore.build(df(rel1), dir) // initial release under bench "all"
    Caches.releaseAll()
    spark.conf.set(DeconStore.DirKey, dir)
    try {
      val input = MemoryStream[(String, String, Long, String)]
      val q = DeconMaintainer.exactlyOnce(
        input.toDF().toDF("bench", "action", "doc_id", "text"),
        ctl, "deconmaint", dir)
        .option("checkpointLocation", tmpDir("deconmaint_cp")).start()
      try {
        // batch 0: a new benchmark lands
        input.addData(events("advance", "b2", rel2): _*)
        q.processAllAvailable()
        // batch 1: replacement — the original release is retired (a
        // retire event's doc_id/text are ignored) and b3 re-releases
        // the same passage under a new id
        input.addData(("all", "retire", 0L, ""),
          ("b3", "advance", 40L, rel1.head._2))
        q.processAllAvailable()
      } finally q.stop()

      // The maintained store is fresh for exactly the post-edit suite…
      val post = rel2 ++ Seq((40L, rel1.head._2))
      assert(DeconStore.openFresh(df(post)).isDefined,
        "maintained partitions must compose to the edited suite")
      assert(DeconStore.openFresh(df(rel1)).isEmpty,
        "the pre-edit suite must read stale after the retire")

      // …and the STORE-SERVED gate verdicts equal the inline ones on a
      // train batch leaking each passage (the composed gates read this
      // same path).
      val train = Seq(
        (1L, filler("da", 40) + passage1 + filler("db", 30)), // leaks b3
        (2L, filler("dc", 35) + passage2 + filler("dd", 35)), // leaks b2
        (3L, filler("dz", 120)))                              // clean
      def verdicts(): Map[Long, Boolean] = {
        val out = DeconGate.flag(df(train), df(post)).collect()
          .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
        Caches.releaseAll()
        out
      }
      val served = verdicts()
      spark.conf.unset(DeconStore.DirKey)
      val inline = verdicts()
      spark.conf.set(DeconStore.DirKey, dir)
      assert(served == inline && served == Map(1L -> false, 2L -> false, 3L -> true),
        s"store-served gate verdicts must equal inline: $served vs $inline")

      // Committed replay skips (metas untouched).
      val metasBefore = spark.read.parquet(s"$dir/meta").collect().toSet
      assert(!DeconMaintainer.applyBatch(
        events("advance", "b2", rel2).toDF("bench", "action", "doc_id", "text"),
        ctl, "deconmaint", dir, batchId = 0L))
      assert(spark.read.parquet(s"$dir/meta").collect().toSet == metasBefore)

      // Uncommitted replay converges (advanceBenchmark is idempotent).
      val ctl2 = new JdbcStateStore("jdbc:derby:memory:deconmaint2;create=true")
      ctl2.ensureTable()
      assert(DeconMaintainer.applyBatch(
        events("advance", "b2", rel2).toDF("bench", "action", "doc_id", "text"),
        ctl2, "deconmaint", dir, batchId = 0L))
      assert(DeconStore.openFresh(df(post)).isDefined,
        "a replayed advance must converge to the same store")
      ctl2.close()
    } finally {
      spark.conf.unset(DeconStore.DirKey)
      Caches.releaseAll()
      ctl.close()
    }
  }

  test("an unknown edit action fails LOUD before anything applies and before the marker commits") {
    // The old per-maintainer copies silently dropped unknown actions
    // and then marked the batch committed — the edit was permanently
    // lost behind the exactly-once marker (review r15 finding 1).
    val ctl = new JdbcStateStore("jdbc:derby:memory:deconmaint3;create=true")
    ctl.ensureTable()
    val dir = tmpDir("deconmaint_badaction")
    DeconStore.build(df(rel1), dir)
    Caches.releaseAll()
    val metasBefore = spark.read.parquet(s"$dir/meta").collect().toSet
    val bad = Seq(("b9", "takedown", 0L, ""),
      ("b2", "advance", 30L, rel2.head._2))
      .toDF("bench", "action", "doc_id", "text")
    intercept[IllegalArgumentException] {
      DeconMaintainer.applyBatch(bad, ctl, "deconmaint_bad", dir, batchId = 0L)
    }
    Caches.releaseAll()
    // nothing applied (not even the batch's VALID advance), nothing
    // marked — a redelivery after the producer fix lands the whole edit
    assert(spark.read.parquet(s"$dir/meta").collect().toSet == metasBefore,
      "a rejected batch must apply none of its edits")
    assert(!ctl.batchCommitted("deconmaint_bad", 0L),
      "a rejected batch must stay uncommitted for redelivery")
    assert(DeconMaintainer.applyBatch(
      Seq(("b2", "advance", 30L, rel2.head._2))
        .toDF("bench", "action", "doc_id", "text"),
      ctl, "deconmaint_bad", dir, batchId = 0L),
      "the corrected redelivery must apply")
    ctl.close()
  }
}
