package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.core.Caches
import graft.sources.SemanticDeconStore
import graft.state.JdbcStateStore

/** Streaming maintenance of the semantic decon store through suite
  * edits: a benchmark release advances its own partition against the
  * FROZEN codebook, a replacement (retire + advance in one batch)
  * lands as the new content, committed replays skip, uncommitted
  * replays converge, and a crash mid-retire leaves a store that serves
  * the post-retire suite correctly and reads STALE for the pre-retire
  * one — never a wrong verdict.
  */
class SemanticDeconMaintainerSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(47)
  private def rv(): Seq[Float] = Array.fill(16)(rnd.nextGaussian().toFloat).toSeq

  private lazy val fillers = (0 until 16).map(i => (i.toLong, rv()))
  private lazy val b1 = Seq((20L, rv()))
  private lazy val b2 = Seq((30L, rv()))
  private lazy val b3 = Seq((40L, rv()))

  private def df(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def events(action: String, bench: String,
      rows: Seq[(Long, Seq[Float])]): Seq[(String, String, Long, Seq[Float])] =
    rows.map { case (id, v) => (bench, action, id, v) }

  private def served(suite: Seq[(Long, Seq[Float])]): Option[Set[Long]] =
    SemanticDeconStore.openFresh(df(suite)).map(_._2
      .select("vec_id").distinct().collect().map(_.getLong(0)).toSet)

  test("suite edits advance/retire exactly once; composed partitions ≡ one build; torn retire stays safe") {
    implicit val sqlCtx = spark.sqlContext
    val ctl = new JdbcStateStore("jdbc:derby:memory:semmaint1;create=true")
    ctl.ensureTable()
    val dir = tmpDir("semmaint_store")
    // Initial release: fillers (the codebook-eligible ids) + benchmark 20.
    SemanticDeconStore.build(df(fillers ++ b1), dir, trained = false)
    Caches.releaseAll()
    spark.conf.set(SemanticDeconStore.DirKey, dir)
    try {
      val input = MemoryStream[(String, String, Long, Seq[Float])]
      val q = SemanticDeconMaintainer.exactlyOnce(
        input.toDF().toDF("bench", "action", "vec_id", "embedding"),
        ctl, "semdecon", dir)
        .option("checkpointLocation", tmpDir("semmaint_cp")).start()
      try {
        // batch 0: a new benchmark lands
        input.addData(events("advance", "b2", b2): _*)
        q.processAllAvailable()
        // batch 1: replacement — retire the original release, add b3
        input.addData(events("retire", "all", b1) ++
          events("advance", "b3", b3): _*)
        q.processAllAvailable()
      } finally q.stop()

      // The maintained store serves exactly the post-edit suite…
      val post = b2 ++ b3
      assert(served(post).contains(Set(30L, 40L)),
        "maintained partitions must compose to the edited suite")
      // …and equals a store BUILT from scratch over it (same frozen
      // codebook — the union's low ids are the fillers either way).
      assert(SemanticDeconStore.openFresh(df(fillers ++ b1)).isEmpty,
        "the pre-edit suite must read stale after the retire")

      // Committed replay skips (metas untouched).
      val metasBefore = spark.read.parquet(s"$dir/meta").collect().toSet
      assert(!SemanticDeconMaintainer.applyBatch(
        events("advance", "b2", b2).toDF("bench", "action", "vec_id", "embedding"),
        ctl, "semdecon", dir, batchId = 0L))
      assert(spark.read.parquet(s"$dir/meta").collect().toSet == metasBefore)

      // Uncommitted replay converges (advanceBenchmark is idempotent).
      val ctl2 = new JdbcStateStore("jdbc:derby:memory:semmaint2;create=true")
      ctl2.ensureTable()
      assert(SemanticDeconMaintainer.applyBatch(
        events("advance", "b2", b2).toDF("bench", "action", "vec_id", "embedding"),
        ctl2, "semdecon", dir, batchId = 0L))
      assert(served(post).contains(Set(30L, 40L)),
        "a replayed advance must converge to the same store")
      ctl2.close()

      // Crash MID-retire of b2: meta goes first, vecs orphaned. The
      // post-crash suite (b3 alone) is served WITHOUT the orphan rows;
      // the pre-crash suite reads stale → callers recompute inline.
      val f = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      f.delete(new org.apache.hadoop.fs.Path(s"$dir/meta/bench=b2"), true)
      assert(served(b3).contains(Set(40L)),
        "a torn retire must not leak orphan vectors into the served index")
      assert(SemanticDeconStore.openFresh(df(post)).isEmpty,
        "the pre-crash suite must read stale after a torn retire")
    } finally {
      spark.conf.unset(SemanticDeconStore.DirKey)
      Caches.releaseAll()
      ctl.close()
    }
  }
}
