package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.state.JdbcStateStore

/** The exactly-once foreachBatch sink against its crash matrix: live
  * batches commit once, a replay after commit no-ops, a replay after a
  * partial write overwrites instead of duplicating, and the marker
  * insert is first-caller-wins.
  */
class TransactionalSinkSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(name: String): JdbcStateStore = {
    val s = new JdbcStateStore(s"jdbc:derby:memory:$name;create=true")
    s.ensureTable()
    s
  }

  test("streamed batches land exactly once and replays of committed batches skip") {
    implicit val sqlCtx = spark.sqlContext
    val store = newStore("txsink1")
    val out = tmpDir("txsink")
    val input = MemoryStream[Long]
    val q = TransactionalSink.exactlyOnce(
      input.toDF().toDF("v"), store, "silver", out)
      .option("checkpointLocation", tmpDir("txsink_cp")).start()
    try {
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      input.addData(4L, 5L)
      q.processAllAvailable()
      // batch_id=N reads back as a hive partition column — the reader's
      // natural per-batch provenance, select the payload explicitly
      val rows = spark.read.parquet(out).select("v").as[Long].collect().sorted
      assert(rows.toSeq == Seq(1L, 2L, 3L, 4L, 5L), rows.mkString(","))

      // Replay of a COMMITTED batch (Spark re-invokes foreachBatch after
      // a checkpoint-window crash): must skip, not duplicate.
      val replayed = TransactionalSink.writeBatch(
        Seq(1L, 2L, 3L).toDF("v"), store, "silver", out, batchId = 0L)
      assert(!replayed, "committed batch must report skipped")
      assert(spark.read.parquet(out).count() == 5, "no duplicate rows after replay")
    } finally q.stop()
  }

  test("replay after a PARTIAL write overwrites the torn directory; marker is first-caller-wins") {
    val store = newStore("txsink2")
    val out = tmpDir("txsink_partial")
    // Simulate a crash mid-write: a torn batch directory, NO marker.
    Seq(99L, 98L).toDF("v").write.parquet(s"$out/batch_id=7")
    assert(!store.batchCommitted("silver", 7L))
    val wrote = TransactionalSink.writeBatch(
      Seq(10L, 11L).toDF("v"), store, "silver", out, batchId = 7L)
    assert(wrote, "uncommitted batch must (re)write")
    val rows = spark.read.parquet(s"$out/batch_id=7").as[Long].collect().sorted
    assert(rows.toSeq == Seq(10L, 11L), s"torn rows must vanish: ${rows.mkString(",")}")
    // marker atomicity: the second marker insert loses
    assert(!store.markBatch("silver", 7L))
    assert(store.batchCommitted("silver", 7L))
  }

  test("writes go through atomic rename: no temp dirs survive, final dir is one writer's output") {
    val store = newStore("txsink4")
    val out = tmpDir("txsink_rename")
    val wrote = TransactionalSink.writeBatch(
      Seq(1L, 2L).toDF("v"), store, "silver", out, batchId = 0L)
    assert(wrote)
    val children = new java.io.File(out).listFiles().map(_.getName).toSeq
    assert(children.exists(_ == "batch_id=0"), children.mkString(","))
    assert(!children.exists(_.startsWith(".tmp-")),
      s"temp attempt dirs must be renamed or deleted, got: ${children.mkString(",")}")
    // A zombie writer re-running the same batch AFTER commit: skipped,
    // final dir untouched, still no temp droppings.
    assert(!TransactionalSink.writeBatch(
      Seq(1L, 2L).toDF("v"), store, "silver", out, batchId = 0L))
    assert(spark.read.parquet(s"$out/batch_id=0").count() == 2)
    assert(!new java.io.File(out).listFiles().map(_.getName).exists(_.startsWith(".tmp-")))
  }

  test("racing marker inserts: exactly one caller wins across 16 threads") {
    val store = newStore("txsink3")
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = Executors.newFixedThreadPool(16)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // JDBC connections are not thread-safe; the store serializes at
      // the DB layer via the PK — each thread gets its own store handle
      // on the SAME in-memory database, the real multi-writer shape.
      val wins = Await.result(
        Future.sequence((1 to 16).map { _ =>
          Future {
            val s = new JdbcStateStore("jdbc:derby:memory:txsink3")
            try s.markBatch("silver", 42L) finally s.close()
          }
        }), 30.seconds).count(identity)
      assert(wins == 1, s"exactly one concurrent marker must win, got $wins")
      assert(store.batchCommitted("silver", 42L))
    } finally pool.shutdown()
  }
}
