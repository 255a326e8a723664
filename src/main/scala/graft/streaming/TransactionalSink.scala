package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.state.JdbcStateStore

/** Exactly-once streaming sink via `foreachBatch` + the control table —
  * the reference's claim/ack pattern applied to micro-batch OUTPUT:
  * Structured Streaming guarantees at-least-once `foreachBatch`
  * invocation (a batch replays after any failure between processing and
  * checkpoint commit), and this sink turns that into exactly-once
  * OBSERVABLE output with two moves:
  *
  *  1. each batch writes to its own `batch_id=N` directory with
  *     overwrite semantics — a replay after a PARTIAL write cleanly
  *     rewrites the same directory instead of appending duplicates;
  *  2. the batch id is then recorded in the control table with an
  *     atomic PRIMARY-KEY insert ([[JdbcStateStore.markBatch]]) — a
  *     replay after a COMPLETE commit sees the marker and skips the
  *     write entirely.
  *
  * Crash matrix: die before the write → replay rewrites; die mid-write
  * → replay overwrites the partial directory; die between write and
  * marker → replay overwrites byte-identically then marks; die after
  * marker → replay no-ops. Every path converges to exactly one
  * committed directory per batch, and a reader that joins directories
  * against committed markers never observes a torn batch.
  *
  * Scale: the marker is one PK insert per MICRO-BATCH (not per row, not
  * per file) on the same store the ingest tier already runs; the data
  * path is an ordinary partitioned parquet write. `foreachBatch` runs
  * on the driver, where the JDBC connection lives.
  */
object TransactionalSink {

  /** Process one micro-batch idempotently; returns true when this call
    * performed the write (false = already-committed replay skipped). */
  def writeBatch(df: DataFrame, store: JdbcStateStore, sinkId: String,
      outDir: String, batchId: Long): Boolean = {
    if (store.batchCommitted(sinkId, batchId)) false
    else {
      // Write to a unique dot-prefixed temp directory, then RENAME into
      // place. A plain `mode("overwrite")` on the final directory is
      // delete + per-task file commits — NOT atomic — so two
      // concurrently-live instances of the same query (zombie old
      // driver racing the restarted one) could interleave task files
      // and leave a MIX of both writers' output. Directory rename is
      // atomic on HDFS/posix, so the final dir is always exactly one
      // writer's complete output; if two zombies race the rename, each
      // swap replaces the WHOLE directory with a complete batch (both
      // render the same batchId, so either winner is correct), and the
      // marker insert still decides the single true return value.
      // Dot-prefixed temp dirs are invisible to parquet readers, so an
      // orphan from a crash mid-write is garbage, never torn data.
      val finalPath = new org.apache.hadoop.fs.Path(s"$outDir/batch_id=$batchId")
      val tmpPath = new org.apache.hadoop.fs.Path(
        s"$outDir/.tmp-batch_id=$batchId-${java.util.UUID.randomUUID()}")
      val fs = finalPath.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
      df.write.mode("overwrite").parquet(tmpPath.toString)
      var renamed = false
      var attempts = 0
      while (!renamed && attempts < 3) { // losing a delete/rename race re-tries
        attempts += 1
        if (fs.exists(finalPath)) fs.delete(finalPath, true)
        renamed = fs.rename(tmpPath, finalPath)
      }
      if (!renamed) {
        fs.delete(tmpPath, true)
        // Couldn't swap in 3 tries — if a racing writer committed the
        // marker meanwhile its complete directory stands and this is a
        // clean replay-skip; otherwise fail the batch so streaming
        // retries rather than silently dropping output.
        if (store.batchCommitted(sinkId, batchId)) false
        else throw new java.io.IOException(
          s"TransactionalSink: rename to $finalPath failed after $attempts attempts")
      } else store.markBatch(sinkId, batchId)
    }
  }

  /** Wire a streaming DataFrame into the exactly-once sink. Caller
    * starts it (and owns checkpointLocation, trigger, etc.). */
  def exactlyOnce(stream: DataFrame, store: JdbcStateStore, sinkId: String,
      outDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (df: DataFrame, batchId: Long) =>
      writeBatch(df, store, sinkId, outDir, batchId)
      ()
    }
}
