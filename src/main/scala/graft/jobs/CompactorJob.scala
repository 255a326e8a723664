package graft.jobs

import org.apache.spark.sql.SparkSession

import graft.sources.{BronzeReader, SilverWriter}
import graft.state.JdbcStateStore

/** The hourly bronze→silver compaction pipeline (reference entry point
  * §3.1/§3.2: `s3_datalog_processor.py:247-327`,
  * `gzip-to-parquet-etl.py:320-347`):
  *
  *   claim pending keys → read NDJSON.gz batch → enrich (epoch
  *   normalization, WITA, partition keys) → partitioned parquet append →
  *   ack (or release on failure).
  *
  * One source pass per batch (the reference reads twice — count then
  * COPY; see SilverWriter). File-level exactly-once comes from the
  * claim pattern, which also makes re-runs after a crash no-ops for
  * acked keys and retries for released ones.
  */
object CompactorJob {

  case class Result(runId: String, claimed: Int, rows: Long, quarantined: Long)

  def run(
      spark: SparkSession,
      store: JdbcStateStore,
      runId: String,
      district: String,
      target: String,
      keyLimit: Int = 2000): Result = {
    val keys = store.claim(runId, keyLimit, Some(district))
    if (keys.isEmpty) return Result(runId, 0, 0L, 0L) // zero-work gate

    try {
      val bronze = BronzeReader.read(spark, keys).cache()
      try {
        val (clean, corrupt) = BronzeReader.quarantine(bronze)
        val nCorrupt = corrupt.count()
        val enriched = SilverWriter.enrich(clean, district)
        val rows = SilverWriter.write(enriched, target)
        store.ack(runId)
        Result(runId, keys.size, rows, nCorrupt)
      } finally bronze.unpersist()
    } catch {
      case e: Throwable =>
        store.release(runId) // keys become claimable again
        throw e
    }
  }
}
