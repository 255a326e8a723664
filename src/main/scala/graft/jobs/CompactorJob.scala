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

  /** Registry key for the telemetry bronze schema. */
  val SchemaDataset = "datalog_bronze"

  def run(
      spark: SparkSession,
      store: JdbcStateStore,
      runId: String,
      district: String,
      target: String,
      keyLimit: Int = 2000,
      relearnSchema: Boolean = false): Result = {
    val keys = store.claim(runId, keyLimit, Some(district))
    if (keys.isEmpty) return Result(runId, 0, 0L, 0L) // zero-work gate

    try {
      // Steady-state path: read with the registry's merged schema — no
      // inference pass, but columns that drift in AFTER registration are
      // invisible until a re-learn (schema-reads ignore unknown JSON
      // fields). The reference re-infers every batch and never misses
      // drift; the cost model here is: steady batches skip the extra
      // scan, and the operator schedules periodic `relearnSchema = true`
      // batches (e.g. daily) to pick up firmware rollouts.
      val bronze = (store.loadSchema(SchemaDataset) match {
        case Some(schema) if !relearnSchema =>
          BronzeReader.read(spark, keys, BronzeReader.withCorruptColumn(schema))
        case _ =>
          val inferred = BronzeReader.read(spark, keys)
          store.mergeSchema(SchemaDataset,
            org.apache.spark.sql.types.StructType(
              inferred.schema.filterNot(f =>
                f.name == BronzeReader.CorruptCol || f.name == "source_file")))
          inferred
      }).cache()
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
