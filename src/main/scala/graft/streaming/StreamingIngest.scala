package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.sources.SilverWriter

/** Structured Streaming flavor of the ingest pipeline (SURVEY §2.10).
  *
  * The reference is micro-batch by polling (`while True: main();
  * sleep(3600)` — `gzip-to-parquet-etl.py:345-347`); the streaming
  * equivalents:
  *  - hourly poll        → `Trigger.ProcessingTime("1 hour")`
  *  - backfill-to-drain  → `Trigger.AvailableNow`
  *  - file-level exactly-once (the MSSQL claim pattern) → the file
  *    source's checkpoint; a processed file is never re-read.
  *
  * The write stays `foreachBatch` + the batch SilverWriter: the
  * reference never drops late data (device clocks can be days off —
  * §2.10), so the partitioned append must not be a watermarked
  * streaming aggregation. Watermarks appear only in the live dashboard
  * aggregate, where dropping ancient updates is acceptable.
  */
object StreamingIngest {

  /** Start the bronze→silver streaming ingest. `availableNow = true`
    * processes the backlog and drains (the reference's BOOST mode);
    * false polls on `interval`. */
  def start(
      spark: SparkSession,
      bronzeDir: String,
      schema: StructType,
      target: String,
      checkpoint: String,
      district: String,
      availableNow: Boolean = true,
      interval: String = "1 hour"): StreamingQuery = {
    val stream = spark.readStream
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(bronzeDir)
      .withColumn("source_file", input_file_name())

    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(interval))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val clean =
          if (batch.columns.contains("_corrupt_record"))
            batch.where(col("_corrupt_record").isNull).drop("_corrupt_record")
          else batch
        SilverWriter.write(SilverWriter.enrich(clean, district), target)
        () // zero-row batches write nothing (SilverWriter gate)
      }
      .start()
  }

  /** The dashboard's per-minute tumbling aggregation (reference A3,
    * `streamlit-app.py:155-169`) as a live streaming aggregate:
    * identical groupBy(window, keys) shape, plus a watermark — the one
    * place late-data dropping is acceptable (display only). */
  def perMinuteLive(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("datetime_wita", watermark)
      .groupBy(
        window(col("datetime_wita"), "1 minute"),
        col("unitno"), col("dstrct_code"))
      .agg(
        graft.functions.AggExprs.decAvg(col("gpsspeed")).as("avg_gpsspeed"),
        graft.functions.AggExprs.decAvg(col("VehicleSpeed")).as("avg_vehiclespeed"),
        graft.functions.AggExprs.decAvg(abs(col("gpsspeed") - col("VehicleSpeed"))).as("avg_error_rate"),
        graft.functions.AggExprs.decAvg(col("gpsnumsat")).as("avg_gpsnumsat"),
        min(col("gpsstatus")).as("gpsstatus"),
        min(col("camfrontstatus")).as("camfrontstatus"),
        min(col("camcabinstatus")).as("camcabinstatus"),
        min(col("speedsource")).as("speedsource"))
      .select(col("window.start").as("minute"), col("*")).drop("window")
}
