package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time/epoch expression library — the semantic heart of the reference's
  * ingest enrichment.
  *
  * The signature expression is the 4-way mixed-precision epoch normalizer
  * (reference `v1-basic-etl/gzip-to-parquet-etl.py:228-243`): device
  * heartbeats arrive as BIGINT epochs whose precision drifts across
  * firmware versions — seconds (<1e10), milliseconds (<1e13), microseconds
  * (<1e16), else nanoseconds. Everything is normalized to microseconds,
  * turned into a timestamp, and shifted UTC→WITA (+8h) to derive the
  * partition date and display timestamp.
  *
  * All functions are pure `Column` transforms — codegen-friendly, no UDFs.
  */
object TimeExprs {

  private val Sec: Long = 10000000000L        // 1e10
  private val Milli: Long = 10000000000000L   // 1e13
  private val Micro: Long = 10000000000000000L // 1e16

  /** Exact integer division (truncating) that never round-trips through
    * Double — nanosecond epochs exceed 2^53 and would lose precision in
    * floating point. `div` is Spark's registered IntegralDivide function.
    */
  private def idiv(c: Column, d: Long): Column =
    call_function("div", c, lit(d))

  /** Mixed-precision BIGINT epoch → microseconds (reference
    * `gzip-to-parquet-etl.py:228-233`). */
  def epochToMicros(epoch: Column): Column =
    when(epoch < Sec, epoch * 1000000L)
      .when(epoch < Milli, epoch * 1000L)
      .when(epoch < Micro, epoch)
      .otherwise(idiv(epoch, 1000L))

  /** Mixed-precision epoch → UTC timestamp (session tz must be UTC). */
  def normalizeEpoch(epoch: Column): Column =
    timestamp_micros(epochToMicros(epoch))

  /** UTC timestamp → WITA (UTC+8) wall-clock timestamp, kept as a derived
    * column rather than a session-tz change (reference `README.md:68`:
    * "UTC internal, convert at display"; `gzip-to-parquet-etl.py:234`). */
  def toWita(ts: Column): Column = ts + expr("INTERVAL 8 HOURS")

  /** Partition date: WITA event date (reference `gzip-to-parquet-etl.py:235`). */
  def hivePeriod(epoch: Column): Column =
    to_date(toWita(normalizeEpoch(epoch)))

  /** Full enrichment bundle: (datetime_wita, hiveperiod) from a raw epoch. */
  def enrichment(epoch: Column): (Column, Column) = {
    val wita = toWita(normalizeEpoch(epoch))
    (wita, to_date(wita))
  }
}
