package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.SparkSpec

/** E1 epoch normalization: all four magnitude branches, the exact
  * boundary values (1e10, 1e13, 1e16 — SURVEY §7.4 calls these out as
  * the risk spots), ns truncation, and WITA derivation. */
class TimeExprsSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private def normalize(epochs: Seq[Long]): Seq[java.time.Instant] =
    epochs.toDF("heartbeat")
      .select(TimeExprs.normalizeEpoch(col("heartbeat")).as("ts"))
      .as[java.sql.Timestamp].collect().toSeq.map(_.toInstant)

  test("four precision branches normalize to the same instant") {
    val base = 1704067200L // 2024-01-01T00:00:00Z
    val got = normalize(Seq(base, base * 1000, base * 1000000, base * 1000000000))
    assert(got.distinct == Seq(java.time.Instant.parse("2024-01-01T00:00:00Z")))
  }

  test("branch boundaries route to the correct precision") {
    val cases = Table(
      ("epoch", "expectMicros"),
      (9999999999L, 9999999999000000L), // max seconds value
      (10000000000L, 10000000000000L), // exactly 1e10 → first ms value
      (9999999999999L, 9999999999999000L), // max ms
      (10000000000000L, 10000000000000L), // exactly 1e13 → first µs value
      (9999999999999999L, 9999999999999999L), // max µs
      (10000000000000000L, 10000000000000L), // exactly 1e16 → ns branch
      (1704067200123456789L, 1704067200123456L)) // ns truncates, not rounds
    forAll(cases) { (epoch, expect) =>
      val got = Seq(epoch).toDF("heartbeat")
        .select(TimeExprs.epochToMicros(col("heartbeat"))).as[Long].head()
      assert(got == expect, s"epoch $epoch")
    }
  }

  test("ns division is exact beyond double precision") {
    // 2^53-breaking value: would be off by hundreds of µs via double math
    val ns = 1704067200123456789L
    val got = Seq(ns).toDF("heartbeat")
      .select(TimeExprs.epochToMicros(col("heartbeat"))).as[Long].head()
    assert(got == 1704067200123456L)
  }

  test("hiveperiod is the WITA (+8h) event date") {
    // 2023-12-31T17:00:00Z = 2024-01-01T01:00 WITA → partition 2024-01-01
    // 2023-12-31T10:00:00Z = 2023-12-31T18:00 WITA → partition 2023-12-31
    val got = Seq(1704042000L, 1704016800L).toDF("heartbeat")
      .select(TimeExprs.hivePeriod(col("heartbeat")).cast("string")).as[String]
      .collect().toSeq
    assert(got == Seq("2024-01-01", "2023-12-31"))
  }

  test("null heartbeat stays null") {
    val got = Seq[Option[Long]](None).toDF("heartbeat")
      .select(TimeExprs.normalizeEpoch(col("heartbeat"))).collect().head
    assert(got.isNullAt(0))
  }
}
