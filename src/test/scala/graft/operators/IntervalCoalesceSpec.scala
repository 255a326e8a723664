package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed semantics for q83 interval coalescing and q87 mode —
  * the cases an oracle diff over uniform testdata would not stress:
  * touching intervals, containment chains that defeat lag-based island
  * detection, and deterministic mode tie-breaks.
  */
class IntervalCoalesceSpec extends SparkSpec {

  // dur(event_id) = event_id % 240 + 60 seconds (TemporalQueries).
  private def ev(user: Long, id: Long, ts: String): (Long, Long, String) =
    (user, id, ts)

  private def intervals(rows: Seq[(Long, Long, String)]) = {
    import spark.implicits._
    val df = rows.toDF("user_id", "event_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
    TemporalQueries.q83IntervalsOn(df)
      .select(col("user_id"), col("island"),
        date_format(col("start_ts"), "HH:mm:ss").as("s"),
        date_format(col("last_end"), "HH:mm:ss").as("e"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("q83: overlap chains, touching intervals, and gaps split correctly") {
    val got = intervals(Seq(
      // user 1: [00:00,00:01) ∪ [00:00:30,00:03:30) ∪ touching [00:03:30,00:04:30)
      ev(1, 0, "2024-01-01 00:00:00"),    // dur 60
      ev(1, 120, "2024-01-01 00:00:30"),  // dur 180
      ev(1, 0, "2024-01-01 00:03:30"),    // dur 60 — starts AT prior max end
      // then a real gap
      ev(1, 0, "2024-01-01 00:10:00"),    // dur 60
      // user 2: alone
      ev(2, 60, "2024-01-01 05:00:00")))  // dur 120
    assert(got == Seq(
      (1L, 1L, "00:00:00", "00:04:30", 3L),
      (1L, 2L, "00:10:00", "00:11:00", 1L),
      (2L, 1L, "05:00:00", "05:02:00", 1L)), got.mkString(", "))
  }

  test("q83: a contained interval must not break the island (running max, not lag)") {
    // eA [00:00,00:04) ⊃ eB [00:01,00:02); eC starts 00:03 — after eB's
    // end but inside eA. A lag-based "previous row's end" would split
    // eC into a new island; the running max must keep one island.
    val got = intervals(Seq(
      ev(3, 180, "2024-01-01 00:00:00"), // dur 240 → end 00:04:00
      ev(3, 0, "2024-01-01 00:01:00"),   // dur 60  → end 00:02:00 (contained)
      ev(3, 0, "2024-01-01 00:03:00")))  // dur 60  → end 00:04:00
    assert(got == Seq((3L, 1L, "00:00:00", "00:04:00", 3L)), got.mkString(", "))
  }

  test("q89: trailing 7-day distinct users, hand-computed, partial windows included") {
    import spark.implicits._
    // activity: day0 u1; day3 u1,u2; day9 u3. Window-end days carry the
    // users active in (end-6 .. end]; day 10+ sees only day9's user.
    val events = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-04 10:00:00"),
      (2L, "2024-01-04 11:00:00"), (3L, "2024-01-10 09:00:00"),
      (3L, "2024-01-10 12:00:00")) // same user+day twice → one contribution
      .toDF("user_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
    val got = TemporalQueries.q89SlidingDistinctOn(events).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).sortBy(_._1).toSeq
    // contributions: day1→days1..7(u1), day4→4..10(u1,u2), day10→10..16
    // clipped at max day 10.
    assert(got == Seq(
      "2024-01-01" -> 1L, "2024-01-02" -> 1L, "2024-01-03" -> 1L,
      "2024-01-04" -> 2L, "2024-01-05" -> 2L, "2024-01-06" -> 2L,
      "2024-01-07" -> 2L, "2024-01-08" -> 2L, "2024-01-09" -> 2L,
      "2024-01-10" -> 3L), got.mkString(", "))
  }

  test("q91: trend slope is exact on a linear series; degenerate series emit NULL") {
    import spark.implicits._
    val events = Seq(
      // user 1: value rises exactly 2.0/day for three days → slope 2.0
      (1L, "2024-01-01 00:00:00", 0.0), (1L, "2024-01-02 00:00:00", 2.0),
      (1L, "2024-01-03 00:00:00", 4.0),
      // user 2: a single event — slope undefined
      (2L, "2024-01-01 12:00:00", 5.0),
      // user 3: two events in the SAME second — zero x-variance
      (3L, "2024-01-01 06:00:00", 1.0), (3L, "2024-01-01 06:00:00", 9.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
    val got = TemporalQueries.q91TrendOn(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 2.0, Some(2.0)), (2L, 1L, 5.0, None), (3L, 2L, 5.0, None)),
      got.mkString(", "))
  }

  test("q87: mode picks the highest count, ties break lexicographically") {
    import spark.implicits._
    val events = Seq(
      (10L, "view"), (10L, "view"), (10L, "click"),
      (10L, "click"), (10L, "click"), (10L, "view"), // 3–3 tie → "click"
      (11L, "view"), (11L, "view"), (11L, "click"))  // clear winner "view"
      .toDF("user_id", "event_type")
    val got = RelationalExtras.q87ModeOn(events).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == Seq((10L, "click", 3L), (11L, "view", 2L)), got.mkString(", "))
  }
}
