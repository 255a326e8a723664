package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins `session_window`'s boundary semantics: Spark merges sessions
  * whose [ts, ts+gap] spans touch, so a gap of EXACTLY the session
  * timeout still merges and only a strictly larger gap splits. The
  * DuckDB oracle's island predicate must therefore be `<=` — this
  * fixture is the regression guard for that parity decision (raised as
  * an ADVICE r1 suspicion; the empirical answer is the inclusive
  * boundary, not the strict one the advisor guessed).
  */
class SessionSpec extends SparkSpec {

  test("events exactly gap-width apart merge; one tick more splits") {
    import spark.implicits._
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(ms: Long) = new Timestamp(t0.getTime + ms)
    val gapMs = 30L * 60 * 1000
    val events = Seq(
      (1L, t0), (1L, plus(gapMs)),     // exactly 30:00 apart -> 1 session
      (2L, t0), (2L, plus(gapMs + 1))  // 30:00.001 apart     -> 2 sessions
    ).toDF("user_id", "ts")
    val sessions = events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sessions == Map(1L -> 1L, 2L -> 2L), s"got $sessions")
  }
}
