package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — q28's gap-merged `session_window` run
  * live: each user's event burst becomes one session row (start, end =
  * last event + gap, event count), emitted exactly once when the
  * watermark passes the session's end, i.e. once the gap has provably
  * elapsed with nothing arriving late to extend it. The live face of
  * the batch q28 the same way TrendMonitor is q65's: "who is active
  * RIGHT NOW and how long was their visit" without waiting for the
  * nightly sessionization.
  *
  * Semantics match batch q28 exactly (same native operator): sessions
  * whose [ts, ts+gap] spans TOUCH merge — two events exactly `gap`
  * apart are ONE session — and Structured Streaming's session-window
  * state MERGES open windows as bridging events arrive, so an event
  * landing between two open sessions collapses them into one before
  * anything is emitted.
  *
  * Scale shape: state is one open (user, window) span + count — not the
  * events themselves — bounded by the number of concurrently active
  * users, and evicted the moment the watermark closes the session.
  * Event volume touches only the map side of the count.
  */
object SessionMonitor {

  /** Gap that ends a session — q28's constant, so live sessions and the
    * batch backfill agree row-for-row on the same data. */
  val GapMinutes = 30

  /** Default late-arrival allowance: an event older than this can no
    * longer open, extend, or BRIDGE a session — a bridging event below
    * the watermark is dropped and the two spans it would have merged
    * close separately, so the allowance must cover the feed's real
    * lateness (the spec drives exactly this edge). */
  val Watermark = "10 minutes"

  /** `events`: a STREAMING (ts: timestamp, user_id: long) relation.
    * Returns append-mode closed-session rows. */
  def sessions(events: DataFrame, watermark: String = Watermark): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), s"$GapMinutes minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))
}
