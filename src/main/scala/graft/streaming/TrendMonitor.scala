package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextExprs
import graft.plans.HeavyHitters

/** Streaming trending-tokens monitor — q65's SpaceSaving heavy-hitters
  * sketch run live: per finalized window, the k most frequent tokens in
  * the documents that arrived in that window, emitted exactly once when
  * the watermark closes the window. The live face of the sketch tier,
  * the same way [[DriftMonitor]]/[[VolumeMonitor]] are the live faces
  * of the q103/q104 audits: what's flooding the feed RIGHT NOW (a
  * template storm, a spam campaign, one scraped site on repeat) without
  * waiting for the nightly q65 batch.
  *
  * Scale shape — the reason this is safe on an unbounded stream: the
  * streaming aggregation state per open window is ONE SpaceSaving
  * buffer of ≤ `capacity` counters, regardless of how many distinct
  * tokens stream past ([[graft.plans.HeavyHittersAgg]]'s fixed-memory
  * guarantee), and partial buffers merge under the PODS'12 mergeable-
  * summaries bound, so micro-batch parallelism and state-store merges
  * preserve the estimate ≥ truth / error ≤ min-counter invariants.
  * Exact per-window top-k would instead hold the window's whole
  * vocabulary in the state store — unbounded on exactly the adversarial
  * feeds a trending monitor exists to catch.
  *
  * Emission contract (append mode): one row per (window, rank) with
  * (token, cnt, err), rank 1 = most frequent, cnt the sketch estimate
  * and err its overestimate bound — err = 0 whenever the window's
  * distinct-token count stayed within capacity (the exact regime).
  */
object TrendMonitor {

  /** Sketch capacity per window — the state budget. Any token with
    * frequency > n/256 of a window's n tokens is guaranteed present. */
  val Capacity = 256

  /** Ranks emitted per finalized window. */
  val TopK = 10

  /** Tumbling window width. */
  val WindowSize = "1 hour"

  /** Late-arrival allowance before a window finalizes. */
  val Watermark = "30 minutes"

  /** `docs`: a STREAMING (ts: timestamp, text: string) relation.
    * Returns the append-mode trending rows. */
  def trending(docs: DataFrame): DataFrame =
    docs
      .withWatermark("ts", Watermark)
      .select(col("ts"), explode(TextExprs.tokens(col("text"))).as("tok"))
      .groupBy(window(col("ts"), WindowSize))
      .agg(HeavyHitters.heavyHitters(col("tok"), Capacity, TopK).as("hh"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), posexplode(col("hh")))
      .select(col("window_start"), col("window_end"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.token").as("token"), col("col.cnt").as("cnt"),
        col("col.err").as("err"))
}
