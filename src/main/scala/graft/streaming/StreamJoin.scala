package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream and stream-static joins — the correlation tier of the
  * streaming surface. The reference correlates click/purchase-style
  * funnels only in batch (its dashboards join bronze history); a live
  * funnel needs the same join on two unbounded inputs.
  *
  * Both sides carry watermarks and the join condition carries an
  * explicit event-time bound, so Spark can expire buffered state: each
  * side's state store holds only rows inside
  * `watermark + joinWindow` — O(rate × window), never O(stream). Without
  * the time bound the state store grows forever; that shape is rejected
  * by the analyzer in append mode, which is exactly the guardrail a
  * 100 TB/day deployment needs.
  */
object StreamJoin {

  /** Correlate two event streams per user within `windowSeconds`:
    * emit (user, trigger ts, follow ts, lag) for every follow event
    * arriving in [trigger, trigger + window]. Inner join → append mode;
    * both state stores bounded by the watermark + window horizon.
    *
    * Inputs need columns (user_id, ts [timestamp], event_id). */
  def funnel(
      triggers: DataFrame,
      follows: DataFrame,
      windowSeconds: Long,
      watermark: String = "10 minutes"): DataFrame = {
    val t = triggers.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("trigger_ts"), col("event_id").as("trigger_id"))
    val f = follows.withWatermark("ts", watermark)
      .select(col("user_id").as("f_user_id"), col("ts").as("follow_ts"),
        col("event_id").as("follow_id"))
    t.join(f,
      col("user_id") === col("f_user_id") &&
        col("follow_ts") >= col("trigger_ts") &&
        col("follow_ts") <= col("trigger_ts") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("user_id"), col("trigger_id"), col("follow_id"),
        col("trigger_ts"), col("follow_ts"),
        (unix_micros(col("follow_ts")) - unix_micros(col("trigger_ts")))
          .as("lag_us"))
  }

  /** Stream-static enrichment: a streaming fact joined to a small batch
    * dimension. The static side broadcasts per micro-batch — no
    * streaming state at all, the degenerate-but-common case. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}
