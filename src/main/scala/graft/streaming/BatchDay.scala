package graft.streaming

/** Shared batch-id → store-day conversion for every maintainer.
  *
  * Store days are `Int`; Structured Streaming batch ids are `Long`,
  * monotonically increasing from 0. A silent truncation would alias
  * two ids congruent mod 2³² onto one day — and because every store's
  * advance is an unconditional retire-then-write (the crash-repair
  * contract), the later batch would DELETE the earlier batch's rows
  * from the serving index with nothing but a stale-store log line
  * downstream (review r15 finding 4). Fail loud instead: 2³¹ batches
  * is unreachable for any real stream (68 years at one per second),
  * and a deployment that somehow approaches it must re-key its store,
  * not lose data.
  */
private[streaming] object BatchDay {
  def of(batchId: Long): Int = {
    require(batchId >= 0 && batchId <= Int.MaxValue,
      s"batch id $batchId does not fit a store day (Int) — truncation would alias an existing day")
    batchId.toInt
  }
}
