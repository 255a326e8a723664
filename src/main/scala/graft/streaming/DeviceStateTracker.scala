package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state: per-device liveness/gap tracking via
  * `flatMapGroupsWithState` — the stateful-processing tier of the
  * streaming surface (SURVEY §2.10 extension row; the reference has no
  * stateful ops, but a live fleet monitor needs exactly this).
  *
  * State is one small record per device (last-seen time + count), so
  * state-store size is O(fleet), not O(events) — safe at any event
  * volume; the state store shuffles by device key only.
  */
object DeviceStateTracker {

  case class Ping(deviceid: String, epoch: Long)
  case class DeviceState(lastSeen: Long, totalPings: Long)
  case class GapAlert(deviceid: String, gapSeconds: Long, at: Long, totalPings: Long)

  val DefaultGapSeconds: Long = 120

  /** Emit an alert whenever a device reappears after more than
    * `gapSeconds` of silence. */
  def trackGaps(
      pings: Dataset[Ping],
      gapSeconds: Long = DefaultGapSeconds): Dataset[GapAlert] = {
    import pings.sparkSession.implicits._
    pings
      .groupByKey(_.deviceid)
      .flatMapGroupsWithState[DeviceState, GapAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (deviceid: String, batch: Iterator[Ping], state: GroupState[DeviceState]) =>
          val sorted = batch.toSeq.sortBy(_.epoch)
          var st = state.getOption.getOrElse(DeviceState(Long.MinValue, 0L))
          val alerts = Seq.newBuilder[GapAlert]
          sorted.foreach { p =>
            if (st.lastSeen != Long.MinValue && p.epoch - st.lastSeen > gapSeconds)
              alerts += GapAlert(deviceid, p.epoch - st.lastSeen, p.epoch, st.totalPings)
            st = DeviceState(math.max(st.lastSeen, p.epoch), st.totalPings + 1)
          }
          state.update(st)
          alerts.result().iterator
      }
  }

  /** Streaming dedup companion: exactly-once event ids within the
    * watermark horizon (`dropDuplicatesWithinWatermark`) — bounded
    * state, unlike an unbounded global dropDuplicates. */
  def dedupWithinWatermark(
      events: org.apache.spark.sql.DataFrame,
      idCol: String,
      tsCol: String,
      watermark: String = "10 minutes"): org.apache.spark.sql.DataFrame =
    events.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(idCol)
}
