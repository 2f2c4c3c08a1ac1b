package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One slot reading as re-fetched by an hourly snapshot: the same
  * (station, slot) arrives again in later snapshots, possibly revised
  * (download_forecast.rs re-fetches the whole week ahead every run). */
final case class SlotReading(
    station_id: String,
    begin_time: Timestamp,
    snapshot_ts: Timestamp,
    min_temp: Long,
    max_temp: Long,
    wind_speed: Long)

/** Custom streaming state (SURVEY §2.8) where the built-ins genuinely
  * can't express the semantics: the reference's snapshot-supersede rule is
  * "the NEWEST snapshot's value for a (station, slot) wins, and revisions
  * must flow downstream". `dropDuplicates` is first-seen-wins (it would
  * freeze the first forecast forever); a windowed agg can't emit
  * per-revision rows. So: `groupByKey` on the slot key +
  * `flatMapGroupsWithState`, with one tiny state cell per key (the last
  * accepted snapshot time) and event-time timeout eviction.
  *
  * Scale notes: state is O(live keys), not O(history) — a key's cell dies
  * once the watermark passes its last snapshot + horizon. Each micro-batch
  * shuffles on the slot key only; the emitted stream is exactly the
  * revision log downstream consumers (e.g. the A1 rollup) need.
  */
object Stateful {

  /** The retained state per slot: the newest accepted snapshot time. */
  final case class SlotState(lastSnapshotMs: Long)

  /** Emit a reading iff it is strictly newer (by snapshot time) than the
    * newest already emitted for its (station, begin_time); evict state
    * once the event-time watermark is `horizon` past the last accepted
    * snapshot. Works on a streaming Dataset (the spec drives it through a
    * MemoryStream); `withWatermark` on `snapshot_ts` must be applied by
    * the caller (it is part of the read contract, like the schema). */
  def latestSnapshotWins(
      spark: SparkSession,
      readings: Dataset[SlotReading],
      horizonMs: Long = 24L * 3600 * 1000): Dataset[SlotReading] = {
    import spark.implicits._
    readings
      .groupByKey(r => (r.station_id, r.begin_time))
      .flatMapGroupsWithState[SlotState, SlotReading](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, rows, state: GroupState[SlotState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // newest row in this micro-batch for the key
            val newest = rows.maxBy(_.snapshot_ts.getTime)
            val newerThanState =
              state.getOption.forall(_.lastSnapshotMs < newest.snapshot_ts.getTime)
            if (newerThanState) {
              state.update(SlotState(newest.snapshot_ts.getTime))
              state.setTimeoutTimestamp(newest.snapshot_ts.getTime + horizonMs)
              Iterator.single(newest)
            } else Iterator.empty
          }
      }
  }
}
