package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming EXACT dedup — the stateful `dropDuplicates` form of d1's
  * batch digest dedup: emit each (user_id, hour-window) key the first
  * time it arrives, suppress every later duplicate. State is one row
  * per OPEN key, and because the dedup key carries the event-time
  * window (the `window()` struct propagates the watermark), a key's
  * state row is evicted the moment the watermark passes its window end
  * — so a 100 TB/day stream holds `keys-per-open-window` of state, not
  * the stream's history. Works identically on batch and streaming
  * inputs; in append mode a key emits exactly once (duplicates emit
  * nothing, late rows for an evicted key are dropped by the watermark
  * — they are duplicates of an already-emitted key by construction in
  * the single-batch gate fixture).
  */
object StreamDedup {

  /** First-seen (user_id, tumbling hour) pairs of an event stream
    * carrying `eventTime`. Output is the KEY columns only —
    * `window(ts).start ≡ date_trunc('hour', ts)` — so the emitted set
    * is order-independent: whichever duplicate arrives first, the row
    * it emits is identical. Callers watermark `eventTime` first. */
  def hourlyKeyDedup(events: DataFrame, eventTime: String = "ts"): DataFrame =
    events
      .select(col("user_id"), window(col(eventTime), "1 hour").as("w"))
      .dropDuplicates("user_id", "w")
      .select(col("user_id"), col("w.start").as("hour_start"))
}
