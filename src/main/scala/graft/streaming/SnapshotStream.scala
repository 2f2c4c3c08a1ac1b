package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming ingestion (SURVEY §2.8): the reference is
  * micro-batch by construction — an hourly tick loop produces immutable
  * snapshot parquet files (crates/daemon/src/main.rs:39-50), re-ingested
  * idempotently with duplicates collapsed downstream (oracle.rs:314-389,
  * weather_data.rs level-1 GROUP BY).
  *
  * Spark mapping: a parquet file-source stream over the landing
  * directory, exactly-once via checkpointing, duplicates dropped in-flight
  * with `dropDuplicates` state keyed on (station_id, event time) bounded
  * by a watermark, `Trigger.AvailableNow` for the scheduled-batch cadence.
  *
  * Scale notes: file-source streams list incrementally (maxFilesPerTrigger
  * bounds a micro-batch); dedup state is per-key in the state store and
  * evicted past the watermark, so state size is bounded by (stations ×
  * watermark horizon), not history length.
  */
object SnapshotStream {

  /** Deduplicating snapshot ingest: landing dir → partitioned store dir.
    * Returns the started query (AvailableNow: drains what exists, stops). */
  def dedupedIngest(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      keys: Seq[String],
      eventTimeCol: String,
      watermark: String,
      outDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 100): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicates(keys)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Tumbling 1-day windowed rollup — the streaming twin of the A1 daily
    * aggregation (`DATE_TRUNC('day', ...)` ≡ `window(ts, "1 day")`).
    * Works on both batch and streaming DataFrames. */
  def dailyRollup(df: DataFrame, eventTimeCol: String): DataFrame =
    df.groupBy(col("station_id"), window(col(eventTimeCol), "1 day").as("day"))
      .agg(
        min("min_temp").as("temp_low"),
        max("max_temp").as("temp_high"),
        max("wind_speed").as("wind_speed"))
      .select(col("station_id"), col("day.start").as("day_start"),
        col("temp_low"), col("temp_high"), col("wind_speed"))

  /** Stream-stream event-time interval join: each observation matched to
    * the forecast slot whose [begin_time, end_time) contains it, per
    * station — the streaming form of the scoring input alignment
    * (oracle.rs:478-528 joins observed vs forecast per station/slot).
    *
    * Both inputs MUST carry watermarks (the caller sets them with the
    * schema, like the read contract): Spark buffers each side's join
    * state only until the other side's watermark passes the interval
    * bound, so state is O(stations × horizon), not unbounded. The join
    * key is station_id (equi) with the containment range as residual —
    * the same bucket+residual recipe as the batch W2 range join.
    *
    * @param obs columns (station_id, obs_time, ...obs payload)
    * @param fc  columns (station_id, begin_time, end_time, ...fc payload)
    */
  def matchObservationsToForecasts(obs: DataFrame, fc: DataFrame): DataFrame =
    obs.join(fc,
      obs("station_id") === fc("station_id") &&
        obs("obs_time") >= fc("begin_time") && obs("obs_time") < fc("end_time"))
      .drop(fc("station_id"))

  /** LEFT OUTER form of [[matchObservationsToForecasts]]: observations
    * with no containing forecast slot are still emitted — with null
    * forecast payload — once the forecast side's watermark proves no
    * matching slot can still arrive. That is the streaming "report
    * unmatched records" pattern (coverage monitoring: which stations
    * observe weather we never forecast?), and it needs one extra piece
    * the inner join doesn't: an explicit match HORIZON
    * (`begin_time >= obs_time − horizon`). Containment alone bounds
    * begin_time only from above, so an arbitrarily OLD forecast could
    * in principle match any future observation — the engine could never
    * conclude "unmatched" nor evict outer state. With the horizon, both
    * event times bound each other, state stays O(stations × horizon),
    * and null rows emit exactly once the watermark passes
    * obs_time + horizon. Semantics contract: slots longer than
    * `horizon` are out of match range — callers size the horizon to
    * the maximum forecast-slot age worth matching. */
  def matchObservationsToForecastsOuter(
      obs: DataFrame, fc: DataFrame, horizon: String = "6 hours"): DataFrame =
    obs.join(fc,
      obs("station_id") === fc("station_id") &&
        obs("obs_time") >= fc("begin_time") && obs("obs_time") < fc("end_time") &&
        fc("begin_time") >= obs("obs_time") - expr(s"interval $horizon"),
      "left_outer")
      .drop(fc("station_id"))

  /** Event-time session windows — the streaming twin of the batch
    * gap-sessionization (q20_session_gap): per key, events closer than
    * `gap` merge into one session, a quiet period longer than `gap`
    * starts the next. `session_window` keeps ONE merging window per open
    * session in the state store (not one per event), and the watermark
    * both closes sessions (append mode emits a session only once the
    * watermark passes its end — which already includes the gap after the
    * last event — exactly-once, no retractions) and evicts their state,
    * so state is O(keys × open sessions), bounded by the watermark
    * horizon at any scale.
    *
    * @param keyCols      session identity (e.g. user_id)
    * @param eventTimeCol watermarked event-time column (caller sets the
    *                     watermark with the schema, like the read
    *                     contract)
    */
  def sessionRollup(
      df: DataFrame,
      keyCols: Seq[String],
      eventTimeCol: String,
      gap: String): DataFrame =
    df.groupBy(
        keyCols.map(col) :+ session_window(col(eventTimeCol), gap).as("session"): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(keyCols.map(col) :+ col("session.start").as("session_start") :+
        col("session.end").as("session_end") :+ col("n_events"): _*)
}
