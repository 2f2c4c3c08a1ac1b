package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tumbling-window distinct-key cardinality sketch — the streaming form
  * of x1's approximate NDV. One HLL++ buffer
  * (`approx_count_distinct`) per open window is the ENTIRE state: KBs
  * per window regardless of event volume, so a 100 TB/day stream holds
  * `open-windows × KB` of state where exact windowed
  * `COUNT(DISTINCT ...)` would buffer every key. Works identically on
  * batch and streaming inputs; the streaming caller watermarks the
  * event-time column, and in append mode a window's estimate emits
  * exactly once — when the watermark passes its end and the buffer is
  * evicted (WindowNdvSpec drives both the emission and the
  * batch-equivalence property).
  */
object WindowNdv {

  /** Per-hour (tumbling) distinct `user_id` estimate over an event
    * stream carrying `eventTime`. `window(ts, "1 hour").start` ≡
    * `date_trunc('hour', ts)`, which is what the oracle gate joins on.
    *
    * rsd 0.01 (2^14 registers, ~16 KB/window): Spark's HLL++ carries no
    * sparse-mode exact path, so at coarser precision even tiny windows
    * can miss by register collisions (measured: 9 for 11 distinct at
    * rsd 0.02) — at 0.01 the w13 gate's ±(5% + 1) bound holds on every
    * window while state stays KB-sized. */
  def hourlyUserNdv(events: DataFrame, eventTime: String = "ts",
      rsd: Double = 0.01): DataFrame =
    events
      .groupBy(window(col(eventTime), "1 hour").as("w"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_users"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("hour_start"),
        col("approx_users"), col("n_events"))

  /** w13b's EXECUTED streaming path: [[hourlyUserNdv]] over a
    * file-source micro-batch stream of the events table, zero-delay
    * watermark, append mode into a memory sink — returns the emitted
    * rows, i.e. every window whose end the final watermark passed. The
    * still-open tail window (the one containing max(ts)) is held in
    * state awaiting later data, exactly what a production append sink
    * sees mid-stream; the w13b oracle carries the matching
    * `window end ≤ max(ts)` filter, so the gate pins the EMISSION
    * semantics (watermark eviction), not just the window arithmetic the
    * batch twin w13 already covers. Eviction needs a batch AFTER the
    * one that advanced the watermark — that's Spark's no-data
    * micro-batch (on by default), which `processAllAvailable` waits
    * out. */
  def emittedHourlyNdv(spark: org.apache.spark.sql.SparkSession,
      dir: String, rsd: Double = 0.01): DataFrame = {
    val (q, ss, sink) = startHourlyNdv(spark, dir, rsd)
    try q.processAllAvailable() finally q.stop()
    drainSink(spark, ss, sink)
  }

  /** The start half of [[emittedHourlyNdv]], so a caller can run this
    * stream CONCURRENTLY with others and drain afterwards (the w11b/
    * w12b/w13b gates share one stream-lifecycle window instead of
    * paying three sequential ones — WeatherGate.streamTrio). */
  private[graft] def startHourlyNdv(spark: org.apache.spark.sql.SparkSession,
      dir: String, rsd: Double = 0.01):
      (org.apache.spark.sql.streaming.StreamingQuery,
        org.apache.spark.sql.SparkSession, String) = {
    // state sized to the workload (~720 hour-windows), not the
    // engine-wide shuffle width — see Sessions.streamSession
    val ss = graft.Sessions.streamSession(spark, 8)
    val sink = "w13b_sink_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = graft.Tables.eventsStream(ss, dir)
      .withWatermark("ts", "0 seconds")
    val q = hourlyUserNdv(stream, rsd = rsd)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    (q, ss, sink)
  }

  /** Materialize a memory sink's rows (bounded: the emitted windows)
    * and DROP the sink view — a bench sweep runs the gate many times in
    * one session, and each undropped MemorySink would retain its full
    * emitted result in driver memory for the app's lifetime. */
  private[graft] def drainSink(spark: org.apache.spark.sql.SparkSession,
      ss: org.apache.spark.sql.SparkSession, sink: String): DataFrame = {
    val out = ss.table(sink)
    val rows = out.collect().toSeq
    val schema = out.schema
    ss.catalog.dropTempView(sink)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }
}
