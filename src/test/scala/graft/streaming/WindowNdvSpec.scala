package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming contract behind w13: the windowed HLL sketch runs as a
  * watermarked streaming aggregation whose append-mode results equal
  * the batch run over the same rows, and a window emits only after the
  * watermark passes its end (bounded state: buffer evicted at emission).
  */
class WindowNdvSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  test("append-mode emission after watermark, equal to the batch run") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(Timestamp, Long)](spark)
    val ndv = WindowNdv.hourlyUserNdv(
      input.toDS().toDF("ts", "user_id").withWatermark("ts", "10 minutes"))
    val q = ndv.writeStream.format("memory").queryName("ndv_stream")
      .outputMode("append").start()
    try {
      val hour1 = Seq(
        (ts("2024-08-12T00:05:00Z"), 1L), (ts("2024-08-12T00:15:00Z"), 2L),
        (ts("2024-08-12T00:25:00Z"), 1L), (ts("2024-08-12T00:45:00Z"), 3L))
      input.addData(hour1: _*)
      q.processAllAvailable()
      // watermark still inside hour 1 → nothing emitted yet
      assert(spark.table("ndv_stream").count() == 0,
        "window emitted before its end passed the watermark")

      // hour-2 data pushes the watermark past hour 1's end → hour 1 emits
      val hour2 = Seq((ts("2024-08-12T01:30:00Z"), 4L), (ts("2024-08-12T01:40:00Z"), 4L))
      input.addData(hour2: _*)
      q.processAllAvailable()
      val emitted = spark.table("ndv_stream").collect()
      assert(emitted.length == 1)
      assert(emitted.head.getAs[Timestamp]("hour_start") == ts("2024-08-12T00:00:00Z"))
      assert(emitted.head.getAs[Long]("n_events") == 4L)

      // streaming result == batch result over the same rows (hour 1)
      val batch = WindowNdv.hourlyUserNdv(hour1.toDF("ts", "user_id"))
        .collect().head
      assert(emitted.head.getAs[Long]("approx_users") ==
        batch.getAs[Long]("approx_users"))
      // and at this cardinality the sketch is exact (HLL++ sparse mode)
      assert(batch.getAs[Long]("approx_users") == 3L)
    } finally q.stop()
  }

  test("boundary: a window ending EXACTLY at the watermark emits (non-strict eviction)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // The w13b/w11b oracles encode emission as `end <= max(ts)` —
    // non-strict. This fixture pins the engine side of that contract:
    // with a zero-delay watermark, an event at precisely 01:00:00
    // advances the watermark to hour 1's END, and hour 1 must emit on
    // the equality, not one microsecond later. A regenerated events
    // corpus landing a max(ts) on an hour boundary would flip the gate
    // if Spark's eviction predicate were strict; this spec fails first.
    val input = MemoryStream[(Timestamp, Long)](spark)
    val ndv = WindowNdv.hourlyUserNdv(
      input.toDS().toDF("ts", "user_id").withWatermark("ts", "0 seconds"))
    val sink = "ndv_boundary_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = ndv.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      input.addData((ts("2024-08-12T00:30:00Z"), 1L))
      q.processAllAvailable()
      input.addData((ts("2024-08-12T01:00:00Z"), 2L)) // watermark == hour-1 end
      q.processAllAvailable()
      val emitted = spark.table(sink).collect()
      assert(emitted.length == 1, s"boundary window: got ${emitted.length} rows")
      assert(emitted.head.getAs[Timestamp]("hour_start") == ts("2024-08-12T00:00:00Z"))
    } finally { q.stop(); spark.catalog.dropTempView(sink) }
  }

  test("boundary: a session ending EXACTLY at the watermark emits (w11b's oracle contract)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // session end = last event + gap; a second user's event at exactly
    // that instant advances the zero-delay watermark onto the boundary
    val input = MemoryStream[(Timestamp, Long)](spark)
    val sess = SnapshotStream.sessionRollup(
      input.toDS().toDF("ts", "user_id").withWatermark("ts", "0 seconds"),
      Seq("user_id"), "ts", "30 minutes")
    val sink = "sess_boundary_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = sess.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      input.addData((ts("2024-08-12T00:10:00Z"), 1L))
      q.processAllAvailable()
      input.addData((ts("2024-08-12T00:40:00Z"), 2L)) // == user 1's session end
      q.processAllAvailable()
      val emitted = spark.table(sink).collect()
      assert(emitted.length == 1,
        s"session ending at the watermark: got ${emitted.length} rows")
      assert(emitted.head.getAs[Long]("user_id") == 1L)
      assert(emitted.head.getAs[Timestamp]("session_end") == ts("2024-08-12T00:40:00Z"))
    } finally { q.stop(); spark.catalog.dropTempView(sink) }
  }

  test("w13b path: file-source stream emits exactly the closed windows, equal to batch") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val emitted = WindowNdv.emittedHourlyNdv(spark, sf)
      .orderBy("hour_start").collect().toSeq.map(_.toSeq)
    // expectation from the BATCH plan: every window whose end the final
    // watermark (= max ts, zero delay) passed — and no others
    val ev = graft.Tables.events(spark, sf)
    val batch = WindowNdv.hourlyUserNdv(ev)
      .crossJoin(broadcast(ev.agg(max("ts").as("mx"))))
      .where(col("hour_start") + expr("INTERVAL 1 HOUR") <= col("mx"))
      .select("hour_start", "approx_users", "n_events")
      .orderBy("hour_start").collect().toSeq.map(_.toSeq)
    assert(emitted.nonEmpty)
    assert(emitted == batch)
    // the tail window (the one containing max ts) must be held open
    val allHours = WindowNdv.hourlyUserNdv(ev).count()
    assert(emitted.size < allHours,
      "tail window emitted — watermark eviction not exercised")
  }
}
