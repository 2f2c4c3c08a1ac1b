package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SnapshotStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  test("file-source micro-batch ingest dedups across snapshot files and restarts") {
    val base = Files.createTempDirectory("graft-stream").toString
    val landing = s"$base/landing"; val out = s"$base/out"; val ckpt = s"$base/ckpt"

    def row(st: String, t: String, v: Long) = (st, ts(t), v)
    val schema = Seq(row("A", "2024-08-12T00:00:00Z", 1L))
      .toDF("station_id", "begin_time", "wind_speed").schema

    // snapshot 1 + snapshot 2 overlap on (A, 00:00)
    Seq(row("A", "2024-08-12T00:00:00Z", 5L), row("A", "2024-08-12T03:00:00Z", 6L))
      .toDF("station_id", "begin_time", "wind_speed")
      .coalesce(1).write.parquet(s"$landing/snap1")
    Seq(row("A", "2024-08-12T00:00:00Z", 5L), row("B", "2024-08-12T00:00:00Z", 7L))
      .toDF("station_id", "begin_time", "wind_speed")
      .coalesce(1).write.parquet(s"$landing/snap2")

    val q1 = SnapshotStream.dedupedIngest(spark, s"$landing/*", schema,
      Seq("station_id", "begin_time"), "begin_time", "1 day", out, ckpt)
    q1.awaitTermination()

    val got1 = spark.read.parquet(out)
      .select("station_id", "begin_time", "wind_speed").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(got1 == Set(
      ("A", ts("2024-08-12T00:00:00Z"), 5L),
      ("A", ts("2024-08-12T03:00:00Z"), 6L),
      ("B", ts("2024-08-12T00:00:00Z"), 7L)))

    // snapshot 3 arrives later: one already-seen key, one new — restart
    // drains only the new file, state dedups across runs via checkpoint
    Seq(row("A", "2024-08-12T03:00:00Z", 6L), row("C", "2024-08-12T06:00:00Z", 8L))
      .toDF("station_id", "begin_time", "wind_speed")
      .coalesce(1).write.parquet(s"$landing/snap3")

    val q2 = SnapshotStream.dedupedIngest(spark, s"$landing/*", schema,
      Seq("station_id", "begin_time"), "begin_time", "1 day", out, ckpt)
    q2.awaitTermination()

    val got2 = spark.read.parquet(out).count()
    assert(got2 == 4) // only C was new
  }

  test("dailyRollup runs as a watermarked streaming aggregation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, Timestamp, Option[Long], Option[Long], Option[Long])](spark)
    val rollup = SnapshotStream.dailyRollup(
      input.toDS()
        .toDF("station_id", "begin_time", "min_temp", "max_temp", "wind_speed")
        .withWatermark("begin_time", "1 hour"),
      "begin_time")
    val q = rollup.writeStream.format("memory").queryName("daily_stream")
      .outputMode("update").start()
    try {
      input.addData(
        ("A", ts("2024-08-12T00:00:00Z"), Some(10L), Some(30L), Some(5L)),
        ("A", ts("2024-08-12T21:00:00Z"), Some(12L), Some(28L), Some(9L)))
      q.processAllAvailable()
      input.addData(("A", ts("2024-08-13T00:00:00Z"), Some(8L), Some(25L), Some(4L)))
      q.processAllAvailable()
      val rows = spark.table("daily_stream")
        .groupBy("station_id", "day_start")
        .agg(org.apache.spark.sql.functions.max("temp_high").as("temp_high"),
          org.apache.spark.sql.functions.min("temp_low").as("temp_low"))
        .orderBy("day_start").collect()
      assert(rows.length == 2)
      assert(rows.head.getAs[Long]("temp_low") == 10L)
      assert(rows.head.getAs[Long]("temp_high") == 30L)
    } finally q.stop()
  }

  test("stream-stream interval join matches observations to forecast slots") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val obsIn = MemoryStream[(String, Timestamp, Long)](spark)
    val fcIn = MemoryStream[(String, Timestamp, Timestamp, Long)](spark)
    val obs = obsIn.toDS().toDF("station_id", "obs_time", "observed")
      .withWatermark("obs_time", "1 hour")
    val fc = fcIn.toDS().toDF("station_id", "begin_time", "end_time", "forecast")
      .withWatermark("begin_time", "1 hour")
    val joined = SnapshotStream.matchObservationsToForecasts(obs, fc)
      .select("station_id", "obs_time", "observed", "forecast")
    val q = joined.writeStream.format("memory").queryName("obs_fc")
      .outputMode("append").start()
    try {
      fcIn.addData(
        ("A", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T03:00:00Z"), 30L),
        ("A", ts("2024-08-12T03:00:00Z"), ts("2024-08-12T06:00:00Z"), 28L),
        ("B", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T03:00:00Z"), 20L))
      obsIn.addData(
        ("A", ts("2024-08-12T01:30:00Z"), 29L),  // slot 1 of A
        ("A", ts("2024-08-12T03:00:00Z"), 27L),  // boundary → slot 2 (begin inclusive)
        ("B", ts("2024-08-12T05:00:00Z"), 19L))  // no containing B slot
      q.processAllAvailable()
      val rows = spark.table("obs_fc").collect()
        .map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
      assert(rows == Set(("A", 29L, 30L), ("A", 27L, 28L)))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched observations as nulls after the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val obsIn = MemoryStream[(String, Timestamp, Long)](spark)
    val fcIn = MemoryStream[(String, Timestamp, Timestamp, Long)](spark)
    val obs = obsIn.toDS().toDF("station_id", "obs_time", "observed")
      .withWatermark("obs_time", "1 hour")
    val fc = fcIn.toDS().toDF("station_id", "begin_time", "end_time", "forecast")
      .withWatermark("begin_time", "1 hour")
    val joined = SnapshotStream.matchObservationsToForecastsOuter(obs, fc)
      .select("station_id", "obs_time", "observed", "forecast")
    val q = joined.writeStream.format("memory").queryName("obs_fc_outer")
      .outputMode("append").start()
    try {
      fcIn.addData(
        ("A", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T03:00:00Z"), 30L))
      obsIn.addData(
        ("A", ts("2024-08-12T01:30:00Z"), 29L),  // matches A's slot
        ("B", ts("2024-08-12T01:00:00Z"), 19L))  // no B forecast exists
      q.processAllAvailable()
      // push both watermarks far past obs_time + horizon so the engine
      // can prove B's observation is unmatchable (two batches: the
      // watermark advances at batch end, nulls emit in the next one)
      fcIn.addData(
        ("A", ts("2024-08-13T00:00:00Z"), ts("2024-08-13T03:00:00Z"), 31L))
      obsIn.addData(("A", ts("2024-08-13T00:30:00Z"), 28L))
      q.processAllAvailable()
      fcIn.addData(
        ("A", ts("2024-08-14T00:00:00Z"), ts("2024-08-14T03:00:00Z"), 32L))
      obsIn.addData(("A", ts("2024-08-14T00:30:00Z"), 27L))
      q.processAllAvailable()
      val rows = spark.table("obs_fc_outer").collect()
        .map(r => (r.getString(0), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      assert(rows.contains(("A", 29L, 30L)), s"matched row missing: $rows")
      assert(rows.contains(("B", 19L, -1L)),
        s"unmatched obs must surface with null forecast: $rows")
    } finally q.stop()
  }

  test("sessionRollup merges within-gap events, splits on quiet periods, emits on watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, Timestamp)](spark)
    val sessions = SnapshotStream.sessionRollup(
      input.toDS().toDF("user_id", "ts").withWatermark("ts", "10 minutes"),
      Seq("user_id"), "ts", "30 minutes")
    val q = sessions.writeStream.format("memory").queryName("session_stream")
      .outputMode("append").start()
    try {
      // user A: two events 10 min apart (one session), then 40 min of
      // quiet (split); user B: one event
      input.addData(
        ("A", ts("2024-08-12T00:00:00Z")), ("A", ts("2024-08-12T00:10:00Z")),
        ("A", ts("2024-08-12T00:50:00Z")), ("B", ts("2024-08-12T00:05:00Z")))
      q.processAllAvailable()
      // the watermark (max ts − 10 min = 00:40) has not passed the open
      // session's end (00:50 + 30 min): it must not have emitted yet
      assert(!spark.table("session_stream").collect()
        .exists(_.getTimestamp(1) == ts("2024-08-12T00:50:00Z")))
      input.addData(("C", ts("2024-08-12T03:00:00Z")))
      q.processAllAvailable()
      val rows = spark.table("session_stream").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3))).toSet
      assert(rows == Set(
        ("A", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T00:40:00Z"), 2L),
        ("A", ts("2024-08-12T00:50:00Z"), ts("2024-08-12T01:20:00Z"), 1L),
        ("B", ts("2024-08-12T00:05:00Z"), ts("2024-08-12T00:35:00Z"), 1L)))
    } finally q.stop()
  }

  test("sessionRollup matches the batch q20 gap-sessionization on the same data") {
    val df = Seq(
      ("A", ts("2024-08-12T00:00:00Z")), ("A", ts("2024-08-12T00:10:00Z")),
      ("A", ts("2024-08-12T00:50:00Z")), ("B", ts("2024-08-12T00:05:00Z"))
    ).toDF("user_id", "ts")
    val out = SnapshotStream.sessionRollup(df, Seq("user_id"), "ts", "30 minutes")
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getString(0), r.getLong(3)))
    assert(out.toSeq == Seq(("A", 2L), ("A", 1L), ("B", 1L)))
  }

  test("dailyRollup matches the batch A1 shape on the same data") {
    val df = Seq(
      ("A", ts("2024-08-12T00:00:00Z"), Some(10L), Some(30L), Some(5L)),
      ("A", ts("2024-08-12T21:00:00Z"), Some(12L), Some(28L), Some(9L)),
      ("A", ts("2024-08-13T00:00:00Z"), Some(8L), Some(25L), Some(4L))
    ).toDF("station_id", "begin_time", "min_temp", "max_temp", "wind_speed")
    val out = SnapshotStream.dailyRollup(df, "begin_time")
      .orderBy("day_start").collect()
    assert(out.length == 2)
    assert(out.head.getAs[Long]("temp_low") == 10L)
    assert(out.head.getAs[Long]("temp_high") == 30L)
    assert(out.head.getAs[Long]("wind_speed") == 9L)
  }
}
