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
