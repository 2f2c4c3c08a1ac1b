package graft.streaming

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class StatefulSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  private def reading(st: String, slot: String, snap: String, wind: Long) =
    SlotReading(st, ts(slot), ts(snap), 10L, 30L, wind)

  test("latestSnapshotWins emits first sight, revisions, and drops stale re-sends") {
    val input = MemoryStream[SlotReading](spark)
    val out = Stateful.latestSnapshotWins(spark,
      input.toDS().withWatermark("snapshot_ts", "1 hour"))
    val q = out.writeStream.format("memory").queryName("latest_wins")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two slots from snapshot T0; slot A has two rows in the
      // SAME batch (an older straggler) — only the newest may win
      input.addData(
        reading("A", "2024-08-12T00:00:00Z", "2024-08-12T06:00:00Z", 5L),
        reading("A", "2024-08-12T00:00:00Z", "2024-08-12T05:00:00Z", 99L),
        reading("B", "2024-08-12T00:00:00Z", "2024-08-12T06:00:00Z", 7L))
      q.processAllAvailable()
      val after1 = spark.table("latest_wins").as[SlotReading].collect()
      assert(after1.map(r => (r.station_id, r.wind_speed)).toSet ==
        Set(("A", 5L), ("B", 7L)))

      // batch 2: a stale duplicate of A (dropped), a genuine revision of B
      // (emitted), and a brand-new slot (emitted)
      input.addData(
        reading("A", "2024-08-12T00:00:00Z", "2024-08-12T06:00:00Z", 5L),
        reading("B", "2024-08-12T00:00:00Z", "2024-08-12T07:00:00Z", 11L),
        reading("C", "2024-08-12T03:00:00Z", "2024-08-12T07:00:00Z", 3L))
      q.processAllAvailable()
      val after2 = spark.table("latest_wins").as[SlotReading].collect()
      assert(after2.length == 4)
      val bRows = after2.filter(_.station_id == "B").map(_.wind_speed).toSet
      assert(bRows == Set(7L, 11L)) // the revision log keeps both versions
      assert(!after2.exists(_.wind_speed == 99L)) // straggler never surfaced
    } finally q.stop()
  }

  test("state for a quiet key is evicted after the horizon passes") {
    val input = MemoryStream[SlotReading](spark)
    val out = Stateful.latestSnapshotWins(spark,
      input.toDS().withWatermark("snapshot_ts", "1 hour"),
      horizonMs = 3600L * 1000)
    val q = out.writeStream.format("memory").queryName("evict_check")
      .outputMode(OutputMode.Append).start()
    try {
      def stateRows: Long =
        q.lastProgress.stateOperators.head.numRowsTotal

      input.addData(reading("A", "2024-08-12T00:00:00Z", "2024-08-12T06:00:00Z", 5L))
      q.processAllAvailable()
      assert(stateRows == 1) // A's cell

      // Z pushes the watermark to 12:00 − 1 h = 11:00, past A's timeout
      // (06:00 snapshot + 1 h horizon = 07:00); the watermark bump
      // triggers the timeout sweep — A's cell is removed, Z's survives.
      input.addData(reading("Z", "2024-08-13T00:00:00Z", "2024-08-13T12:00:00Z", 1L))
      q.processAllAvailable()
      assert(stateRows == 1) // state stayed bounded: only Z's cell lives
    } finally q.stop()
  }
}
