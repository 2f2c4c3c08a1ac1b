package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Differential fuzz for the latest-snapshot-wins state machine: random
  * interleavings of revisions, same-batch stragglers, and exact re-sends
  * across several micro-batches must emit exactly what a driver-side
  * fold of the same sequence emits — one output per strict
  * snapshot-time advance per (station, slot), in order. */
class StatefulFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("seeded fuzz: random interleavings match the sequential fold") {
    val rnd = new scala.util.Random(83)
    val base = 1723420800000L // 2024-08-12T00:00:00Z
    val keys = for (st <- Seq("A", "B", "C"); slot <- 0 until 2)
      yield (st, slot)

    // 4 batches of random rows; wind encodes (key, snap) so emissions
    // are attributable
    val batches = (0 until 4).map { _ =>
      (0 until 10).map { _ =>
        val (st, slot) = keys(rnd.nextInt(keys.length))
        val snap = rnd.nextInt(8) // coarse: collisions + stragglers likely
        SlotReading(st, new Timestamp(base + slot * 3600000L),
          new Timestamp(base + snap * 3600000L),
          10L, 30L, slot * 100L + snap * 10L + "ABC".indexOf(st))
      }
    }

    // driver fold: within a batch the max snapshot per key is considered
    // (the implementation reduces each batch before consulting state);
    // it emits iff strictly newer than the best seen in prior batches
    val best = scala.collection.mutable.Map[(String, Long), Long]()
    val want = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    for (b <- batches) {
      val perKey = b.groupBy(r => (r.station_id, r.begin_time.getTime))
      for ((k, rows) <- perKey) {
        val newest = rows.maxBy(_.snapshot_ts.getTime)
        if (best.getOrElse(k, Long.MinValue) < newest.snapshot_ts.getTime) {
          best(k) = newest.snapshot_ts.getTime
          want += ((k._1, k._2, newest.wind_speed))
        }
      }
    }

    val input = MemoryStream[SlotReading](spark)
    val out = Stateful.latestSnapshotWins(spark,
      input.toDS().withWatermark("snapshot_ts", "100 hours")) // no eviction
    val q = out.writeStream.format("memory").queryName("latest_fuzz")
      .outputMode(OutputMode.Append).start()
    try {
      for (b <- batches) { input.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("latest_fuzz").as[SlotReading].collect()
        .map(r => (r.station_id, r.begin_time.getTime, r.wind_speed))
      assert(got.sorted.toSeq == want.sorted.toSeq)
    } finally q.stop()
  }
}
