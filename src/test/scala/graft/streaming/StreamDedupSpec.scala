package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The two halves of streaming exact dedup the w14 oracle can't see:
  * (1) the emitted set equals the batch DISTINCT (first-seen emission,
  * no suppression of firsts, no duplicate leakage), and (2) the state
  * store actually EVICTS — after the watermark passes, state holds only
  * the keys of the still-open tail window, not the stream's history.
  * (2) is the 100 TB claim: without window-keyed eviction, dedup state
  * grows with every key ever seen.
  */
class StreamDedupSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("emitted = batch DISTINCT; post-watermark state holds only the open tail window") {
    val ss = graft.Sessions.streamSession(spark, 4)
    val sink = "sd_sink_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = StreamDedup.hourlyKeyDedup(
        graft.Tables.eventsStream(ss, sf).withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val emitted = ss.table(sink).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val batch = graft.Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(emitted == batch,
      s"emitted ${emitted.size} keys, batch distinct ${batch.size}")

    val maxTs = graft.Tables.events(spark, sf)
      .agg(max("ts")).head().getTimestamp(0)
    val open = batch.count { case (_, h) =>
      h.toInstant.plusSeconds(3600).isAfter(maxTs.toInstant) }
    val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
    assert(stateRows == open,
      s"state holds $stateRows rows; only the $open open-tail-window keys should survive eviction")
    ss.catalog.dropTempView(sink)
  }

  test("cross-batch suppression: a key emitted in batch 1 emits nothing in batch 2") {
    // the w14 gate's single-file source delivers everything in one
    // micro-batch, so it never exercises the STATE half of dedup: here
    // the same keys land in TWO batches (split by event_id parity, so
    // (user, hour) keys overlap across files; maxFilesPerTrigger=1
    // forces one batch per file) and the second occurrence must be
    // suppressed by the state store, not re-emitted. Watermark delay
    // covers the fixture span so no row is late — suppression, not
    // eviction, is what this pins.
    val src = graft.Tables.events(spark, sf)
      .where(col("user_id").isNotNull && col("ts").isNotNull)
    val landing = java.nio.file.Files
      .createTempDirectory("graft-sd-landing").toString
    src.where(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(landing)
    src.where(col("event_id") % 2 =!= 0).coalesce(1)
      .write.mode("append").parquet(landing)

    val ss = graft.Sessions.streamSession(spark, 4)
    val sink = "sd_xb_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = ss.readStream.schema(ss.read.parquet(landing).schema)
      .option("maxFilesPerTrigger", 1).parquet(landing)
      .withWatermark("ts", "3650 days")
    val q = StreamDedup.hourlyKeyDedup(stream)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val emitted = ss.table(sink).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    assert(emitted.size == emitted.distinct.size,
      "a key was emitted twice — cross-batch state failed to suppress")
    val batch = src
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(emitted.toSet == batch,
      s"emitted ${emitted.size} keys, batch distinct ${batch.size}")
    ss.catalog.dropTempView(sink)
  }
}
