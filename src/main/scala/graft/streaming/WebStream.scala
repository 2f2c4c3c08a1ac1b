package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.ingest.{HtmlExtract, WebCrawl}

/** Streaming crawl ingest — the in-flight half of the web front door
  * ([[graft.queries.HtmlOps]]'s p3 is the batch half): WARC blobs land
  * continuously (a crawler never stops), and each micro-batch runs the
  * STATELESS front of the pipeline — record split, envelope sanity,
  * HTML→text extraction, URL normalization + hygiene, quality scoring +
  * floor — before the rows reach the store. The stateful tail (exact
  * dedup's keeper choice, the per-domain cap) stays a batch pass over
  * the accumulated store: both depend on the WHOLE corpus (a keeper or
  * a rank can be displaced by a later arrival), so running them
  * in-flight would need O(corpus) streaming state for a result the
  * batch tail recomputes exactly. Same division as the reference's
  * snapshot-ingest-then-collapse posture (oracle.rs:314-389) and
  * DocStream's d1/c1 split.
  *
  * Every in-flight stage is a per-row column expression — no watermark,
  * no state store — so the streaming query is a pure map over each
  * micro-batch and the parquet sink's exactly-once file commit is the
  * only delivery guarantee needed (a re-delivered batch re-commits the
  * same file set; no foreachBatch side effects to replay).
  */
object WebStream {

  val blobSchema: StructType = new StructType()
    .add("file_id", LongType).add("blob", StringType)

  /** The stateless front half, shared verbatim with batch p3: blobs →
    * scored kept rows. */
  def scoredRows(blobs: DataFrame): DataFrame = {
    val parsed = WebCrawl.parseRecords(blobs)
      .where(col("status") === 200 && col("len_ok"))
    val extracted = HtmlExtract.withMainText(parsed, "html")
      .select(col("uri"), col("main_text"))
    graft.queries.HtmlOps.scoreExtracted(extracted)
  }

  /** Drain `landingDir` (parquet blobs) through the front half into
    * `outDir`; checkpointed AvailableNow, so scheduled re-runs resume
    * incrementally and a crashed run re-commits idempotently. */
  def crawlIngest(
      spark: SparkSession,
      landingDir: String,
      outDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 100): StreamingQuery = {
    val raw = spark.readStream
      .schema(blobSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
    scoredRows(raw)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
