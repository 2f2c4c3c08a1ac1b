package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.llm.{ImagePhash, MediaIndex}

/** Streaming perceptual-dedup screen — [[DocStream.nearDupScreen]]'s
  * MEDIA twin: each micro-batch of landed assets is fingerprinted
  * through the REAL codec path ([[ImagePhash]]) and screened against
  * the persistent [[MediaIndex]], emitting near-dup pairs
  * (within-batch and cross-batch) while the batch's fingerprints join
  * the index for the next batch to screen against.
  *
  * Delivery semantics are the screen family's: the stream is
  * at-least-once, membership composes to exactly-once through
  * checkAndAdd's live anti-join (a replayed batch is a no-op), and
  * pairs are at-least-once (the onPairs hook commits BEFORE the
  * membership append; the batch_id column lets a consumer dedup).
  */
object MediaStream {

  /** Screen a landing directory of (doc_id, enc) asset rows into
    * `indexDir`, appending discovered pairs to `pairsOutDir`.
    * `AvailableNow`: drains what exists, then stops (the
    * scheduled-batch cadence; checkpointed, so re-runs resume
    * incrementally). One landed file per micro-batch by default, so
    * separately-landed encodings of the same content exercise the
    * cross-generation screen. */
  def phashScreen(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      indexDir: String,
      pairsOutDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val hashes = ImagePhash.avgHash(ImagePhash.synthAssetRows(batch))
          .toDF.select("asset_id", "hash")
        MediaIndex.checkAndAdd(batch.sparkSession, indexDir, hashes,
          onPairs = p => p.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(pairsOutDir))
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
