package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming embedding ingest into the persistent kNN graph — the
  * vector-side twin of [[DocStream.nearDupScreen]]: each micro-batch of
  * (vec_id, embedding) rows is folded into [[graft.llm.KnnGraphIndex]],
  * which finalizes the batch's own neighbor lists and rewrites the
  * existing lists it displaces, so the STORED graph is always the exact
  * bucket-mate top-k of everything ingested so far.
  *
  * foreachBatch is the right harness for the same reasons as the dedup
  * screen: the merge needs the on-disk graph (arbitrary-past state,
  * beyond any watermark), and re-delivery is safe because `add`'s
  * vectors ledger is the commit point — a replayed batch re-merges only
  * vectors whose ledger append never committed, and the identical graph
  * rows it may re-append collapse in the reader's resolve.
  *
  * Generation-delta compaction rides the service's own cadence
  * (batchId is checkpointed and monotonic across restarts), exactly
  * like the dedup screen's file compaction and the weather store's
  * day-rollover maintenance: without it a long-lived ingest accumulates
  * one delta generation per batch and every read pays the
  * latest-generation window over all of them.
  */
object VectorStream {

  def graphIngest(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      indexDir: String,
      checkpointDir: String,
      k: Int = 3,
      maxFilesPerTrigger: Int = 100,
      compactEvery: Int = 50,
      compactTargetFiles: Int = 8): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llm.KnnGraphIndex.add(batch.sparkSession, indexDir,
          batch.select("vec_id", "embedding"), k)
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          graft.llm.KnnGraphIndex.compact(batch.sparkSession, indexDir,
            compactTargetFiles)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
