package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.llm.CorpusEtlConfig
import graft.queries.{Redact, TextOps}

/** Streaming corpus ingest — the in-flight half of the LLM data pipeline
  * ([[graft.llm.CorpusEtl]] is the batch half): documents land as parquet
  * files, and each micro-batch is repetition-filtered, exact-deduped and
  * PII-scrubbed before it reaches the store, so downstream batch jobs
  * (near-dup clustering, profiling) start from a clean corpus.
  *
  * Stage shapes, chosen for bounded streaming state:
  *  - the quality filter is [[TextOps.repetitionStatsInline]] — stateless,
  *    shuffle-free, per-row;
  *  - exact dedup keys on the md5 content digest via
  *    `dropDuplicatesWithinWatermark`: a duplicate arriving within the
  *    watermark horizon of its first copy is dropped, and the digest's
  *    state cell is evicted once the watermark passes — state is
  *    O(docs per horizon), never O(corpus). (Plain `dropDuplicates` on a
  *    non-event-time key would keep every digest forever.) Re-landed
  *    files beyond the horizon re-ingest — collapsed later by the batch
  *    d1/c1 pass, exactly the reference's snapshot-reingest-then-collapse
  *    posture (oracle.rs:314-389);
  *  - the scrub is pure `regexp_replace` column work, after the dedup so
  *    it runs once per kept document.
  */
object DocStream {

  /** Filter + dedup + scrub a landing directory into a store directory.
    * `schema` must carry `text` plus timestamp `ingestTimeCol` (the
    * event-time for the dedup watermark). Returns the started query
    * (`AvailableNow`: drains what exists, then stops — the scheduled-
    * batch cadence; checkpointed, so re-runs resume incrementally). */
  def preparedIngest(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      outDir: String,
      checkpointDir: String,
      ingestTimeCol: String = "ingest_ts",
      watermark: String = "1 hour",
      cfg: CorpusEtlConfig = CorpusEtlConfig(),
      maxFilesPerTrigger: Int = 100): StreamingQuery = {
    val raw = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
    prepared(raw, ingestTimeCol, watermark, cfg)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The transform alone (works on a streaming or batch frame): quality
    * filter → watermarked exact dedup → scrub. Exposed so specs and
    * non-parquet sinks can drive it directly. */
  def prepared(
      docs: DataFrame,
      ingestTimeCol: String,
      watermark: String,
      cfg: CorpusEtlConfig = CorpusEtlConfig()): DataFrame = {
    val kept = TextOps.repetitionStatsInline(docs)
      .where(col("n_tokens") >= cfg.minTokens &&
        col("dup_2g_frac") <= cfg.maxDup2gFrac &&
        col("dup_3g_frac") <= cfg.maxDup3gFrac &&
        col("top_tok_frac") <= cfg.maxTopTokFrac)
    val deduped = kept
      .withColumn("content_hash", md5(col("text")))
      .withWatermark(ingestTimeCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
    Redact.scrub(deduped)
      .drop("text")
  }

  /** Streaming near-dup screening against the accumulated corpus: each
    * micro-batch is checked against (and appended to) the persistent
    * [[graft.llm.DedupIndex]] via `foreachBatch`, and the pairs it
    * completes land in `pairsOutDir` — the streaming half of the
    * dedup-service pattern (the exact in-flight dedup above handles
    * byte-identical copies; this catches near-duplicates against
    * EVERYTHING ingested so far, not just the watermark horizon).
    *
    * foreachBatch is the right harness: the index join needs the
    * on-disk postings (arbitrary-past state, beyond any watermark), and
    * re-delivery is safe because [[graft.llm.DedupIndex.checkAndAdd]]
    * drops already-indexed doc ids up front (its membership ledger is
    * the commit point) — a replayed batch re-checks only the docs whose
    * index append never committed. The pair write hangs on the index's
    * onPairs hook, committing before the ledger, so pairs are delivered
    * at-least-once (the batch_id column lets a consumer dedup). */
  def nearDupScreen(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      indexDir: String,
      pairsOutDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 100,
      compactEvery: Int = 50,
      compactTargetFiles: Int = 8): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the pair write rides checkAndAdd's onPairs hook so it commits
        // BEFORE the membership ledger: a crash in between replays the
        // batch and re-emits (at-least-once, dedupable by batch_id) —
        // writing after checkAndAdd returned would lose the pairs
        // forever on that crash (the replay would drop the now-ledgered
        // docs and recompute nothing)
        graft.llm.DedupIndex.checkAndAdd(batch.sparkSession, indexDir, batch,
          pairs => pairs.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(pairsOutDir))
        // Compaction rides the SERVICE's own cadence (the weather
        // store's maintenance-in-the-loop discipline): every append-only
        // batch adds files, and a long-lived screen accumulates
        // thousands whose listing + footer cost grows every batch's
        // index join. batchId is checkpointed and monotonic across
        // restarts, so the cadence survives them; compact serializes
        // against checkAndAdd on the shared WriterLock, and a replayed
        // compaction batch just re-observes file counts at target.
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          graft.llm.DedupIndex.compact(batch.sparkSession, indexDir,
            compactTargetFiles)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming LEXICAL-index ingest — [[nearDupScreen]]'s twin for
    * [[graft.llm.TextIndex]]: each micro-batch of landed documents is
    * tokenized once and appended to the persistent BM25 index, so
    * retrieval (topic selection over the growing corpus) never re-reads
    * text. The stream's at-least-once delivery composes to exactly-once
    * membership through add()'s ledger anti-join (a replayed batch is a
    * no-op; a crash between the postings and ledger appends leaves
    * duplicates the read path collapses and compaction reclaims).
    * Compaction rides the checkpointed batch-id cadence, serialized
    * against add on the index WriterLock — the same
    * maintenance-in-the-loop discipline as the dedup screen and the
    * vector graph ingest. */
  def textIngest(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      indexDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 100,
      compactEvery: Int = 50,
      compactTargetFiles: Int = 8): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.llm.TextIndex.add(batch.sparkSession, indexDir, batch)
        if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
          graft.llm.TextIndex.compact(batch.sparkSession, indexDir,
            compactTargetFiles)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
