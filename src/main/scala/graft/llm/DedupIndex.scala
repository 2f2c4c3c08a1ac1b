package graft.llm

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.TextOps

/** Incremental near-duplicate index — the "dedup service" pattern a
  * production pipeline runs once the corpus stops fitting in one job:
  * new document batches are checked against the ACCUMULATED MinHash
  * index instead of re-deduping the whole corpus, then appended to it.
  *
  * On-disk layout under `dir` (plain parquet, append-only):
  *  - `sigs/`  — one row per indexed document: (doc_id, h sorted
  *    xxhash64 shingle hashes, n, sigs minhash array); the verify side
  *    AND the membership ledger (written LAST — the batch's commit
  *    point).
  *  - `bands/` — the exploded LSH postings: (band, mh, doc_id); the
  *    candidate-join side, keyed exactly like the batch pipeline's
  *    bucket join.
  *
  * Re-delivery safety (foreachBatch retries, at-least-once feeds):
  * already-indexed doc ids are dropped from the batch up front by an
  * anti-join against `sigs/`, so re-running a batch whose sigs append
  * committed is a no-op. A crash BETWEEN the bands append and the sigs
  * append leaves orphan postings; the retry then reprocesses those docs
  * (they are absent from the ledger) and appends their postings again —
  * duplicate postings only ever duplicate CANDIDATES, which the
  * explicit `distinct` on candidate pairs collapses, and `sigs/` itself
  * stays exactly-once. Durable pair consumers attach via `onPairs`,
  * which fires before the ledger commit — so pair delivery is
  * at-least-once, never silently lost (once the ledger commits, a
  * replay drops the docs and cannot recompute their pairs).
  *
  * Scale shape of [[checkAndAdd]]: the NEW batch's postings join the
  * index postings on (band, mh) — shuffle keyed on the bucket, index
  * side pruned to the buckets the batch touches by the join itself;
  * nothing ever rescans the corpus text. Verification joins only the
  * candidate doc ids back to `sigs/`. At 100 TB the postings table is
  * what you'd bucket-partition by (band, mh) so the batch join is
  * co-located.
  *
  * Exactness contract (DedupIndexSpec): feeding any partition of a
  * corpus through successive checkAndAdd calls emits, across all
  * calls, EXACTLY the batch pipeline's pair set (same first-shared-band
  * candidate rule, same fused-kernel verification, same 0.05 floor) —
  * each cross-batch pair once, from the batch that completed it.
  */
object DedupIndex {

  val MinJaccard = 0.05

  private def sigsPath(dir: String) = s"$dir/sigs"
  private def bandsPath(dir: String) = s"$dir/bands"

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = fsOf(spark, p)
    fs.exists(path) && fs.listStatus(path).exists(s =>
      !s.getPath.getName.startsWith("_"))
  }

  private def guardCompaction(spark: SparkSession, dir: String): Unit =
    for (t <- Seq("sigs", "bands")) {
      val old = new org.apache.hadoop.fs.Path(s"$dir/$t.old")
      if (fsOf(spark, dir).exists(old))
        sys.error(s"interrupted compaction detected ($dir/$t.old exists); " +
          s"recover by renaming it back to $dir/$t (or deleting it if " +
          s"$dir/$t is complete) before using the index")
    }

  /** Check `newDocs` (doc_id, text, …) against the index AND against
    * each other, append them to the index, and return the verified
    * near-dup pairs this batch completes: (doc_a, doc_b, n_common,
    * jaccard), doc_a < doc_b. Re-delivered doc ids are skipped (see the
    * class doc's re-delivery contract).
    *
    * `onPairs` runs over the materialized pairs BEFORE the ledger
    * append commits — a durable pair sink must hang here, not on the
    * returned frame: once the ledger commits, a replay drops the docs
    * and can never recompute their pairs. Delivery through `onPairs` is
    * at-least-once (a crash between the sink write and the ledger
    * commit replays the batch and re-emits). */
  def checkAndAdd(spark: SparkSession, dir: String, newDocs: DataFrame,
      onPairs: DataFrame => Unit = _ => ()): DataFrame =
      graft.store.WriterLock.forIndex(spark, dir).withLock {
    guardCompaction(spark, dir)
    val hasSigs = exists(spark, sigsPath(dir))
    val hasBands = exists(spark, bandsPath(dir))

    val fresh =
      if (!hasSigs) newDocs
      else newDocs.join(
        spark.read.parquet(sigsPath(dir)).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
    val newSigs = TextOps.sigFrame(fresh).localCheckpoint(true)
    // sigs ride the posexplode — no join-back to re-attach them
    val newBands = newSigs.select(col("doc_id"), col("sigs"),
      posexplode(col("sigs")).as(Seq("band", "mh")))

    // within-batch candidates (both sides new)
    val within = newBands
      .select(col("doc_id").as("doc_a"), col("sigs").as("sig_a"),
        col("band"), col("mh"))
      .join(newBands.select(col("doc_id").as("doc_b"), col("sigs").as("sig_b"),
        col("band"), col("mh")), Seq("band", "mh"))
      .where(col("doc_a") < col("doc_b"))
      .where(col("band") === TextOps.firstSharedBand)
      .select("doc_a", "doc_b")

    // cross-generation candidates (new × indexed)
    val cross =
      if (!hasBands || !hasSigs) within.limit(0)
      else {
        val idxBands = spark.read.parquet(bandsPath(dir))
          .join(spark.read.parquet(sigsPath(dir)).select(col("doc_id"), col("sigs")),
            "doc_id")
        newBands.select(col("doc_id").as("new_id"), col("sigs").as("new_sigs"),
            col("band"), col("mh"))
          .join(idxBands.select(col("doc_id").as("old_id"), col("sigs").as("old_sigs"),
            col("band"), col("mh")), Seq("band", "mh"))
          .where(col("new_id") =!= col("old_id"))
          // normalize to doc_a < doc_b BEFORE the first-band rule so the
          // (sig_a, sig_b) orientation matches the batch pipeline's
          .select(
            least(col("new_id"), col("old_id")).as("doc_a"),
            greatest(col("new_id"), col("old_id")).as("doc_b"),
            when(col("new_id") < col("old_id"), col("new_sigs"))
              .otherwise(col("old_sigs")).as("sig_a"),
            when(col("new_id") < col("old_id"), col("old_sigs"))
              .otherwise(col("new_sigs")).as("sig_b"),
            col("band"))
          .where(col("band") === TextOps.firstSharedBand)
          .select("doc_a", "doc_b")
      }

    val allSigs =
      if (!hasSigs) newSigs
      else newSigs.unionByName(spark.read.parquet(sigsPath(dir)))
    // distinct: the candidate set is small (post-LSH) and this is what
    // makes orphan postings from a torn append harmless — duplicated
    // postings duplicate candidates, never verified pairs
    val pairs = TextOps.verifyPairs(
        within.unionByName(cross).distinct(), allSigs, MinJaccard)
      .select("doc_a", "doc_b", "n_common", "jaccard")
      .localCheckpoint(true) // materialize before the index appends below
    onPairs(pairs) // durable sinks commit before the ledger does

    // bands first, sigs LAST: sigs is the membership ledger the anti-join
    // keys on, so a crash between the two reprocesses the batch instead
    // of silently skipping docs whose postings were never written
    newBands.select("band", "mh", "doc_id")
      .write.mode(SaveMode.Append).parquet(bandsPath(dir))
    newSigs.write.mode(SaveMode.Append).parquet(sigsPath(dir))
    pairs
  } // WriterLock released here

  /** Indexed document count (observability). */
  def size(spark: SparkSession, dir: String): Long =
    if (!exists(spark, sigsPath(dir))) 0L
    else spark.read.parquet(sigsPath(dir)).count()

  /** Compact the append-only index (each checkAndAdd batch appends its
    * own files; a long-lived service accumulates thousands). Unlike
    * `WeatherStore.compactPartition` — whose readers tolerate duplicate
    * rows by design — index readers do NOT, so this swap is per-TABLE
    * directory renames (atomic on HDFS/local), never a state where old
    * and compacted rows coexist: write `t.compacting`, rename `t` →
    * `t.old`, rename `t.compacting` → `t`, delete `t.old`. A crash
    * mid-swap leaves `t.old` behind; [[checkAndAdd]] refuses to run
    * until it is recovered (guardCompaction) rather than reading a
    * half-swapped index. Serialized against [[checkAndAdd]] by the
    * shared [[graft.store.WriterLock]] — a mis-scheduled overlap waits
    * (up to the index envelope) instead of corrupting the swap. */
  def compact(spark: SparkSession, dir: String,
      numFiles: Int = 8): Map[String, (Int, Int)] =
      graft.store.WriterLock.forIndex(spark, dir).withLock {
    guardCompaction(spark, dir)
    Seq("sigs" -> sigsPath(dir), "bands" -> bandsPath(dir)).map { case (name, p) =>
      if (!exists(spark, p)) name -> (0, 0)
      else {
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = fsOf(spark, p)
        val nOld = fs.listStatus(path).count(s =>
          !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
        if (nOld <= numFiles) name -> (nOld, nOld)
        else {
          val compacting = new org.apache.hadoop.fs.Path(p + ".compacting")
          val old = new org.apache.hadoop.fs.Path(p + ".old")
          fs.delete(compacting, true) // leftovers from an aborted WRITE are safe to drop
          spark.read.parquet(p).repartition(numFiles)
            .write.parquet(compacting.toString)
          val nNew = fs.listStatus(compacting).count(_.getPath.getName.endsWith(".parquet"))
          if (!fs.rename(path, old))
            sys.error(s"index compaction aborted: rename $path -> $old failed")
          if (!fs.rename(compacting, path)) {
            fs.rename(old, path) // restore; both renames on one local fs
            sys.error(s"index compaction aborted: rename $compacting -> $path failed")
          }
          fs.delete(old, true)
          name -> (nOld, nNew)
        }
      }
    }.toMap
  } // WriterLock released here
}
