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
  *    xxhash64 shingle hashes, n, sigs minhash array); the verify side.
  *  - `bands/` — the exploded LSH postings: (band, mh, doc_id); the
  *    candidate-join side, keyed exactly like the batch pipeline's
  *    bucket join.
  *
  * Scale shape of [[checkAndAdd]]: the NEW batch's postings join the
  * index postings on (band, mh) — shuffle keyed on the bucket, index
  * side pruned to the buckets the batch touches by the join itself;
  * nothing ever rescans the corpus text. Verification joins only the
  * candidate doc ids back to `sigs/`. At 100 TB the postings table is
  * what you'd bucket-partition by (band, mh) so the batch join is
  * co-located; the append-only layout is compatible with
  * `WeatherStore.compactPartition`-style maintenance.
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

  private def exists(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) && fs.listStatus(path).exists(s =>
      !s.getPath.getName.startsWith("_"))
  }

  /** Check `newDocs` (doc_id, text, …) against the index AND against
    * each other, append them to the index, and return the verified
    * near-dup pairs this batch completes: (doc_a, doc_b, n_common,
    * jaccard), doc_a < doc_b. Ids must be globally unique and unseen
    * (the caller's corpus contract). */
  def checkAndAdd(spark: SparkSession, dir: String, newDocs: DataFrame): DataFrame = {
    val newSigs = TextOps.sigFrame(newDocs).localCheckpoint(true)
    val newBands = newSigs.select(col("doc_id"),
      posexplode(col("sigs")).as(Seq("band", "mh")))

    val hasIndex = exists(spark, bandsPath(dir))
    // within-batch candidates (both sides new)
    val a = newBands.join(newSigs.select(col("doc_id"), col("sigs").as("sig_a")), "doc_id")
      .select(col("doc_id").as("doc_a"), col("sig_a"), col("band"), col("mh"))
    val b = newBands.join(newSigs.select(col("doc_id"), col("sigs").as("sig_b")), "doc_id")
      .select(col("doc_id").as("doc_b"), col("sig_b"), col("band"), col("mh"))
    val within = a.join(b, Seq("band", "mh"))
      .where(col("doc_a") < col("doc_b"))
      .where(col("band") === TextOps.firstSharedBand)
      .select("doc_a", "doc_b")

    // cross-generation candidates (new × indexed) — the index side of
    // the join carries its sigs by a postings→sigs join on doc_id
    val cross =
      if (!hasIndex) within.limit(0)
      else {
        val idxSigs = spark.read.parquet(sigsPath(dir))
        val idxBands = spark.read.parquet(bandsPath(dir))
          .join(idxSigs.select(col("doc_id"), col("sigs")), "doc_id")
        val newSide = newBands
          .join(newSigs.select(col("doc_id"), col("sigs")), "doc_id")
        newSide.select(col("doc_id").as("new_id"), col("sigs").as("new_sigs"),
            col("band"), col("mh"))
          .join(idxBands.select(col("doc_id").as("old_id"), col("sigs").as("old_sigs"),
            col("band"), col("mh")), Seq("band", "mh"))
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
      if (!hasIndex) newSigs
      else newSigs.unionByName(spark.read.parquet(sigsPath(dir)))
    val pairs = TextOps.verifyPairs(within.unionByName(cross), allSigs, MinJaccard)
      .select("doc_a", "doc_b", "n_common", "jaccard")
      .localCheckpoint(true) // materialize before the index append below

    newSigs.write.mode(SaveMode.Append).parquet(sigsPath(dir))
    newBands.select("band", "mh", "doc_id")
      .write.mode(SaveMode.Append).parquet(bandsPath(dir))
    pairs
  }

  /** Indexed document count (observability). */
  def size(spark: SparkSession, dir: String): Long =
    if (!exists(spark, sigsPath(dir))) 0L
    else spark.read.parquet(sigsPath(dir)).count()

  /** Compact the append-only index (each checkAndAdd batch appends its
    * own files; a long-lived service accumulates thousands). Maintenance
    * op for a quiet window — same single-maintainer discipline as
    * `WeatherStore.compactPartition`: rewrite to `numFiles`, swap via
    * temp dir + rename. Returns (filesBefore, filesAfter) per table. */
  def compact(spark: SparkSession, dir: String,
      numFiles: Int = 8): Map[String, (Int, Int)] =
    Seq("sigs" -> sigsPath(dir), "bands" -> bandsPath(dir)).map { case (name, p) =>
      if (!exists(spark, p)) name -> (0, 0)
      else {
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val old = fs.listStatus(path).map(_.getPath)
          .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
        if (old.length <= numFiles) name -> (old.length, old.length)
        else {
          val tmp = new org.apache.hadoop.fs.Path(path,
            ".compact-" + java.util.UUID.randomUUID().toString)
          spark.read.parquet(p).repartition(numFiles).write.parquet(tmp.toString)
          val parts = fs.listStatus(tmp).map(_.getPath)
            .filter(_.getName.endsWith(".parquet"))
          parts.zipWithIndex.foreach { case (f, i) =>
            val dest = new org.apache.hadoop.fs.Path(path,
              s"compact-${tmp.getName.stripPrefix(".compact-")}-part$i.parquet")
            if (!fs.rename(f, dest))
              sys.error(s"index compaction aborted: rename $f -> $dest failed")
          }
          old.foreach(f => fs.delete(f, false))
          fs.delete(tmp, true)
          name -> (old.length, parts.length)
        }
      }
    }.toMap
}
