package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed tables for co-located joins (SCALING.md): two fact tables
  * bucketed + sorted on the same key join with ZERO exchanges — each task
  * reads matching bucket files from both sides and merge-joins them. At
  * 100 TB this is the difference between re-shuffling both fact tables on
  * every join and shuffling once at write time, amortized over every
  * subsequent join/aggregation on the bucket key.
  *
  * Bucket count is a layout decision: pick ≈ (largest expected join's
  * parallelism); all co-joined tables must share count + key.
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted table. Managed (lives in
    * the session's warehouse dir) unless `path` pins an external
    * location — gated queries use an external tmp path so a verify run
    * never writes inside the caller's working directory. */
  def write(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, mode: SaveMode = SaveMode.Overwrite,
      path: Option[String] = None): Unit = {
    require(bucketCols.nonEmpty && numBuckets > 0)
    val w = df.write
      .mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
