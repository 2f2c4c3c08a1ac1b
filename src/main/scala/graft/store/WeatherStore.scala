package graft.store

import java.sql.Timestamp
import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Date/kind-partitioned Parquet snapshot store — the Spark-native
  * replacement for the reference's hand-rolled date-directory file layout
  * and filename scanning (crates/oracle/src/file_access.rs:84-145;
  * crates/daemon/src/main.rs:84-98).
  *
  * Layout: `root/kind={forecasts|observations}/date=YYYY-MM-DD/` parquet
  * files, with an explicit `snapshot_ts` column replacing the reference's
  * filename-embedded RFC-3339 timestamp. Benefits at scale:
  *  - Catalyst partition pruning replaces the hand-rolled directory walk
  *    (file_access.rs:119-145) — `.where($"date".between(...))` prunes
  *    at planning time, no driver-side listing logic;
  *  - `snapshot_ts` min/max parquet statistics replace the filename
  *    timestamp filter (file_access.rs:47-79) with row-group skipping;
  *  - `mergeSchema` replaces `union_by_name = true`
  *    (weather_data.rs:101-104) for schema drift across snapshots.
  */
final class WeatherStore(spark: SparkSession, root: String) {

  import WeatherStore._

  /** Append one snapshot. `snapshotTs` identifies the ingest run (the
    * reference encodes it in the filename).
    *
    * `numFiles` defaults to the reference's one-small-file-per-snapshot
    * layout; a large snapshot (or a backfill job) passes the parallelism
    * it needs — the write is `numFiles` tasks, not a single-task funnel. */
  def write(df: DataFrame, kind: String, snapshotTs: Timestamp,
      numFiles: Int = 1): Unit =
    df.withColumn("snapshot_ts", lit(snapshotTs))
      .withColumn("date", to_date(lit(snapshotTs)))
      .withColumn("kind", lit(kind))
      .repartition(numFiles)
      .write
      .mode(SaveMode.Append)
      .partitionBy("kind", "date")
      .parquet(root)

  /** Pruned scan of one kind over [start, end]. Forecast reads pad the
    * start back one day (weather_data.rs:78-85) so snapshots generated
    * the previous day still contribute rows; both also filter on the
    * snapshot timestamp like the reference's filename check.
    *
    * Returns None when nothing exists (the reference's early-exit on an
    * empty file list, weather_data.rs:87-89). */
  def read(kind: String, start: Timestamp, end: Timestamp): Option[DataFrame] = {
    val padDays = if (kind == Kinds.Forecasts) 1 else 0
    val startDate = toUtcDate(start).minusDays(padDays)
    val endDate = toUtcDate(end)
    if (!exists(kind)) None
    else {
      // Scan only the kind's subtree: forecasts and observations have
      // different schemas (merging across kinds is both wrong and a
      // listing cost at scale); date pruning happens inside it.
      val df = spark.read
        .option("mergeSchema", "true")
        .option("basePath", root)
        .parquet(s"$root/kind=$kind")
        .where(col("date").between(
          lit(java.sql.Date.valueOf(startDate)), lit(java.sql.Date.valueOf(endDate))) &&
          col("snapshot_ts").between(
            lit(Timestamp.from(startDate.atStartOfDay(ZoneOffset.UTC).toInstant)),
            lit(end)))
      Some(df)
    }
  }

  /** Whole-kind scan (ad-hoc SQL surface). */
  def readAll(kind: String): Option[DataFrame] =
    if (!exists(kind)) None
    else Some(spark.read.option("mergeSchema", "true")
      .option("basePath", root).parquet(s"$root/kind=$kind"))

  private def exists(kind: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$root/kind=$kind")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s => !s.getPath.getName.startsWith("_"))
  }

  /** Merge one (kind, date) partition's many small snapshot files into
    * `targetFiles` — the maintenance job the reference's one-file-per-
    * hourly-run layout (parquet_handler.rs:26-36) makes necessary at
    * scale: a year of hourly ingest is ~8,760 tiny files per kind whose
    * listing + footer cost dominates the scan.
    *
    * Safety: the compacted output is written to a dot-prefixed temp dir
    * (invisible to Spark's file listing), fully materialized, then
    * renamed into the partition file-by-file (rename is atomic per
    * file; a failed rename aborts BEFORE any original file is deleted,
    * leaving the partition intact plus an ignorable temp dir). A scan
    * that resolves its file listing after any rename and before the
    * deletes can observe a row twice — the duplication the store's read
    * discipline already tolerates (A1's level-1 GROUP BY, streaming
    * dropDuplicates; SURVEY §2.8). A scan holding a listing resolved
    * BEFORE the swap can fail on the deleted files, like any vacuum —
    * run compaction where in-flight scans either retry or don't overlap
    * the maintenance window (the reference's store has the same
    * single-maintainer discipline; the event store, whose readers are
    * continuous, uses versioned swaps instead).
    *
    * @return (filesBefore, filesAfter) for observability */
  def compactPartition(kind: String, date: java.time.LocalDate,
      targetFiles: Int = 1): (Int, Int) =
    rewritePartition(kind, date, targetFiles)(_.repartition(targetFiles))

  /** [[compactPartition]] that also Z-ORDERS the rewritten files by
    * (station_id, snapshot_ts) — the two columns every scoring/read
    * path filters on (station lists + snapshot time windows;
    * weather_data.rs:47-85's filename filter and the A1/J7 station
    * predicates). The string dimension enters the Morton curve through
    * its dense lexicographic rank, joined in from a RANK DIMENSION
    * built off the partition itself (distinct ids + one dimension-sized
    * row_number sort, then a broadcast equi-join back) — never a
    * collected driver map: a plan-literal map bloats the plan and caps
    * the key universe at driver memory, where the join form carries an
    * unbounded station universe for one dimension-table broadcast
    * (100k-id case exercised by WeatherStoreSpec). Per-file min/max
    * stats stay narrow in BOTH dimensions so parquet footer skipping
    * works for either predicate alone — the `OPTIMIZE ZORDER BY`
    * nightly a lakehouse runs, here as the store's own maintenance op
    * ([[maintain]] wires it to the ingest loop's day rollover). */
  def zOrderPartition(kind: String, date: java.time.LocalDate,
      targetFiles: Int = 1): (Int, Int) =
    rewritePartition(kind, date, targetFiles) { df =>
      // rank dimension: dimension-sized (distinct station ids), ordered
      // by a single-partition window — fine for a dimension, never run
      // on the fact rows
      val rankDim = df.select("station_id")
        .where(col("station_id").isNotNull).distinct()
        .withColumn("__rk",
          (row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy("station_id")) - 1).cast("long"))
      val nStations = rankDim.count()
      // null station ids sort at rank 0, sharing it with the first
      // station — same contract as the previous literal-map lookup
      val withDims = df
        .join(broadcast(rankDim), Seq("station_id"), "left")
        .withColumn("__rk", coalesce(col("__rk"), lit(0L)))
        .withColumn("__tsd", col("snapshot_ts").cast("double"))
      val b = withDims.agg(min("__tsd"), max("__tsd")).head()
      val (tsMin, tsMax) =
        if (b.isNullAt(0)) (0.0, 0.0) else (b.getDouble(0), b.getDouble(1))
      val z = ZOrder.zValue(Seq(col("__rk"), col("__tsd")),
        Seq(0.0, tsMin), Seq(math.max(nStations - 1, 1).toDouble, tsMax))
      withDims.withColumn("__z", z)
        .repartitionByRange(targetFiles, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__rk", "__tsd", "__z")
    }

  /** The store's nightly maintenance for one closed `date`: both kinds
    * compacted AND z-ordered in one rewrite each. Returns
    * kind → (filesBefore, filesAfter). Called by the ingest loop when a
    * tick's UTC date rolls past the previous tick's (IngestTick). */
  def maintain(date: java.time.LocalDate,
      targetFiles: Int = 1): Map[String, (Int, Int)] =
    Seq(Kinds.Forecasts, Kinds.Observations)
      .map(k => k -> zOrderPartition(k, date, targetFiles)).toMap

  /** Closed dates still needing maintenance: every `date=` partition
    * strictly before `before` that, in either kind, has more than
    * `targetFiles` data files OR any file not carrying the `compact-`
    * rewrite prefix — the filename is the clustering marker, so a
    * one-snapshot day (few files but never z-ordered: no min/max
    * locality for footer skipping) still gets clustered exactly once,
    * and an already-maintained day is never rewritten again just for
    * existing. This is what makes maintenance scheduling STATELESS —
    * a restarted daemon (or one that slept across several days) derives
    * its backlog from the store itself instead of an in-memory
    * last-tick date (IngestTick seeds from this on every rollover and
    * on its first tick). Driver-side listing, O(partition dirs) — the
    * same directory walk any scan's file discovery already pays. */
  def datesNeedingMaintenance(before: LocalDate,
      targetFiles: Int = 1): Seq[LocalDate] =
    Seq(Kinds.Forecasts, Kinds.Observations).flatMap { kind =>
      val p = new org.apache.hadoop.fs.Path(s"$root/kind=$kind")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Seq.empty[LocalDate]
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("date="))
        .flatMap { d =>
          scala.util.Try(
            LocalDate.parse(d.getPath.getName.stripPrefix("date="))).toOption
            .filter(_.isBefore(before))
            .filter { _ =>
              val data = fs.listStatus(d.getPath).map(_.getPath.getName)
                .filter(n => !n.startsWith("_") && !n.startsWith("."))
              data.length > targetFiles ||
                data.exists(!_.startsWith("compact-"))
            }
        }
    }.distinct.sortBy(_.toEpochDay)

  /** Shared rewrite-and-swap machinery of [[compactPartition]] /
    * [[zOrderPartition]]: `arrange` shapes the partition's rows into
    * the new file layout; everything else (dot-prefixed temp dir,
    * rename-before-delete, abort-on-failed-rename) is the safety
    * discipline documented on [[compactPartition]]. */
  private def rewritePartition(kind: String, date: java.time.LocalDate,
      targetFiles: Int)(arrange: DataFrame => DataFrame): (Int, Int) = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    val dir = new org.apache.hadoop.fs.Path(s"$root/kind=$kind/date=$date")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) (0, 0)
    else {
      val isData = (n: String) => !n.startsWith("_") && !n.startsWith(".")
      val old = fs.listStatus(dir).map(_.getPath).filter(p => isData(p.getName))
      // no-op ONLY when the partition is both small enough and already
      // clustered (every file carries the rewrite's `compact-` prefix) —
      // a raw one-snapshot day must still get its one clustering pass
      if (old.length <= targetFiles &&
          old.forall(_.getName.startsWith("compact-"))) (old.length, old.length)
      else {
        // read the partition dir directly: partition columns live in the
        // dir name, so the rewritten files carry exactly the data columns
        val tmp = new org.apache.hadoop.fs.Path(dir,
          ".compact-" + java.util.UUID.randomUUID().toString)
        // tight range boundaries for the clustering shuffle: the default
        // 100 samples/partition lets a boundary land deep inside the
        // next z-region on interleaved layouts, leaving one file spread
        // across the whole rank universe (measured: p5-p95 spread 87k of
        // a 100k universe on one in ~30 runs). One day's partition is
        // small relative to the store, so the extra sampling pass is
        // noise; the payoff is deterministic footer-skipping locality.
        // scope the override to a child session: newSession shares the
        // SparkContext (and its spark.sql.* builder conf) but owns its
        // SQLConf, so a concurrent query on the caller's session never
        // sees the 100× sampling rate — set/restore on the shared conf
        // would leak it for the duration of the rewrite
        val scoped = spark.newSession()
        scoped.conf.set(
          "spark.sql.execution.rangeExchange.sampleSizePerPartition", "10000")
        arrange(scoped.read.option("mergeSchema", "true").parquet(dir.toString))
          .write.parquet(tmp.toString)
        val parts = fs.listStatus(tmp).map(_.getPath)
          .filter(p => p.getName.endsWith(".parquet"))
        // FileSystem.rename reports failure by RETURNING false — abort
        // before touching any original file, or a failed rename would be
        // followed by deleting both the originals and the only compacted
        // copy
        parts.zipWithIndex.foreach { case (p, i) =>
          val dest = new org.apache.hadoop.fs.Path(dir,
            s"compact-${tmp.getName.stripPrefix(".compact-")}-part$i.parquet")
          if (!fs.rename(p, dest))
            sys.error(s"compaction aborted: rename $p -> $dest failed; " +
              "originals left untouched")
        }
        old.foreach(p => fs.delete(p, false))
        fs.delete(tmp, true)
        (old.length, parts.length)
      }
    }
  }

  /** S9 — land an externally-produced parquet file (the reference's upload
    * endpoint, routes/files/upload.rs:22-91, minus the HTTP shell): the
    * name must be exactly one normal path component ending in `.parquet`
    * (path-traversal guard, upload.rs:71-91), and the bytes land under the
    * kind/date partition dir where the next scan picks them up. */
  def landFile(fileName: String, bytes: Array[Byte], kind: String,
      snapshotTs: Timestamp): Unit = {
    require(WeatherStore.uploadNameIsValid(fileName),
      s"invalid upload name: $fileName (need a single .parquet path component)")
    val dir = new org.apache.hadoop.fs.Path(
      s"$root/kind=$kind/date=${WeatherStore.toUtcDate(snapshotTs)}")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    // The reference's RFC-3339 filenames contain ':', which hadoop Path
    // rejects (and HDFS forbids) — the PHYSICAL name is sanitized; the
    // logical name stays the API surface. Reads key off the snapshot_ts
    // column, never the filename, so the mapping is lossless.
    val physical = fileName.replace(':', '-')
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, physical), false)
    try out.write(bytes) finally out.close()
  }
}

object WeatherStore {
  object Kinds {
    val Forecasts = "forecasts"
    val Observations = "observations"
  }

  def toUtcDate(ts: Timestamp): LocalDate =
    Instant.ofEpochMilli(ts.getTime).atZone(ZoneOffset.UTC).toLocalDate

  /** Structural parquet check on upload payloads: the PAR1 magic at
    * both ends (the format's own framing). The reference validates only
    * the NAME (upload.rs:22-91); this store must be stricter because
    * its readers union every file in the partition dir (S10) — one
    * landed junk file would poison every later scan of that partition,
    * the multi-file analog of the poison-blob clamp. Not a full footer
    * parse: cheap, byte-local, and enough to keep non-parquet bytes
    * out of the scan path (a corrupt-but-framed file still fails its
    * own read, which parquet reports per file). */
  def looksLikeParquet(bytes: Array[Byte]): Boolean = {
    val magic = "PAR1".getBytes("US-ASCII")
    bytes.length >= 12 &&
      bytes.take(4).sameElements(magic) &&
      bytes.takeRight(4).sameElements(magic)
  }

  /** Exactly one normal path component, `.parquet` extension — rejects
    * traversal (`../x.parquet`), absolute paths, nesting, and non-parquet
    * names (upload.rs:71-91). */
  def uploadNameIsValid(name: String): Boolean =
    try {
      val p = java.nio.file.Paths.get(name)
      name.nonEmpty && !name.startsWith("/") && p.getNameCount == 1 &&
        !name.contains("..") && name.endsWith(".parquet") &&
        name != ".parquet"
    } catch {
      // Paths.get throws on bytes the filesystem itself forbids (NUL
      // and friends) — hostile input, not an internal error: reject,
      // never 500 (ApiSpec's upload fuzz drives this)
      case _: java.nio.file.InvalidPathException => false
    }
}
