package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The generation-ledger machinery shared by the stateful services
  * ([[graft.llm.DedupIndex]], [[graft.llm.KnnGraphIndex]],
  * [[graft.llm.VectorIndex]], [[graft.llm.TextIndex]],
  * [[graft.llm.CorpusRefresh]]): marker-file generation counter,
  * commit-marker sets, interrupted-compaction guard, and the atomic
  * directory swap. One implementation so the crash contracts — which
  * are load-bearing in every caller — cannot drift apart.
  *
  * The conventions, shared verbatim by every caller:
  *  - `_gen_<n>` — the generation high-water mark lives in a marker
  *    file whose NAME carries the value: one directory listing + one
  *    create, O(1) in state size (the EventStore sequence pattern).
  *    Advanced BEFORE any data write, so a crash burns a number —
  *    harmless — and never reuses one under different contents.
  *  - `<prefix><n>` commit markers (`_commit_`, `_gcommit_`,
  *    `_tcommit_`, per-caller) — an append is visible iff its marker
  *    exists, so a torn append (files visible, writer lost before the
  *    marker) is invisible to every reader.
  *  - `<table>.compacting` / `<table>.old` — the swap discipline:
  *    write aside, rename the live dir away, rename the new dir in,
  *    delete the old. Readers never see old and new rows together; a
  *    crash mid-swap leaves `.old` for [[guardCompaction]] to refuse
  *    on rather than reading a half-swapped state.
  *
  * Callers serialize every mutation through [[WriterLock]], so
  * list-then-create here needs no further coordination.
  */
object GenLedger {

  val GenPrefix = "_gen_"

  def fsOf(spark: SparkSession, p: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Does `p` exist with at least one non-underscore entry (i.e. real
    * data files, not just markers/_SUCCESS)? */
  def hasData(spark: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = fsOf(spark, p)
    fs.exists(path) && fs.listStatus(path).exists(s =>
      !s.getPath.getName.startsWith("_"))
  }

  /** Count of data files (non-underscore, non-dot) directly under `p`;
    * 0 when absent. The no-op guard compaction paths key on. */
  def dataFileCount(spark: SparkSession, p: String): Int = {
    val path = new org.apache.hadoop.fs.Path(p)
    if (!fsOf(spark, p).exists(path)) 0
    else fsOf(spark, p).listStatus(path).count { st =>
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** `max(gen)` over a parquet table, guarded on the column actually
    * existing — state written BEFORE a service grew its `gen` column
    * must bootstrap as generation 0, not throw AnalysisException on
    * first touch. Empty/absent tables are 0 too. */
  def maxGenIn(spark: SparkSession, tablePath: String): Long =
    if (!hasData(spark, tablePath)) 0L
    else {
      // mergeSchema: a dir mixing pre-`gen` files with stamped ones must
      // not nondeterministically resolve to a gen-less file's schema and
      // bootstrap the counter below generations already handed out
      val t = spark.read.option("mergeSchema", "true").parquet(tablePath)
      if (!t.columns.contains("gen")) 0L
      else Option(t.agg(max("gen")).head.get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
    }

  /** Reserve the next generation number: read the `_gen_<n>` high-water
    * marker (falling back to `hwmFallback` — typically a one-time
    * [[maxGenIn]] scan for state dirs that predate the marker), create
    * the new marker, retire stale ones. */
  def nextGen(spark: SparkSession, dir: String,
      hwmFallback: => Long = 0L): Long = {
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(d)) fs.mkdirs(d)
    val existing = fs.listStatus(d).map(_.getPath.getName)
      .filter(_.startsWith(GenPrefix)).toSeq
    val hwm = existing.map(_.stripPrefix(GenPrefix).toLong).maxOption
      .getOrElse(hwmFallback)
    val gen = hwm + 1
    fs.create(new org.apache.hadoop.fs.Path(d, GenPrefix + gen), true).close()
    existing.foreach(m =>
      fs.delete(new org.apache.hadoop.fs.Path(d, m), false))
    gen
  }

  /** Raw marker file names under `dir` starting with `prefix`. For
    * callers whose marker names carry more than the generation (e.g.
    * CorpusRefresh's `_commit_<gen>_<batchTag>`). */
  def markerNames(spark: SparkSession, dir: String,
      prefix: String): Seq[String] = {
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).map(_.getPath.getName)
      .filter(_.startsWith(prefix)).toSeq
  }

  /** Generations whose `<prefix><n>` marker exists, ascending. */
  def committedMarkers(spark: SparkSession, dir: String,
      prefix: String): Seq[Long] =
    markerNames(spark, dir, prefix).map(_.stripPrefix(prefix).toLong).sorted

  /** Create `<prefix><gen>` — the append's commit point. */
  def commit(spark: SparkSession, dir: String, prefix: String,
      gen: Long): Unit =
    fsOf(spark, dir).create(
      new org.apache.hadoop.fs.Path(dir, prefix + gen), true).close()

  /** Retire the given markers (rows already folded/gone). */
  def retireMarkers(spark: SparkSession, dir: String, prefix: String,
      gens: Seq[Long]): Unit = {
    val fs = fsOf(spark, dir)
    gens.foreach(g =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, prefix + g), false))
  }

  /** Refuse to run while an interrupted swap's `.old` dir exists for
    * any of `tables` — recover by renaming it back (or deleting it if
    * the live dir is complete) before using the state. */
  def guardCompaction(spark: SparkSession, dir: String,
      tables: Seq[String]): Unit =
    for (t <- tables) {
      val old = new org.apache.hadoop.fs.Path(s"$dir/$t.old")
      if (fsOf(spark, dir).exists(old))
        sys.error(s"interrupted compaction detected ($dir/$t.old exists); " +
          s"recover by renaming it back to $dir/$t (or deleting it if " +
          s"$dir/$t is complete) before using the state")
    }

  /** The atomic swap: write `content` to `<p>.compacting`, rename `p`
    * aside, rename the new dir in, delete the old. Returns the number
    * of data files written. Leftovers of an aborted WRITE (a stale
    * `.compacting`) are safe to drop; a failed rename aborts with the
    * original intact. */
  def swapIn(spark: SparkSession, p: String, content: DataFrame,
      numFiles: Int): Int = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = fsOf(spark, p)
    val compacting = new org.apache.hadoop.fs.Path(p + ".compacting")
    val old = new org.apache.hadoop.fs.Path(p + ".old")
    fs.delete(compacting, true)
    content.repartition(numFiles).write.parquet(compacting.toString)
    val nNew = fs.listStatus(compacting)
      .count(_.getPath.getName.endsWith(".parquet"))
    if (!fs.rename(path, old))
      sys.error(s"compaction aborted: rename $path -> $old failed")
    if (!fs.rename(compacting, path)) {
      fs.rename(old, path) // restore; both renames on one local fs
      sys.error(s"compaction aborted: rename $compacting -> $path failed")
    }
    fs.delete(old, true)
    nNew
  }
}
