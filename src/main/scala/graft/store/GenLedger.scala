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

  /** Guarded repair of interrupted-swap debris — the actuator for what
    * the doctor family reports as `stale_asides` (VERDICT r11 #5: a
    * fsck that can't fix leaves the 3 am operator improvising). The
    * swap discipline ([[swapIn]]) leaves exactly three recoverable
    * states, each with ONE correct move derived from the swap's step
    * order (aside is written fully before any rename):
    *  - `<t>.old` present, live `<t>` MISSING — crash between
    *    rename-aside and rename-in: ROLL BACK (rename `.old` → live);
    *    the original data is the one copy known complete.
    *  - `<t>.old` present, live present — crash after rename-in but
    *    before the aside delete: the swap COMPLETED; delete `.old`.
    *  - `<t>.compacting` present (live present after the rules above) —
    *    an aborted aside write; droppable scratch.
    * Anything else (torn gen rows, dead postings) is NOT repaired here:
    * those are invisible-by-read-rule and physically reclaimed by the
    * service's own `compact`. Caller MUST hold the service's
    * WriterLock — repair races a concurrent swap otherwise. With
    * `dryRun` (the default posture) every action is listed, nothing is
    * touched. Returns (item, damage, action, applied) rows. */
  def repairAsides(spark: SparkSession, dir: String, tables: Seq[String],
      dryRun: Boolean): Seq[(String, String, String, Boolean)] = {
    val fs = fsOf(spark, dir)
    tables.flatMap { t =>
      val live = new org.apache.hadoop.fs.Path(s"$dir/$t")
      val old = new org.apache.hadoop.fs.Path(s"$dir/$t.old")
      val comp = new org.apache.hadoop.fs.Path(s"$dir/$t.compacting")
      val oldAction: Option[(String, String, String, Boolean)] =
        if (!fs.exists(old)) None
        else if (!fs.exists(live)) {
          val applied = !dryRun && fs.rename(old, live)
          Some((t, "interrupted_swap_no_live", s"rename $old -> $live", applied))
        } else {
          val applied = !dryRun && fs.delete(old, true)
          Some((t, "completed_swap_stale_old", s"delete $old", applied))
        }
      val compAction: Option[(String, String, String, Boolean)] =
        if (!fs.exists(comp)) None
        else {
          val applied = !dryRun && fs.delete(comp, true)
          Some((t, "aborted_aside_write", s"delete $comp", applied))
        }
      oldAction.toSeq ++ compAction
    }
  }

  /** [[repairAsides]]' counterpart for VERSIONED layouts (the
    * EventStore / VectorIndex `vNNNNNNNN` + `_commit_` pattern). Two
    * damage classes, both exactly what the layouts' doctors report:
    *  - a DANGLING MARKER (marker, no dir) — the read-breaking one:
    *    resolution lands on the highest marker, so a dangling highest
    *    marker fails every read; the marker is the corrupt artifact
    *    (its data never survived), delete it and reads resolve to the
    *    previous committed version;
    *  - an UNCOMMITTED DIR (dir, no marker) — a build/swap that died
    *    pre-flip: inert scratch, delete the dir.
    * Same contract as [[repairAsides]]: hold the service's WriterLock,
    * dryRun lists without touching. */
  def repairVersions(spark: SparkSession, parent: String,
      commitPrefix: String, dryRun: Boolean): Seq[(String, String, String, Boolean)] = {
    val p = new org.apache.hadoop.fs.Path(parent)
    val fs = fsOf(spark, parent)
    if (!fs.exists(p)) Seq.empty
    else {
      val names = fs.listStatus(p).map(_.getPath.getName).toSeq
      val dirs = names.filter(_.matches("v\\d{8}")).toSet
      val marks = names.filter(_.startsWith(commitPrefix))
        .map(_.stripPrefix(commitPrefix)).toSet
      val dangling = (marks -- dirs).toSeq.sorted.map { v =>
        val m = new org.apache.hadoop.fs.Path(parent, commitPrefix + v)
        val applied = !dryRun && fs.delete(m, false)
        (v, "dangling_marker", s"delete $m", applied)
      }
      val dead = (dirs -- marks).toSeq.sorted.map { v =>
        val d = new org.apache.hadoop.fs.Path(parent, v)
        val applied = !dryRun && fs.delete(d, true)
        (v, "uncommitted_dir", s"delete $d", applied)
      }
      dangling ++ dead
    }
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
