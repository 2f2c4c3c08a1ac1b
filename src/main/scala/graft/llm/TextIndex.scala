package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent inverted text index — the LEXICAL retrieval service of the
  * index trio (near-dup: [[DedupIndex]]; semantic: [[VectorIndex]] /
  * [[KnnGraphIndex]]; lexical: this). A training-data pipeline runs one
  * to select documents near a topic (the t8 BM25 pass) without
  * re-scanning corpus text per query: documents are tokenized ONCE at
  * add time; every later search touches only the queried terms'
  * postings plus the doc-length ledger.
  *
  * On-disk layout under `dir` (plain parquet, append-only):
  *  - `postings/` — (tok, doc_id, tf): one row per (token, document)
  *    with the term frequency. At 100 TB this is the table you bucket
  *    by `tok`, so a search scan prunes to the queried terms' buckets.
  *  - `docs/` — (doc_id, dl, gen): the doc-length ledger AND the
  *    membership commit point (written LAST, the [[DedupIndex]] write
  *    order); `gen` orders rows against tombstones.
  *  - `tombs/` + `_tcommit_<gen>` markers — marker-committed removal
  *    generations ([[graft.store.GenLedger]] conventions; a torn
  *    tombstone append is invisible).
  *
  * Re-delivery / crash contract (same discipline as [[DedupIndex]]):
  * postings append FIRST, ledger LAST — a replayed batch anti-joins
  * against the live ledger and is a no-op once the ledger committed; a
  * crash between the two appends leaves orphan postings the retry
  * duplicates, and every read path tolerates duplicates (per-(doc,tok)
  * `max(tf)` — the duplicate rows are byte-identical because tf is a
  * pure function of the text — and `countDistinct` document
  * frequencies); [[compact]] physically collapses them. Postings of
  * REMOVED documents stay on disk until compact; they cost a filtered
  * row at read time, never a wrong answer, because every read joins
  * back to the LIVE ledger (the "stale postings die in the verify
  * join" rule).
  *
  * Exactness contract (the t8b/t8c gates): [[search]] over the live
  * index is bit-identical to the from-scratch BM25 pass
  * ([[graft.queries.TextOps.bm25]]) over the live documents — same
  * rational Robertson idf, same fixed-term-order double arithmetic
  * (per-term scores sum in the caller's term order via one generated
  * expression, never a float aggregation whose order could drift), so
  * the DuckDB oracle hash-matches with no tolerance.
  */
object TextIndex {

  private def postingsPath(dir: String) = s"$dir/postings"
  private def docsPath(dir: String) = s"$dir/docs"
  private def tombsPath(dir: String) = s"$dir/tombs"

  private val TcommitPrefix = "_tcommit_"

  private def nextGen(spark: SparkSession, dir: String): Long =
    graft.store.GenLedger.nextGen(spark, dir,
      graft.store.GenLedger.maxGenIn(spark, docsPath(dir)))

  private def committedTombGens(spark: SparkSession, dir: String): Seq[Long] =
    graft.store.GenLedger.committedMarkers(spark, dir, TcommitPrefix)

  private def exists(spark: SparkSession, p: String): Boolean =
    graft.store.GenLedger.hasData(spark, p)

  private def guardCompaction(spark: SparkSession, dir: String): Unit =
    graft.store.GenLedger.guardCompaction(spark, dir, Seq("postings", "docs"))

  /** Per-id max COMMITTED tombstone generation (absent → no filter in
    * the plan at all — the common state). Removal-sized: broadcast. */
  private def tombMax(spark: SparkSession, dir: String): Option[DataFrame] = {
    if (!exists(spark, tombsPath(dir))) None
    else {
      val committed = committedTombGens(spark, dir)
      if (committed.isEmpty) None
      else Some(spark.read.parquet(tombsPath(dir))
        .where(col("gen").isin(committed: _*))
        .groupBy("doc_id").agg(max("gen").as("tgen")))
    }
  }

  /** Live ledger rows (doc_id, dl, gen): a row is live iff no committed
    * tombstone at a later-or-equal generation covers its doc_id. */
  private def liveDocRows(spark: SparkSession, dir: String): Option[DataFrame] = {
    if (!exists(spark, docsPath(dir))) None
    else {
      val docs = spark.read.parquet(docsPath(dir))
      Some(tombMax(spark, dir) match {
        case None => docs
        case Some(t) => docs.join(broadcast(t), Seq("doc_id"), "left")
          .where(col("tgen").isNull || col("gen") > col("tgen"))
          .drop("tgen")
      })
    }
  }

  /** The ONE tokenization rule, shared with the batch BM25 pass
    * (t7/t8's `split(lower(text), ' ')`): tf is a pure function of the
    * text, which is what makes replayed/duplicated postings rows
    * byte-identical and the max-collapse exact. */
  private def tokens: Column = split(lower(col("text")), " ")

  /** Index `newDocs` (doc_id, text, …): tokenize once, append term
    * postings, then commit membership by appending the doc-length
    * ledger. Already-live doc ids are dropped up front (anti-join on
    * the ledger), so re-feeding a committed batch is a no-op; a doc
    * removed earlier re-adds as a fresh membership at a higher
    * generation. Scale shape: one explode + one (doc_id, tok) groupBy —
    * shuffle keyed on the posting key, corpus text read exactly once,
    * nothing joins corpus-sized sides. */
  def add(spark: SparkSession, dir: String, newDocs: DataFrame): Unit =
      graft.store.WriterLock.forIndex(spark, dir).withLock {
    guardCompaction(spark, dir)
    val gen = nextGen(spark, dir)
    val fresh = (liveDocRows(spark, dir) match {
      case None => newDocs
      case Some(l) =>
        newDocs.join(l.select("doc_id"), Seq("doc_id"), "left_anti")
    }).select(col("doc_id"), tokens.as("t")).localCheckpoint(true)
    if (!fresh.isEmpty) {
      // postings FIRST (orphans are duplicate-tolerated), ledger LAST
      // (the membership commit point the anti-join keys on)
      fresh.select(col("doc_id"), explode(col("t")).as("tok"))
        .groupBy("tok", "doc_id")
        .agg(count(lit(1)).cast("int").as("tf"))
        .write.mode(SaveMode.Append).parquet(postingsPath(dir))
      fresh.select(col("doc_id"),
          org.apache.spark.sql.functions.size(col("t")).as("dl"),
          lit(gen).as("gen"))
        .write.mode(SaveMode.Append).parquet(docsPath(dir))
    }
  } // WriterLock released here

  /** Remove `ids` (doc_id) — takedown without a rebuild. Tombstones are
    * marker-committed generations: the doc leaves every search result
    * (membership, document frequencies, avgdl — ALL corpus statistics
    * shift, which the t8c gate pins against a from-scratch recompute on
    * the survivors) the moment `_tcommit_` lands; its postings rows are
    * reclaimed later by [[compact]]. */
  def remove(spark: SparkSession, dir: String, ids: DataFrame): Unit =
      graft.store.WriterLock.forIndex(spark, dir).withLock {
    guardCompaction(spark, dir)
    liveDocRows(spark, dir).foreach { l =>
      val victims = l.select("doc_id")
        .join(ids.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
        .localCheckpoint(true)
      if (!victims.isEmpty) {
        val gen = nextGen(spark, dir)
        victims.select(lit(gen).as("gen"), col("doc_id"))
          .write.mode(SaveMode.Append).parquet(tombsPath(dir))
        graft.store.GenLedger.commit(spark, dir, TcommitPrefix, gen)
      }
    }
  } // WriterLock released here

  /** BM25 top-k for `terms` over the LIVE index — the stored-index form
    * of [[graft.queries.TextOps.bm25]], bit-identical by construction:
    * identical scoring expression text over identically-typed inputs
    * (dl/tf int, n_docs/sum_dl/df long), per-term parts summed in the
    * given fixed term order. Scale shape: the postings scan prunes to
    * the queried terms (pushed `tok IN` filter — the bucket-pruned scan
    * at 100 TB); corpus statistics are ONE ledger aggregate broadcast
    * back; only matching documents' tf rows move, never corpus text. */
  def search(spark: SparkSession, dir: String, terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty && terms.map(_.toLowerCase).distinct.size == terms.size,
      "terms must be non-empty and distinct")
    require(terms.forall(_.matches("[a-z0-9_]+")),
      s"terms must be bare lowercase tokens, got $terms")
    val live = liveDocRows(spark, dir).getOrElse(
      return spark.range(0).select(
        col("id").as("doc_id") +:
          terms.map(t => lit(0).cast("int").as(s"tf_$t")) :+
          lit(0.0).as("bm25"): _*))
    // duplicate postings (crash-replay orphans) collapse on max(tf) —
    // exact, the rows are byte-identical; removed docs' stale postings
    // die in the inner join to the live ledger below
    val post = spark.read.parquet(postingsPath(dir))
      .where(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(max("tf").as("tf"))
      .join(live.select("doc_id"), Seq("doc_id"), "left_semi")
    // (doc_id, tok) unique after the collapse, so df is a plain
    // conditional count; corpus stats come from the ledger. Both are
    // 1-row frames — the only exchanges besides the final TakeOrdered.
    val corpus = live.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val dfs = post.agg(
      sum(when(col("tok") === terms.head, 1L).otherwise(0L)).as(s"df_${terms.head}"),
      terms.tail.map(t =>
        sum(when(col("tok") === t, 1L).otherwise(0L)).as(s"df_$t")): _*)
    val stats = corpus.crossJoin(dfs)
    val perDoc = post
      .groupBy("doc_id")
      .agg(max(when(col("tok") === terms.head, col("tf"))).as(s"raw_${terms.head}"),
        terms.tail.map(t =>
          max(when(col("tok") === t, col("tf"))).as(s"raw_$t")): _*)
      .select(col("doc_id") +: terms.map(t =>
        coalesce(col(s"raw_$t"), lit(0)).as(s"tf_$t")): _*)
      .join(live.select("doc_id", "dl"), Seq("doc_id"))
    def part(term: String): String =
      s"""((n_docs - df_$term + 0.5e0) / (df_$term + 0.5e0)) *
          (tf_$term * 2.2e0) /
          (tf_$term + 1.2e0 * (0.25e0 + 0.75e0 * (dl / (sum_dl / n_docs))))"""
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id") +: terms.map(t => col(s"tf_$t")) :+
        expr(terms.map(part).mkString(" + ")).as("bm25"): _*)
      .where(col("bm25") > 0d)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** LIVE indexed document count (observability). */
  def size(spark: SparkSession, dir: String): Long =
    liveDocRows(spark, dir).map(_.count()).getOrElse(0L)

  /** Compact the append-only index: fold live ledger rows to one fresh
    * generation, reclaim removed docs' postings (live semi-join) and
    * crash-replay duplicates (distinct — exact, duplicates are
    * byte-identical), drop tombstones and their markers. Atomic per
    * table via [[graft.store.GenLedger.swapIn]]; an interrupted swap is
    * refused by guardCompaction until recovered, and a stale tombstone
    * surviving any crash window is inert against the re-stamped rows
    * (their fresh generation outranks it). */
  def compact(spark: SparkSession, dir: String,
      numFiles: Int = 8): Map[String, (Int, Int)] =
      graft.store.WriterLock.forIndex(spark, dir).withLock {
    guardCompaction(spark, dir)
    val hasTombs = committedTombGens(spark, dir).nonEmpty
    val foldGen = if (hasTombs) nextGen(spark, dir) else 0L
    def rewrite(name: String, p: String,
        content: => DataFrame): (String, (Int, Int)) = {
      if (!exists(spark, p)) name -> (0, 0)
      else {
        val nOld = graft.store.GenLedger.dataFileCount(spark, p)
        if (nOld <= numFiles && !hasTombs) name -> (nOld, nOld)
        else name -> (nOld, graft.store.GenLedger.swapIn(spark, p, content, numFiles))
      }
    }
    val out = Map(
      rewrite("docs", docsPath(dir),
        liveDocRows(spark, dir).get.select("doc_id", "dl")
          .withColumn("gen", lit(foldGen))),
      rewrite("postings", postingsPath(dir), {
        val p = spark.read.parquet(postingsPath(dir))
          .select("tok", "doc_id", "tf").distinct()
        liveDocRows(spark, dir) match {
          case None => p
          case Some(l) =>
            p.join(l.select("doc_id"), Seq("doc_id"), "left_semi")
              .select("tok", "doc_id", "tf")
        }
      }))
    if (hasTombs) {
      val fs = graft.store.GenLedger.fsOf(spark, dir)
      fs.delete(new org.apache.hadoop.fs.Path(tombsPath(dir)), true)
      graft.store.GenLedger.retireMarkers(spark, dir, TcommitPrefix,
        committedTombGens(spark, dir))
    }
    out
  } // WriterLock released here
}
