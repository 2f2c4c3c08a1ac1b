package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Lifecycle contract of the persistent inverted text index: stored
  * search is bit-identical to the from-scratch BM25 pass over the live
  * documents, re-feeding a committed batch is a no-op, crash-replay
  * duplicate postings never change a score, removal shifts every corpus
  * statistic, a re-add after removal is indistinguishable from
  * never-removed, compaction changes no result while reclaiming dead
  * rows, and an interrupted compaction is refused.
  */
class TextIndexSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private val terms = Seq("hash", "scan", "merge")

  /** The from-scratch reference: TextOps.bm25 over `docs`, the same
    * >0-filter/top-k shape as TextIndex.search. */
  private def batchTopK(docs: DataFrame, k: Int): Seq[(Long, Int, Int, Int, Double)] =
    graft.queries.TextOps.bm25(docs, terms)
      .where(col("bm25") > 0d)
      .orderBy(col("bm25").desc, col("doc_id")).limit(k)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
      .toSeq

  private def searchTopK(dir: String, k: Int): Seq[(Long, Int, Int, Int, Double)] =
    TextIndex.search(spark, dir, terms, k).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
      .toSeq

  test("two-batch add serves the batch scorer bit-exactly; re-feed is a no-op") {
    val dir = Files.createTempDirectory("graft-textidx").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    TextIndex.add(spark, dir, docs.where(col("doc_id") % 2 === 0))
    TextIndex.add(spark, dir, docs.where(col("doc_id") % 2 =!= 0))
    assert(TextIndex.size(spark, dir) == docs.count())
    assert(searchTopK(dir, 25) == batchTopK(docs, 25))

    // a re-fed committed batch must change nothing (ledger anti-join)
    TextIndex.add(spark, dir, docs.where(col("doc_id") % 2 === 0))
    assert(TextIndex.size(spark, dir) == docs.count())
    assert(searchTopK(dir, 25) == batchTopK(docs, 25))
  }

  test("crash-replay duplicate postings never change a score; compact reclaims them") {
    val dir = Files.createTempDirectory("graft-textidx-dup").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    TextIndex.add(spark, dir, docs)
    // simulate the crash window: postings landed, ledger append lost,
    // retry re-appended postings — byte-identical duplicate rows
    val snap = spark.read.parquet(s"$dir/postings").localCheckpoint(true)
    val origCount = snap.count()
    val before = searchTopK(dir, 25)
    snap.write.mode("append").parquet(s"$dir/postings")
    assert(spark.read.parquet(s"$dir/postings").count() == 2 * origCount)
    assert(searchTopK(dir, 25) == before,
      "duplicate postings must collapse in the max(tf) read")
    // numFiles=1 so the file-count guard can't no-op the pass (the tiny
    // fixture fits in two files); a skipped compact leaves duplicates
    // behind BY DESIGN — reads tolerate them until a real pass runs
    val stats = TextIndex.compact(spark, dir, numFiles = 1)
    assert(stats("postings")._2 <= 1)
    assert(searchTopK(dir, 25) == before, "compact must change no result")
    // physically deduplicated: row count back to one row per (doc, tok)
    assert(spark.read.parquet(s"$dir/postings").count() == origCount)
  }

  test("remove shifts N/avgdl/df; re-add equals never-removed; compact is invisible") {
    val dir = Files.createTempDirectory("graft-textidx-tomb").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    TextIndex.add(spark, dir, docs)
    val all = docs.count()

    val victims = docs.where(col("doc_id") % 7 === 3)
    val survivors = docs.where(col("doc_id") % 7 =!= 3)
    TextIndex.remove(spark, dir, victims.select("doc_id"))
    assert(TextIndex.size(spark, dir) == all - victims.count())
    // the reference recomputes from scratch on the survivors: N, sum_dl
    // and every df shift, not just the removed rows vanishing
    assert(searchTopK(dir, 25) == batchTopK(survivors, 25))
    // removing already-removed ids is a no-op
    TextIndex.remove(spark, dir, victims.select("doc_id"))
    assert(searchTopK(dir, 25) == batchTopK(survivors, 25))

    // re-add: fresh membership, identical to never-removed
    TextIndex.add(spark, dir, victims)
    assert(TextIndex.size(spark, dir) == all)
    assert(searchTopK(dir, 25) == batchTopK(docs, 25))

    // compact folds tombstones + dead postings away without changing
    // any result, and the tombs dir is gone
    TextIndex.compact(spark, dir)
    assert(searchTopK(dir, 25) == batchTopK(docs, 25))
    assert(!graft.store.GenLedger.hasData(spark, s"$dir/tombs"))
    assert(TextIndex.size(spark, dir) == all)
  }

  test("re-add with DIFFERENT text serves the new text only; compact keeps it") {
    val dir = Files.createTempDirectory("graft-textidx-readd").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    TextIndex.add(spark, dir, docs)

    // remove a slice, then re-add the SAME ids with rewritten text —
    // the old text's postings are a dead membership's rows and must
    // not merge into the fresh one (old max(tf) / df resurrection)
    val victims = docs.where(col("doc_id") % 7 === 3)
    TextIndex.remove(spark, dir, victims.select("doc_id"))
    val rewritten = victims.select(col("doc_id"),
      concat(lit("hash hash scan rewritten "), col("text")).as("text"))
    TextIndex.add(spark, dir, rewritten)

    val corpusNow = docs.where(col("doc_id") % 7 =!= 3).unionByName(rewritten)
    assert(TextIndex.size(spark, dir) == docs.count())
    assert(searchTopK(dir, 25) == batchTopK(corpusNow, 25),
      "stale old-text postings must not contribute tf or df")

    // compact reclaims the dead membership's postings without changing
    // any result
    TextIndex.compact(spark, dir, numFiles = 1)
    assert(searchTopK(dir, 25) == batchTopK(corpusNow, 25))
  }

  test("duplicate doc_id rows within one add batch index once") {
    val dir = Files.createTempDirectory("graft-textidx-batchdup").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // the DocStream shape: one trigger lands the same doc from two files
    TextIndex.add(spark, dir, docs.unionByName(docs.where(col("doc_id") % 5 === 0)))
    assert(TextIndex.size(spark, dir) == docs.count(),
      "a doc landing twice in one batch must produce one membership")
    assert(searchTopK(dir, 25) == batchTopK(docs, 25),
      "in-batch duplicates must not double tf or df")
  }

  test("torn tombstone append is invisible; commit marker makes it live") {
    val dir = Files.createTempDirectory("graft-textidx-torn").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    TextIndex.add(spark, dir, docs)
    val before = searchTopK(dir, 25)

    // hand-write tombstone FILES without the _tcommit_ marker — the
    // torn-append crash window
    val g = 999L
    docs.where(col("doc_id") % 7 === 3)
      .select(lit(g).as("gen"), col("doc_id"))
      .write.mode("append").parquet(s"$dir/tombs")
    assert(searchTopK(dir, 25) == before, "torn tombstone must be invisible")
    assert(TextIndex.size(spark, dir) == docs.count())

    graft.store.GenLedger.commit(spark, dir, "_tcommit_", g)
    val survivors = docs.where(col("doc_id") % 7 =!= 3)
    assert(searchTopK(dir, 25) == batchTopK(survivors, 25))
  }

  test("interrupted compaction is refused until recovered") {
    val dir = Files.createTempDirectory("graft-textidx-guard").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    TextIndex.add(spark, dir, docs.where(col("doc_id") < 50))
    // simulate a crash mid-swap: a leftover postings.old dir
    val fs = graft.store.GenLedger.fsOf(spark, dir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/postings.old"))
    val e = intercept[RuntimeException] {
      TextIndex.add(spark, dir, docs.where(col("doc_id") >= 50))
    }
    assert(e.getMessage.contains("interrupted compaction"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/postings.old"), true)
    TextIndex.add(spark, dir, docs.where(col("doc_id") >= 50))
    assert(TextIndex.size(spark, dir) == docs.count())
  }

  test("racing add/remove vs compact keeps the search contract") {
    // the DedupIndexSpec discipline for the lexical service: concurrent
    // maintainers serialize on the shared WriterLock, so any interleave
    // of batch adds, a takedown, and a compaction must land on exactly
    // the batch scorer over the surviving documents — and the lock file
    // must be released at the end
    val dir = Files.createTempDirectory("graft-textidx-race").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    TextIndex.add(spark, dir, docs.where(col("doc_id") % 4 === 0))

    val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tasks: Seq[Runnable] = (1 until 4).map[Runnable] { part => () =>
      try TextIndex.add(spark, dir, docs.where(col("doc_id") % 4 === part))
      catch { case t: Throwable => failures.add(t) }
    } :+ ({ () =>
      try TextIndex.compact(spark, dir, numFiles = 2)
      catch { case t: Throwable => failures.add(t) }
    }: Runnable) :+ ({ () =>
      // victims confined to the PRE-SEEDED batch: they are live before
      // the race starts and no racing task re-adds them, so the end
      // state is interleave-independent (a remove only tombstones
      // currently-live ids — removing a slice a racing add might land
      // LATER would make the outcome depend on scheduling)
      try TextIndex.remove(spark, dir,
        docs.where(col("doc_id") % 4 === 0 && col("doc_id") % 13 === 7)
          .select("doc_id"))
      catch { case t: Throwable => failures.add(t) }
    }: Runnable)
    tasks.foreach(pool.execute)
    pool.shutdown()
    assert(pool.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS))
    assert(failures.isEmpty, s"concurrent maintainer failed: ${failures.peek()}")

    val survivors = docs.where(!(col("doc_id") % 4 === 0 && col("doc_id") % 13 === 7))
    assert(searchTopK(dir, 25) == batchTopK(survivors, 25),
      "racing maintainers broke the search contract")
    assert(TextIndex.size(spark, dir) == survivors.count())
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_writer_lock")))
  }

  test("doctor: clean on healthy state, counts every damage class, read-only") {
    val dir = Files.createTempDirectory("graft-textidx-doctor").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    TextIndex.add(spark, dir, docs.where(col("doc_id") % 2 === 0))
    TextIndex.add(spark, dir, docs.where(col("doc_id") % 2 =!= 0))
    val n = docs.count()

    def report(): (Long, Long, Long, Long, Int) = {
      val r = TextIndex.doctor(spark, dir).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))
    }
    assert(report() == ((n, 0L, 0L, 0L, 0)), "healthy index must audit clean")

    // a committed takedown leaves INERT postings: reclaimable, not wrong
    val victims = docs.where(col("doc_id") % 7 === 3)
    TextIndex.remove(spark, dir, victims.select("doc_id"))
    val (live1, dup1, reclaim1, torn1, stale1) = report()
    assert(live1 == n - victims.count() && dup1 == 0L && torn1 == 0L && stale1 == 0)
    assert(reclaim1 > 0L, "removed docs' postings must count as reclaimable")

    // torn tombstone (files, no marker): counted, nothing else moves
    docs.where(col("doc_id") % 11 === 5).limit(3)
      .select(lit(999L).as("gen"), col("doc_id"))
      .write.mode("append").parquet(s"$dir/tombs")
    val (live2, _, _, torn2, _) = report()
    assert(live2 == live1 && torn2 == 3L,
      s"3 uncommitted tombstone rows expected, got $torn2")

    // duplicate live membership (hand-forged second ledger row)
    val dupDoc = docs.where(col("doc_id") % 7 =!= 3).select("doc_id").head().getLong(0)
    spark.read.parquet(s"$dir/docs").where(col("doc_id") === dupDoc)
      .limit(1).withColumn("gen", col("gen") + 1000L)
      .write.mode("append").parquet(s"$dir/docs")
    assert(report()._2 == 1L, "forged duplicate membership must be counted")

    // stale aside: doctor still reports (guardCompaction would refuse writes)
    assert(new java.io.File(s"$dir/docs.old").mkdirs())
    assert(report()._5 == 1, "docs.old aside must be counted")
    assert(new java.io.File(s"$dir/docs.old").delete())

    // doctor never mutated anything: searches unaffected by auditing,
    // and a compact repairs what it reported (dups fold, inerts reclaim)
    TextIndex.compact(spark, dir)
    val (live3, dup3, reclaim3, torn3, stale3) = report()
    assert(dup3 == 0L && reclaim3 == 0L && torn3 == 0L && stale3 == 0)
    assert(live3 == live1, "compact must not change live membership count")
  }

  test("search on an empty index returns the empty shape") {
    val dir = Files.createTempDirectory("graft-textidx-empty").toString
    val out = TextIndex.search(spark, dir, terms, 25)
    assert(out.columns.toSeq ==
      Seq("doc_id") ++ terms.map("tf_" + _) :+ "bm25")
    assert(out.count() == 0)
  }
}
