package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** The incremental index's exactness contract: streaming a corpus
  * through successive checkAndAdd batches must emit, across all
  * batches, EXACTLY the batch pipeline's verified pair set — every
  * within-batch and cross-batch pair once, with identical n_common and
  * jaccard values.
  */
class DedupIndexSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("three incremental batches reproduce the batch pair set exactly") {
    val dir = Files.createTempDirectory("graft-dedup-index").toString
    val docs = Tables.documents(spark, sf)

    val emitted = (0 until 3).flatMap { part =>
      DedupIndex.checkAndAdd(spark, dir,
        docs.where(col("doc_id") % 3 === part))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    }
    // each pair exactly once across all batches
    assert(emitted.size == emitted.toSet.size, "a pair was emitted twice")

    val batch = SparkEntry.queries("d2_dedup_ngram_jaccard")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(emitted.toSet == batch,
      s"incremental ${emitted.size} pairs vs batch ${batch.size}: " +
        s"missing=${(batch -- emitted.toSet).take(3)} " +
        s"extra=${(emitted.toSet -- batch).take(3)}")

    assert(DedupIndex.size(spark, dir) == docs.count())

    // a batch of already-known content (new ids, duplicate text) is
    // flagged against the index, not silently admitted as novel
    val dupBatch = docs.where(col("doc_id") < 3)
      .withColumn("doc_id", col("doc_id") + 100000L)
    val flagged = DedupIndex.checkAndAdd(spark, dir, dupBatch).collect()
    val exactDups = flagged.filter(_.getDouble(3) == 1.0)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0L until 3L).forall(id => exactDups.contains((id, id + 100000L))),
      s"exact re-submissions not flagged: $exactDups")

    // re-delivery: replaying an already-committed batch drops every doc
    // at the membership ledger — no pairs, no growth, no self-pairs
    val replay = DedupIndex.checkAndAdd(spark, dir,
      docs.where(col("doc_id") % 3 === 0)).collect()
    assert(replay.isEmpty, s"replayed batch emitted: ${replay.take(3).mkString}")
    assert(DedupIndex.size(spark, dir) == docs.count() + 3)

    // compaction shrinks the per-batch file accumulation; the next
    // batch still sees the identical index
    val before = DedupIndex.size(spark, dir)
    val res = DedupIndex.compact(spark, dir, numFiles = 2)
    assert(res("sigs")._2 <= 2 && res("bands")._2 <= 2, res.toString)
    assert(res("sigs")._1 > res("sigs")._2, s"nothing compacted: $res")
    assert(DedupIndex.size(spark, dir) == before)
    val after = DedupIndex.checkAndAdd(spark, dir,
      docs.where(col("doc_id") === 0L)
        .withColumn("doc_id", col("doc_id") + 200000L)).collect()
    assert(after.exists(r => r.getDouble(3) == 1.0 && r.getLong(0) == 0L),
      "post-compaction index lost content")
  }

  test("racing checkAndAdd vs compact keeps the pair-set exactness contract") {
    // concurrent maintainers — a mis-scheduled overlap of batch inserts
    // and compaction must corrupt nothing: the shared WriterLock
    // serializes them (each contender waits out the holder's job), so
    // the union of emitted pairs still equals the batch pipeline's set
    // and the ledger count is exact
    val dir = Files.createTempDirectory("graft-dedup-race").toString
    val docs = Tables.documents(spark, sf)
    // seed one batch so compaction has something to chew on
    val seeded = DedupIndex.checkAndAdd(spark, dir,
      docs.where(col("doc_id") % 4 === 0)).collect()

    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val emitted = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Long, Int, Double)]()
    seeded.foreach(r => emitted.add(
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tasks: Seq[Runnable] = (1 until 4).map[Runnable] { part => () =>
      try DedupIndex.checkAndAdd(spark, dir, docs.where(col("doc_id") % 4 === part))
        .collect()
        .foreach(r => emitted.add(
          (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))))
      catch { case t: Throwable => failures.add(t) }
    } :+ { () =>
      try DedupIndex.compact(spark, dir, numFiles = 2)
      catch { case t: Throwable => failures.add(t) }
    }
    tasks.foreach(pool.execute)
    pool.shutdown()
    assert(pool.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS))
    assert(failures.isEmpty, s"concurrent maintainer failed: ${failures.peek()}")

    val batch = SparkEntry.queries("d2_dedup_ngram_jaccard")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toSet == batch,
      s"racing maintainers broke exactness: emitted ${emitted.size} vs batch ${batch.size}")
    assert(DedupIndex.size(spark, dir) == docs.count())
    // the lock file is released
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_writer_lock")))
  }

  test("doctor: clean when healthy; counts dead rows, torn tombs, stale asides") {
    val dir = Files.createTempDirectory("graft-dedup-doctor").toString
    val docs = Tables.documents(spark, sf)
    DedupIndex.checkAndAdd(spark, dir, docs.where(col("doc_id") % 2 === 0))
    DedupIndex.checkAndAdd(spark, dir, docs.where(col("doc_id") % 2 =!= 0))
    val n = docs.count()

    def report(): (Long, Long, Long, Long, Long, Int) = {
      val r = DedupIndex.doctor(spark, dir).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getInt(5))
    }
    assert(report() == ((n, 0L, 0L, 0L, 0L, 0)), "healthy index must audit clean")

    // committed takedown: dead sigs AND their band postings become
    // reclaimable, live shrinks, nothing is a violation
    val victims = docs.where(col("doc_id") % 7 === 3).select("doc_id")
    DedupIndex.remove(spark, dir, victims)
    val v = victims.count()
    val (live1, dup1, dsig1, dband1, torn1, stale1) = report()
    assert(live1 == n - v && dup1 == 0L && torn1 == 0L && stale1 == 0)
    assert(dsig1 == v, s"$v dead sig rows expected, got $dsig1")
    assert(dband1 == v * 8, s"${v * 8} dead band postings expected, got $dband1")

    // torn tombstone rows: counted, liveness unchanged
    docs.where(col("doc_id") % 11 === 5).limit(2)
      .select(lit(999L).as("gen"), col("doc_id"))
      .write.mode("append").parquet(s"$dir/tombs")
    val r2 = report()
    assert(r2._1 == live1 && r2._5 == 2L, s"2 torn tombstone rows expected: $r2")

    // stale aside blocks writers; doctor still reads
    assert(new java.io.File(s"$dir/bands.old").mkdirs())
    assert(report()._6 == 1)
    assert(new java.io.File(s"$dir/bands.old").delete())

    // re-add one victim slice with DIFFERENT text: the doc is live
    // again, but its old-text band postings are stale — doctor must
    // count them even though the doc_id itself is live
    DedupIndex.checkAndAdd(spark, dir,
      docs.where(col("doc_id") % 7 === 3)
        .withColumn("text", concat(col("text"), lit(" zqj zqj zqj"))))
    val (live2b, _, dsig2b, dband2b, _, _) = report()
    assert(live2b == n, "re-added docs must be live again")
    assert(dsig2b == v, "old incarnations' sig rows stay dead")
    // only the bands whose minhash actually moved go stale (a few new
    // shingles rarely displace every per-band minimum), so the bound is
    // existence, not v*8
    assert(dband2b > 0, s"old-text postings must count as reclaimable: $dband2b")

    // compact reclaims everything doctor flagged as inert — including
    // the re-added docs' old-text postings (postings are REGENERATED
    // from live sigs, not semi-joined by doc_id)
    DedupIndex.compact(spark, dir)
    val (live3, dup3, dsig3, dband3, torn3, stale3) = report()
    assert((live3, dup3, dsig3, dband3, torn3, stale3) ==
      ((n, 0L, 0L, 0L, 0L, 0)), "post-compact index must audit clean")
  }
}
