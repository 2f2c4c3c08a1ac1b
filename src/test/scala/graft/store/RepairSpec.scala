package graft.store

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.llm.{CorpusRefresh, DedupIndex, KnnGraphIndex, TextIndex, VectorIndex}
import graft.oracle.{EventRow, EventStore, Uuid7}

/** The doctor family's actuator (VERDICT r11 #5): every stateful
  * service exposes `repair(dryRun)` that fixes EXACTLY the structural
  * damage its doctor reports — interrupted-swap asides for the
  * GenLedger services, dangling markers / dead version dirs for the
  * versioned layouts — and nothing else. Contract pinned here for all
  * six services:
  *  - dryRun lists the pending actions and provably touches nothing
  *    (doctor output identical before/after);
  *  - a real run heals every injected damage class, doctor audits
  *    clean afterwards, and reads/serves still return correct data;
  *  - the one ROLL-BACK class (live dir missing, `.old` present) is
  *    restored, not deleted — the aside is the only complete copy.
  */
class RepairSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def mkdir(p: String): Unit = assert(new java.io.File(p).mkdirs())
  private def touch(p: String): Unit =
    assert(new java.io.File(p).createNewFile())
  private def gone(p: String): Boolean = !new java.io.File(p).exists()

  private def collectActions(df: DataFrame): Seq[(String, String, Boolean)] =
    df.select("item", "damage", "applied").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSeq.sorted

  test("TextIndex: asides repaired; roll-back restores a missing live dir") {
    val dir = Files.createTempDirectory("graft-repair-text").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    TextIndex.add(spark, dir, docs)
    val before = TextIndex.search(spark, dir, Seq("hash", "scan"), 10)
      .collect().toSeq

    // completed-swap stale aside + aborted aside write
    mkdir(s"$dir/docs.old")
    mkdir(s"$dir/postings.compacting")
    val dry = collectActions(TextIndex.repair(spark, dir)) // dryRun default
    assert(dry == Seq(("docs", "completed_swap_stale_old", false),
      ("postings", "aborted_aside_write", false)).sorted)
    assert(!gone(s"$dir/docs.old") && !gone(s"$dir/postings.compacting"),
      "dryRun must not touch the filesystem")
    val fixed = collectActions(TextIndex.repair(spark, dir, dryRun = false))
    assert(fixed.forall(_._3), s"repair must apply: $fixed")
    assert(gone(s"$dir/docs.old") && gone(s"$dir/postings.compacting"))
    assert(TextIndex.doctor(spark, dir).head()
      .getAs[Int]("stale_asides") == 0)

    // the roll-back class: live dir lost mid-swap, .old is the one copy
    assert(new java.io.File(s"$dir/docs")
      .renameTo(new java.io.File(s"$dir/docs.old")))
    val rb = collectActions(TextIndex.repair(spark, dir, dryRun = false))
    assert(rb == Seq(("docs", "interrupted_swap_no_live", true)))
    assert(gone(s"$dir/docs.old") && !gone(s"$dir/docs"))
    assert(TextIndex.search(spark, dir, Seq("hash", "scan"), 10)
      .collect().toSeq == before, "reads must survive the round trip")
  }

  test("DedupIndex and KnnGraphIndex: their asides repaired the same way") {
    val ddir = Files.createTempDirectory("graft-repair-dedup").toString
    DedupIndex.checkAndAdd(spark, ddir,
      Tables.documents(spark, sf).select("doc_id", "text").limit(50))
    mkdir(s"$ddir/sigs.old"); mkdir(s"$ddir/bands.compacting")
    assert(DedupIndex.repair(spark, ddir).count() == 2) // dry: listed
    assert(!gone(s"$ddir/sigs.old"))
    DedupIndex.repair(spark, ddir, dryRun = false)
    assert(gone(s"$ddir/sigs.old") && gone(s"$ddir/bands.compacting"))
    assert(DedupIndex.doctor(spark, ddir).head()
      .getAs[Int]("stale_asides") == 0)
    assert(DedupIndex.size(spark, ddir) == 50L)

    val gdir = Files.createTempDirectory("graft-repair-knng").toString
    KnnGraphIndex.add(spark, gdir,
      Tables.embeddings(spark, sf).select("vec_id", "embedding").limit(60), 3)
    val beforeG = KnnGraphIndex.neighbors(spark, gdir).count()
    mkdir(s"$gdir/graph.old"); mkdir(s"$gdir/vectors.compacting")
    KnnGraphIndex.repair(spark, gdir, dryRun = false)
    assert(gone(s"$gdir/graph.old") && gone(s"$gdir/vectors.compacting"))
    assert(KnnGraphIndex.doctor(spark, gdir).head()
      .getAs[Int]("stale_asides") == 0)
    assert(KnnGraphIndex.neighbors(spark, gdir).count() == beforeG)
  }

  test("VectorIndex: dangling marker breaks the audit path; repair restores reads") {
    val dir = Files.createTempDirectory("graft-repair-vec").toString
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    VectorIndex.build(spark, dir, emb, 8)
    val queries = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val before = VectorIndex.search(spark, dir, queries, k = 3, nprobe = 8)
      .collect().toSeq

    // dangling HIGHEST marker: resolution lands on it, reads break
    touch(s"$dir/_commit_v99999999")
    assert(VectorIndex.doctor(spark, dir).head()
      .getAs[Int]("dangling_markers") == 1)
    assertThrows[Throwable](
      VectorIndex.search(spark, dir, queries, k = 3, nprobe = 8).collect())
    // dead build dir alongside
    mkdir(s"$dir/v00000099")
    val dry = VectorIndex.repair(spark, dir)
    assert(dry.count() == 2 && !gone(s"$dir/_commit_v99999999"))
    VectorIndex.repair(spark, dir, dryRun = false)
    assert(gone(s"$dir/_commit_v99999999") && gone(s"$dir/v00000099"))
    val doc = VectorIndex.doctor(spark, dir).head()
    assert(doc.getAs[Int]("dangling_markers") == 0 &&
      doc.getAs[Int]("uncommitted_versions") == 0)
    assert(VectorIndex.search(spark, dir, queries, k = 3, nprobe = 8)
      .collect().toSeq == before, "repair must restore the previous version's serves")
  }

  test("CorpusRefresh: own asides and the embedded dedup index repaired together") {
    val dir = Files.createTempDirectory("graft-repair-refresh").toString
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "lang", "text").limit(80)
    CorpusRefresh.refresh(spark, dir, docs)
    val before = CorpusRefresh.prepared(spark, dir).count()
    mkdir(s"$dir/exact.old")
    mkdir(s"$dir/dedup/sigs.compacting")
    val dry = collectActions(CorpusRefresh.repair(spark, dir))
    assert(dry == Seq(("dedup/sigs", "aborted_aside_write", false),
      ("exact", "completed_swap_stale_old", false)).sorted)
    CorpusRefresh.repair(spark, dir, dryRun = false)
    assert(gone(s"$dir/exact.old") && gone(s"$dir/dedup/sigs.compacting"))
    val doc = CorpusRefresh.doctor(spark, dir).head()
    assert(doc.getAs[Int]("stale_asides") == 0)
    assert(CorpusRefresh.prepared(spark, dir).count() == before)
  }

  test("EventStore: dangling marker deleted, reads resolve to the prior version") {
    val root = Files.createTempDirectory("graft-repair-events").toString
    val store = new EventStore(spark, root)
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2024-08-11T00:00:00Z"))
    store.insertEvents(Seq(EventRow(
      id = Uuid7.generate(), total_allowed_entries = 4,
      number_of_places_win = 1, number_of_values_per_entry = 6,
      signing_date = t0, observation_date = t0,
      locations = Seq("PFNO", "KSAW"), coordinator_pubkey = "pk",
      nonce = Some(Array[Byte](1, 2)), event_announcement = None,
      attestation_signature = None, created_at = t0, updated_at = t0)))
    assert(store.events.count() == 1)

    touch(s"$root/events/_commit_v00000009") // dangling highest marker
    mkdir(s"$root/events_entries/v00000042") // dead swap scratch
    assertThrows[Throwable](store.events.collect())
    val dry = store.repair() // default dryRun
    assert(dry.count() == 2)
    assert(!gone(s"$root/events/_commit_v00000009"),
      "dryRun must not touch the filesystem")
    val fixed = store.repair(dryRun = false)
    assert(fixed.collect().forall(_.getAs[Boolean]("applied")))
    assert(gone(s"$root/events/_commit_v00000009") &&
      gone(s"$root/events_entries/v00000042"))
    val doc = store.doctor().collect()
      .map(r => r.getString(0) -> (r.getInt(3), r.getInt(4))).toMap
    assert(doc.values.forall(_ == ((0, 0))), s"doctor must be clean: $doc")
    assert(store.events.count() == 1, "reads must resolve to the prior version")
  }
}
