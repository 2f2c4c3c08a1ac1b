package graft.oracle

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EventStoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t0 = Timestamp.from(Instant.parse("2024-08-11T00:00:00Z"))

  private def newStore() =
    new EventStore(spark, Files.createTempDirectory("graft-events").toString)

  private def mkEvent(id: String) = EventRow(
    id = id, total_allowed_entries = 4, number_of_places_win = 1,
    number_of_values_per_entry = 6, signing_date = t0, observation_date = t0,
    locations = Seq("PFNO", "KSAW"), coordinator_pubkey = "pk",
    nonce = Some(Array[Byte](1, 2)), event_announcement = None,
    attestation_signature = None, created_at = t0, updated_at = t0)

  test("insert + activeEvents with entry counts, coalesce 0") {
    val store = newStore()
    val eA = Uuid7.generate(); val eB = Uuid7.generate()
    store.insertEvents(Seq(mkEvent(eA), mkEvent(eB)))
    val n1 = Uuid7.generate(); val n2 = Uuid7.generate()
    store.insertEntries(
      Seq(EntryRow(n1, eA, 0L, t0, t0), EntryRow(n2, eA, 0L, t0, t0)),
      Seq(ChoiceRow(1L, n1, "PFNO", Some("par"), None, Some("over")),
        ChoiceRow(2L, n2, "KSAW", None, Some("under"), None)))

    val active = store.activeEvents().collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Long]("total_entries")).toMap
    assert(active(eA) == 2L)
    assert(active(eB) == 0L)
  }

  test("choice enum validation rejects bad values") {
    val store = newStore()
    val n = Uuid7.generate()
    intercept[IllegalArgumentException] {
      store.insertEntries(Seq(EntryRow(n, "ev", 0L, t0, t0)),
        Seq(ChoiceRow(1L, n, "PFNO", Some("sideways"), None, None)))
    }
  }

  test("updateScores merges by entry id (J5) and preserves others") {
    val store = newStore()
    val e = Uuid7.generate()
    store.insertEvents(Seq(mkEvent(e)))
    val n1 = Uuid7.generate(); val n2 = Uuid7.generate()
    store.insertEntries(Seq(EntryRow(n1, e, 0L, t0, t0), EntryRow(n2, e, 7L, t0, t0)), Nil)
    store.updateScores(Seq((n1, 409899L)).toDF("entry_id", "score"))
    val scores = store.entries.collect().map(r => r.id -> r.score).toMap
    assert(scores(n1) == 409899L)
    assert(scores(n2) == 7L)
  }

  test("time travel: entriesAsOf reads the pre-merge scores") {
    val store = newStore()
    val e = Uuid7.generate()
    store.insertEvents(Seq(mkEvent(e)))
    val n1 = Uuid7.generate()
    store.insertEntries(Seq(EntryRow(n1, e, 5L, t0, t0)), Nil)
    val before = store.tableVersions("events_entries").last
    store.updateScores(Seq((n1, 409899L)).toDF("entry_id", "score"))
    val versions = store.tableVersions("events_entries")
    assert(versions.contains(before) && versions.last != before)
    // current read sees the merge; the retained pre-merge version doesn't
    assert(store.entries.collect().head.score == 409899L)
    assert(store.entriesAsOf(before).collect().head.score == 5L)
    intercept[IllegalArgumentException](store.entriesAsOf("v99999999"))
    // the live version is append-mutable, not a snapshot — rejected
    intercept[IllegalArgumentException](store.entriesAsOf(versions.last))
  }

  test("updateAttestation removes the event from the active set") {
    val store = newStore()
    val e1 = Uuid7.generate(); val e2 = Uuid7.generate()
    store.insertEvents(Seq(mkEvent(e1), mkEvent(e2)))
    store.updateAttestation(e1, Array[Byte](9, 9))
    val active = store.activeEvents().collect().map(_.getAs[String]("id")).toSet
    assert(active == Set(e2))
    val sig = store.events.collect().find(_.id == e1).get.attestation_signature
    assert(sig.exists(_.sameElements(Array[Byte](9, 9))))
  }

  test("listEvents: left-join counts, stable order, default limit 100") {
    val store = newStore()
    val ids = (1 to 110).map(i => f"ev-$i%03d")
    store.insertEvents(ids.map(mkEvent))
    val n1 = Uuid7.generate()
    store.insertEntries(Seq(EntryRow(n1, "ev-002", 0L, t0, t0)), Nil)

    val listed = store.listEvents().collect()
    assert(listed.length == 100) // default EventFilter caps the listing
    assert(listed.map(_.getAs[String]("id")).toSeq == ids.sorted.take(100))
    val byId = listed.map(r => r.getAs[String]("id") -> r.getAs[Long]("total_entries")).toMap
    assert(byId("ev-002") == 1L && byId("ev-001") == 0L)

    val some = store.eventsByIds(Seq("ev-105", "ev-002")).collect()
    assert(some.map(_.getAs[String]("id")).toSeq == Seq("ev-002", "ev-105"))
  }

  test("eventsToSign: unsigned events among the requested ids, with nonce bytes") {
    val store = newStore()
    store.insertEvents(Seq(mkEvent("ev-a"), mkEvent("ev-b"), mkEvent("ev-c")))
    store.updateAttestation("ev-b", Array[Byte](7))
    val toSign = store.eventsToSign(Seq("ev-a", "ev-b")).collect()
    assert(toSign.map(_.getAs[String]("id")).toSeq == Seq("ev-a")) // ev-b signed, ev-c unrequested
    assert(toSign.head.getAs[Array[Byte]]("nonce").sameElements(Array[Byte](1, 2)))

    val json = store.signEventsJson(Seq("ev-a")).collect().head.getAs[String]("sign_event")
    assert(json.contains("\"nonce\":\"" +
      java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2)) + "\""))
    assert(json.contains("\"signing_date\":\"2024-08-11T00:00:00Z\""))
  }

  test("insertEntriesAutoIds: sequence-style choice ids and now() defaults") {
    val store = newStore()
    store.insertEvents(Seq(mkEvent("ev-a")))
    val n0 = Uuid7.generate()
    store.insertEntries(Seq(EntryRow(n0, "ev-a", 0L, t0, t0)),
      Seq(ChoiceRow(41L, n0, "PFNO", Some("par"), None, None)))

    val n1 = Uuid7.generate(); val n2 = Uuid7.generate()
    store.insertEntriesAutoIds(
      Seq(EntryRow(n1, "ev-a", 0L, null, null), EntryRow(n2, "ev-a", 0L, t0, t0)),
      Seq((n1, "PFNO", Some("over"), None, None),
        (n1, "KSAW", None, Some("under"), None),
        (n2, "KWMC", Some("par"), None, Some("par"))))

    val cs = store.choices.collect()
    val autoIds = cs.filter(_.id != 41L).map(_.id)
    assert(autoIds.length == 3 && autoIds.distinct.length == 3)
    assert(autoIds.forall(_ > 41L)) // strictly after the existing max, like a sequence
    val stamped = store.entries.collect()
    assert(stamped.forall(e => e.created_at != null && e.updated_at != null))
    assert(stamped.find(_.id == n2).get.created_at == t0) // explicit values kept
  }

  test("insertEntriesAutoIds: O(1) sequence marker, not a table rescan") {
    val rootDir = Files.createTempDirectory("graft-seq").toString
    val store = new EventStore(spark, rootDir)
    store.insertEvents(Seq(mkEvent("ev-s")))
    val n1 = Uuid7.generate()
    store.insertEntriesAutoIds(Seq(EntryRow(n1, "ev-s", 0L, t0, t0)),
      Seq((n1, "PFNO", Some("over"), None, None)))
    // the reservation left a high-water marker file in the table dir
    val dir = new java.io.File(rootDir, "expected_observations")
    def markers = dir.listFiles.map(_.getName).filter(_.startsWith("_seq_")).toSeq
    assert(markers == Seq("_seq_1"))
    // allocation follows the MARKER, not max(id): plant a higher mark and
    // the next batch must start above it (proves no data rescan)
    assert(new java.io.File(dir, "_seq_1").delete())
    assert(new java.io.File(dir, "_seq_1000").createNewFile())
    val n2 = Uuid7.generate()
    store.insertEntriesAutoIds(Seq(EntryRow(n2, "ev-s", 0L, t0, t0)),
      Seq((n2, "KSAW", None, Some("under"), None), (n2, "KWMC", Some("par"), None, None)))
    val ids = store.choices.collect().map(_.id).sorted
    assert(ids.toSeq == Seq(1L, 1001L, 1002L))
    assert(markers == Seq("_seq_1002")) // old marks retired, one survivor
  }

  test("writer lock: concurrent insert batches serialize, ids stay unique") {
    val store = newStore()
    store.insertEvents(Seq(mkEvent("ev-c")))
    // each thread retries on lock exhaustion, as the reference's API
    // callers do on its lock-retry 500s — the property under test is
    // mutual exclusion (no lost reservation), not the retry budget
    val failures = new java.util.concurrent.atomic.AtomicInteger
    val threads = (1 to 6).map { _ =>
      new Thread(() => {
        val n = Uuid7.generate()
        var attempts = 0
        var done = false
        while (!done && attempts < 60) {
          try {
            store.insertEntriesAutoIds(Seq(EntryRow(n, "ev-c", 0L, t0, t0)),
              Seq((n, "PFNO", Some("over"), None, None),
                (n, "KSAW", None, Some("under"), None)))
            done = true
          } catch {
            case e: RuntimeException if e.getMessage.contains("writer lock") =>
              attempts += 1; Thread.sleep(50)
          }
        }
        if (!done) failures.incrementAndGet()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(failures.get() == 0)
    val ids = store.choices.collect().map(_.id)
    // 6 racing read-modify-write reservations: any lost update would
    // produce a duplicate id
    assert(ids.length == 12 && ids.distinct.length == 12)
  }

  test("writer lock: a held lock exhausts the 5 x 100 ms retry budget") {
    val rootDir = Files.createTempDirectory("graft-lock").toString
    val store = new EventStore(spark, rootDir)
    store.insertEvents(Seq(mkEvent("ev-l"))) // creates the root
    val lock = new java.io.File(rootDir, "_writer_lock")
    assert(lock.createNewFile())
    try {
      val t0ms = System.currentTimeMillis()
      val e = intercept[RuntimeException] {
        store.insertEvents(Seq(mkEvent("ev-l2")))
      }
      assert(e.getMessage.contains("writer lock"))
      assert(System.currentTimeMillis() - t0ms >= 400) // ~5 x 100 ms waited
    } finally lock.delete()
  }

  test("writer lock: a stale lock from a crashed writer is broken") {
    val rootDir = Files.createTempDirectory("graft-stale").toString
    val store = new EventStore(spark, rootDir)
    store.insertEvents(Seq(mkEvent("ev-st")))
    val lock = new java.io.File(rootDir, "_writer_lock")
    assert(lock.createNewFile())
    assert(lock.setLastModified(System.currentTimeMillis() - EventStore.LockStaleMs - 1000))
    store.insertEvents(Seq(mkEvent("ev-st2"))) // must not need 5 retries
    assert(store.events.collect().map(_.id).sorted.toSeq == Seq("ev-st", "ev-st2"))
    assert(!lock.exists())
  }

  test("writer lock: heartbeat keeps a long-held lock from going stale") {
    val rootDir = Files.createTempDirectory("graft-beat").toString
    val store = new EventStore(spark, rootDir, lockStaleMs = 1000)
    store.insertEvents(Seq(mkEvent("ev-hb")))
    @volatile var holderDone = false
    val holder = new Thread(() => {
      store.withWriterLock { Thread.sleep(2500); holderDone = true }
    })
    holder.start()
    Thread.sleep(1500) // well past lockStaleMs: only the heartbeat saves it
    // a contender must NOT break the heartbeated lock — it exhausts the
    // retry budget instead, while the holder is still inside f
    val e = intercept[RuntimeException] { store.insertEvents(Seq(mkEvent("ev-hb2"))) }
    assert(e.getMessage.contains("writer lock") && !holderDone)
    holder.join()
    assert(holderDone)
    store.insertEvents(Seq(mkEvent("ev-hb3"))) // and releases cleanly
    assert(store.events.count() == 2)
  }

  test("reserveSeq with an empty choice batch keeps the sequence marker") {
    val rootDir = Files.createTempDirectory("graft-seq0").toString
    val store = new EventStore(spark, rootDir)
    store.insertEvents(Seq(mkEvent("ev-z")))
    val n1 = Uuid7.generate()
    store.insertEntriesAutoIds(Seq(EntryRow(n1, "ev-z", 0L, t0, t0)),
      Seq((n1, "PFNO", Some("over"), None, None)))
    val dir = new java.io.File(rootDir, "expected_observations")
    def markers = dir.listFiles.map(_.getName).filter(_.startsWith("_seq_")).toSeq
    assert(markers == Seq("_seq_1"))
    // an entry with no choices reserves n = 0: the marker must survive
    val n2 = Uuid7.generate()
    store.insertEntriesAutoIds(Seq(EntryRow(n2, "ev-z", 0L, t0, t0)), Seq.empty)
    assert(markers == Seq("_seq_1"))
    val n3 = Uuid7.generate()
    store.insertEntriesAutoIds(Seq(EntryRow(n3, "ev-z", 0L, t0, t0)),
      Seq((n3, "KSAW", None, Some("under"), None)))
    assert(store.choices.collect().map(_.id).sorted.toSeq == Seq(1L, 2L))
  }

  test("eventWeatherRows 3-way join and entriesWithChoices collection") {
    val store = newStore()
    val e = Uuid7.generate()
    store.insertEvents(Seq(mkEvent(e)))
    val w1 = Uuid7.generate()
    store.insertWeather(
      Seq(WeatherRow(w1, "PFNO",
        observed = Some(WeatherReading(t0, 9L, 35L, 11L)),
        forecasted = Some(WeatherReading(t0, 9L, 35L, 8L)), created_at = t0, updated_at = t0)),
      Seq(EventWeatherRow(Uuid7.generate(), e, w1, t0)))
    val rows = store.eventWeatherRows(e).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("station_id") == "PFNO")

    val n = Uuid7.generate()
    store.insertEntries(Seq(EntryRow(n, e, 0L, t0, t0)),
      Seq(ChoiceRow(2L, n, "KSAW", None, None, Some("over")),
        ChoiceRow(1L, n, "PFNO", Some("par"), None, None)))
    val ec = store.entriesWithChoices(e).collect()
    assert(ec.length == 1)
    val obs = ec.head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("expected_observations")
    assert(obs.map(_.getAs[Long]("choice_id")).toSeq == Seq(1L, 2L)) // sorted, deterministic
  }

  test("a concurrent reader never fails across 100 swap-writes") {
    val store = newStore()
    val e = Uuid7.generate()
    store.insertEvents(Seq(mkEvent(e)))

    @volatile var failure: Option[Throwable] = None
    @volatile var keepReading = true
    @volatile var reads = 0
    val reader = new Thread(() => {
      while (keepReading && failure.isEmpty) {
        try {
          // full read path: pointer resolve -> version scan -> count
          if (store.events.count() != 1L)
            failure = Some(new AssertionError("reader saw wrong row count"))
          reads += 1
        } catch { case t: Throwable => failure = Some(t) }
      }
    })
    reader.start()
    try
      // every updateAttestation is a swapWrite of the events table
      for (i <- 1 to 100) store.updateAttestation(e, Array(i.toByte))
    finally {
      keepReading = false
      reader.join(60000)
    }
    assert(failure.isEmpty, s"concurrent reader failed: ${failure.map(_.toString)}")
    assert(reads > 0, "reader thread never completed a read")
    // the writer's last swap won
    val att = store.events.head().attestation_signature.get
    assert(att.length == 1 && att.head == 100.toByte)
  }

  test("crash between version write and commit marker: readers blind, next writer recovers") {
    import org.apache.spark.sql.functions.lit
    val rootDir = Files.createTempDirectory("graft-events-crash").toString
    val store = new EventStore(spark, rootDir)
    val e = Uuid7.generate()
    store.insertEvents(Seq(mkEvent(e)))
    val n1 = Uuid7.generate(); val n2 = Uuid7.generate()
    store.insertEntries(Seq(EntryRow(n1, e, 1L, t0, t0), EntryRow(n2, e, 2L, t0, t0)), Nil)
    store.updateScores(Seq((n1, 10L)).toDF("entry_id", "score"))
    val liveBefore = store.tableVersions("events_entries").last
    val rowsBefore = store.entries.collect().map(r => r.id -> r.score).toMap

    // Simulate a writer that died AFTER fully writing the next version
    // dir but BEFORE creating its commit marker: plausible-but-wrong
    // data, no pointer. (The complementary torn state — marker without
    // dir — cannot occur: commitPointer runs only after the write
    // returns.)
    val nextNum = liveBefore.drop(1).toInt + 1
    val orphan = f"$rootDir/events_entries/v$nextNum%08d"
    store.entries.toDF().withColumn("score", lit(999999L)).write.parquet(orphan)

    // (1) readers resolve by marker, so the partial version is invisible
    // to both the current read and the time-travel surface
    assert(store.tableVersions("events_entries").last == liveBefore)
    assert(store.entries.collect().map(r => r.id -> r.score).toMap == rowsBefore)

    // (2) the next writer claims the same version number, overwrites the
    // orphan bytes, and commits — the junk rows were reachable at no
    // point before, during, or after
    store.updateScores(Seq((n2, 20L)).toDF("entry_id", "score"))
    assert(store.entries.collect().map(r => r.id -> r.score).toMap ==
      Map(n1 -> 10L, n2 -> 20L))
    assert(store.tableVersions("events_entries").last == f"v$nextNum%08d")
  }

  test("doctor: clean when healthy; counts dead version dirs and dangling markers") {
    val root = Files.createTempDirectory("graft-events-doctor").toString
    val store = new EventStore(spark, root)
    store.insertEvents(Seq(mkEvent(Uuid7.generate())))

    def report(): Map[String, (String, Int, Int, Int)] =
      store.doctor().collect().map(r => r.getString(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    val healthy = report()
    assert(healthy("events")._1 == "v00000001")
    assert(healthy.values.forall(v => v._3 == 0 && v._4 == 0),
      s"healthy store must audit clean: $healthy")

    // a swap that died before its marker: inert, counted
    assert(new java.io.File(s"$root/events/v99999999").mkdirs())
    assert(report()("events")._3 == 1, "dead version dir must be counted")
    assert(new java.io.File(s"$root/events/v99999999").delete())

    // a marker whose dir is missing: the violation that breaks reads
    new java.io.File(s"$root/events/_commit_v00000007").createNewFile()
    assert(report()("events")._4 == 1, "dangling marker must be counted")
    assert(new java.io.File(s"$root/events/_commit_v00000007").delete())
    assert(report() == healthy)
  }
}
