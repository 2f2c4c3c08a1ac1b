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
}
