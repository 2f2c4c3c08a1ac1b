package graft.oracle

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.store.WeatherStore
import graft.store.WeatherStore.Kinds

/** The golden ETL workflow, replayed THROUGH the stores (the reference's
  * tests/api/etl_workflow.rs): raw forecast slots and observation rows
  * land in the weather store, events/entries/choices in the event store,
  * then ONE `Oracle.runEtl` call must aggregate, write weather back,
  * score 409899/309799/409699/109599 into `events_entries`, rank the
  * winners, and attest with the event's committed nonce — byte-identical
  * to an independent recomputation, exactly like the reference's test
  * (etl_workflow.rs:306-333). */
class OracleEtlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  // the same deterministic entry ids as the w4/w5 gate fixture: the
  // tiebreak is 9999 - uuid_millis % 10000
  private val e1 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.100Z"), 0, 0)
  private val e2 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.200Z"), 0, 0)
  private val e3 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.300Z"), 0, 0)
  private val e4 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.400Z"), 0, 0)

  test("runEtl: stores in, golden scores + verifiable attestation out") {
    val root = Files.createTempDirectory("graft-etl").toString
    val weatherStore = new WeatherStore(spark, s"$root/weather")
    val eventStore = new EventStore(spark, s"$root/events")
    val now = ts("2024-08-13T00:00:00Z")
    val created = ts("2024-08-11T00:00:00Z")

    // --- weather store: raw slot/observation rows for the golden
    // aggregates f(PFNO 9,35,8 | KSAW 17,25,3 | PAPG 14,17,6 |
    // KWMC 31,33,11) and o(9.4,35.0,11 | 22.0,25.0,10 | 15.0,16.0,6 |
    // 32.8,34.4,11) — mock_forecast_data/mock_observation_data in the
    // reference test.
    val slots = Seq(
      ("PFNO", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T12:00:00Z"), 9L, 35L, 8L),
      ("KSAW", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T12:00:00Z"), 17L, 25L, 3L),
      ("PAPG", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T12:00:00Z"), 14L, 17L, 6L),
      ("KWMC", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T12:00:00Z"), 31L, 33L, 11L)
    ).toDF("station_id", "begin_time", "end_time", "min_temp", "max_temp", "wind_speed")
    weatherStore.write(slots, Kinds.Forecasts, ts("2024-08-12T01:00:00Z"))

    val obs = Seq(
      ("PFNO", ts("2024-08-12T02:00:00Z"), 9.4, 11L),
      ("PFNO", ts("2024-08-12T14:00:00Z"), 35.0, 5L),
      ("KSAW", ts("2024-08-12T02:00:00Z"), 22.0, 10L),
      ("KSAW", ts("2024-08-12T14:00:00Z"), 25.0, 4L),
      ("PAPG", ts("2024-08-12T02:00:00Z"), 15.0, 6L),
      ("PAPG", ts("2024-08-12T14:00:00Z"), 16.0, 6L),
      ("KWMC", ts("2024-08-12T02:00:00Z"), 32.8, 11L),
      ("KWMC", ts("2024-08-12T14:00:00Z"), 34.4, 9L)
    ).toDF("station_id", "generated_at", "temperature_value", "wind_speed")
    weatherStore.write(obs, Kinds.Observations, ts("2024-08-12T15:00:00Z"))

    // --- event store: one event past its signing date, four entries with
    // the golden choices.
    val seckey = Schnorr.taggedHash("graft/etl-test-key", Array(1.toByte))
    val nonce = Schnorr.taggedHash("graft/etl-test-nonce", Array(2.toByte))
    val eventId = Uuid7.generateDeterministic(Instant.parse("2024-08-10T00:00:00Z"), 0, 0)
    eventStore.insertEvents(Seq(EventRow(
      id = eventId, total_allowed_entries = 4, number_of_places_win = 3,
      number_of_values_per_entry = 6,
      signing_date = ts("2024-08-12T23:00:00Z"), // < now: must be signed
      observation_date = ts("2024-08-12T00:00:00Z"),
      locations = Seq("PFNO", "KSAW", "PAPG", "KWMC"),
      coordinator_pubkey = "pk", nonce = Some(nonce), event_announcement = None,
      attestation_signature = None, created_at = created, updated_at = created)))

    val choices: Seq[(String, String, Option[String], Option[String], Option[String])] = Seq(
      (e1, "PFNO", Some("under"), None, Some("over")),
      (e1, "KSAW", None, None, Some("over")),
      (e1, "KWMC", Some("par"), Some("under"), Some("par")),
      (e2, "PFNO", Some("par"), None, Some("par")),
      (e2, "KSAW", Some("par"), None, Some("over")),
      (e2, "KWMC", Some("par"), Some("under"), None),
      (e3, "PFNO", Some("par"), None, Some("under")),
      (e3, "KSAW", Some("over"), None, Some("over")),
      (e3, "KWMC", Some("par"), None, Some("under")),
      (e4, "PFNO", Some("over"), None, Some("par")),
      (e4, "KSAW", None, Some("under"), Some("over")),
      (e4, "KWMC", Some("par"), None, Some("under")))
    eventStore.insertEntries(
      Seq(e1, e2, e3, e4).map(id => EntryRow(id, eventId, 0L, created, created)),
      choices.zipWithIndex.map { case ((en, st, lo, hi, w), i) =>
        ChoiceRow(i + 1L, en, st, lo, hi, w) })

    // --- the single composed call
    val report = Oracle.runEtl(spark, weatherStore, eventStore, seckey, now)

    assert(report.activeEvents == 1)
    assert(report.weatherRowsWritten == 4)
    assert(report.entriesScored == 4L)
    assert(report.signedEventIds == Seq(eventId))

    // weather write-back happened through the store
    assert(eventStore.eventWeatherRows(eventId).count() == 4)

    // golden scores landed in events_entries (etl_workflow.rs:284-304)
    val scores = eventStore.entries.collect().map(r => r.id -> r.score).toMap
    assert(scores(e1) == 409899L)
    assert(scores(e2) == 309799L)
    assert(scores(e3) == 409699L)
    assert(scores(e4) == 109599L)

    // attestation recomputes byte-identically (etl_workflow.rs:306-333):
    // winners by score desc are e1, e3, e2; outcome indices are positions
    // in entry-id order (e1<e2<e3<e4 by construction) -> 0, 2, 1
    val att = eventStore.events.collect().find(_.id == eventId).get
      .attestation_signature.get
    val winningBytes = Scoring.winningBytes(Seq(0L, 2L, 1L))
    assert(java.util.Arrays.equals(att,
      Schnorr.attestationSecret(seckey, nonce, winningBytes)))
    // and it verifies as a BIP-340 signature under the committed nonce
    assert(Schnorr.verify(Schnorr.pubkey(seckey), winningBytes,
      Schnorr.pubkey(nonce) ++ att))

    // the event left the active set; a second tick is a no-op sign-wise
    assert(eventStore.activeEvents().count() == 0)
    val second = Oracle.runEtl(spark, weatherStore, eventStore, seckey, now)
    assert(second.activeEvents == 0 && second.signedEventIds.isEmpty)
  }

  test("runEtl re-ticks are idempotent: appended weather rows don't multiply scores") {
    // a still-active event (signing date in the future) scored across
    // THREE ticks: each tick appends fresh weather rows (the reference's
    // acknowledged re-inserts), and scoring must reduce latest-per-
    // station instead of joining every historical row — or points
    // multiply with the tick count
    val root = Files.createTempDirectory("graft-etl-retick").toString
    val weatherStore = new WeatherStore(spark, s"$root/weather")
    val eventStore = new EventStore(spark, s"$root/events")
    val now = ts("2024-08-13T00:00:00Z")
    val created = ts("2024-08-11T00:00:00Z")

    val slots = Seq(
      ("PFNO", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T12:00:00Z"), 9L, 35L, 8L),
      ("KSAW", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T12:00:00Z"), 17L, 25L, 3L),
      ("KWMC", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T12:00:00Z"), 31L, 33L, 11L)
    ).toDF("station_id", "begin_time", "end_time", "min_temp", "max_temp", "wind_speed")
    weatherStore.write(slots, Kinds.Forecasts, ts("2024-08-12T01:00:00Z"))
    val obs = Seq(
      ("PFNO", ts("2024-08-12T02:00:00Z"), 9.4, 11L),
      ("KSAW", ts("2024-08-12T02:00:00Z"), 22.0, 10L),
      ("KWMC", ts("2024-08-12T02:00:00Z"), 32.8, 11L)
    ).toDF("station_id", "generated_at", "temperature_value", "wind_speed")
    weatherStore.write(obs, Kinds.Observations, ts("2024-08-12T15:00:00Z"))

    val seckey = Schnorr.taggedHash("graft/etl-retick-key", Array(3.toByte))
    val eventId = Uuid7.generateDeterministic(Instant.parse("2024-08-10T01:00:00Z"), 0, 0)
    eventStore.insertEvents(Seq(EventRow(
      id = eventId, total_allowed_entries = 2, number_of_places_win = 1,
      number_of_values_per_entry = 6,
      signing_date = ts("2024-08-20T00:00:00Z"), // future: stays active
      observation_date = ts("2024-08-12T00:00:00Z"),
      locations = Seq("PFNO", "KSAW", "KWMC"),
      coordinator_pubkey = "pk", nonce = None, event_announcement = None,
      attestation_signature = None, created_at = created, updated_at = created)))
    eventStore.insertEntries(
      Seq(e1, e2).map(id => EntryRow(id, eventId, 0L, created, created)),
      Seq(ChoiceRow(1L, e1, "PFNO", Some("under"), None, Some("over")),
        ChoiceRow(2L, e1, "KWMC", Some("par"), Some("under"), Some("par")),
        ChoiceRow(3L, e2, "PFNO", Some("par"), None, Some("par"))))

    Oracle.runEtl(spark, weatherStore, eventStore, seckey, now)
    val first = eventStore.entries.collect().map(r => r.id -> r.score).toMap
    assert(first.values.forall(_ > 0L), s"tick 1 produced no scores: $first")

    for (_ <- 2 to 3) Oracle.runEtl(spark, weatherStore, eventStore, seckey, now)
    val third = eventStore.entries.collect().map(r => r.id -> r.score).toMap
    assert(third == first,
      s"re-ticks changed scores: tick1 $first vs tick3 $third")
    // the appended history is real (3 ticks × 3 stations) — only the
    // scoring reduction keeps it from leaking into the points
    assert(eventStore.eventWeatherRows(eventId).count() == 9)
  }

  test("runEtl handles many concurrent events: per-event scores and signatures") {
    // the reference's operating regime (~10 concurrent active events,
    // oracle.rs:315) — scores must not bleed across events and only
    // events past their signing date sign
    val root = Files.createTempDirectory("graft-etl3").toString
    val weatherStore = new WeatherStore(spark, s"$root/weather")
    val eventStore = new EventStore(spark, s"$root/events")
    val now = ts("2024-08-13T00:00:00Z")
    val created = ts("2024-08-11T00:00:00Z")

    val slots = Seq(
      ("PFNO", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T12:00:00Z"), 9L, 35L, 8L),
      ("KSAW", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T12:00:00Z"), 17L, 25L, 3L)
    ).toDF("station_id", "begin_time", "end_time", "min_temp", "max_temp", "wind_speed")
    weatherStore.write(slots, Kinds.Forecasts, ts("2024-08-12T01:00:00Z"))
    val obs = Seq(
      ("PFNO", ts("2024-08-12T02:00:00Z"), 9.0, 8L),
      ("KSAW", ts("2024-08-12T02:00:00Z"), 20.0, 10L)
    ).toDF("station_id", "generated_at", "temperature_value", "wind_speed")
    weatherStore.write(obs, Kinds.Observations, ts("2024-08-12T15:00:00Z"))

    val seckey = Schnorr.taggedHash("graft/etl-test-key", Array(5.toByte))
    def mkEvent(id: String, signing: Timestamp, nonceSeed: Byte) = EventRow(
      id = id, total_allowed_entries = 2, number_of_places_win = 1,
      number_of_values_per_entry = 3, signing_date = signing,
      observation_date = ts("2024-08-12T00:00:00Z"),
      locations = Seq("PFNO", "KSAW"), coordinator_pubkey = "pk",
      nonce = Some(Schnorr.taggedHash("graft/etl-test-nonce", Array(nonceSeed))),
      event_announcement = None, attestation_signature = None,
      created_at = created, updated_at = created)
    val (evA, evB, evC) = (
      Uuid7.generateDeterministic(Instant.parse("2024-08-10T00:00:00Z"), 1, 0),
      Uuid7.generateDeterministic(Instant.parse("2024-08-10T00:00:01Z"), 2, 0),
      Uuid7.generateDeterministic(Instant.parse("2024-08-10T00:00:02Z"), 3, 0))
    eventStore.insertEvents(Seq(
      mkEvent(evA, ts("2024-08-12T23:00:00Z"), 6), // past signing: signs
      mkEvent(evB, ts("2024-08-12T23:00:00Z"), 7), // past signing: signs
      mkEvent(evC, ts("2024-08-14T00:00:00Z"), 8))) // future: stays active

    // e1/e2 in evA (par hits on PFNO low => 20), e3 in evB (miss => 0),
    // e4 in evC (par on KSAW wind? choice 'over' f3 < o10 => 10)
    eventStore.insertEntries(
      Seq(EntryRow(e1, evA, 0L, created, created),
        EntryRow(e2, evA, 0L, created, created),
        EntryRow(e3, evB, 0L, created, created),
        EntryRow(e4, evC, 0L, created, created)),
      Seq(ChoiceRow(1L, e1, "PFNO", Some("par"), None, None),
        ChoiceRow(2L, e2, "PFNO", Some("over"), None, None),
        ChoiceRow(3L, e3, "KSAW", Some("under"), None, None),
        ChoiceRow(4L, e4, "KSAW", None, None, Some("over"))))

    val report = Oracle.runEtl(spark, weatherStore, eventStore, seckey, now)
    assert(report.activeEvents == 3)
    assert(report.signedEventIds.sorted == Seq(evA, evB).sorted)

    // per-event scores: bases 20 (e1 par 9==9), 0 (e2 over 9<9 false),
    // 0 (e3 under 17>20 false), 10 (e4 over 3<10)
    val scores = eventStore.entries.collect().map(r => r.id -> r.score).toMap
    assert(scores(e1) == 20L * 10000L + 9899L)
    assert(scores(e2) == 9799L)
    assert(scores(e3) == 9699L)
    assert(scores(e4) == 10L * 10000L + 9599L)

    // each signed event attests ITS OWN winner under ITS OWN nonce:
    // both evA (winner e1, index 0 of {e1,e2}) and evB (winner e3,
    // index 0 of {e3}) encode winning index 0 — distinct nonces must
    // still produce distinct, individually-verifiable attestations
    val byId = eventStore.events.collect().map(e => e.id -> e).toMap
    for (ev <- Seq(evA, evB)) {
      val att = byId(ev).attestation_signature.get
      val bytes = Scoring.winningBytes(Seq(0L))
      assert(java.util.Arrays.equals(att,
        Schnorr.attestationSecret(seckey, byId(ev).nonce.get, bytes)), ev)
      assert(Schnorr.verify(Schnorr.pubkey(seckey), bytes,
        Schnorr.pubkey(byId(ev).nonce.get) ++ att), ev)
    }
    assert(byId(evA).attestation_signature.get.toSeq !=
      byId(evB).attestation_signature.get.toSeq)
    assert(byId(evC).attestation_signature.isEmpty)
    assert(eventStore.activeEvents().count() == 1) // only evC remains
  }

  test("runEtl scores entries even when a station has no observations yet") {
    val root = Files.createTempDirectory("graft-etl2").toString
    val weatherStore = new WeatherStore(spark, s"$root/weather")
    val eventStore = new EventStore(spark, s"$root/events")
    val now = ts("2024-08-12T06:00:00Z") // before signing_date: no signing

    val slots = Seq(
      ("PFNO", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T12:00:00Z"), 9L, 35L, 8L)
    ).toDF("station_id", "begin_time", "end_time", "min_temp", "max_temp", "wind_speed")
    weatherStore.write(slots, Kinds.Forecasts, ts("2024-08-12T01:00:00Z"))
    // no observations at all

    val seckey = Schnorr.taggedHash("graft/etl-test-key", Array(3.toByte))
    val eventId = Uuid7.generate()
    eventStore.insertEvents(Seq(EventRow(
      id = eventId, total_allowed_entries = 2, number_of_places_win = 1,
      number_of_values_per_entry = 3,
      signing_date = ts("2024-08-13T00:00:00Z"), observation_date = ts("2024-08-12T00:00:00Z"),
      locations = Seq("PFNO"), coordinator_pubkey = "pk",
      nonce = Some(Schnorr.taggedHash("graft/etl-test-nonce", Array(4.toByte))),
      event_announcement = None, attestation_signature = None,
      created_at = now, updated_at = now)))
    eventStore.insertEntries(
      Seq(EntryRow(e1, eventId, 0L, now, now)),
      Seq(ChoiceRow(1L, e1, "PFNO", Some("par"), None, None)))

    val report = Oracle.runEtl(spark, weatherStore, eventStore, seckey, now)
    assert(report.signedEventIds.isEmpty)
    // no observation -> the station contributes nothing (inner-join
    // semantics, oracle.rs:478-491): base 0, tiebreak-only score
    val score = eventStore.entries.collect().find(_.id == e1).get.score
    assert(score == 9999L - 100L) // base 0 * 10000 + (9999 - millis)
    // still re-scorable and unsigned on the next tick
    assert(eventStore.activeEvents().count() == 1)
  }
}
