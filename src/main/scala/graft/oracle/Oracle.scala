package graft.oracle

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.WeatherQueries
import graft.store.WeatherStore
import graft.store.WeatherStore.Kinds

/** The composed ETL pipeline (SURVEY §3.2; the reference's
  * `POST /oracle/update` → `Oracle::etl_data`, oracle.rs:314-389): one
  * production entry point a scheduler calls per tick, running
  *
  *   active events → per-event A1/A2 aggregates from the weather store →
  *   weather write-back → score entries from the stored weather →
  *   score merge → per-event winner ranking → Schnorr attestation.
  *
  * Driver-loop boundaries mirror the reference exactly: the active-event
  * list is bounded small by design ("maybe 10 at most", oracle.rs:316),
  * each event's station list is ≤ 50 (the chunk cap), and winners are 3
  * rows per event (oracle.rs:606) — those are the only collects. All
  * per-row work (aggregation, scoring, ranking) stays in Spark plans, so
  * one event with a million entries is the same code path, just a bigger
  * cluster.
  *
  * Like the reference, repeated runs append fresh weather rows rather
  * than deduplicating them (oracle.rs:315-317 notes the same), and
  * re-score idempotently; events are signed once (attestation-null
  * filter) with their committed nonce.
  */
object Oracle {

  final case class EtlReport(
      activeEvents: Int,
      weatherRowsWritten: Int,
      entriesScored: Long,
      signedEventIds: Seq[String])

  /** Rust `f64::round() as i64` (half-away-from-zero) — the store-time
    * rounding the reference applies to observed temps (db/mod.rs:856-862),
    * which makes scoring from stored longs bit-identical to scoring the
    * raw doubles (Scoring.rustRound is idempotent on whole values). */
  private def rustRound(d: Double): Long =
    BigDecimal(d).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  def runEtl(
      spark: SparkSession,
      weatherStore: WeatherStore,
      eventStore: EventStore,
      privateKey: Array[Byte],
      now: Timestamp): EtlReport = {

    // Step 0: active events (attestation IS NULL), with their windows.
    // Bounded driver list by design — see the class doc.
    val active = eventStore.activeEvents()
      .select("id", "signing_date", "observation_date", "locations", "nonce",
        "number_of_places_win")
      .collect()
    if (active.isEmpty) return EtlReport(0, 0, 0L, Nil)

    // Step 1: per-event A1/A2 aggregates over the event's observation day
    // and locations, written back as weather rows + event links
    // (update_event_weather_data, oracle.rs:391-443).
    var weatherRows = 0
    for (ev <- active) {
      val id = ev.getAs[String]("id")
      val obsDate = ev.getAs[Timestamp]("observation_date")
      val locations = ev.getAs[scala.collection.Seq[String]]("locations").toSeq
      val dayStart = Timestamp.from(
        WeatherStore.toUtcDate(obsDate).atStartOfDay(java.time.ZoneOffset.UTC).toInstant)
      val dayEnd = new Timestamp(dayStart.getTime + 24L * 3600 * 1000)

      val fAgg: Map[String, WeatherReading] =
        weatherStore.read(Kinds.Forecasts, dayStart, dayEnd)
          .map(df => WeatherQueries.forecastsDaily(df, locations, Some(dayStart), Some(dayEnd))
            .select("station_id", "start_time", "temp_low", "temp_high", "wind_speed")
            .collect()
            .map(r => r.getAs[String]("station_id") -> WeatherReading(
              r.getAs[Timestamp]("start_time"), r.getAs[Long]("temp_low"),
              r.getAs[Long]("temp_high"), r.getAs[Long]("wind_speed")))
            .toMap)
          .getOrElse(Map.empty)
      val oAgg: Map[String, WeatherReading] =
        weatherStore.read(Kinds.Observations, dayStart, dayEnd)
          .map(df => WeatherQueries.observationSummary(df, locations, Some(dayStart), Some(dayEnd))
            .select("station_id", "start_time", "temp_low", "temp_high", "wind_speed")
            .collect()
            .map(r => r.getAs[String]("station_id") -> WeatherReading(
              r.getAs[Timestamp]("start_time"),
              rustRound(r.getAs[Double]("temp_low")),
              rustRound(r.getAs[Double]("temp_high")),
              r.getAs[Long]("wind_speed")))
            .toMap)
          .getOrElse(Map.empty)

      val rows = locations.flatMap { st =>
        val obs = oAgg.get(st)
        val fc = fAgg.get(st)
        if (obs.isEmpty && fc.isEmpty) None // nothing known for this station yet
        else Some(WeatherRow(Uuid7.generate(), st, obs, fc, now, now))
      }
      if (rows.nonEmpty) {
        eventStore.insertWeather(rows,
          rows.map(w => EventWeatherRow(Uuid7.generate(), id, w.id, now)))
        weatherRows += rows.length
      }
    }

    // Step 2: score every active event's entries FROM the stored weather
    // (update_active_events_entry_scores, oracle.rs:536-588), one merged
    // write-back.
    val perEventScores: Seq[DataFrame] = active.toSeq.map { ev =>
      val id = ev.getAs[String]("id")
      val wr = eventStore.eventWeatherRows(id)
      // Every ETL tick appends fresh weather rows for a still-active
      // event (step 1, mirroring the reference's acknowledged
      // re-inserts, oracle.rs:315-316) — so scoring MUST reduce to one
      // row per station or re-ticks multiply each choice's points
      // through the join. The reference's Rust `.find()` picks whichever
      // row its unordered Vec yields first; here latest-wins is pinned
      // explicitly (weather ids are UUIDv7 — time-ordered), per side, so
      // an observation that only materialized on a later tick is used
      // even when the earliest row predates it. Re-running the ETL is
      // then idempotent (OracleEtlSpec locks this).
      def latestPerStation(side: String) = {
        val w = Window.partitionBy(col("station_id"))
          .orderBy(col("weather_id").desc)
        wr.where(col(side).isNotNull)
          .withColumn("__rn", row_number().over(w))
          .where(col("__rn") === 1)
          .select(col("station_id"), col(s"$side.temp_low").as("temp_low"),
            col(s"$side.temp_high").as("temp_high"),
            col(s"$side.wind_speed").as("wind_speed"))
      }
      val f = latestPerStation("forecasted")
      val o = latestPerStation("observed")
      val entryIds = eventStore.entries.toDF()
        .where(col("event_id") === id).select(col("id").as("entry_id"))
      val evChoices = eventStore.choices.toDF()
        .join(entryIds, Seq("entry_id"))
        .select("entry_id", "station", "temp_low", "temp_high", "wind_speed")
      Scoring.scoreAllEntries(entryIds, evChoices, f, o)
        .withColumn("event_id", lit(id))
    }
    val allScores = perEventScores.reduce(_ unionByName _)
      // materialize before updateScores swaps the entry files out from
      // under this very plan's scan
      .localCheckpoint(true)
    val entriesScored = allScores.count()
    eventStore.updateScores(allScores.select(col("entry_id"), col("score")))

    // Step 3: sign completed events (signing_date passed, attestation
    // null) — winnersByEvent in ONE plan (ranked to the deepest
    // number_of_places_win among the events being signed), then the
    // bounded per-event collect feeds the Schnorr signer with each
    // event's OWN winner count (top number_of_places_win,
    // add_oracle_signature, oracle.rs:590-658 — a places=1 event signs
    // exactly one winner).
    val toSign = active.filter(_.getAs[Timestamp]("signing_date").before(now))
    val signed = if (toSign.isEmpty) Nil else {
      val signIds = toSign.map(_.getAs[String]("id")).toSeq
      val places = toSign.map(ev =>
        ev.getAs[String]("id") -> ev.getAs[Int]("number_of_places_win")).toMap
      val scored = eventStore.entries.toDF()
        .where(col("event_id").isin(signIds: _*))
        .select(col("event_id"), col("id").as("entry_id"), col("score"))
      val winnerLists = Scoring.winnersByEvent(scored, places.values.max)
        .groupBy("event_id")
        .agg(sort_array(collect_list(struct(col("rank"), col("outcome_index")))).as("w"))
        .collect()
        .map(r => r.getAs[String]("event_id") ->
          r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("w")
            .map(_.getAs[Long]("outcome_index")).toSeq)
        .toMap
      val nonces = toSign.map(ev =>
        ev.getAs[String]("id") -> ev.getAs[Array[Byte]]("nonce")).toMap
      for {
        id <- signIds
        winners <- winnerLists.get(id)
        nonce <- Option(nonces(id))
      } yield {
        val attestation = Schnorr.attestationSecret(
          privateKey, nonce, Scoring.winningBytes(winners.take(places(id))))
        eventStore.updateAttestation(id, attestation)
        id
      }
    }

    EtlReport(active.length, weatherRows, entriesScored, signed)
  }
}
