package graft.api

import java.sql.Timestamp
import java.time.{Instant, OffsetDateTime}
import java.time.format.DateTimeFormatter
import java.util.Base64

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.json4s._

import graft.oracle._
import graft.queries.WeatherQueries
import graft.sql.AdHoc
import graft.store.WeatherStore
import graft.store.WeatherStore.Kinds

/** The application layer the reference exposes over HTTP
  * (crates/oracle/src/oracle.rs + routes/), bound to the engine's stores
  * and plans. Every method returns a json4s JValue (or bytes) so
  * [[ApiServer]] stays a pure transport shell.
  *
  * Design notes vs the reference:
  *  - Events/entries come from [[EventStore]] plans, never a row loop:
  *    the list endpoint's per-event weather is ONE join over the ids
  *    being listed (the reference issues a query per event,
  *    db/mod.rs:450+).
  *  - `status` implements the reference's documented intent (LIVE until
  *    the observation day begins, RUNNING during it, COMPLETED after,
  *    SIGNED once attested) — the reference's own `get_status`
  *    (db/mod.rs:447-471) has an unreachable RUNNING branch
  *    (`observation_date < now && observation_date − 1d > now` is
  *    contradictory); we restore the comment's semantics.
  *  - The event nonce is derived deterministically from the oracle key
  *    and event id (tagged hash) instead of an in-process CSPRNG: same
  *    unpredictability to third parties, plus crash-safe reproducibility.
  *  - The announcement commits to the outcome space as a digest (streamed
  *    SHA-256 over every ordered outcome's winner bytes) rather than
  *    materializing millions of adaptor points like the reference's
  *    `CreateEventData::new` (whose own tests mark large spaces "slow",
  *    outcome_generator.rs:48-69).
  */
final class OracleApi(
    val spark: SparkSession,
    val weatherStore: WeatherStore,
    val eventStore: EventStore,
    oracleSeckey: Array[Byte],
    now: () => Timestamp = () => new Timestamp(System.currentTimeMillis())) {

  import OracleApi._

  // ---------------------------------------------------------------- keys

  def pubkeyJson: JValue =
    JObject("key" -> JString(Base64.getEncoder.encodeToString(
      Schnorr.compressedPubkey(oracleSeckey))))

  def npubJson: JValue =
    JObject("key" -> JString(Keys.npub(Schnorr.pubkey(oracleSeckey))))

  // -------------------------------------------------------------- events

  /** POST /oracle/events (oracle.rs:183-214). */
  def createEvent(coordinatorNpub: String, body: JValue): Either[ApiError, JValue] = {
    for {
      id <- str(body, "id").toRight(bad("missing id"))
      _ <- Either.cond(Uuid7.isValid(id), (),
        bad(s"event needs to provide a valid Uuidv7 for event id $id"))
      signing <- str(body, "signing_date").flatMap(parseRfc3339)
        .toRight(bad("signing_date is not a valid RFC3339 datetime"))
      observation <- str(body, "observation_date").flatMap(parseRfc3339)
        .toRight(bad("observation_date is not a valid RFC3339 datetime"))
      locations <- strList(body, "locations").toRight(bad("missing locations"))
      _ <- Either.cond(locations.nonEmpty, (), bad("locations must be non-empty"))
      valuesPerEntry <- num(body, "number_of_values_per_entry").toRight(bad("missing number_of_values_per_entry"))
      totalAllowed <- num(body, "total_allowed_entries").toRight(bad("missing total_allowed_entries"))
      places <- num(body, "number_of_places_win").toRight(bad("missing number_of_places_win"))
      _ <- Either.cond(totalAllowed <= 25, (),
        bad("Max number of allowed entries the oracle can watch is 25"))
      _ <- Either.cond(places <= 5 && places >= 1, (),
        bad(s"Max number of allowed ranks in an event that can win is 5, requested: $places"))
      // uniqueness is read-check-write: the check and the insert must sit
      // under ONE writer-lock hold or two concurrent identical POSTs both
      // pass the isEmpty check (the reference gets this atomicity from
      // DuckDB's primary key); the losing writer surfaces the same 400
      result <- eventStore.withWriterLock {
        for {
          _ <- Either.cond(eventStore.events.where(col("id") === id).isEmpty, (),
            bad(s"event with id $id already exists"))
        } yield {
          val ts = now()
          val nonce = Schnorr.taggedHash("graft/oracle/event-nonce",
            oracleSeckey ++ id.getBytes("UTF-8"))
          val announcement = announcementBytes(oracleSeckey, nonce, totalAllowed.toInt, places.toInt)
          eventStore.insertEvents(Seq(EventRow(
            id = id,
            total_allowed_entries = totalAllowed.toInt,
            number_of_places_win = places.toInt,
            number_of_values_per_entry = valuesPerEntry.toInt,
            signing_date = signing,
            observation_date = observation,
            locations = locations,
            coordinator_pubkey = coordinatorNpub,
            nonce = Some(nonce),
            event_announcement = Some(announcement),
            attestation_signature = None,
            created_at = ts, updated_at = ts)))
          eventJson(id).getOrElse(
            throw new IllegalStateException(s"event $id vanished after insert"))
        }
      }
    } yield result
  }

  /** GET /oracle/events — summaries with per-event weather as one join. */
  def listEvents(limit: Option[Int], eventIds: Option[Seq[String]]): JValue = {
    val rows = eventStore.listEvents(EventFilter(
      limit = limit.orElse(Some(100)), eventIds = eventIds)).collect()
    val weatherByEvent = weatherFor(rows.map(_.getAs[String]("id")).toSeq)
    JArray(rows.toList.map { r =>
      JObject(
        "id" -> JString(r.getAs[String]("id")),
        "signing_date" -> JString(fmt(r.getAs[Timestamp]("signing_date"))),
        "observation_date" -> JString(fmt(r.getAs[Timestamp]("observation_date"))),
        "locations" -> JArray(r.getAs[scala.collection.Seq[String]]("locations").toList.map(JString(_))),
        "number_of_values_per_entry" -> JInt(r.getAs[Int]("number_of_values_per_entry")),
        "status" -> JString(status(r.getAs[Timestamp]("observation_date"),
          Option(r.getAs[Array[Byte]]("attestation_signature")))),
        "total_allowed_entries" -> JInt(r.getAs[Int]("total_allowed_entries")),
        "total_entries" -> JInt(BigInt(r.getAs[Long]("total_entries"))),
        "number_of_places_win" -> JInt(r.getAs[Int]("number_of_places_win")),
        "weather" -> weatherByEvent.getOrElse(r.getAs[String]("id"), JArray(Nil)),
        "attestation" -> bytesOrNull(Option(r.getAs[Array[Byte]]("attestation_signature"))),
        "nonce" -> noncePointOrNull(Option(r.getAs[Array[Byte]]("nonce"))))
    })
  }

  /** GET /oracle/events/{id} (404 when absent). */
  def getEvent(id: String): Either[ApiError, JValue] =
    eventJson(id).toRight(notFound(s"event with id $id not found"))

  /** POST /oracle/events/{id}/entry (oracle.rs:216-289). */
  def addEventEntry(requesterNpub: String, body: JValue): Either[ApiError, JValue] = {
    for {
      id <- str(body, "id").toRight(bad("missing id"))
      _ <- Either.cond(Uuid7.isValid(id), (),
        bad(s"Client needs to provide a valid Uuidv7 for entry id $id"))
      eventId <- str(body, "event_id").toRight(bad("missing event_id"))
      event <- eventRow(eventId).toRight(notFound(s"event with id $eventId not found"))
      _ <- Either.cond(event.getAs[String]("coordinator_pubkey") == requesterNpub, (),
        bad(s"Client needs the valid coordinator signature in header for this event $id"))
      choices <- choiceList(body)
      valueCount = choices.map(c => Seq(c._2, c._3, c._4).flatten.size).sum
      _ <- Either.cond(valueCount <= event.getAs[Int]("number_of_values_per_entry"), (),
        bad(s"entry_id $id not valid, too many value choices, max allowed " +
          s"${event.getAs[Int]("number_of_values_per_entry")} but got $valueCount"))
      eventLocations = event.getAs[scala.collection.Seq[String]]("locations").toSet
      _ <- Either.cond(choices.forall(c => eventLocations.contains(c._1)), (),
        bad(s"entry_id $id not valid, chosen locations not in the event"))
      allowed = eventStore.choiceValues
      _ <- Either.cond(choices.forall(c => Seq(c._2, c._3, c._4).flatten.forall(allowed)), (),
        bad(s"choice values must be one of $allowed"))
      // capacity + entry-id uniqueness are read-check-write against the
      // entries table: checked and inserted under ONE writer-lock hold so
      // concurrent POSTs can neither double-insert an id nor blow past
      // total_allowed_entries (the event row itself is immutable here, so
      // the lookups above can stay lock-free)
      result <- eventStore.withWriterLock {
        for {
          _ <- Either.cond(
            eventStore.entries.where(col("event_id") === eventId).count() <
              event.getAs[Int]("total_allowed_entries"), (),
            bad(s"event $eventId is full, no more entries are allowed"))
          _ <- Either.cond(eventStore.entries.where(col("id") === id).isEmpty, (),
            bad(s"entry with id $id already exists"))
        } yield {
          val ts = now()
          eventStore.insertEntriesAutoIds(
            Seq(EntryRow(id, eventId, 0L, ts, ts)),
            choices.map(c => (id, c._1, c._2, c._3, c._4)))
          entryJson(eventId, id).getOrElse(
            throw new IllegalStateException(s"entry $id vanished after insert"))
        }
      }
    } yield result
  }

  /** GET /oracle/events/{event_id}/entry/{entry_id}. */
  def getEventEntry(eventId: String, entryId: String): Either[ApiError, JValue] =
    entryJson(eventId, entryId).toRight(
      notFound(s"entry with id $entryId not found for event $eventId"))

  // ----------------------------------------------------------------- etl

  /** Last completed ETL outcome (observability for the async kick-off). */
  val lastEtl = new java.util.concurrent.atomic.AtomicReference[Option[Either[Throwable, Oracle.EtlReport]]](None)

  /** POST /oracle/update — kicked off asynchronously like the reference
    * (oracle_routes.rs:192-205); the caller gets 200 immediately. */
  def updateAsync(): Unit = {
    val t = new Thread(() => {
      try lastEtl.set(Some(Right(
        Oracle.runEtl(spark, weatherStore, eventStore, oracleSeckey, now()))))
      catch { case e: Throwable => lastEtl.set(Some(Left(e))) }
    }, "graft-api-etl")
    t.setDaemon(true)
    t.start()
  }

  // ------------------------------------------------------------- weather

  /** GET /stations — distinct stations seen in the last 4 h of
    * observations (weather_data.rs:224-259). */
  def stationsJson: JValue = {
    val end = now()
    val start = new Timestamp(end.getTime - 4L * 3600 * 1000)
    weatherStore.read(Kinds.Observations, start, end) match {
      case None => JArray(Nil)
      case Some(df) =>
        val pruned = df.where(col("generated_at").between(lit(start), lit(end)))
        val rows = WeatherQueries.stations(pruned).collect()
        JArray(rows.toList.map(r => JObject(
          "station_id" -> JString(r.getAs[String]("station_id")),
          "station_name" -> JString(r.getAs[String]("station_name")),
          "latitude" -> JDouble(r.getAs[Double]("latitude")),
          "longitude" -> JDouble(r.getAs[Double]("longitude")))))
    }
  }

  /** GET /stations/forecasts (weather_routes.rs:25-35): daily rollup per
    * station over [start, end]. */
  def forecastsJson(start: Option[Timestamp], end: Option[Timestamp],
      stationIds: Seq[String]): JValue =
    scanKind(Kinds.Forecasts, start, end) match {
      case None => JArray(Nil)
      case Some(df) =>
        val rows = WeatherQueries.forecastsDaily(df, stationIds, start, end)
          .orderBy("station_id", "date").collect()
        JArray(rows.toList.map(r => JObject(
          "station_id" -> JString(r.getAs[String]("station_id")),
          "date" -> JString(r.getAs[String]("date")),
          "start_time" -> JString(fmt(r.getAs[Timestamp]("start_time"))),
          "end_time" -> JString(fmt(r.getAs[Timestamp]("end_time"))),
          "temp_low" -> JInt(BigInt(r.getAs[Long]("temp_low"))),
          "temp_high" -> JInt(BigInt(r.getAs[Long]("temp_high"))),
          "wind_speed" -> JInt(BigInt(r.getAs[Long]("wind_speed"))))))
    }

  /** GET /stations/observations (weather_routes.rs:110-120). */
  def observationsJson(start: Option[Timestamp], end: Option[Timestamp],
      stationIds: Seq[String]): JValue =
    scanKind(Kinds.Observations, start, end) match {
      case None => JArray(Nil)
      case Some(df) =>
        val rows = WeatherQueries.observationSummary(df, stationIds, start, end)
          .orderBy("station_id").collect()
        JArray(rows.toList.map(r => JObject(
          "station_id" -> JString(r.getAs[String]("station_id")),
          "start_time" -> JString(fmt(r.getAs[Timestamp]("start_time"))),
          "end_time" -> JString(fmt(r.getAs[Timestamp]("end_time"))),
          "temp_low" -> JDouble(r.getAs[Double]("temp_low")),
          "temp_high" -> JDouble(r.getAs[Double]("temp_high")),
          "wind_speed" -> JInt(BigInt(r.getAs[Long]("wind_speed"))))))
    }

  /** Pruned scan when both bounds are present; whole-kind scan otherwise
    * (the filters still apply downstream). */
  private def scanKind(kind: String, start: Option[Timestamp],
      end: Option[Timestamp]): Option[DataFrame] =
    (start, end) match {
      case (Some(s), Some(e)) => weatherStore.read(kind, s, e)
      case _ => weatherStore.readAll(kind)
    }

  // ----------------------------------------------------------- ad-hoc SQL

  /** POST /query — the reference UI's ad-hoc console capability, moved
    * server-side: ui/main.js:112-141 registers the downloaded snapshots
    * as duckdb-wasm tables and runs arbitrary user SQL against them,
    * with the SELECT-only guard left as a TODO (main.js:130). Here the
    * same two tables are temp views over the live store and the guard is
    * [[graft.sql.AdHoc.run]]'s parsed-plan check, enforced before
    * execution. The row cap mirrors the UI's default `LIMIT 200` example
    * (main.js:52), bounded at 1000 — the transport is for console-sized
    * answers, not extracts (those are `GET /file/{name}`).
    */
  def queryJson(sql: String, limit: Option[Int]): Either[ApiError, JValue] = {
    val cap = math.max(1, math.min(limit.getOrElse(200), 1000))
    if (sql.trim.isEmpty) Left(bad("missing sql"))
    else {
      AdHoc.registerViews(spark, Seq(
        Kinds.Observations -> weatherStore.readAll(Kinds.Observations),
        Kinds.Forecasts -> weatherStore.readAll(Kinds.Forecasts))
        .collect { case (n, Some(df)) => n -> df }.toMap)
      try {
        val df = AdHoc.run(spark, sql)
        val cols = df.columns.toList
        val rows = df.limit(cap).collect()
        Right(JObject(
          "columns" -> JArray(cols.map(JString(_))),
          "rows" -> JArray(rows.toList.map(r =>
            JArray(cols.indices.toList.map(i => sqlJson(r.get(i))))))))
      } catch {
        case AdHoc.NotAQueryException(m) => Left(bad(m))
        case e: org.apache.spark.sql.catalyst.parser.ParseException =>
          Left(bad(s"parse error: ${e.getMessage}"))
        case e: org.apache.spark.sql.AnalysisException =>
          Left(bad(s"analysis error: ${e.getMessage}"))
      }
    }
  }

  /** Generic SQL value → JSON for the console transport (timestamps as
    * RFC-3339, like every other route). */
  private def sqlJson(v: Any): JValue = v match {
    case null => JNull
    case s: String => JString(s)
    case b: Boolean => JBool(b)
    case i: Int => JInt(BigInt(i))
    case l: Long => JInt(BigInt(l))
    case s: Short => JInt(BigInt(s.toInt))
    case b: Byte => JInt(BigInt(b.toInt))
    case d: Double => JDouble(d)
    case f: Float => JDouble(f.toDouble)
    case d: java.math.BigDecimal => JDecimal(BigDecimal(d))
    case d: BigDecimal => JDecimal(d)
    case t: Timestamp => JString(fmt(t))
    case d: java.sql.Date => JString(d.toString)
    case seq: scala.collection.Seq[_] => JArray(seq.toList.map(sqlJson))
    case m: scala.collection.Map[_, _] =>
      JObject(m.toList.map { case (k, x) => k.toString -> sqlJson(x) })
    case r: Row =>
      JObject(r.schema.fieldNames.toList.zip(r.toSeq.map(sqlJson)): _*)
    case other => JString(other.toString)
  }

  // --------------------------------------------------------------- files

  /** GET /files — snapshot names `{kind}_{rfc3339}.parquet` synthesized
    * from the store's snapshot_ts (the reference embeds the timestamp in
    * the physical filename; here the column is the source of truth and
    * the filename is the VIEW). */
  def fileNamesJson(start: Option[Timestamp], end: Option[Timestamp],
      observations: Option[Boolean], forecasts: Option[Boolean]): JValue = {
    def names(kind: String, wanted: Option[Boolean]): Seq[String] =
      if (!wanted.getOrElse(true)) Nil
      else weatherStore.readAll(kind) match {
        case None => Nil
        case Some(df) =>
          var d = df.select(col("snapshot_ts")).distinct()
          start.foreach(s => d = d.where(col("snapshot_ts") >= lit(s)))
          end.foreach(e => d = d.where(col("snapshot_ts") <= lit(e)))
          d.orderBy("snapshot_ts").collect()
            .map(r => s"${kind}_${fmt(r.getAs[Timestamp]("snapshot_ts"))}.parquet").toSeq
      }
    JObject("file_names" -> JArray(
      (names(Kinds.Observations, observations) ++ names(Kinds.Forecasts, forecasts))
        .toList.map(JString(_))))
  }

  /** GET /file/{name} — one snapshot's rows as a parquet file. The name
    * parses like the reference's download route (`{kind}_{rfc3339}
    * .parquet`, download.rs:29-74); the bytes are re-materialized from
    * the store (one snapshot is one ingest tick — driver-sized). */
  def downloadFile(name: String): Either[ApiError, Array[Byte]] =
    for {
      parsed <- parseSnapshotName(name)
      (kind, ts) = parsed
      df <- weatherStore.readAll(kind).toRight(notFound(s"no $kind data"))
      bytes <- {
        val snap = df.where(col("snapshot_ts") === lit(ts)).drop("kind", "date")
        if (snap.isEmpty) Left(notFound(s"file not found: $name"))
        else Right(parquetBytes(snap))
      }
    } yield bytes

  /** POST /file/{name} — land an externally produced snapshot file; kind
    * and snapshot time come from the name (upload.rs:22-91 + the daemon's
    * `{kind}_{rfc3339}.parquet` naming, daemon/src/main.rs:84-98). */
  def uploadFile(name: String, bytes: Array[Byte]): Either[ApiError, Unit] =
    for {
      _ <- Either.cond(WeatherStore.uploadNameIsValid(name), (), bad("Invalid file"))
      // magic-byte clamp: readers union every landed file (S10), so one
      // junk payload would poison later scans of its whole partition
      _ <- Either.cond(WeatherStore.looksLikeParquet(bytes), (),
        bad("payload is not a parquet file"))
      parsed <- parseSnapshotName(name)
      (kind, ts) = parsed
    } yield weatherStore.landFile(name, bytes, kind, ts)

  private def parseSnapshotName(name: String): Either[ApiError, (String, Timestamp)] = {
    val stem = name.stripSuffix(".parquet")
    val cut = stem.indexOf('_')
    if (cut < 0) Left(bad(s"Badly formatted filename: $name (need {kind}_{rfc3339}.parquet)"))
    else {
      val kind = stem.substring(0, cut)
      if (kind != Kinds.Forecasts && kind != Kinds.Observations)
        Left(bad(s"unknown kind '$kind' in filename $name"))
      else parseRfc3339(stem.substring(cut + 1)).map(kind -> _)
        .toRight(bad(s"Badly formatted filename, not a valid rfc3339 datetime: $name"))
    }
  }

  /** Serialize a driver-sized DataFrame to single-file parquet bytes. */
  private def parquetBytes(df: DataFrame): Array[Byte] = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-api-dl")
    try {
      val out = tmp.resolve("out").toString
      df.coalesce(1).write.parquet(out)
      val part = java.nio.file.Files.list(tmp.resolve("out")).toArray
        .map(_.asInstanceOf[java.nio.file.Path])
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException("no parquet part written"))
      java.nio.file.Files.readAllBytes(part)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  // ----------------------------------------------------------- internals

  private def eventRow(id: String): Option[Row] =
    eventStore.events.toDF().where(col("id") === id).collect().headOption

  private def eventJson(id: String): Option[JValue] =
    eventRow(id).map { ev =>
      val entryRows = eventStore.entriesWithChoices(id)
        .orderBy("id").collect()
      val weather = weatherFor(Seq(id)).getOrElse(id, JArray(Nil))
      JObject(
        "id" -> JString(id),
        "signing_date" -> JString(fmt(ev.getAs[Timestamp]("signing_date"))),
        "observation_date" -> JString(fmt(ev.getAs[Timestamp]("observation_date"))),
        "locations" -> JArray(ev.getAs[scala.collection.Seq[String]]("locations").toList.map(JString(_))),
        "number_of_values_per_entry" -> JInt(ev.getAs[Int]("number_of_values_per_entry")),
        "status" -> JString(status(ev.getAs[Timestamp]("observation_date"),
          Option(ev.getAs[Array[Byte]]("attestation_signature")))),
        "total_allowed_entries" -> JInt(ev.getAs[Int]("total_allowed_entries")),
        "entry_ids" -> JArray(entryRows.toList.map(r => JString(r.getAs[String]("id")))),
        "number_of_places_win" -> JInt(ev.getAs[Int]("number_of_places_win")),
        "entries" -> JArray(entryRows.toList.map(entryRowJson)),
        "weather" -> weather,
        "nonce" -> noncePointOrNull(Option(ev.getAs[Array[Byte]]("nonce"))),
        "event_announcement" -> Option(ev.getAs[Array[Byte]]("event_announcement"))
          .map(b => JString(Base64.getEncoder.encodeToString(b))).getOrElse(JNull),
        "attestation" -> bytesOrNull(Option(ev.getAs[Array[Byte]]("attestation_signature"))),
        "coordinator_pubkey" -> JString(ev.getAs[String]("coordinator_pubkey")))
    }

  private def entryJson(eventId: String, entryId: String): Option[JValue] =
    eventStore.entriesWithChoices(eventId)
      .where(col("id") === entryId).collect().headOption.map(entryRowJson)

  /** One entriesWithChoices row → WeatherEntry JSON (db/mod.rs:1239). */
  private def entryRowJson(r: Row): JValue = {
    val choices = r.getAs[scala.collection.Seq[Row]]("expected_observations")
    JObject(
      "id" -> JString(r.getAs[String]("id")),
      "event_id" -> JString(r.getAs[String]("event_id")),
      "expected_observations" -> JArray(choices.toList
        // an entry with zero choices still yields one all-null struct
        // from the left join — drop it
        .filter(c => c.getAs[String]("station") != null)
        .map(c => JObject(
          "stations" -> JString(c.getAs[String]("station")),
          "temp_low" -> strOrNull(Option(c.getAs[String]("temp_low"))),
          "temp_high" -> strOrNull(Option(c.getAs[String]("temp_high"))),
          "wind_speed" -> strOrNull(Option(c.getAs[String]("wind_speed")))))),
      "score" -> JInt(BigInt(r.getAs[Long]("score"))))
  }

  /** Weather rows for a set of events — ONE plan for the whole id list. */
  private def weatherFor(ids: Seq[String]): Map[String, JArray] = {
    if (ids.isEmpty) return Map.empty
    val links = eventStore.eventWeather.toDF()
      .where(col("event_id").isin(ids: _*))
      .select(col("event_id"), col("weather_id"))
    val rows = links.join(eventStore.weather.toDF()
        .select(col("id").as("weather_id"), col("station_id"),
          col("observed"), col("forecasted")), Seq("weather_id"))
      .orderBy("event_id", "weather_id")
      .collect()
    rows.groupBy(_.getAs[String]("event_id")).map { case (eid, ws) =>
      eid -> JArray(ws.toList.map { w =>
        JObject(
          "station_id" -> JString(w.getAs[String]("station_id")),
          "observed" -> readingJson(Option(w.getAs[Row]("observed"))),
          "forecasted" -> readingJson(Option(w.getAs[Row]("forecasted"))))
      })
    }
  }

  private def readingJson(r: Option[Row]): JValue = r match {
    case None => JNull
    case Some(row) => JObject(
      "reading_date" -> JString(fmt(row.getAs[Timestamp]("reading_date"))),
      "temp_low" -> JInt(BigInt(row.getAs[Long]("temp_low"))),
      "temp_high" -> JInt(BigInt(row.getAs[Long]("temp_high"))),
      "wind_speed" -> JInt(BigInt(row.getAs[Long]("wind_speed"))))
  }

  private def status(observation: Timestamp, attestation: Option[Array[Byte]]): String = {
    val n = now().getTime
    val obs = observation.getTime
    if (attestation.isDefined) "signed"
    else if (n >= obs + 24L * 3600 * 1000) "completed"
    else if (n >= obs) "running"
    else "live"
  }
}

object OracleApi {

  /** Error with the HTTP status the transport should answer. */
  final case class ApiError(status: Int, message: String)

  def bad(msg: String): ApiError = ApiError(400, msg)
  def notFound(msg: String): ApiError = ApiError(404, msg)

  private val Rfc3339 = DateTimeFormatter.ISO_INSTANT

  def fmt(ts: Timestamp): String = Rfc3339.format(ts.toInstant)

  def parseRfc3339(s: String): Option[Timestamp] =
    try Some(Timestamp.from(OffsetDateTime.parse(s).toInstant))
    catch {
      case _: java.time.format.DateTimeParseException =>
        try Some(Timestamp.from(Instant.parse(s)))
        catch { case _: java.time.format.DateTimeParseException => None }
    }

  // --- JValue field helpers (manual, explicit — no reflection) ---

  private[api] def str(v: JValue, field: String): Option[String] =
    v \ field match { case JString(s) => Some(s); case _ => None }

  private[api] def num(v: JValue, field: String): Option[Long] =
    v \ field match {
      case JInt(n) => Some(n.toLong)
      case JLong(n) => Some(n)
      case _ => None
    }

  private[api] def strList(v: JValue, field: String): Option[Seq[String]] =
    v \ field match {
      case JArray(items) if items.forall(_.isInstanceOf[JString]) =>
        Some(items.collect { case JString(s) => s })
      case _ => None
    }

  private[api] def strOrNull(o: Option[String]): JValue =
    o.map(JString(_)).getOrElse(JNull)

  private[api] def bytesOrNull(o: Option[Array[Byte]]): JValue =
    o.map(b => JString(b.map(x => f"${x & 0xFF}%02x").mkString)).getOrElse(JNull)

  /** Public view of the stored secret nonce scalar: its curve POINT.
    * The scalar k must never leave the process — once the attestation
    * s = k + e·d is published, anyone holding k recovers the oracle key
    * d = (s − k)/e. The reference leaks the scalar on its public event
    * JSON; we publish only R = k·G, which is what verifiers need (it is
    * the same commitment already inside `announcementBytes`). */
  private[api] def noncePointOrNull(o: Option[Array[Byte]]): JValue =
    bytesOrNull(o.map(Schnorr.pubkey))

  /** Parse the AddEventEntry `expected_observations` array into
    * (station, temp_low, temp_high, wind_speed) tuples. */
  private[api] def choiceList(body: JValue)
      : Either[ApiError, Seq[(String, Option[String], Option[String], Option[String])]] =
    body \ "expected_observations" match {
      case JArray(items) =>
        val parsed = items.map { item =>
          str(item, "stations").map(st =>
            (st, str(item, "temp_low"), str(item, "temp_high"), str(item, "wind_speed")))
        }
        if (parsed.forall(_.isDefined)) Right(parsed.flatten)
        else Left(bad("every expected_observation needs a stations field"))
      case _ => Left(bad("missing expected_observations"))
    }

  /** Commit to the outcome space: JSON bytes carrying the oracle pubkey,
    * the committed nonce POINT (never the secret nonce), the outcome
    * count, and a streamed SHA-256 over every ordered outcome's winner
    * bytes (lexicographic permutation order — reproducible by any
    * verifier from the public event parameters). Spaces above
    * [[MaxDigestedOutcomes]] record the count but skip the digest, the
    * documented bound the reference lacks (its generator materializes
    * every permutation in memory). */
  def announcementBytes(seckey: Array[Byte], nonce: Array[Byte],
      totalAllowedEntries: Int, places: Int): Array[Byte] = {
    val k = math.min(places, totalAllowedEntries)
    val count = Outcomes.count(totalAllowedEntries, k)
    val digest =
      if (count > MaxDigestedOutcomes) JNull
      else {
        val md = java.security.MessageDigest.getInstance("SHA-256")
        Outcomes.permutations(totalAllowedEntries, k)
          .foreach(p => md.update(Scoring.winningBytes(p.map(_.toLong))))
        JString(md.digest().map(b => f"${b & 0xFF}%02x").mkString)
      }
    val obj = JObject(
      "oracle_pubkey" -> JString(Schnorr.pubkey(seckey).map(b => f"${b & 0xFF}%02x").mkString),
      "nonce_point" -> JString(Schnorr.pubkey(nonce).map(b => f"${b & 0xFF}%02x").mkString),
      "num_outcomes" -> JInt(BigInt(count)),
      "outcomes_digest" -> digest)
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(obj)).getBytes("UTF-8")
  }

  /** Digest bound for announcement outcome enumeration (25P5 ≈ 6.4M would
    * still stream in seconds, but the API should never block minutes on a
    * create call). */
  val MaxDigestedOutcomes: Long = 200000L
}
