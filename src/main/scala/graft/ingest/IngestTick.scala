package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.ingest.Fetch.{HttpFetcher, Pacer, StationCoord, SystemPacer}
import graft.oracle.{EventStore, Oracle}
import graft.store.WeatherStore
import graft.store.WeatherStore.Kinds

/** The reference daemon's hourly ingest cycle
  * (crates/daemon/src/main.rs:28-101), as one engine entry point:
  *
  *   stations index (gzip XML) → US filter → ≤50-coordinate forecast
  *   chunks → bounded-parallel DWML fetch → distributed flatten +
  *   station match → METAR cache (gzip XML) → decode + station filter →
  *   one [[WeatherStore]] snapshot per kind → optional oracle ETL.
  *
  * Per-chunk failures are skip-and-continue (the reference's JoinSet
  * counter, download_forecast.rs:683-720): one dead upstream chunk
  * costs its ~50 stations, not the tick. Rate limiting, retry and
  * backoff all live inside the shared [[HttpFetcher]] — the loop adds
  * no second throttle, matching the daemon's single shared
  * `RateLimiter`.
  *
  * Scale note: the two cache files are single bounded blobs (the
  * upstream serves one gzip per cycle), so their decode is driver-side
  * by design; the per-chunk DWML parse + flatten runs distributed via
  * [[DwmlFlatten.flattenAll]], so a larger station universe scales with
  * executors, not the driver.
  */
object IngestTick {

  /** Where one tick fetches from. `forecastUrl` builds the per-chunk
    * list-point URL (the ndfdXMLclient template,
    * download_forecast.rs:900) — injected so tests point it at a stub
    * server. */
  final case class TickConfig(
      stationsUrl: String,
      metarsUrl: String,
      forecastUrl: Seq[StationCoord] => String,
      maxPerRequest: Int = 50,
      fetchParallelism: Int = 4)

  /** What one tick did — the daemon's per-cycle log lines, as data. */
  final case class TickReport(
      snapshotTs: Timestamp,
      stations: Int,
      forecastChunksOk: Int,
      forecastChunksFailed: Int,
      forecastRows: Long,
      observationRows: Long,
      etlEventsSigned: Int)

  /** Run one ingest cycle at logical time `now` (process_data,
    * main.rs:52-101). Pass `etl` to chain the oracle scoring pass the
    * way the reference's `send_parquet_files` → `POST /oracle/update`
    * hand-off does, using the freshly-written snapshots. */
  def runIngestTick(
      spark: SparkSession,
      fetcher: HttpFetcher,
      store: WeatherStore,
      cfg: TickConfig,
      now: Timestamp,
      etl: Option[(EventStore, Array[Byte])] = None): TickReport = {

    // 1. Station universe: one gzip cache file, US-filtered at parse
    //    (get_coordinates, coordinates.rs:133-161).
    val stations = XmlSources.parseStations(fetcher.fetchXmlGzip(cfg.stationsUrl))
    val coords = stations.map(s => StationCoord(s.station_id, s.latitude, s.longitude))

    // 2. Forecasts: chunked list-point DWML requests with bounded
    //    concurrency; failed chunks are dropped, not fatal.
    val chunks = Fetch.chunkCoordinates(coords, cfg.maxPerRequest)
    val urlToChunk = chunks.map(c => cfg.forecastUrl(c) -> c).toMap
    val (okDocs, failed) = Fetch.fetchAll(fetcher, urlToChunk.keys.toSeq, cfg.fetchParallelism)
    failed.foreach { case (url, e) =>
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"forecast chunk failed, skipping ${urlToChunk(url).size} stations: $url (${e.getMessage})")
    }

    import spark.implicits._
    val forecasts = {
      val docs = spark.createDataset(okDocs.map { case (url, xml) => (url, xml) })
      val idx = spark.createDataset(stations).toDF()
      // Station ids attach pre-flatten (wild DWML carries none; the
      // match is the broadcast 2-dp coordinate join); names post-flatten.
      val flat = DwmlFlatten.flattenAll(spark, docs, now, stationIndex = Some(idx))
        .drop("doc_id")
      DwmlFlatten.matchStations(flat, idx)
    }

    // 3. Observations: the METAR cache file, kept to stations we track
    //    (get_observations filters to the coordinate set,
    //    download_observations.rs:229-268).
    val known = stations.map(_.station_id).toSet
    val obs = XmlSources.parseMetars(fetcher.fetchXmlGzip(cfg.metarsUrl))
      .filter(o => known.contains(o.station_id))
    val obsDs = spark.createDataset(obs)

    // 4. One snapshot per kind, both stamped with the tick's logical
    //    time (the reference encodes it in the parquet filename).
    val forecastRows = forecasts.count()
    store.write(forecasts, Kinds.Forecasts, now)
    store.write(obsDs.toDF(), Kinds.Observations, now)

    // 5. Optional scoring pass over everything landed so far.
    val signed = etl match {
      case Some((events, privateKey)) =>
        Oracle.runEtl(spark, store, events, privateKey, now).signedEventIds.size
      case None => 0
    }

    TickReport(now, stations.size, okDocs.size, failed.size,
      forecastRows, obsDs.count(), signed)
  }

  /** The hourly loop (process_weather_data_hourly, main.rs:28-50): tick,
    * sleep `intervalMillis`, repeat `ticks` times. A failed cycle is
    * logged and the loop continues — the daemon never dies on one bad
    * upstream hour. `pacer` injects virtual time for tests; `clock`
    * supplies each cycle's logical timestamp.
    *
    * Storage maintenance rides the loop's own clock: on the FIRST tick
    * and whenever a tick's UTC date rolls past the previous tick's,
    * every still-fragmented closed date
    * ([[WeatherStore.datesNeedingMaintenance]] — derived from the store
    * itself, so a restarted daemon or one that slept across several
    * days picks up its whole backlog, not just the single last-tick
    * day) is compacted and z-ordered by (station_id, snapshot_ts) via
    * [[WeatherStore.maintain]] — BEFORE the new day's first ingest, the
    * window where no writer targets yesterday and the reference daemon
    * would be between cycles. Hourly ingest without this accumulates
    * ~8,760 tiny files per kind-year whose listing + footer cost
    * dominates every scan; with it, a closed day is `maintainFiles`
    * z-ordered files whose parquet stats skip on either station or
    * time predicates. A failed maintenance pass logs and continues like
    * a failed tick — the day stays scannable (just uncompacted), and
    * because the backlog is re-derived from disk it is retried at the
    * next rollover (at most once per day — bounded), never silently
    * dropped. The rewrite stays an optimization, never required for
    * correctness (the read path's dedup discipline tolerates the
    * in-flight rename window the same way it tolerates re-served
    * snapshot rows). */
  def runLoop(
      spark: SparkSession,
      fetcher: HttpFetcher,
      store: WeatherStore,
      cfg: TickConfig,
      ticks: Int,
      intervalMillis: Long = 3600000L,
      pacer: Pacer = SystemPacer,
      clock: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
      etl: Option[(EventStore, Array[Byte])] = None,
      maintenance: Boolean = true,
      maintainFiles: Int = 1): Seq[TickReport] = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    val reports = scala.collection.mutable.ArrayBuffer.empty[TickReport]
    var lastDate: Option[java.time.LocalDate] = None
    var i = 0
    while (i < ticks) {
      // clock() stays INSIDE the catch-all: the loop's "never dies on
      // one bad cycle" contract covers a throwing injected clock (NTP
      // hiccup) the same as a bad upstream hour
      try {
        val now = clock()
        val today = WeatherStore.toUtcDate(now)
        // first tick (restart seed) or day rollover: maintain the whole
        // on-disk backlog of fragmented closed dates, each under its own
        // failure isolation
        if (maintenance && lastDate.forall(today.isAfter))
          store.datesNeedingMaintenance(today, maintainFiles).foreach { closed =>
            try {
              val r = store.maintain(closed, maintainFiles)
              log.info(s"maintained $closed: $r")
            } catch {
              case scala.util.control.NonFatal(e) =>
                log.error(s"maintenance for $closed failed, day left uncompacted: ${e.getMessage}")
            }
          }
        reports += runIngestTick(spark, fetcher, store, cfg, now, etl)
        lastDate = Some(today)
      } catch {
        case scala.util.control.NonFatal(e) =>
          log.error(s"ingest cycle failed, retrying next interval: ${e.getMessage}")
      }
      i += 1
      if (i < ticks) pacer.sleep(intervalMillis)
    }
    reports.toSeq
  }
}
