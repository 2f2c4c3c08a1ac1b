package graft.ingest

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.sql.Timestamp
import java.time.Instant
import java.util.concurrent.atomic.AtomicInteger
import java.util.zip.GZIPOutputStream

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ingest.Fetch.{HttpFetcher, Pacer, TokenBucket}
import graft.queries.WeatherQueries
import graft.store.WeatherStore
import graft.store.WeatherStore.Kinds

/** The daemon loop (main.rs:28-101) end-to-end over a stub upstream:
  * two hourly ticks land two snapshot files per kind, the A1 rollup
  * reads across both (level-1 dedup collapses re-served slots), and a
  * dead forecast chunk skips without killing the tick. */
class IngestTickSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = TestSpark.spark

  private final class VirtualPacer extends Pacer {
    var nowNanos: Long = 0L
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    def nanoTime(): Long = nowNanos
    def sleep(millis: Long): Unit = { sleeps += millis; nowNanos += millis * 1000000L }
  }

  private var server: HttpServer = _
  private var base: String = _
  private val forecastCalls = new AtomicInteger(0)

  // Two US stations (chunk size 1 in tests → two forecast requests per
  // tick) plus one non-US station the parse-time filter must drop.
  private val stationsXml =
    """<response><data>
      |<Station><station_id>KAAA</station_id><site>Alpha</site>
      |  <latitude>44.56</latitude><longitude>-95.12</longitude>
      |  <country>US</country><state>MN</state></Station>
      |<Station><station_id>KBBB</station_id><site>Beta</site>
      |  <latitude>30.10</latitude><longitude>-97.70</longitude>
      |  <country>US</country><state>TX</state></Station>
      |<Station><station_id>CYYZ</station_id><site>Toronto</site>
      |  <latitude>43.68</latitude><longitude>-79.63</longitude>
      |  <country>CA</country><state>ON</state></Station>
      |</data></response>""".stripMargin

  // METARs: the two tracked stations plus one unknown the tick filters.
  private val metarsXml =
    """<response><data>
      |<METAR><station_id>KAAA</station_id>
      |  <observation_time>2024-08-12T01:00:00Z</observation_time>
      |  <latitude>44.56</latitude><longitude>-95.12</longitude>
      |  <temp_c>21.5</temp_c><wind_speed_kt>8</wind_speed_kt></METAR>
      |<METAR><station_id>KZZZ</station_id>
      |  <observation_time>2024-08-12T01:00:00Z</observation_time>
      |  <latitude>10.00</latitude><longitude>10.00</longitude>
      |  <temp_c>30.0</temp_c><wind_speed_kt>2</wind_speed_kt></METAR>
      |</data></response>""".stripMargin

  // One DWML doc per coordinate query; no station-id element, so the
  // tick's 2-dp coordinate match must attach it (J8).
  private def dwmlXml(lat: String, lon: String) =
    s"""<dwml><head><product><creation-date>2024-08-12T00:00:00Z</creation-date></product></head>
       |<data>
       |<location><location-key>point1</location-key>
       |  <point latitude="$lat" longitude="$lon"/></location>
       |<time-layout><layout-key>k-p24h-n2-1</layout-key>
       |  <start-valid-time>2024-08-12T00:00:00-00:00</start-valid-time>
       |  <start-valid-time>2024-08-13T00:00:00-00:00</start-valid-time></time-layout>
       |<parameters applicable-location="point1">
       |  <temperature type="maximum" units="Fahrenheit" time-layout="k-p24h-n2-1">
       |    <value>83</value><value>79</value></temperature>
       |  <temperature type="minimum" units="Fahrenheit" time-layout="k-p24h-n2-1">
       |    <value>61</value><value>58</value></temperature>
       |  <wind-speed type="sustained" units="knots" time-layout="k-p24h-n2-1">
       |    <value>9</value><value>11</value></wind-speed>
       |</parameters></data></dwml>""".stripMargin

  private def gzip(s: String): Array[Byte] = {
    val raw = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(raw)
    gz.write(s.getBytes("UTF-8"))
    gz.close()
    raw.toByteArray
  }

  private def reply(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/stations.xml.gz", (ex: HttpExchange) =>
      reply(ex, 200, gzip(stationsXml)))
    server.createContext("/metars.xml.gz", (ex: HttpExchange) =>
      reply(ex, 200, gzip(metarsXml)))
    server.createContext("/forecast", (ex: HttpExchange) => {
      forecastCalls.incrementAndGet()
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      // listLatLon=44.56,-95.12 → serve that point's DWML; the KBBB
      // point is served only when not in dead mode
      val point = q.split('&').collectFirst {
        case p if p.startsWith("listLatLon=") => p.stripPrefix("listLatLon=")
      }.getOrElse("")
      if (point.startsWith("44.56")) reply(ex, 200, dwmlXml("44.56", "-95.12").getBytes("UTF-8"))
      else if (deadChunk) reply(ex, 404, Array.emptyByteArray)
      else reply(ex, 200, dwmlXml("30.10", "-97.70").getBytes("UTF-8"))
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  @volatile private var deadChunk = false

  private def mkFetcher(p: VirtualPacer) =
    new HttpFetcher("graft-test/1.0", new TokenBucket(100, 0.001, 3, 20000L, p),
      5000L, 0, 100L, p)

  private def cfg = IngestTick.TickConfig(
    stationsUrl = s"$base/stations.xml.gz",
    metarsUrl = s"$base/metars.xml.gz",
    forecastUrl = chunk =>
      s"$base/forecast?listLatLon=${Fetch.coordinatesQuery(chunk)}&product=time-series",
    maxPerRequest = 1, // 2 US stations → 2 chunks per tick
    fetchParallelism = 2)

  test("two hourly ticks land two snapshots per kind and A1 reads across both") {
    val root = java.nio.file.Files.createTempDirectory("graft-tick").toString
    val store = new WeatherStore(spark, root)
    val p = new VirtualPacer
    val t1 = Timestamp.from(Instant.parse("2024-08-12T01:00:00Z"))
    val t2 = Timestamp.from(Instant.parse("2024-08-12T02:00:00Z"))
    val times = Iterator(t1, t2)

    val reports = IngestTick.runLoop(spark, mkFetcher(p), store, cfg,
      ticks = 2, intervalMillis = 3600000L, pacer = p, clock = () => times.next())

    assert(reports.map(_.snapshotTs) == Seq(t1, t2))
    assert(reports.forall(_.stations == 2))          // CYYZ dropped at parse
    assert(reports.forall(_.forecastChunksOk == 2))
    assert(reports.forall(_.forecastChunksFailed == 0))
    assert(reports.forall(_.forecastRows == 2 * 57)) // 2 stations × 3-h week grid
    assert(reports.forall(_.observationRows == 1))   // KZZZ filtered out
    assert(p.sleeps.contains(3600000L))              // the hourly wait

    // Two physical snapshot files per kind, one per tick.
    val fc = store.readAll(Kinds.Forecasts).get
    assert(fc.select("snapshot_ts").distinct().count() == 2)
    assert(store.readAll(Kinds.Observations).get
      .select("snapshot_ts").distinct().count() == 2)

    // A1 across both snapshots: level-1 dedup collapses the re-served
    // slots, so each station still reports one row per day with the
    // single-snapshot min/max — not doubled.
    val daily = WeatherQueries.forecastsDaily(fc, Seq("KAAA"))
      .orderBy("date").collect()
    assert(daily.length == 8) // the week grid touches 8 calendar days
    assert(daily.head.getAs[String]("date") == "2024-08-12")
    assert(daily.head.getAs[Long]("temp_high") == 83L)
    assert(daily.head.getAs[Long]("temp_low") == 61L)
    assert(daily.last.getAs[Long]("temp_high") == 79L) // second layout value

    // The coordinate match attached station ids to id-less DWML points.
    import org.apache.spark.sql.functions.col
    assert(fc.where(col("station_id") === "KBBB").count() == 2 * 57)
  }

  test("a dead forecast chunk is skipped; the tick still lands the rest") {
    deadChunk = true
    try {
      val root = java.nio.file.Files.createTempDirectory("graft-tick2").toString
      val store = new WeatherStore(spark, root)
      val p = new VirtualPacer
      val t1 = Timestamp.from(Instant.parse("2024-08-12T03:00:00Z"))
      val r = IngestTick.runIngestTick(spark, mkFetcher(p), store, cfg, t1)
      assert(r.forecastChunksOk == 1 && r.forecastChunksFailed == 1)
      assert(r.forecastRows == 57)   // only KAAA's grid
      assert(r.observationRows == 1) // observations unaffected
      val fc = store.readAll(Kinds.Forecasts).get
      assert(fc.where(org.apache.spark.sql.functions.col("station_id") === "KAAA").count() == 57)
    } finally deadChunk = false
  }

  test("restart seeds maintenance from disk: the whole fragmented backlog, first tick") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-tick4").toString
    val store = new WeatherStore(spark, root)
    // a previous daemon run left TWO closed days fragmented (it died
    // before their rollovers could maintain them)
    for (day <- Seq("2024-08-11", "2024-08-12"); h <- 0 until 3)
      store.write(Seq(("KAAA", h.toLong)).toDF("station_id", "value"),
        Kinds.Observations, Timestamp.from(Instant.parse(f"${day}T$h%02d:00:00Z")))
    def files(date: String) =
      new java.io.File(s"$root/kind=observations/date=$date")
        .listFiles().filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(files("2024-08-11").length == 3 && files("2024-08-12").length == 3)

    // fresh loop, FIRST tick on 08-13: no in-memory last-tick date
    // exists, so the backlog must come from the store itself
    val p = new VirtualPacer
    val t = Timestamp.from(Instant.parse("2024-08-13T00:30:00Z"))
    val reports = IngestTick.runLoop(spark, mkFetcher(p), store, cfg,
      ticks = 1, intervalMillis = 3600000L, pacer = p, clock = () => t)
    assert(reports.size == 1)
    for (day <- Seq("2024-08-11", "2024-08-12")) {
      assert(files(day).length == 1, s"$day not maintained on restart")
      assert(files(day).head.getName.startsWith("compact-"))
    }
    // rows survive the rewrite; the open day's fresh snapshot is untouched
    val obs = store.readAll(Kinds.Observations).get
    assert(obs.where(org.apache.spark.sql.functions.col("value").isNotNull)
      .count() == 6)
    assert(files("2024-08-13").length == 1)
  }

  test("day rollover runs maintenance: closed day compacted+z-ordered, reads unchanged") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft-tick3").toString
    val store = new WeatherStore(spark, root)
    val p = new VirtualPacer
    val times = Seq("2024-08-12T21:00:00Z", "2024-08-12T22:00:00Z",
      "2024-08-12T23:00:00Z", "2024-08-13T00:30:00Z")
      .map(s => Timestamp.from(Instant.parse(s)))
    val it = times.iterator

    val reports = IngestTick.runLoop(spark, mkFetcher(p), store, cfg,
      ticks = 4, intervalMillis = 3600000L, pacer = p, clock = () => it.next())
    assert(reports.size == 4)

    // The day-2 tick closed 2024-08-12 → its partitions are maintained
    // down to ONE z-ordered file per kind; the open day is untouched.
    def files(kind: String, date: String) =
      new java.io.File(s"$root/kind=$kind/date=$date")
        .listFiles().filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
    for (k <- Seq(Kinds.Forecasts, Kinds.Observations)) {
      assert(files(k, "2024-08-12").length == 1, s"$k not compacted")
      assert(files(k, "2024-08-12").head.getName.startsWith("compact-"))
    }

    // Reads across the rewrite are unchanged: all three day-1 snapshots
    // plus day 2's survive with their snapshot_ts intact, and the A1
    // rollup still collapses the re-served slots to one row per day.
    val fc = store.readAll(Kinds.Forecasts).get
    assert(fc.select("snapshot_ts").distinct().count() == 4)
    assert(fc.where(col("station_id") === "KAAA").count() == 4 * 57)
    val daily = WeatherQueries.forecastsDaily(fc, Seq("KAAA"))
      .orderBy("date").collect()
    // 9 calendar days: day 1's ticks cover the 8-day week grid and the
    // day-2 tick's grid starts one day later
    assert(daily.length == 9 && daily.head.getAs[Long]("temp_high") == 83L)

    // Partition pruning still lands on the compacted layout.
    val pruned = store.read(Kinds.Observations,
      times.head, Timestamp.from(Instant.parse("2024-08-12T23:59:00Z"))).get
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("date"))
    assert(pruned.count() == 3) // day 1's three observation snapshots
  }
}
