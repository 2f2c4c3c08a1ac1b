package graft

import java.io.ByteArrayOutputStream
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.{InetSocketAddress, URI}
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import java.util.zip.GZIPOutputStream

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end boot of the one-process service (graft.Main): the API
  * comes up, one ingest tick runs over stub NOAA upstreams, and the
  * freshly-landed snapshot is served by `/stations/forecasts` — the
  * reference's daemon→oracle hand-off
  * (daemon/src/main.rs:52-101 → oracle weather routes), in-process. */
class MainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = TestSpark.spark
  private val client = HttpClient.newHttpClient()

  private val stationsXml =
    """<response><data>
      |<Station><station_id>KAAA</station_id><site>Alpha</site>
      |  <latitude>44.56</latitude><longitude>-95.12</longitude>
      |  <country>US</country><state>MN</state></Station>
      |</data></response>""".stripMargin

  private val metarsXml =
    """<response><data>
      |<METAR><station_id>KAAA</station_id>
      |  <observation_time>2024-08-12T01:00:00Z</observation_time>
      |  <latitude>44.56</latitude><longitude>-95.12</longitude>
      |  <temp_c>21.5</temp_c><wind_speed_kt>8</wind_speed_kt></METAR>
      |</data></response>""".stripMargin

  private val dwmlXml =
    """<dwml><head><product><creation-date>2024-08-12T00:00:00Z</creation-date></product></head>
      |<data>
      |<location><location-key>point1</location-key>
      |  <point latitude="44.56" longitude="-95.12"/></location>
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

  private def reply(ex: HttpExchange, body: Array[Byte]): Unit = {
    ex.sendResponseHeaders(200, body.length)
    ex.getResponseBody.write(body)
    ex.close()
  }

  private var upstream: HttpServer = _
  private var upstreamBase: String = _

  override def beforeAll(): Unit = {
    upstream = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    upstream.createContext("/stations.xml.gz",
      (ex: HttpExchange) => reply(ex, gzip(stationsXml)))
    upstream.createContext("/metars.xml.gz",
      (ex: HttpExchange) => reply(ex, gzip(metarsXml)))
    upstream.createContext("/forecast",
      (ex: HttpExchange) => reply(ex, dwmlXml.getBytes("UTF-8")))
    upstream.start()
    upstreamBase = s"http://127.0.0.1:${upstream.getAddress.getPort}"
  }

  override def afterAll(): Unit = if (upstream != null) upstream.stop(0)

  test("flag parsing covers every knob; unknown flags fail loudly") {
    val c = Main.parse(Array("--port=9200", "--ticks=3", "--sleep-interval=60",
      "--weather-dir=/w", "--event-dir=/e", "--key-file=/k.hex",
      "--refill-rate=2.5", "--token-capacity=9", "--cores=4",
      "--user-agent=ua", "--host=0.0.0.0",
      "--stations-url=su", "--metars-url=mu", "--forecast-base=fb"))
    assert(c.port == 9200 && c.ticks == 3 && c.sleepIntervalSeconds == 60L)
    assert(c.weatherDir == "/w" && c.eventDir == "/e" && c.keyFile == "/k.hex")
    assert(c.refillRateSeconds == 2.5 && c.tokenCapacity == 9 && c.cores == 4)
    assert(c.userAgent == "ua" && c.host == "0.0.0.0")
    assert(c.stationsUrl == "su" && c.metarsUrl == "mu" && c.forecastBase == "fb")
    intercept[RuntimeException](Main.parse(Array("--no-such-flag=1")))
  }

  test("key bootstrap: generated once, stable across reloads") {
    val dir = Files.createTempDirectory("graft-main-key")
    val path = dir.resolve("sub").resolve("key.hex")
    val k1 = Main.loadOrCreateKey(path)
    assert(Files.exists(path))
    val k2 = Main.loadOrCreateKey(path)
    assert(k1.sameElements(k2))
    val bad = dir.resolve("bad.hex")
    Files.write(bad, "zz".getBytes("UTF-8"))
    intercept[IllegalArgumentException](Main.loadOrCreateKey(bad))
  }

  test("forecast URL carries the chunk coordinates and element list") {
    val now = Timestamp.from(Instant.parse("2024-08-12T00:00:00Z"))
    val url = Main.forecastUrl("http://x/forecast", () => now)(
      Seq(graft.ingest.Fetch.StationCoord("KAAA", 44.56, -95.12)))
    assert(url.startsWith("http://x/forecast?listLatLon=44.56,-95.12&"))
    assert(url.contains("begin=2024-08-12T00:00:00"))
    assert(url.contains("end=2024-08-19T00:00:00"))
    assert(url.contains("maxt=maxt") && url.contains("mint=mint") && url.contains("wspd=wspd"))
  }

  test("boot: API up, one tick lands a snapshot, routes serve it") {
    val root = Files.createTempDirectory("graft-main").toString
    val tickTime = Timestamp.from(Instant.parse("2024-08-12T01:00:00Z"))
    val cfg = Main.Config(
      port = 0,
      weatherDir = s"$root/weather",
      eventDir = s"$root/events",
      keyFile = s"$root/key.hex",
      stationsUrl = s"$upstreamBase/stations.xml.gz",
      metarsUrl = s"$upstreamBase/metars.xml.gz",
      forecastBase = s"$upstreamBase/forecast")
    val (server, port, run) = Main.boot(spark, cfg, clock = () => tickTime)
    try {
      def get(path: String): (Int, String) = {
        val rsp = client.send(
          HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
          HttpResponse.BodyHandlers.ofString())
        (rsp.statusCode(), rsp.body())
      }
      // identity route up before any tick
      val (kc, kb) = get("/oracle/npub")
      assert(kc == 200 && JsonMethods.parse(kb) \ "key" != JNothing)

      val reports = run(1)
      assert(reports.size == 1)
      assert(reports.head.stations == 1 && reports.head.forecastRows > 0)

      val (fc, fb) = get("/stations/forecasts?start=2024-08-11T00:00:00Z&" +
        "end=2024-08-14T00:00:00Z&station_ids=KAAA")
      assert(fc == 200)
      val rows = JsonMethods.parse(fb).asInstanceOf[JArray].arr
      assert(rows.nonEmpty)
      assert(rows.forall(r => r \ "station_id" == JString("KAAA")))

      val (oc, ob) = get("/stations/observations?start=2024-08-11T00:00:00Z&" +
        "end=2024-08-14T00:00:00Z&station_ids=KAAA")
      assert(oc == 200)
      assert(JsonMethods.parse(ob).asInstanceOf[JArray].arr.nonEmpty)
    } finally server.stop()
  }
}
