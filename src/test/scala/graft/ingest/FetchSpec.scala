package graft.ingest

import java.io.ByteArrayOutputStream
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import java.util.zip.GZIPOutputStream

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Fetch._

/** Ingestion-edge behavior vs a local stub HTTP server: retry/backoff,
  * gzip stream decode, token-bucket pacing (virtual time), chunking. */
class FetchSpec extends AnyFunSuite with BeforeAndAfterAll {

  /** Virtual time: sleeps advance the clock instantly and are recorded. */
  final class VirtualPacer extends Pacer {
    var nowNanos: Long = 0L
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    def nanoTime(): Long = nowNanos
    def sleep(millis: Long): Unit = { sleeps += millis; nowNanos += millis * 1000000L }
    def advanceSeconds(s: Double): Unit = nowNanos += (s * 1e9).toLong
  }

  /** A bucket whose waits cost nothing (virtual) but still refill. */
  private def fastBucket(p: Pacer) = new TokenBucket(3, 15.0, 3, 20000L, p)

  private var server: HttpServer = _
  private var base: String = _
  private val flakyCalls = new AtomicInteger(0)

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    def reply(ex: HttpExchange, code: Int, body: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }
    server.createContext("/ok", (ex: HttpExchange) =>
      reply(ex, 200, "<response>ok</response>".getBytes("UTF-8")))
    server.createContext("/flaky", (ex: HttpExchange) => {
      val n = flakyCalls.incrementAndGet()
      if (n <= 2) reply(ex, 503, Array.emptyByteArray)
      else reply(ex, 200, s"<response>attempt $n</response>".getBytes("UTF-8"))
    })
    server.createContext("/teapot", (ex: HttpExchange) =>
      reply(ex, 418, Array.emptyByteArray))
    server.createContext("/gz", (ex: HttpExchange) => {
      val raw = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(raw)
      gz.write("line one\nline two\nlast line no newline".getBytes("UTF-8"))
      gz.close()
      reply(ex, 200, raw.toByteArray)
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  private def fetcher(p: VirtualPacer, retries: Int = 3) =
    new HttpFetcher("graft-test/1.0", fastBucket(p), 5000L, retries, 100L, p)

  test("S1: plain fetch returns the body") {
    val p = new VirtualPacer
    assert(fetcher(p).fetchXml(s"$base/ok") == "<response>ok</response>")
  }

  test("S1: transient 5xx retried with exponential backoff, then succeeds") {
    flakyCalls.set(0)
    val p = new VirtualPacer
    val body = fetcher(p).fetchXml(s"$base/flaky")
    assert(body == "<response>attempt 3</response>")
    // two failures → backoffs 100 ms then 200 ms
    assert(p.sleeps.toSeq == Seq(100L, 200L))
  }

  test("S1: retries exhausted surfaces the transient error") {
    flakyCalls.set(-100) // needs 102 calls to succeed; retries run out first
    val p = new VirtualPacer
    val e = intercept[TransientHttpError](fetcher(p, retries = 2).fetchXml(s"$base/flaky"))
    assert(e.status == 503)
    assert(p.sleeps.toSeq == Seq(100L, 200L)) // 1 try + 2 retries
  }

  test("S1: non-transient 4xx fails fast without retry") {
    val p = new VirtualPacer
    intercept[RuntimeException](fetcher(p).fetchXml(s"$base/teapot"))
    assert(p.sleeps.isEmpty)
  }

  test("S2: gzip body is stream-decoded with reference line reassembly") {
    val p = new VirtualPacer
    val body = fetcher(p).fetchXmlGzip(s"$base/gz")
    // every line (including the unterminated last one) ends with \n
    assert(body == "line one\nline two\nlast line no newline\n")
  }

  test("S3: bucket allows capacity requests, then blocks-waits, then fails") {
    val p = new VirtualPacer
    val b = fastBucket(p)
    assert(b.tryAcquire() && b.tryAcquire() && b.tryAcquire())
    // 4th: no tokens → 3 waits of 20 s virtual each; each wait refills
    // 20 s × 3/15 s = 4 tokens (clamped) so the first wait succeeds
    assert(b.tryAcquire())
    assert(p.sleeps.toSeq == Seq(20000L))
  }

  test("S3: bucket fails after maxWaits when time is frozen") {
    val frozen = new Pacer {
      var sleeps = 0
      def nanoTime(): Long = 0L
      def sleep(millis: Long): Unit = sleeps += 1 // time does not advance
    }
    val b = new TokenBucket(1, 15.0, 3, 20000L, frozen)
    assert(b.tryAcquire())
    assert(!b.tryAcquire())
    assert(frozen.sleeps == 3)
  }

  test("S3: refill clamps at capacity (no unbounded burst)") {
    val p = new VirtualPacer
    val b = fastBucket(p)
    p.advanceSeconds(3600) // an hour idle
    assert(b.tryAcquire(1) && b.tryAcquire(1) && b.tryAcquire(1))
    // a 4th immediate acquire must wait: the idle hour must NOT have
    // banked more than `capacity` tokens
    assert(b.tryAcquire(1) && p.sleeps.nonEmpty)
  }

  test("S3: fetch surfaces RateLimitExceeded when the bucket is dry") {
    val frozen = new Pacer {
      def nanoTime(): Long = 0L
      def sleep(millis: Long): Unit = ()
    }
    val b = new TokenBucket(0, 15.0, 1, 1L, frozen)
    val f = new HttpFetcher("t", b, 5000L, 0, 1L, frozen)
    intercept[RateLimitExceeded](f.fetchXml(s"$base/ok"))
  }

  test("fetchAll lands every healthy chunk and isolates the failing one") {
    flakyCalls.set(10) // /flaky healthy from the start for this test
    val p = new VirtualPacer
    // generous bucket so the fan-out isn't rate-limited
    val b = new TokenBucket(100, 15.0, 3, 1L, p)
    val f = new HttpFetcher("graft-test/1.0", b, 5000L, 0, 1L, p)
    val urls = Seq(s"$base/ok", s"$base/teapot", s"$base/flaky", s"$base/ok")
    val (oks, errs) = fetchAll(f, urls, parallelism = 3)
    assert(oks.map(_._1) == Seq(s"$base/ok", s"$base/flaky", s"$base/ok"))
    assert(oks.count(_._2 == "<response>ok</response>") == 2)
    assert(errs.map(_._1) == Seq(s"$base/teapot")) // one bad chunk, rest landed
  }

  test("O5: chunking is ≤50 per chunk, order-preserving, lossless") {
    val stations = (1 to 117).map(i => StationCoord(s"S$i", 40.0 + i * 0.01, -93.0 - i * 0.01))
    val chunks = chunkCoordinates(stations)
    assert(chunks.map(_.size) == Seq(50, 50, 17))
    assert(chunks.flatten == stations)
    val one = chunkCoordinates(stations, 117)
    assert(one.size == 1 && one.head == stations)
  }

  test("O5: coordinate query is 2-dp lat,lon joined by %20") {
    val q = coordinatesQuery(Seq(
      StationCoord("A", 44.8831, -93.2289), StationCoord("B", 61.169, -149.998)))
    assert(q == "44.88,-93.23%2061.17,-150.00")
  }
}
