package graft.ingest

import java.io.{BufferedReader, InputStreamReader}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.zip.GZIPInputStream

/** The ingestion edge (SURVEY §2.1 S1-S3, §2.6 O5): rate-limited HTTP
  * fetch with retry, streaming gzip decode, and ≤50-coordinate request
  * chunking — the pieces that move upstream XML into the engine, where
  * [[XmlSources]] / [[Dwml]] take over and everything becomes a DataFrame.
  *
  * These are deliberately DRIVER-SIDE utilities, not distributed
  * operators: the upstream service is rate-limited to ~3 requests / 15 s
  * (crates/daemon/src/main.rs:18-21), so at any scale the fetch edge is a
  * single paced loop — parallelizing it across executors would only race
  * the limiter. Scale lives downstream: each fetched document lands as a
  * row (snapshot pattern, graft.streaming.SnapshotStream) and Spark fans
  * out from there.
  *
  * Time and sleeping are injected through [[Pacer]] so the
  * retry/backoff/limiter logic is unit-testable without real 20-second
  * sleeps.
  */
object Fetch {

  /** Clock + sleep abstraction (re-implemented in tests as virtual time). */
  trait Pacer {
    def nanoTime(): Long
    def sleep(millis: Long): Unit
  }

  object SystemPacer extends Pacer {
    def nanoTime(): Long = System.nanoTime()
    def sleep(millis: Long): Unit = Thread.sleep(millis)
  }

  /** Token-bucket rate limiter — the reference's
    * `RateLimiter` (crates/daemon/src/utils.rs:102-148) with its
    * *intended* semantics: `capacity` requests per `refillPeriodSeconds`
    * (main.rs:17 — "Max send 3 requests per 15 second"), a bounded number
    * of blocking waits, then failure.
    *
    * Two reference quirks are deliberately not reproduced: its
    * `refill_rate` is used as tokens/second (so `3, 15.0` actually refills
    * 15/s — far more permissive than the comment intends), and the bucket
    * is never clamped, so idle time accumulates unbounded burst. Here the
    * refill rate is `capacity / refillPeriodSeconds` and the bucket clamps
    * at `capacity`.
    *
    * @param waitMillis sleep between acquire attempts (utils.rs:144: 20 s)
    * @param maxWaits   attempts before giving up (utils.rs:138: 3)
    */
  final class TokenBucket(
      capacity: Int = 3,
      refillPeriodSeconds: Double = 15.0,
      maxWaits: Int = 3,
      waitMillis: Long = 20000L,
      pacer: Pacer = SystemPacer) {

    private val ratePerNano = capacity / (refillPeriodSeconds * 1e9)
    private var tokens: Double = capacity.toDouble
    private var lastRefill: Long = pacer.nanoTime()

    private def refill(): Unit = {
      val now = pacer.nanoTime()
      tokens = math.min(capacity.toDouble, tokens + (now - lastRefill) * ratePerNano)
      lastRefill = now
    }

    /** Acquire `n` tokens, sleeping up to [[maxWaits]] times; false when
      * the budget never materialized (caller should fail the fetch). */
    def tryAcquire(n: Double = 1.0): Boolean = synchronized {
      var waits = 0
      while (true) {
        refill()
        if (n <= tokens) { tokens -= n; return true }
        if (waits >= maxWaits) return false
        waits += 1
        pacer.sleep(waitMillis)
      }
      false // unreachable
    }
  }

  /** Transient fetch failure (retried); terminal errors throw the
    * underlying exception. */
  final case class TransientHttpError(status: Int, url: String)
      extends RuntimeException(s"transient HTTP $status from $url")

  /** Rate limit exhausted after the bucket's bounded waits
    * (utils.rs:172-175). */
  final case class RateLimitExceeded(url: String)
      extends RuntimeException(s"rate limit exceeded after retries: $url")

  /** HTTP fetcher with UA, per-request timeout, and exponential-backoff
    * retry — the reference's `XmlFetcher` (utils.rs:151-231:
    * `user_agent`, 20 s timeout, `ExponentialBackoff` max 3 retries).
    *
    * Retries cover connect/IO errors and 5xx/429 responses; other
    * non-2xx statuses fail fast. Backoff is `backoffBaseMillis · 2^k`
    * before retry k+1.
    */
  final class HttpFetcher(
      userAgent: String = "noaa-data-pipeline/1.0",
      bucket: TokenBucket = new TokenBucket(),
      timeoutMillis: Long = 20000L,
      maxRetries: Int = 3,
      backoffBaseMillis: Long = 500L,
      pacer: Pacer = SystemPacer,
      client: HttpClient = HttpClient.newBuilder()
        .followRedirects(HttpClient.Redirect.NORMAL).build()) {

    private def request(url: String): HttpRequest =
      HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMillis))
        .header("User-Agent", userAgent)
        .GET()
        .build()

    private def withRetry[T](url: String)(once: () => T): T = {
      var attempt = 0
      while (true) {
        try return once()
        catch {
          case e @ (_: java.io.IOException | _: TransientHttpError) =>
            if (attempt >= maxRetries) throw e
            pacer.sleep(backoffBaseMillis << attempt)
            attempt += 1
        }
      }
      throw new IllegalStateException("unreachable")
    }

    private def checked[T](url: String, rsp: HttpResponse[T]): HttpResponse[T] = {
      val code = rsp.statusCode()
      if (code >= 500 || code == 429) throw TransientHttpError(code, url)
      if (code < 200 || code >= 300)
        throw new RuntimeException(s"error response from request: HTTP $code $url")
      rsp
    }

    /** S1: plain text/XML GET (utils.rs:168-191). */
    def fetchXml(url: String): String = {
      if (!bucket.tryAcquire(1.0)) throw RateLimitExceeded(url)
      withRetry(url) { () =>
        checked(url, client.send(request(url),
          HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))).body()
      }
    }

    /** S2: gzip-compressed GET, decoded as a stream — the body is never
      * buffered compressed-in-memory (utils.rs:193-231). Mirrors the
      * reference's line-reassembly (every line ends with '\n', including
      * the last). */
    def fetchXmlGzip(url: String): String = {
      if (!bucket.tryAcquire(1.0)) throw RateLimitExceeded(url)
      withRetry(url) { () =>
        val rsp = client.send(request(url), HttpResponse.BodyHandlers.ofInputStream())
        // Anything that throws before `reader` exists must close the body
        // stream, or every failed attempt of the retry loop leaks a
        // connection: checked() on a bad status, AND the GZIPInputStream
        // constructor itself (it reads the 10-byte gzip header, so a
        // 200 with a truncated/non-gzip body throws right there).
        val reader =
          try {
            checked(url, rsp)
            new BufferedReader(new InputStreamReader(
              new GZIPInputStream(rsp.body()), StandardCharsets.UTF_8))
          } catch {
            case e: Throwable =>
              try rsp.body().close() catch { case _: Throwable => () }
              throw e
          }
        try {
          val sb = new StringBuilder
          var line = reader.readLine()
          while (line != null) { sb.append(line).append('\n'); line = reader.readLine() }
          sb.toString
        } finally reader.close()
      }
    }
  }

  /** A station's request coordinates, formatted to 2 dp the way the
    * upstream API expects (coordinates.rs:40-45). */
  final case class StationCoord(stationId: String, latitude: Double, longitude: Double) {
    // Locale.ROOT: a comma-decimal default locale must not corrupt the URL
    def queryForm: String =
      String.format(java.util.Locale.ROOT, "%.2f,%.2f", latitude, longitude)
  }

  /** O5: split a station set into request chunks of ≤ `maxPerRequest`
    * coordinates — the upstream forecast endpoint rejects larger lists
    * (split_cityweather, coordinates.rs:96-124; call site
    * download_forecast.rs:684 uses 50). Preserves input order; every
    * station appears in exactly one chunk. */
  def chunkCoordinates(
      stations: Seq[StationCoord], maxPerRequest: Int = 50): Seq[Seq[StationCoord]] =
    stations.grouped(maxPerRequest).toSeq

  /** The `lat,lon%20lat,lon…` list-point query fragment for one chunk
    * (coordinates.rs:68-82). */
  def coordinatesQuery(chunk: Seq[StationCoord]): String =
    chunk.map(_.queryForm).mkString("%20")

  /** Fan out one fetch per URL with bounded concurrency, collecting
    * successes and failures separately — the reference's per-chunk task
    * set with its completion counter (download_forecast.rs:683-720:
    * JoinSet + AtomicUsize; a failed chunk is logged and the rest still
    * land). Per-request retry/backoff/rate-limiting stay inside
    * [[HttpFetcher]]; this layer only orchestrates. Order of results
    * follows the input URL order. */
  def fetchAll(fetcher: HttpFetcher, urls: Seq[String], parallelism: Int = 4)
      : (Seq[(String, String)], Seq[(String, Throwable)]) = {
    require(parallelism >= 1, "parallelism must be >= 1")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    try {
      val futures = urls.map { url =>
        url -> pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = fetcher.fetchXml(url)
        })
      }
      val results = futures.map { case (url, f) =>
        try Right(url -> f.get())
        catch {
          case e: java.util.concurrent.ExecutionException => Left(url -> e.getCause)
          case e: Throwable => Left(url -> e)
        }
      }
      (results.collect { case Right(ok) => ok }, results.collect { case Left(err) => err })
    } finally pool.shutdown()
  }
}
