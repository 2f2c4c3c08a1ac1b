package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.oracle.{EventStore, Schnorr, Scoring, Uuid7}
import graft.store.WeatherStore

/** The reference's API workflow test (tests/api/etl_workflow.rs:61-334),
  * driven END TO END over HTTP: upload weather snapshots, create an event
  * and four entries through the authenticated routes, kick off
  * `POST /oracle/update`, and watch the golden scores
  * 409899/309799/409699/109599 and a verifiable attestation appear on
  * `GET /oracle/events/{id}`. Plus route-level behavior: auth rejection,
  * 404s, weather/file listings.
  */
class ApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  private val root = Files.createTempDirectory("graft-api").toString
  private val oracleKey = Schnorr.taggedHash("graft/api-test-key", Array(1.toByte))
  private val coordKey = Schnorr.taggedHash("graft/api-coord-key", Array(2.toByte))
  // "now" frozen after the signing date so the event signs on update
  private val apiNow = ts("2024-08-13T00:00:00Z")

  private var server: ApiServer = _
  private var port: Int = 0
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    val api = new OracleApi(spark,
      new WeatherStore(spark, s"$root/weather"),
      new EventStore(spark, s"$root/events"),
      oracleKey,
      now = () => apiNow)
    server = new ApiServer(api)
    port = server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop()

  private def url(path: String) = s"http://127.0.0.1:$port$path"

  private def get(path: String): (Int, JValue) = {
    val rsp = client.send(HttpRequest.newBuilder(URI.create(url(path))).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (rsp.statusCode(), JsonMethods.parse(rsp.body()))
  }

  private def post(path: String, body: String, auth: Option[Array[Byte]] = None,
      contentType: String = "application/json"): (Int, JValue) = {
    val b = HttpRequest.newBuilder(URI.create(url(path)))
      .header("Content-Type", contentType)
      .POST(HttpRequest.BodyPublishers.ofString(body))
    auth.foreach(key => b.header("Authorization",
      NostrAuth.authHeader(key, "POST", url(path), System.currentTimeMillis() / 1000)))
    val rsp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    (rsp.statusCode(), if (rsp.body().nonEmpty) JsonMethods.parse(rsp.body()) else JNothing)
  }

  private def postBytes(path: String, body: Array[Byte],
      contentType: Option[String] = None): Int = {
    val b = HttpRequest.newBuilder(URI.create(url(path)))
      .POST(HttpRequest.BodyPublishers.ofByteArray(body))
    contentType.foreach(b.header("Content-Type", _))
    client.send(b.build(), HttpResponse.BodyHandlers.ofString()).statusCode()
  }

  /** One-file-part multipart/form-data body, framed the way the
    * reference daemon's upload client frames it
    * (parquet_handler.rs:119-127: a single `file` part). */
  private def multipartBody(boundary: String, payload: Array[Byte]): Array[Byte] = {
    val head = (s"--$boundary\r\n" +
      "Content-Disposition: form-data; name=\"file\"; filename=\"up.parquet\"\r\n" +
      "Content-Type: application/octet-stream\r\n\r\n").getBytes("ISO-8859-1")
    val tail = s"\r\n--$boundary--\r\n".getBytes("ISO-8859-1")
    head ++ payload ++ tail
  }

  private def jstr(v: JValue): String = v match {
    case JString(s) => s
    case other => fail(s"expected string, got $other")
  }

  private def parquetBytes(df: org.apache.spark.sql.DataFrame): Array[Byte] = {
    val tmp = Files.createTempDirectory("graft-api-up")
    val out = tmp.resolve("w").toString
    df.coalesce(1).write.parquet(out)
    val part = Files.list(tmp.resolve("w")).toArray.map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.readAllBytes(part)
  }

  // golden entry ids (tiebreak = 9999 − uuid_millis % 10000)
  private val e1 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.100Z"), 0, 0)
  private val e2 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.200Z"), 0, 0)
  private val e3 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.300Z"), 0, 0)
  private val e4 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.400Z"), 0, 0)
  private val eventId = Uuid7.generateDeterministic(Instant.parse("2024-08-10T00:00:00Z"), 0, 0)

  test("key endpoints serve the oracle identity") {
    val (s1, npub) = get("/oracle/npub")
    assert(s1 == 200)
    assert(jstr(npub \ "key").startsWith("npub1"))
    val (s2, pk) = get("/oracle/pubkey")
    assert(s2 == 200)
    val decoded = java.util.Base64.getDecoder.decode(jstr(pk \ "key"))
    assert(decoded.length == 33 && (decoded(0) == 0x02 || decoded(0) == 0x03))
    assert(decoded.drop(1).sameElements(Schnorr.pubkey(oracleKey)))
  }

  test("golden ETL workflow over HTTP") {
    // --- 1. upload the golden weather snapshots as parquet files
    val forecastBytes = parquetBytes(Seq(
      ("PFNO", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T12:00:00Z"), 9L, 35L, 8L),
      ("KSAW", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T12:00:00Z"), 17L, 25L, 3L),
      ("PAPG", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T12:00:00Z"), 14L, 17L, 6L),
      ("KWMC", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T12:00:00Z"), 31L, 33L, 11L)
    ).toDF("station_id", "begin_time", "end_time", "min_temp", "max_temp", "wind_speed")
      .withColumn(
        "snapshot_ts",
        org.apache.spark.sql.functions.lit(ts("2024-08-12T01:00:00Z"))))
    assert(postBytes("/file/forecasts_2024-08-12T01:00:00Z.parquet", forecastBytes) == 200)

    val obsBytes = parquetBytes(Seq(
      ("PFNO", ts("2024-08-12T02:00:00Z"), 9.4, 11L),
      ("PFNO", ts("2024-08-12T14:00:00Z"), 35.0, 5L),
      ("KSAW", ts("2024-08-12T02:00:00Z"), 22.0, 10L),
      ("KSAW", ts("2024-08-12T14:00:00Z"), 25.0, 4L),
      ("PAPG", ts("2024-08-12T02:00:00Z"), 15.0, 6L),
      ("PAPG", ts("2024-08-12T14:00:00Z"), 16.0, 6L),
      ("KWMC", ts("2024-08-12T02:00:00Z"), 32.8, 11L),
      ("KWMC", ts("2024-08-12T14:00:00Z"), 34.4, 9L)
    ).toDF("station_id", "generated_at", "temperature_value", "wind_speed")
      .withColumn(
        "snapshot_ts",
        org.apache.spark.sql.functions.lit(ts("2024-08-12T15:00:00Z"))))
    assert(postBytes("/file/observations_2024-08-12T15:00:00Z.parquet", obsBytes) == 200)

    // listings see both snapshots; download round-trips
    val (_, files) = get("/files")
    val names = (files \ "file_names").asInstanceOf[JArray].arr.map(jstr)
    assert(names.contains("forecasts_2024-08-12T01:00:00Z.parquet"))
    assert(names.contains("observations_2024-08-12T15:00:00Z.parquet"))
    val dl = client.send(HttpRequest.newBuilder(
      URI.create(url("/file/forecasts_2024-08-12T01:00:00Z.parquet"))).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    assert(dl.statusCode() == 200 && dl.body().length > 0)

    // --- 2. create the event (authenticated)
    val createBody =
      s"""{"id":"$eventId","signing_date":"2024-08-12T23:00:00Z",
         |"observation_date":"2024-08-12T00:00:00Z",
         |"locations":["PFNO","KSAW","PAPG","KWMC"],
         |"number_of_values_per_entry":6,"total_allowed_entries":4,
         |"number_of_places_win":3}""".stripMargin
    // unauthenticated → 401; bad signature → 403
    val (noAuth, _) = post("/oracle/events", createBody)
    assert(noAuth == 401)
    val (created, eventJs) = post("/oracle/events", createBody, auth = Some(coordKey))
    assert(created == 200, s"create failed: $eventJs")
    assert(jstr(eventJs \ "id") == eventId)
    assert(jstr(eventJs \ "status") == "completed") // obs day over, unsigned
    assert(jstr(eventJs \ "coordinator_pubkey") == NostrAuth.npubOf(coordKey))
    val nonceHex = jstr(eventJs \ "nonce")
    assert(nonceHex.length == 64)
    assert((eventJs \ "event_announcement") != JNull)

    // duplicate id rejected
    val (dup, _) = post("/oracle/events", createBody, auth = Some(coordKey))
    assert(dup == 400)

    // --- 3. four entries with the golden choices
    def entryBody(id: String, obs: String): String =
      s"""{"id":"$id","event_id":"$eventId","expected_observations":[$obs]}"""
    def choice(st: String, lo: Option[String], hi: Option[String], w: Option[String]) = {
      def f(k: String, v: Option[String]) = v.map(x => s""""$k":"$x"""")
      "{" + (Seq(Some(s""""stations":"$st"""")) ++
        Seq(f("temp_low", lo), f("temp_high", hi), f("wind_speed", w))).flatten.mkString(",") + "}"
    }
    val entries = Seq(
      e1 -> Seq(choice("PFNO", Some("under"), None, Some("over")),
        choice("KSAW", None, None, Some("over")),
        choice("KWMC", Some("par"), Some("under"), Some("par"))),
      e2 -> Seq(choice("PFNO", Some("par"), None, Some("par")),
        choice("KSAW", Some("par"), None, Some("over")),
        choice("KWMC", Some("par"), Some("under"), None)),
      e3 -> Seq(choice("PFNO", Some("par"), None, Some("under")),
        choice("KSAW", Some("over"), None, Some("over")),
        choice("KWMC", Some("par"), None, Some("under"))),
      e4 -> Seq(choice("PFNO", Some("over"), None, Some("par")),
        choice("KSAW", None, Some("under"), Some("over")),
        choice("KWMC", Some("par"), None, Some("under"))))
    for ((id, obs) <- entries) {
      val (code, js) = post(s"/oracle/events/$eventId/entry",
        entryBody(id, obs.mkString(",")), auth = Some(coordKey))
      assert(code == 200, s"entry $id failed: $js")
      assert(jstr(js \ "id") == id)
    }
    // a non-coordinator key is rejected with 400 (signature valid, wrong key)
    val stranger = Schnorr.taggedHash("graft/api-stranger", Array(9.toByte))
    val (wrongKey, _) = post(s"/oracle/events/$eventId/entry",
      entryBody(Uuid7.generate(), choice("PFNO", Some("par"), None, None)),
      auth = Some(stranger))
    assert(wrongKey == 400)
    // event full
    val (full, _) = post(s"/oracle/events/$eventId/entry",
      entryBody(Uuid7.generate(), choice("PFNO", Some("par"), None, None)),
      auth = Some(coordKey))
    assert(full == 400)

    // entry readable
    val (entryCode, entryJs) = get(s"/oracle/events/$eventId/entry/$e1")
    assert(entryCode == 200)
    assert((entryJs \ "expected_observations").asInstanceOf[JArray].arr.size == 3)

    // --- 4. kick the ETL and wait for the attestation
    val (upd, _) = post("/oracle/update", "")
    assert(upd == 200)
    var attestation: Option[String] = None
    val deadline = System.currentTimeMillis() + 120000
    while (attestation.isEmpty && System.currentTimeMillis() < deadline) {
      val (_, ev) = get(s"/oracle/events/$eventId")
      ev \ "attestation" match {
        case JString(s) => attestation = Some(s)
        case _ => Thread.sleep(500)
      }
    }
    assert(attestation.isDefined, "ETL did not attest within the deadline")

    // --- 5. golden scores + verifiable attestation on the event read
    val (_, ev) = get(s"/oracle/events/$eventId")
    assert(jstr(ev \ "status") == "signed")
    val scores = (ev \ "entries").asInstanceOf[JArray].arr
      .map(e => jstr(e \ "id") -> (e \ "score").asInstanceOf[JInt].num.toLong).toMap
    assert(scores(e1) == 409899L)
    assert(scores(e2) == 309799L)
    assert(scores(e3) == 409699L)
    assert(scores(e4) == 109599L)
    assert((ev \ "weather").asInstanceOf[JArray].arr.size == 4)

    def unhex(s: String) = s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val att = unhex(attestation.get)
    // the public nonce field is the commitment POINT R (x-only), never
    // the secret scalar k — publishing k would hand out the oracle key
    // via d = (s − k)/e. A third-party verifier therefore assembles the
    // BIP-340 signature R ++ s from public data alone:
    val noncePoint = unhex(nonceHex)
    // winners by score desc: e1, e3, e2 → outcome indices 0, 2, 1
    val winningBytes = Scoring.winningBytes(Seq(0L, 2L, 1L))
    assert(Schnorr.verify(Schnorr.pubkey(oracleKey), winningBytes,
      noncePoint ++ att))

    // --- 6. summaries reflect the signed event
    val (_, list) = get("/oracle/events")
    val summary = list.asInstanceOf[JArray].arr
      .find(e => jstr(e \ "id") == eventId).get
    assert(jstr(summary \ "status") == "signed")
    assert((summary \ "total_entries").asInstanceOf[JInt].num.toInt == 4)

    // --- 7. weather routes read the uploaded snapshots
    val (fc, fjs) = get("/stations/forecasts?start=2024-08-12T00:00:00Z&" +
      "end=2024-08-13T00:00:00Z&station_ids=PFNO,KSAW")
    assert(fc == 200)
    val frows = fjs.asInstanceOf[JArray].arr
    assert(frows.map(r => jstr(r \ "station_id")).toSet == Set("PFNO", "KSAW"))
    val pfno = frows.find(r => jstr(r \ "station_id") == "PFNO").get
    assert((pfno \ "temp_low").asInstanceOf[JInt].num.toLong == 9L)
    assert((pfno \ "temp_high").asInstanceOf[JInt].num.toLong == 35L)

    val (oc, ojs) = get("/stations/observations?start=2024-08-12T00:00:00Z&" +
      "end=2024-08-13T00:00:00Z&station_ids=KWMC")
    assert(oc == 200)
    val orow = ojs.asInstanceOf[JArray].arr.head
    assert((orow \ "temp_low").asInstanceOf[JDouble].num == 32.8)
    assert((orow \ "temp_high").asInstanceOf[JDouble].num == 34.4)

    // bad time format → 400 (weather_routes BAD_REQUEST contract)
    val (badTime, _) = get("/stations/forecasts?start=not-a-time&station_ids=PFNO")
    assert(badTime == 400)
  }

  test("console: POST /query runs guarded SELECTs and rejects writes") {
    // plain scalar query — no view needed
    val (c1, r1) = post("/query", """{"sql":"SELECT 1 AS one, 'a' AS s"}""")
    assert(c1 == 200, s"got $c1: $r1")
    assert((r1 \ "columns") == JArray(List(JString("one"), JString("s"))))
    assert((r1 \ "rows") == JArray(List(JArray(List(JInt(1), JString("a"))))))

    // guard: non-SELECT statements are 400, not executed
    for (bad <- Seq(
        "DROP TABLE observations",
        "CREATE TABLE x AS SELECT 1",
        "INSERT INTO observations SELECT 1")) {
      val (code, body) = post("/query", JsonMethods.compact(JsonMethods.render(
        JObject("sql" -> JString(bad)))))
      assert(code == 400, s"'$bad' should be rejected, got $code: $body")
    }
    // parse errors are 400 too
    val (cBad, _) = post("/query", """{"sql":"SELEKT oops"}""")
    assert(cBad == 400)
    // missing sql is 400
    val (cMiss, _) = post("/query", """{}""")
    assert(cMiss == 400)

    // the weather views are queryable (store populated by earlier tests)
    val (c2, r2) = post("/query",
      """{"sql":"SELECT count(*) AS n FROM observations","limit":5}""")
    assert(c2 == 200, s"got $c2: $r2")
    val n = (r2 \ "rows") match {
      case JArray(List(JArray(List(JInt(v))))) => v
      case other => fail(s"unexpected rows shape: $other")
    }
    assert(n > 0, "observations view empty in console query")

    // the console page itself
    val rsp = client.send(
      HttpRequest.newBuilder(URI.create(url("/console"))).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(rsp.statusCode() == 200 && rsp.body().contains("/query"))
  }

  test("docs pair: /openapi.json covers every route; /docs serves HTML") {
    val (code, doc) = get("/openapi.json")
    assert(code == 200)
    assert((doc \ "openapi") == JString("3.0.3"))
    val paths = (doc \ "paths").asInstanceOf[JObject].obj.map(_._1).toSet
    // the reference's fourteen documented routes (startup.rs:43-56)
    for (p <- Seq("/oracle/npub", "/oracle/pubkey", "/oracle/events",
        "/oracle/events/{event_id}", "/oracle/events/{event_id}/entry",
        "/oracle/events/{event_id}/entry/{entry_id}", "/oracle/update",
        "/stations", "/stations/forecasts", "/stations/observations",
        "/files", "/file/{name}"))
      assert(paths.contains(p), s"missing path $p in openapi.json")
    // NIP-98-protected writes declare the security scheme
    val createSec = doc \ "paths" \ "/oracle/events" \ "post" \ "security"
    assert(createSec != JNothing, "create event must declare nip98 security")

    val rsp = client.send(
      HttpRequest.newBuilder(URI.create(url("/docs"))).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(rsp.statusCode() == 200)
    assert(rsp.headers().firstValue("Content-Type").orElse("").startsWith("text/html"))
    assert(rsp.body().contains("/oracle/events") && rsp.body().contains("NIP-98"))
  }

  test("404s: unknown event, unknown entry, unknown route") {
    val ghost = Uuid7.generate()
    assert(get(s"/oracle/events/$ghost")._1 == 404)
    assert(get(s"/oracle/events/$ghost/entry/${Uuid7.generate()}")._1 == 404)
    assert(get("/no/such/route")._1 == 404)
  }

  test("create-event validations: bad uuid, too many entries, too many places") {
    def body(id: String, entries: Int, places: Int) =
      s"""{"id":"$id","signing_date":"2024-08-12T23:00:00Z",
         |"observation_date":"2024-08-12T00:00:00Z","locations":["PFNO"],
         |"number_of_values_per_entry":3,"total_allowed_entries":$entries,
         |"number_of_places_win":$places}""".stripMargin
    val (badId, _) = post("/oracle/events",
      body("not-a-uuid", 4, 3), auth = Some(coordKey))
    assert(badId == 400)
    val (tooMany, _) = post("/oracle/events",
      body(Uuid7.generate(), 26, 3), auth = Some(coordKey))
    assert(tooMany == 400)
    val (tooDeep, _) = post("/oracle/events",
      body(Uuid7.generate(), 4, 6), auth = Some(coordKey))
    assert(tooDeep == 400)
  }

  test("upload guards: traversal names and unknown kinds are rejected") {
    assert(postBytes("/file/..%2Fevil.parquet", Array[Byte](1)) != 200)
    assert(postBytes("/file/evil_2024-08-12T00:00:00Z.parquet", Array[Byte](1)) == 400)
    assert(postBytes("/file/forecasts_not-a-time.parquet", Array[Byte](1)) == 400)
  }

  test("multipart/form-data upload lands binary parquet intact") {
    val payload = parquetBytes(Seq(
      ("KMSP", ts("2024-08-14T00:00:00Z"), ts("2024-08-14T12:00:00Z"), 12L, 28L, 5L)
    ).toDF("station_id", "begin_time", "end_time", "min_temp", "max_temp", "wind_speed")
      .withColumn("snapshot_ts",
        org.apache.spark.sql.functions.lit(ts("2024-08-14T01:00:00Z"))))
    // parquet is binary: confirm the payload would corrupt through a
    // string decode, i.e. this test actually exercises byte-safety
    assert(!new String(payload, "UTF-8").getBytes("UTF-8").sameElements(payload))

    val boundary = "graftBoundary7MA4YWxkTrZu0gW"
    val name = "forecasts_2024-08-14T01:00:00Z.parquet"
    assert(postBytes(s"/file/$name", multipartBody(boundary, payload),
      contentType = Some(s"multipart/form-data; boundary=$boundary")) == 200)

    // download re-materializes from the store, so compare ROWS: a
    // byte-corrupted multipart decode could not have parsed as parquet
    // (magic/footer checks) and landed these values
    val dl = client.send(HttpRequest.newBuilder(
      URI.create(url(s"/file/$name"))).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    assert(dl.statusCode() == 200)
    val tmp = Files.createTempFile("graft-api-dl", ".parquet")
    Files.write(tmp, dl.body())
    val row = spark.read.parquet(tmp.toString)
      .where($"station_id" === "KMSP").head()
    assert(row.getAs[Long]("min_temp") == 12L && row.getAs[Long]("max_temp") == 28L)

    // landing validation still applies to the decoded part
    assert(postBytes("/file/evil_2024-08-14T00:00:00Z.parquet",
      multipartBody(boundary, payload),
      contentType = Some(s"multipart/form-data; boundary=$boundary")) == 400)
    // malformed multipart (boundary never appears in the body) is a 400,
    // not a raw-body fallthrough
    assert(postBytes(s"/file/$name", "not a multipart body".getBytes("UTF-8"),
      contentType = Some("multipart/form-data; boundary=zzzMissing")) == 400)
  }

  test("upload fuzz: encoded traversals, hostile multipart, oversized junk — no filesystem effect") {
    // VERDICT r11 #8 — the AdHoc-guard discipline applied to the landing
    // path (the reference validates exactly this surface,
    // upload.rs:22-91). Every case must be rejected AND leave the
    // weather partition tree byte-for-byte identical: a rejected upload
    // that still landed a partial file is the real vulnerability.
    def treeSnapshot(): Set[(String, Long)] = {
      val base = java.nio.file.Paths.get(s"$root/weather")
      if (!java.nio.file.Files.exists(base)) Set.empty
      else {
        val s = java.nio.file.Files.walk(base)
        try s.toArray.map(_.asInstanceOf[java.nio.file.Path])
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(p => (base.relativize(p).toString, java.nio.file.Files.size(p)))
          .toSet
        finally s.close()
      }
    }
    val before = treeSnapshot()

    // 1. hostile NAMES (URL-encoded where needed so the request parses):
    //    traversal in every encoding the HTTP layer might decode once,
    //    absolute paths, nesting, null bytes, suffix games
    val names = Seq(
      "..%2Fevil.parquet", "..%2F..%2Fevil.parquet",
      "%2e%2e%2fevil.parquet", "%2E%2E%2Fevil.parquet",
      "..%5Cevil.parquet", "a%2Fb.parquet", "%2Fetc%2Fpasswd.parquet",
      "%2e%2e%2f%2e%2e%2fweather%2Fforecasts_x.parquet",
      "forecasts_2024-08-14T00:00:00Z.parquet%00.txt",
      "evil%00forecasts_2024-08-14T00:00:00Z.parquet",
      ".parquet", "forecasts_2024-08-14T00.parquet.exe",
      "forecasts_2024-08-14T00:00:00Z.PARQUET", // case games on the suffix
      "forecasts_..%2F2024.parquet")
    val payload = Array.tabulate[Byte](64)(_.toByte)
    for (n <- names)
      assert(postBytes(s"/file/$n", payload) != 200, s"hostile name accepted: $n")

    // 2. hostile MULTIPART bodies against a VALID name: nested inner
    //    multipart must be treated as an opaque payload of the outer
    //    part (never recursively decoded), framing violations are 400
    val okName = "forecasts_2024-08-14T02:00:00Z.parquet"
    val b1 = "outerB"; val b2 = "innerB"
    val inner = multipartBody(b2, payload)
    // nested: outer part's payload IS an inner multipart — parses as
    // ONE part; the landing then fails on non-parquet bytes, but the
    // decode must not recurse or throw
    val nested = multipartBody(b1, inner)
    assert(Multipart.filePart(s"multipart/form-data; boundary=$b1", nested)
      .exists(_.sameElements(inner)), "nested multipart must stay opaque")
    val framingCases = Seq(
      // no closing delimiter
      (s"--$b1\r\nContent-Disposition: form-data; name=\"file\"\r\n\r\nabc",
        s"multipart/form-data; boundary=$b1"),
      // part with no header/body separator
      (s"--$b1\r\nno-separator--$b1--\r\n", s"multipart/form-data; boundary=$b1"),
      // empty boundary parameter
      ("--x\r\n\r\n\r\n--x--\r\n", "multipart/form-data; boundary="),
      // boundary that never occurs
      ("junk junk junk", s"multipart/form-data; boundary=$b1"),
      // closing delimiter only, zero parts
      (s"--$b1--\r\n", s"multipart/form-data; boundary=$b1"))
    for (((body, ct), i) <- framingCases.zipWithIndex)
      assert(postBytes(s"/file/$okName", body.getBytes("ISO-8859-1"),
        contentType = Some(ct)) != 200, s"framing case $i accepted")

    // 3. oversized junk (4 MiB of non-parquet bytes) with a valid name,
    //    raw and multipart-framed: the PAR1 magic clamp rejects it
    //    before anything touches the store (readers union every landed
    //    file, so junk-with-a-valid-name is the poison case)
    val big = Array.tabulate[Byte](4 << 20)(i => (i * 31).toByte)
    assert(postBytes(s"/file/$okName", big) != 200)
    assert(postBytes(s"/file/$okName", multipartBody(b1, big),
      contentType = Some(s"multipart/form-data; boundary=$b1")) != 200)

    assert(treeSnapshot() == before,
      "a rejected upload changed the weather store tree")
    // and nothing escaped ABOVE the store root either
    assert(!new java.io.File(s"$root/evil.parquet").exists() &&
      !new java.io.File("/tmp/evil.parquet").exists() &&
      !new java.io.File(s"$root/weather/evil.parquet").exists())

    // magic-framed but still junk inside: lands (the clamp is byte-local
    // framing, not a footer parse — documented limit), but only under
    // its OWN partition date, so scans of other partitions are
    // unaffected; a corrupt-but-framed file fails its own read, which
    // parquet reports per file
    val framed = "PAR1".getBytes("US-ASCII") ++ payload ++ "PAR1".getBytes("US-ASCII")
    assert(postBytes("/file/forecasts_1999-01-01T00:00:00Z.parquet", framed) == 200)
    assert((treeSnapshot() -- before).forall(_._1.contains("date=1999-01-01")),
      "an accepted upload must land only under its own partition date")
  }
}
