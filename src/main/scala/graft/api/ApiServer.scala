package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The reference's HTTP route surface (crates/oracle/src/startup.rs:113-139)
  * over [[OracleApi]], on the JDK's built-in HTTP server — zero new
  * dependencies, pure transport: parse path/query/body, dispatch, encode
  * status + JSON. Route-for-route:
  *
  * {{{
  *   GET  /files                                   file name listing
  *   GET  /file/{name}                             snapshot download
  *   POST /file/{name}                             snapshot upload
  *   GET  /stations                                stations seen recently
  *   GET  /stations/forecasts?start&end&station_ids
  *   GET  /stations/observations?start&end&station_ids
  *   GET  /oracle/npub                             nostr npub
  *   GET  /oracle/pubkey                           compressed key (base64)
  *   POST /oracle/update                           async ETL kick-off
  *   GET  /oracle/events?limit&event_ids           summaries
  *   POST /oracle/events                 [NIP-98]  create event
  *   GET  /oracle/events/{id}                      full event
  *   POST /oracle/events/{id}/entry      [NIP-98]  add entry
  *   GET  /oracle/events/{id}/entry/{id}           one entry
  *   GET  /docs                                    API docs page
  *   GET  /openapi.json                            OpenAPI 3.0.3 spec
  *   GET  /console                                 SQL console page
  *   POST /query                                   guarded ad-hoc SQL
  *   GET  /                                        index (UI dir is
  *                                                 out-of-engine, SURVEY §7.6)
  * }}}
  *
  * Auth mapping mirrors oracle_routes.rs:88-89: a missing/malformed
  * NIP-98 header is 401, a failed signature/id check 403. Error bodies
  * are `{"error": …}` like the reference's IntoResponse
  * (oracle_routes.rs:207-225).
  */
final class ApiServer(api: OracleApi, host: String = "127.0.0.1", port: Int = 0) {

  import OracleApi._

  private val server = HttpServer.create(new InetSocketAddress(host, port), 0)
  // Spark is thread-safe for concurrent actions; a small pool matches the
  // reference's modest route concurrency without fan-out into the driver.
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))

  server.createContext("/", (ex: HttpExchange) => handle(ex))

  def start(): Int = { server.start(); server.getAddress.getPort }
  def stop(): Unit = server.stop(0)

  /** Clock for NIP-98 freshness (injectable for tests). */
  var authNow: () => Long = () => System.currentTimeMillis() / 1000

  // ------------------------------------------------------------ dispatch

  private def handle(ex: HttpExchange): Unit =
    try {
      val method = ex.getRequestMethod.toUpperCase
      val segments = ex.getRequestURI.getPath.split("/").filter(_.nonEmpty).toList
      val q = query(ex)
      (method, segments) match {
        case ("GET", Nil) => sendHtml(ex, 200, Index)
        // Docs pair (startup.rs:104,135 — utoipa ApiDoc + Scalar at /docs)
        case ("GET", "docs" :: Nil) => sendHtml(ex, 200, OpenApiDoc.html)
        case ("GET", "openapi.json" :: Nil) =>
          sendJson(ex, 200, OpenApiDoc.json)
        // Ad-hoc console (ui/main.js:112-141 runs this client-side in
        // duckdb-wasm; here the guard and execution are server-side)
        case ("GET", "console" :: Nil) => sendHtml(ex, 200, Console)
        case ("POST", "query" :: Nil) =>
          val body = parseBody(ex)
          val sql = body \ "sql" match { case JString(s) => s; case _ => "" }
          val limit = body \ "limit" match {
            case JInt(n) => Some(n.toInt)
            case _ => None
          }
          api.queryJson(sql, limit) match {
            case Left(err) => sendError(ex, err)
            case Right(js) => sendJson(ex, 200, js)
          }
        case ("GET", "files" :: Nil) =>
          (for {
            obs <- boolParam(q, "observations")
            fc <- boolParam(q, "forecasts")
          } yield api.fileNamesJson(
            q.get("start").flatMap(parseRfc3339),
            q.get("end").flatMap(parseRfc3339), obs, fc)) match {
            case Left(err) => sendError(ex, err)
            case Right(js) => sendJson(ex, 200, js)
          }
        case ("GET", "file" :: name :: Nil) =>
          api.downloadFile(name) match {
            case Left(err) => sendError(ex, err)
            case Right(bytes) =>
              ex.getResponseHeaders.set("Content-Type", "application/parquet")
              ex.getResponseHeaders.set("Content-Disposition",
                s"""attachment; filename="$name"""")
              ex.sendResponseHeaders(200, bytes.length.toLong)
              ex.getResponseBody.write(bytes)
          }
        case ("POST", "file" :: name :: Nil) =>
          // the reference daemon posts multipart/form-data
          // (parquet_handler.rs:119-127); raw-body uploads stay accepted
          // as the simpler programmatic path
          val raw = ex.getRequestBody.readAllBytes()
          val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
          val payload =
            if (ct.toLowerCase.startsWith("multipart/form-data"))
              Multipart.filePart(ct, raw)
                .toRight(ApiError(400, "malformed multipart body"))
            else Right(raw)
          payload.flatMap(api.uploadFile(name, _)) match {
            case Left(err) => sendError(ex, err)
            case Right(()) => sendJson(ex, 200, JObject())
          }
        case ("GET", "stations" :: Nil) => sendJson(ex, 200, api.stationsJson)
        case ("GET", "stations" :: "forecasts" :: Nil) =>
          timeWindow(q) match {
            case Left(err) => sendError(ex, err)
            case Right((start, end)) =>
              sendJson(ex, 200, api.forecastsJson(start, end, stationIds(q)))
          }
        case ("GET", "stations" :: "observations" :: Nil) =>
          timeWindow(q) match {
            case Left(err) => sendError(ex, err)
            case Right((start, end)) =>
              sendJson(ex, 200, api.observationsJson(start, end, stationIds(q)))
          }
        case ("GET", "oracle" :: "npub" :: Nil) => sendJson(ex, 200, api.npubJson)
        case ("GET", "oracle" :: "pubkey" :: Nil) => sendJson(ex, 200, api.pubkeyJson)
        case ("POST", "oracle" :: "update" :: Nil) =>
          api.updateAsync(); sendJson(ex, 200, JObject())
        case ("GET", "oracle" :: "events" :: Nil) =>
          intParam(q, "limit") match {
            case Left(err) => sendError(ex, err)
            case Right(limit) => sendJson(ex, 200, api.listEvents(
              limit, q.get("event_ids").map(_.split(",").toSeq.filter(_.nonEmpty))))
          }
        case ("POST", "oracle" :: "events" :: Nil) =>
          withAuth(ex, method) { npub =>
            api.createEvent(npub, parseBody(ex)) match {
              case Left(err) => sendError(ex, err)
              case Right(js) => sendJson(ex, 200, js)
            }
          }
        case ("GET", "oracle" :: "events" :: id :: Nil) =>
          api.getEvent(id) match {
            case Left(err) => sendError(ex, err)
            case Right(js) => sendJson(ex, 200, js)
          }
        case ("POST", "oracle" :: "events" :: id :: "entry" :: Nil) =>
          withAuth(ex, method) { npub =>
            // the path id is advisory in the reference too
            // (oracle_routes.rs:145: Path(_event_id)); the body's
            // event_id is authoritative
            api.addEventEntry(npub, parseBody(ex)) match {
              case Left(err) => sendError(ex, err)
              case Right(js) => sendJson(ex, 200, js)
            }
          }
        case ("GET", "oracle" :: "events" :: id :: "entry" :: entryId :: Nil) =>
          api.getEventEntry(id, entryId) match {
            case Left(err) => sendError(ex, err)
            case Right(js) => sendJson(ex, 200, js)
          }
        case _ => sendError(ex, ApiError(404, s"no route for $method ${ex.getRequestURI.getPath}"))
      }
    } catch {
      case e: Throwable =>
        try sendError(ex, ApiError(500, "internal server error"))
        catch { case _: Throwable => () }
        org.slf4j.LoggerFactory.getLogger(classOf[ApiServer])
          .error(s"request failed: ${ex.getRequestMethod} ${ex.getRequestURI}", e)
    } finally ex.close()

  // ------------------------------------------------------------- helpers

  private def withAuth(ex: HttpExchange, method: String)(f: String => Unit): Unit = {
    // scheme is a placeholder (NostrAuth compares scheme-insensitively);
    // the query string is part of the signed URL per NIP-98
    val url = "http://" +
      Option(ex.getRequestHeaders.getFirst("Host")).getOrElse("localhost") +
      ex.getRequestURI.getPath +
      Option(ex.getRequestURI.getRawQuery).filter(_.nonEmpty).map("?" + _).getOrElse("")
    val header = Option(ex.getRequestHeaders.getFirst("Authorization"))
    NostrAuth.verify(header, method, url, authNow()) match {
      case Right(v) => f(v.npub)
      case Left(reason) if reason.startsWith("forbidden") =>
        sendError(ex, ApiError(403, reason))
      case Left(reason) => sendError(ex, ApiError(401, reason))
    }
  }

  private def timeWindow(q: Map[String, String])
      : Either[ApiError, (Option[java.sql.Timestamp], Option[java.sql.Timestamp])] = {
    def parse(key: String) = q.get(key) match {
      case None => Right(None)
      case Some(s) => parseRfc3339(s).map(Some(_))
        .toRight(ApiError(400, s"Times are not in RFC3339 format: $key=$s"))
    }
    for { s <- parse("start"); e <- parse("end") } yield (s, e)
  }

  /** Malformed query params are the CALLER's fault: parse with the
    * -Option variants and answer 400, never let a NumberFormatException
    * fall into the catch-all 500. */
  private def boolParam(q: Map[String, String], key: String)
      : Either[ApiError, Option[Boolean]] = q.get(key) match {
    case None => Right(None)
    case Some(s) => s.toBooleanOption.map(Some(_))
      .toRight(ApiError(400, s"$key must be true or false: $key=$s"))
  }

  private def intParam(q: Map[String, String], key: String)
      : Either[ApiError, Option[Int]] = q.get(key) match {
    case None => Right(None)
    case Some(s) => s.toIntOption.map(Some(_))
      .toRight(ApiError(400, s"$key must be an integer: $key=$s"))
  }

  private def stationIds(q: Map[String, String]): Seq[String] =
    q.get("station_ids").map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).map(_.split("&").toSeq
      .filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) kv -> ""
        else java.net.URLDecoder.decode(kv.take(i), "UTF-8") ->
          java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
      }.toMap).getOrElse(Map.empty)

  private def parseBody(ex: HttpExchange): JValue =
    try JsonMethods.parse(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
    catch { case _: Exception => JNothing }

  private def sendJson(ex: HttpExchange, status: Int, body: JValue): Unit = {
    val bytes = JsonMethods.compact(JsonMethods.render(body)).getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  private def sendError(ex: HttpExchange, err: ApiError): Unit =
    sendJson(ex, err.status, JObject("error" -> JString(err.message)))

  private def sendHtml(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  private val Index =
    """<!doctype html><title>graft oracle</title>
      |<h1>graft oracle API</h1>
      |<p>Routes: /files, /file/{name}, /stations, /stations/forecasts,
      |/stations/observations, /oracle/npub, /oracle/pubkey, /oracle/update,
      |/oracle/events, /oracle/events/{id},
      |/oracle/events/{id}/entry/{entry_id}</p>
      |<p>Docs: <a href="/docs">/docs</a> ·
      |<a href="/openapi.json">/openapi.json</a> ·
      |SQL console: <a href="/console">/console</a></p>
      |""".stripMargin

  /** Self-contained SQL console (the reference ships a duckdb-wasm
    * console, ui/main.js — out-of-engine per SURVEY §7.6; this page is
    * the transport-thin equivalent over `POST /query`, zero external
    * assets, with the default query mirroring main.js:52). */
  private val Console =
    """<!doctype html><html><head><meta charset="utf-8">
      |<title>graft console</title>
      |<style>body{font-family:sans-serif;max-width:60rem;margin:2rem auto}
      |textarea{width:100%;height:6rem;font-family:monospace}
      |table{border-collapse:collapse;margin-top:1rem}
      |td,th{border:1px solid #ccc;padding:.2em .5em;font-size:.9em}
      |#err{color:#b00}</style></head><body>
      |<h1>graft SQL console</h1>
      |<p>Read-only SQL over the <code>observations</code> and
      |<code>forecasts</code> views (server-enforced guard).</p>
      |<textarea id="q">SELECT station_id, generated_at FROM forecasts
      |ORDER BY station_id, generated_at DESC LIMIT 200</textarea><br>
      |<button onclick="run()">Run</button> <span id="err"></span>
      |<div id="out"></div>
      |<script>
      |async function run(){
      |  const err=document.getElementById('err'),out=document.getElementById('out');
      |  err.textContent='';out.innerHTML='';
      |  const rsp=await fetch('/query',{method:'POST',
      |    headers:{'Content-Type':'application/json'},
      |    body:JSON.stringify({sql:document.getElementById('q').value})});
      |  const js=await rsp.json();
      |  if(!rsp.ok){err.textContent=js.error||('HTTP '+rsp.status);return;}
      |  const esc=s=>String(s).replace(/[&<>]/g,c=>({'&':'&amp;','<':'&lt;','>':'&gt;'}[c]));
      |  let h='<table><tr>'+js.columns.map(c=>'<th>'+esc(c)+'</th>').join('')+'</tr>';
      |  for(const r of js.rows)
      |    h+='<tr>'+r.map(v=>'<td>'+(v===null?'∅':esc(typeof v==='object'?JSON.stringify(v):v))+'</td>').join('')+'</tr>';
      |  out.innerHTML=h+'</table>';
      |}
      |</script></body></html>
      |""".stripMargin
}
