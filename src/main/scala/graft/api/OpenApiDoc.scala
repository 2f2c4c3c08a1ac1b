package graft.api

import org.json4s._

/** OpenAPI description of the API surface, mirroring the reference's
  * generated doc (crates/oracle/src/startup.rs:41-74 declares the utoipa
  * `ApiDoc` over the same fourteen routes; startup.rs:135 merges a Scalar
  * UI at `/docs`). The reference derives the document from code
  * annotations; here the route table IS the data and both artifacts —
  * `/openapi.json` and the `/docs` page — render from it, so they cannot
  * drift from each other. The docs page is server-rendered static HTML
  * (this environment has zero egress, so no CDN-loaded viewer; the
  * reference's Scalar bundle plays that role out-of-engine).
  */
object OpenApiDoc {

  /** (method, path, tag, summary, query params, has NIP-98 auth). */
  private final case class Route(
      method: String, path: String, tag: String, summary: String,
      params: Seq[(String, String)] = Nil, auth: Boolean = false)

  // Route-for-route with startup.rs's `paths(...)` block.
  private val routes = Seq(
    Route("get", "/oracle/npub", "oracle", "oracle nostr npub (bech32)"),
    Route("get", "/oracle/pubkey", "oracle",
      "oracle compressed pubkey (base64)"),
    Route("get", "/oracle/events", "oracle", "event summaries",
      Seq("limit" -> "max rows, default 100", "event_ids" -> "comma list")),
    Route("post", "/oracle/events", "oracle", "create oracle event",
      auth = true),
    Route("get", "/oracle/events/{event_id}", "oracle", "full event"),
    Route("post", "/oracle/events/{event_id}/entry", "oracle",
      "add event entry", auth = true),
    Route("get", "/oracle/events/{event_id}/entry/{entry_id}", "oracle",
      "one event entry"),
    Route("post", "/oracle/update", "oracle", "kick off the ETL pass"),
    Route("get", "/stations/forecasts", "stations", "forecasts in range",
      Seq("start" -> "RFC-3339", "end" -> "RFC-3339",
        "station_ids" -> "comma list")),
    Route("get", "/stations/observations", "stations",
      "observations in range",
      Seq("start" -> "RFC-3339", "end" -> "RFC-3339",
        "station_ids" -> "comma list")),
    Route("get", "/stations", "stations", "stations seen recently"),
    Route("get", "/file/{name}", "files", "snapshot download"),
    Route("get", "/files", "files", "file name listing"),
    Route("post", "/file/{name}", "files", "snapshot upload"),
    // Server-side form of the reference's client-side duckdb-wasm
    // console (ui/main.js:112-141) — not in the reference's OpenAPI doc
    // because there it is not an HTTP route.
    Route("post", "/query", "console",
      "read-only ad-hoc SQL over observations/forecasts views " +
        "(body: {sql, limit?}; guard rejects non-SELECT)")
  )

  /** OpenAPI 3.0.3 document (json4s AST, encoded by the server). */
  lazy val json: JObject = {
    val paths: Seq[(String, JValue)] = routes.groupBy(_.path).toSeq
      .sortBy(_._1)
      .map { case (path, rs) =>
        path -> JObject(rs.sortBy(_.method).map { r =>
          val pathParams = "\\{([a-z_]+)\\}".r
            .findAllMatchIn(r.path).map(_.group(1)).toSeq
            .map(n => JObject(
              "name" -> JString(n), "in" -> JString("path"),
              "required" -> JBool(true),
              "schema" -> JObject("type" -> JString("string"))))
          val queryParams = r.params.map { case (n, desc) =>
            JObject("name" -> JString(n), "in" -> JString("query"),
              "required" -> JBool(false), "description" -> JString(desc),
              "schema" -> JObject("type" -> JString("string")))
          }
          val sec: Seq[(String, JValue)] =
            if (r.auth) Seq("security" ->
              JArray(List(JObject("nip98" -> JArray(Nil)))))
            else Nil
          r.method -> JObject(Seq[(String, JValue)](
            "tags" -> JArray(List(JString(r.tag))),
            "summary" -> JString(r.summary),
            "parameters" -> JArray((pathParams ++ queryParams).toList),
            "responses" -> JObject(
              "200" -> JObject("description" -> JString("success")),
              "4XX" -> JObject("description" -> JString(
                """{"error": …} — 400 bad params, 401/403 auth, 404 missing""")))
          ) ++ sec: _*)
        }: _*)
      }
    JObject(
      "openapi" -> JString("3.0.3"),
      "info" -> JObject(
        "title" -> JString("noaa data oracle api"),
        "description" -> JString(
          "a RESTful api that acts as an oracle for NOAA forecast and " +
            "observation data"),
        "version" -> JString("1.0.0")),
      "paths" -> JObject(paths: _*),
      "components" -> JObject("securitySchemes" -> JObject(
        "nip98" -> JObject(
          "type" -> JString("http"), "scheme" -> JString("nostr"),
          "description" -> JString(
            "NIP-98 HTTP auth: signed nostr event in the Authorization " +
              "header; url tag must include the query string")))))
  }

  /** The `/docs` page: same route table, human-ordered, zero JS. */
  lazy val html: String = {
    val byTag = routes.groupBy(_.tag).toSeq.sortBy(_._1)
    val sections = byTag.map { case (tag, rs) =>
      val items = rs.map { r =>
        val qs =
          if (r.params.isEmpty) ""
          else r.params.map(_._1).mkString("?", "&amp;", "")
        val badge = if (r.auth) " <em>[NIP-98]</em>" else ""
        s"<li><code>${r.method.toUpperCase} ${r.path}$qs</code>$badge — ${r.summary}</li>"
      }.mkString("\n")
      s"<h2>$tag</h2>\n<ul>\n$items\n</ul>"
    }.mkString("\n")
    s"""<!doctype html><html><head><meta charset="utf-8">
       |<title>noaa data oracle api — docs</title>
       |<style>body{font-family:sans-serif;max-width:48rem;margin:2rem auto}
       |code{background:#f0f0f0;padding:0 .3em}</style></head><body>
       |<h1>noaa data oracle api</h1>
       |<p>Machine-readable spec: <a href="/openapi.json">/openapi.json</a>
       |(OpenAPI 3.0.3).</p>
       |$sections
       |</body></html>
       |""".stripMargin
  }
}
