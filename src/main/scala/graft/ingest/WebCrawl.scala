package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC-style crawl-record framing + URL hygiene — the two front-door
  * steps a real 100 TB web pipeline runs BEFORE [[HtmlExtract]]'s
  * HTML→text stage: split a concatenated crawl stream into records,
  * parse the record envelope (target URI, content length, HTTP status),
  * then normalize and filter the URLs (tracking-param strip, default
  * ports, blocklists, path-depth caps — the C4/RefinedWeb recipe, both
  * public). Together with t21 this closes the crawl → `documents` path
  * end-to-end: WARC → record → HTML → main text → quality/dedup.
  *
  * Mirrors the reference's ingest posture (pure decode functions over
  * hostile payloads, `xml_observation.rs:5-87`'s decode-then-null-drop):
  * nothing here throws on malformed input. A torn record yields empty
  * extracts (`regexp_extract`'s miss value), a Content-Length that
  * disagrees with the framed payload is SURFACED as `len_ok = false`
  * rather than trusted, and junk between records stays confined to its
  * own split piece.
  *
  * Scale shape: record SPLIT + envelope PARSE are pure per-row column
  * expressions — at 100 TB they ride the scan of the crawl files (one
  * file = one row of `blob`, or newline-delimited segments under
  * `spark.sql.files.maxPartitionBytes`); nothing shuffles until the
  * later dedup/cap stages key on content. The blob ASSEMBLY side
  * (groupBy + ordered array_join) exists only to synthesize a
  * deterministic fixture corpus from `documents` so the DuckDB oracle
  * can replay the exact bytes — production never assembles blobs, it
  * reads them.
  */
object WebCrawl {

  // ---------------------------------------------------------------- WARC

  /** CRLF as the engines see it. Scala-side strings carry the real
    * control characters (no SQL-literal layer: these columns are built
    * with `lit`/`concat`, never `expr`, exactly to dodge the
    * HtmlExtract.WsSql double-unescape trap). The oracle side builds the
    * same bytes with `chr(13)||chr(10)`. */
  private val Crlf = "\r\n"

  /** DuckDB expression for one CRLF (non-E literals keep backslashes as
    * text, so `'\r\n'` would be four characters — build it from chr). */
  private val NlSql = "(chr(13)||chr(10))"

  /** Constant HTTP response prefix: status line + one header + the blank
    * line that ends the header block. `Content-Length` counts the whole
    * HTTP block (this prefix + the HTML payload), in characters — the
    * synth contract both engines recompute. */
  private val HttpPrefix = s"HTTP/1.1 200 OK${Crlf}Content-Type: text/html$Crlf$Crlf"

  private val HttpPrefixSql =
    s"('HTTP/1.1 200 OK'||$NlSql||'Content-Type: text/html'||$NlSql||$NlSql)"

  /** One WARC response record for (url, html): version line, three
    * envelope headers, blank line, HTTP block, blank line terminator. */
  def record(url: Column, html: Column): Column = {
    val http = concat(lit(HttpPrefix), html)
    concat(
      lit(s"WARC/1.0${Crlf}WARC-Type: response${Crlf}WARC-Target-URI: "), url,
      lit(s"${Crlf}Content-Length: "), length(http),
      lit(s"$Crlf$Crlf"), http, lit(s"$Crlf$Crlf"))
  }

  /** Deterministic fixture crawl: one blob per 10 documents, records
    * concatenated in doc_id order (sort_array over (doc_id, rec) structs
    * — collect_list alone is partition-order nondeterministic, which
    * would torpedo the byte-exact oracle replay). */
  def synthWarc(docs: DataFrame): DataFrame =
    docs
      .select(floor(col("doc_id") / lit(10)).cast("long").as("file_id"),
        struct(col("doc_id"),
          record(synthUrl(col("doc_id")),
            HtmlExtract.synthHtml(col("doc_id"), col("text"))).as("rec")).as("r"))
      .groupBy("file_id")
      .agg(array_join(transform(sort_array(collect_list(col("r"))),
        x => x.getField("rec")), "").as("blob"))

  /** Split a crawl blob into records and parse each envelope.
    * Input: `(file_id, blob)`. Output one row per record:
    * `(file_id, rec_idx, uri, status, clen, len_ok, html)`.
    *
    * `rec_idx` is the record's 1-based position in its blob (piece 0 of
    * the split is the empty prefix before the first version line — a
    * blob that starts mid-record, e.g. a resumed range request, parks
    * its torn head there instead of corrupting record 1). Every field
    * extract degrades to ''/null on torn input; `len_ok` cross-checks
    * the envelope's Content-Length against the framed payload so a
    * truncated transfer is detectable downstream without trusting
    * either side. */
  private def intOrNull(c: Column): Column =
    when(c === "", lit(null).cast("int")).otherwise(c.cast("int"))

  def parseRecords(blobs: DataFrame): DataFrame = {
    val piece = col("piece")
    blobs
      .select(col("file_id"),
        posexplode(split(col("blob"), s"WARC/1\\.0$Crlf")).as(Seq("rec_idx", "piece")))
      .where(col("rec_idx") >= 1)
      .select(
        col("file_id"),
        col("rec_idx").cast("int").as("rec_idx"),
        regexp_extract(piece, "WARC-Target-URI: ([^\r\n]+)", 1).as("uri"),
        // regexp_extract misses as '' — null it out BEFORE the cast
        // (ANSI mode: cast('' AS INT) throws; a torn envelope must
        // degrade, never error)
        intOrNull(regexp_extract(piece, "HTTP/1\\.1 ([0-9]{3})", 1)).as("status"),
        intOrNull(regexp_extract(piece, "Content-Length: ([0-9]+)", 1)).as("clen"),
        // first blank line ends the WARC envelope, second ends the HTTP
        // headers; payload runs to the record's trailing blank line
        regexp_extract(piece, "(?s)^.*?\r\n\r\n.*?\r\n\r\n(.*)\r\n\r\n$", 1).as("html"))
      .withColumn("len_ok",
        col("clen") === (length(col("html")) + lit(HttpPrefix.length)))
      .select("file_id", "rec_idx", "uri", "status", "clen", "len_ok", "html")
  }

  /** t22 gate frame: fixture crawl → split → parse → envelope summary
    * (payload carried as md5 + length so the gate row stays narrow). */
  def warcParse(docs: DataFrame): DataFrame =
    parseRecords(synthWarc(docs))
      .select(col("file_id"), col("rec_idx"), col("uri"), col("status"),
        col("clen"), col("len_ok"),
        length(col("html")).cast("int").as("n_chars"),
        md5(col("html")).as("html_md5"))
      .orderBy("file_id", "rec_idx")

  // ----------------------------------------------------------------- URL

  /** Five deterministic URL shapes per doc, chosen so every
    * normalization rule and both filter rules fire inside the gate
    * corpus itself: uppercase scheme/host + default port + fragment +
    * tracking params (0), trailing slash + ref/utm mix (1), blocklisted
    * domain (2), duplicate slashes + deep path (3), NON-default port
    * that must survive (4). */
  def synthUrl(docId: Column): Column = {
    val m = (docId % 5).cast("int")
    when(m === 0, concat(lit("HTTPS://WWW.Example.COM:443/shop/page-"), docId,
        lit("?utm_source=x&id="), docId, lit("#frag")))
      .when(m === 1, concat(lit("http://blog.example.com/posts/"), docId,
        lit("/?ref=tw&utm_campaign=y&page=2")))
      .when(m === 2, concat(lit("https://spam-casino.biz/win/"), docId, lit("?q=1")))
      .when(m === 3, concat(lit("http://example.com//a//deep/path/x/y/z/"), docId))
      .otherwise(concat(lit("https://docs.example.com:80/guide/"), docId))
  }

  /** Domains excluded from the corpus (the C4 blocklist posture). At
    * scale this is a broadcast dimension; the rule here keys on the
    * registered domain so subdomain evasion ("a.spam-casino.biz") is
    * covered by construction. */
  val Blocklist: Seq[String] = Seq("spam-casino.biz")

  /** Max path segments / max normalized-url length (RefinedWeb-style
    * hygiene caps — deep auto-generated paths and mile-long URLs are
    * crawler-trap signals). */
  val MaxDepth = 6
  val MaxLen = 120

  /** Add `url_norm, domain, reg_domain, path_depth, keep` to a frame
    * holding `urlCol`. Pure per-row column expressions (the blocklist is
    * a literal IN over the broadcast-dimension contents — swap for a
    * broadcast join when the list outgrows a literal): normalization
    * shuffles nothing and rides the scan at 100 TB.
    *
    * Rules (each pinned by a synth variant and by UrlNormSpec):
    * scheme/host lowercased; default port stripped (https:443, http:80 —
    * a NON-default port survives); leading `www.` dropped; fragment
    * dropped; `utm_*` and `ref` query params dropped, the rest kept in
    * original order; duplicate slashes collapsed; trailing slash
    * stripped except at root; empty query drops its '?'. */
  def withUrlNorm(df: DataFrame, urlCol: String): DataFrame = {
    val url = col(urlCol)
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val hostport0 = lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?#]*)", 1))
    val path0 = regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]*([^?#]*)", 1)
    val query0 = regexp_extract(noFrag, "[?]([^#]*)", 1)

    df.withColumn("__scheme", scheme)
      .withColumn("__hp0", hostport0)
      .withColumn("__hp",
        when(col("__scheme") === "https" && col("__hp0").endsWith(":443"),
          col("__hp0").substr(lit(1), length(col("__hp0")) - 4))
          .when(col("__scheme") === "http" && col("__hp0").endsWith(":80"),
            col("__hp0").substr(lit(1), length(col("__hp0")) - 3))
          .otherwise(col("__hp0")))
      .withColumn("__hp2",
        when(col("__hp").startsWith("www."), expr("substring(__hp, 5)"))
          .otherwise(col("__hp")))
      .withColumn("__path1",
        regexp_replace(when(path0 === "", "/").otherwise(path0), "/{2,}", "/"))
      .withColumn("__path2",
        when(col("__path1") =!= "/" && col("__path1").endsWith("/"),
          col("__path1").substr(lit(1), length(col("__path1")) - 1))
          .otherwise(col("__path1")))
      .withColumn("__q1",
        array_join(filter(split(query0, "&"),
          p => p =!= "" && !p.startsWith("utm_") && !p.startsWith("ref=")), "&"))
      .withColumn("url_norm",
        concat(col("__scheme"), lit("://"), col("__hp2"), col("__path2"),
          when(col("__q1") =!= "", concat(lit("?"), col("__q1"))).otherwise(lit(""))))
      .withColumn("domain", regexp_extract(col("__hp2"), "^([^:]*)", 1))
      .withColumn("reg_domain", regexp_extract(col("domain"), "([^.]+[.][^.]+)$", 1))
      .withColumn("path_depth",
        size(filter(split(col("__path2"), "/"), x => x =!= "")).cast("int"))
      .withColumn("keep",
        !col("reg_domain").isin(Blocklist: _*) &&
          col("path_depth") <= MaxDepth && length(col("url_norm")) <= MaxLen)
      .drop("__scheme", "__hp0", "__hp", "__hp2", "__path1", "__path2", "__q1")
  }

  /** t23 gate frame over the synth URL universe. */
  def urlNormalize(docs: DataFrame): DataFrame =
    withUrlNorm(docs.select(col("doc_id"), synthUrl(col("doc_id")).as("url")), "url")
      .select("doc_id", "url_norm", "domain", "reg_domain", "path_depth", "keep")
      .orderBy("doc_id")

  // ------------------------------------------------------------- oracles

  /** DuckDB CTE body rebuilding [[synthUrl]] over `src(doc_id)`. */
  def duckUrls(src: String): String =
    s"""SELECT doc_id,
        CASE CAST(doc_id % 5 AS INT)
          WHEN 0 THEN 'HTTPS://WWW.Example.COM:443/shop/page-' || doc_id ||
                      '?utm_source=x&id=' || doc_id || '#frag'
          WHEN 1 THEN 'http://blog.example.com/posts/' || doc_id ||
                      '/?ref=tw&utm_campaign=y&page=2'
          WHEN 2 THEN 'https://spam-casino.biz/win/' || doc_id || '?q=1'
          WHEN 3 THEN 'http://example.com//a//deep/path/x/y/z/' || doc_id
          ELSE 'https://docs.example.com:80/guide/' || doc_id
        END AS url
      FROM $src"""

  /** DuckDB replay of [[withUrlNorm]] over `src(doc_id-or-any-key, url)`
    * — same regexes (RE2), same CASE rules, same integer filters. Emits
    * `keyCols, url_norm, domain, reg_domain, path_depth, keep`. */
  def duckUrlNorm(src: String, keyCols: String): String =
    s"""SELECT $keyCols, url_norm, domain,
        regexp_extract(domain, '([^.]+[.][^.]+)$$', 1) AS reg_domain,
        path_depth,
        regexp_extract(domain, '([^.]+[.][^.]+)$$', 1) NOT IN ('spam-casino.biz')
          AND path_depth <= $MaxDepth AND len(url_norm) <= $MaxLen AS keep
      FROM (
        SELECT $keyCols,
          scheme || '://' || hp2 || path2 ||
            CASE WHEN q1 <> '' THEN '?' || q1 ELSE '' END AS url_norm,
          regexp_extract(hp2, '^([^:]*)', 1) AS domain,
          CAST(len(list_filter(string_split(path2, '/'), x -> x <> '')) AS INT) AS path_depth
        FROM (
          SELECT $keyCols, scheme,
            CASE WHEN hp LIKE 'www.%' THEN substr(hp, 5) ELSE hp END AS hp2,
            CASE WHEN path1 <> '/' AND path1 LIKE '%/'
                 THEN substr(path1, 1, len(path1) - 1) ELSE path1 END AS path2,
            q1
          FROM (
            SELECT $keyCols, scheme,
              CASE WHEN scheme = 'https' AND hostport LIKE '%:443'
                     THEN substr(hostport, 1, len(hostport) - 4)
                   WHEN scheme = 'http' AND hostport LIKE '%:80'
                     THEN substr(hostport, 1, len(hostport) - 3)
                   ELSE hostport END AS hp,
              regexp_replace(CASE WHEN path0 = '' THEN '/' ELSE path0 END,
                '/{2,}', '/', 'g') AS path1,
              array_to_string(list_filter(string_split(query0, '&'),
                p -> p <> '' AND NOT (p LIKE 'utm_%' OR p LIKE 'ref=%')), '&') AS q1
            FROM (
              SELECT $keyCols,
                lower(regexp_extract(nofrag, '^([A-Za-z]+)://', 1)) AS scheme,
                lower(regexp_extract(nofrag, '^[A-Za-z]+://([^/?#]*)', 1)) AS hostport,
                regexp_extract(nofrag, '^[A-Za-z]+://[^/?#]*([^?#]*)', 1) AS path0,
                regexp_extract(nofrag, '[?]([^#]*)', 1) AS query0
              FROM (SELECT $keyCols, regexp_replace(url, '#.*$$', '') AS nofrag
                    FROM $src)))))"""

  /** DuckDB CTE chain rebuilding the fixture crawl and its parse over
    * CTEs `pages(doc_id, html)` + `urls(doc_id, url)`: emits
    * `parsed(file_id, rec_idx, uri, status, clen, html)`. Shared by the
    * t22 oracle and the p3 composition oracle. */
  def duckWarcCtes: String =
    s"""recs AS (
        SELECT p.doc_id // 10 AS file_id, p.doc_id,
          'WARC/1.0' || $NlSql || 'WARC-Type: response' || $NlSql ||
          'WARC-Target-URI: ' || u.url || $NlSql ||
          'Content-Length: ' || len($HttpPrefixSql || p.html) || $NlSql || $NlSql ||
          $HttpPrefixSql || p.html || $NlSql || $NlSql AS rec
        FROM pages p JOIN urls u USING (doc_id)),
      blobs AS (
        SELECT file_id, string_agg(rec, '' ORDER BY doc_id) AS blob
        FROM recs GROUP BY file_id),
      pieces AS (
        SELECT file_id, unnest(range(2, len(l) + 1)) AS i, l
        FROM (SELECT file_id, string_split(blob, 'WARC/1.0' || $NlSql) AS l
              FROM blobs)),
      parsed AS (
        SELECT file_id, CAST(i - 1 AS INT) AS rec_idx,
          regexp_extract(l[i], 'WARC-Target-URI: ([^\\r\\n]+)', 1) AS uri,
          CAST(regexp_extract(l[i], 'HTTP/1\\.1 ([0-9]{3})', 1) AS INT) AS status,
          CAST(regexp_extract(l[i], 'Content-Length: ([0-9]+)', 1) AS INT) AS clen,
          regexp_extract(l[i],
            '(?s)^.*?\\r\\n\\r\\n.*?\\r\\n\\r\\n(.*)\\r\\n\\r\\n$$', 1) AS html
        FROM pieces)"""

  /** DuckDB expression for the constant HTTP-prefix length (the
    * Content-Length cross-check's fixed term). */
  def duckHttpPrefixLen: String = s"len($HttpPrefixSql)"

  /** t22 oracle: fixture crawl replay + envelope summary. */
  def warcOracleSql(pagesCte: String): String =
    s"""WITH pages AS ($pagesCte),
      urls AS (${duckUrls("documents")}),
      $duckWarcCtes
      SELECT file_id, rec_idx, uri, status, clen,
        clen = len(html) + len($HttpPrefixSql) AS len_ok,
        CAST(len(html) AS INT) AS n_chars, md5(html) AS html_md5
      FROM parsed ORDER BY file_id, rec_idx"""

  /** t23 oracle: url synth + normalization replay. */
  def urlOracleSql: String =
    s"""WITH urls AS (${duckUrls("documents")})
      SELECT doc_id, url_norm, domain, reg_domain, path_depth, keep
      FROM (${duckUrlNorm("urls", "doc_id")}) ORDER BY doc_id"""
}
