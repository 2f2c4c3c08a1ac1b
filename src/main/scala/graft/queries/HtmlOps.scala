package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ingest.{HtmlExtract, WebCrawl}

/** Gate registration for the raw-web ingest front door: HTML→text
  * ([[graft.ingest.HtmlExtract]]), WARC record framing + URL hygiene
  * ([[graft.ingest.WebCrawl]]), the per-domain diversity cap, and the
  * composed crawl→documents pipeline. */
object HtmlOps {

  /** Per-domain keep cap (C4/RefinedWeb-style domain balancing): a
    * handful of boilerplate-heavy domains otherwise dominate a crawl
    * corpus. Rank within domain by (quality desc, id) — both bit-exact
    * cross-engine — keep the top [[DomainCap]]. */
  val DomainCap = 20

  /** p3 quality floor + minimum token count (values chosen against the
    * synth corpus's measured quality distribution so the gate exercises
    * BOTH branches — a threshold no row crosses pins nothing). */
  val QualityFloor = 0.66
  val MinTokens = 5

  /** DuckDB t2-quality CTE body over `src(key, n_chars, text)` — the
    * exact operand order of [[TextOps.qualityScores]] so the double is
    * bit-identical (proven by the t2 gate since round 3). */
  private def duckQuality(src: String, key: String): String =
    s"""SELECT $key,
        CAST(len(t) AS INT) AS n_tokens,
        0.4 * (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)) +
        0.3 * (1.0 - CAST(len(list_filter(t, x -> x IN ('the','a','and','of'))) AS DOUBLE)
                 / CAST(len(t) AS DOUBLE)) +
        0.3 * least(1.0, (CAST(n_chars AS DOUBLE) / CAST(len(t) AS DOUBLE)) / 10.0) AS quality
      FROM (SELECT $key, n_chars, string_split(lower(text), ' ') AS t FROM $src)"""

  /** Spark twin of [[duckQuality]]: adds `n_tokens` + `quality` from
    * `textCol`/`nCharsCol` (same operand order as
    * [[TextOps.qualityScores]]). */
  private def withQuality(df: org.apache.spark.sql.DataFrame,
      textCol: String, nCharsCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("__t", split(lower(col(textCol)), " "))
      .withColumn("n_tokens", size(col("__t")).cast("int"))
      .withColumn("quality",
        lit(0.4) * (size(array_distinct(col("__t"))).cast("double") /
            col("n_tokens").cast("double")) +
          lit(0.3) * (lit(1.0) -
            size(filter(col("__t"), t => t.isin("the", "a", "and", "of"))).cast("double") /
              col("n_tokens").cast("double")) +
          lit(0.3) * least(lit(1.0),
            (col(nCharsCol).cast("double") / col("n_tokens").cast("double")) / lit(10.0)))
      .drop("__t")

  /** t1's language/topic guess from a token array column. */
  private def withGuess(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.withColumn("__t", split(lower(col(textCol)), " "))
      .withColumn("__s_art",
        size(filter(col("__t"), t => t.isin("the", "a"))).cast("int"))
      .withColumn("__s_tech",
        size(filter(col("__t"), t => t.isin("spark", "vector", "hash"))).cast("int"))
      .withColumn("__s_db",
        size(filter(col("__t"), t => t.isin("table", "query", "join"))).cast("int"))
      .withColumn("guess",
        when(col("__s_art") >= col("__s_tech") && col("__s_art") >= col("__s_db"), "article")
          .when(col("__s_tech") >= col("__s_db"), "tech").otherwise("db"))
      .drop("__t", "__s_art", "__s_tech", "__s_db")

  private val duckGuess =
    """CASE WHEN len(list_filter(t, x -> x IN ('the','a'))) >= len(list_filter(t, x -> x IN ('spark','vector','hash')))
            AND len(list_filter(t, x -> x IN ('the','a'))) >= len(list_filter(t, x -> x IN ('table','query','join')))
       THEN 'article'
       WHEN len(list_filter(t, x -> x IN ('spark','vector','hash'))) >= len(list_filter(t, x -> x IN ('table','query','join')))
       THEN 'tech' ELSE 'db' END"""

  /** The pipeline's stateless middle, shared by batch p3 and the
    * streaming ingest ([[graft.streaming.WebStream]]): extracted
    * `(uri, main_text)` → url-kept, quality-floored, scored rows. Pure
    * per-row column work — safe inside a streaming micro-batch. */
  def scoreExtracted(extracted: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val flagged = WebCrawl.withUrlNorm(extracted, "uri")
    val scored = withGuess(
      withQuality(
        flagged.where(col("keep"))
          .withColumn("n_chars", length(col("main_text")).cast("int")),
        "main_text", "n_chars"),
      "main_text")
    scored
      .where(col("n_tokens") >= MinTokens && col("quality") >= QualityFloor)
      .withColumn("text_md5", md5(col("main_text")))
      .select("uri", "domain", "guess", "n_tokens", "n_chars", "quality", "text_md5")
  }

  /** The pipeline's stateful tail — exact dedup (min-URI keeper per
    * content digest) then the per-domain cap. Batch-only on purpose:
    * both decisions are displaceable by any later arrival, so the
    * streaming half stores scored rows and this tail recomputes the
    * final corpus exactly (the reference's ingest-then-collapse
    * posture, oracle.rs:314-389). */
  def dedupCapTail(scored: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    scored
      .withColumn("__dr", row_number().over(
        Window.partitionBy("text_md5").orderBy("uri")))
      .where(col("__dr") === 1)
      .withColumn("rn", row_number().over(
        Window.partitionBy("domain")
          .orderBy(col("quality").desc, col("uri"))))
      .where(col("rn") <= DomainCap)
      .select("uri", "domain", "guess", "n_tokens", "n_chars", "text_md5")
      .orderBy("uri")

  val all: Seq[Q] = Seq(

    // t21 — HTML → text extraction over deterministic synth pages
    // (title/style/script chrome + pure-link nav + the doc's text as
    // the content block + link-heavy footer; every 7th page carries an
    // UNTERMINATED script opener so the torn-markup clamp is pinned by
    // the gate corpus itself, not just the poison spec). The oracle
    // replays synth + extraction with the same RE2-safe patterns and
    // the same integer link-density rule (3·linkLen < visLen), so a
    // drift in tag stripping, whitespace collapse, block scoring, or
    // the clamp direction hash-mismatches. Scale shape: the whole
    // extraction is a codegen'd per-row map over the scan — no
    // shuffle, no UDF; at 100 TB it rides the read stage of the crawl.
    Q("t21_html_extract",
      (s, d) => graft.ingest.HtmlExtract.extract(
        graft.ingest.HtmlExtract.synthPages(Tables.documentsSpread(s, d))),
      Some(graft.ingest.HtmlExtract.oracleSql)),

    // t22 — WARC record framing: fixture crawl blobs (10 records each,
    // byte-deterministic) split on the version line and each envelope
    // parsed (target URI, HTTP status, Content-Length cross-checked
    // against the framed payload as len_ok). The step BEFORE t21 in a
    // real crawl pipeline. Scale shape: split + parse are per-row
    // column expressions riding the blob scan — only the fixture
    // ASSEMBLY (groupBy + ordered join) shuffles, and that exists so
    // the oracle can replay the exact bytes; production reads blobs.
    Q("t22_warc_parse",
      (s, d) => WebCrawl.warcParse(Tables.documentsSpread(s, d)),
      Some(WebCrawl.warcOracleSql(HtmlExtract.duckPages("documents")))),

    // t23 — URL normalization + hygiene filters (C4/RefinedWeb recipe):
    // scheme/host lowercase, default-port + www. + fragment strip,
    // utm_*/ref param removal preserving the rest in order, duplicate
    // slash collapse, trailing-slash strip; keep = not blocklisted AND
    // path depth ≤ 6 AND url ≤ 120 chars. Every rule fires inside the
    // synth universe (five URL shapes incl. a NON-default port that
    // must survive). Pure per-row map — no shuffle at any scale.
    Q("t23_url_normalize",
      (s, d) => WebCrawl.urlNormalize(Tables.documents(s, d)),
      Some(WebCrawl.urlOracleSql)),

    // t24 — per-domain diversity cap: rank url-kept docs within their
    // domain by (quality desc, doc_id) and keep the top 20 — the
    // domain-balancing pass that stops boilerplate-heavy hosts from
    // dominating a crawl corpus. One partitioned window (shuffle keyed
    // on domain; a hot domain is exactly what the cap bounds — each
    // partition's output is ≤ cap after the rank).
    Q("t24_domain_cap",
      (s, d) => {
        // url columns AND quality derive from the same documents row —
        // one scan, no self-join (a doc_id equi-join of the table with
        // itself would pay a gratuitous shuffle per side at any scale)
        val urls = WebCrawl.withUrlNorm(
          TextOps.qualityScores(Tables.documents(s, d))
            .select(col("doc_id"), col("quality"),
              WebCrawl.synthUrl(col("doc_id")).as("url")),
          "url").where(col("keep"))
        urls
          .withColumn("rn", row_number().over(
            Window.partitionBy("domain")
              .orderBy(col("quality").desc, col("doc_id"))).cast("int"))
          .select(col("doc_id"), col("domain"), col("quality"), col("rn"),
            (col("rn") <= DomainCap).as("kept"))
          .orderBy("doc_id")
      },
      Some(s"""WITH urls AS (${WebCrawl.duckUrls("documents")}),
          norm AS (${WebCrawl.duckUrlNorm("urls", "doc_id")}),
          q AS (${duckQuality("documents", "doc_id")}),
          ranked AS (
            SELECT n.doc_id, n.domain, q.quality,
              CAST(row_number() OVER (
                PARTITION BY n.domain ORDER BY q.quality DESC, n.doc_id) AS INT) AS rn
            FROM norm n JOIN q USING (doc_id) WHERE n.keep)
        SELECT doc_id, domain, quality, rn, rn <= $DomainCap AS kept
        FROM ranked ORDER BY doc_id""")),

    // p3 — the composed crawl → documents pipeline, keyed on the crawl
    // URI end-to-end (doc_id never leaks past the fixture): WARC split/
    // parse (t22) → envelope sanity (status 200, Content-Length check)
    // → HTML main-text extraction (t21) → URL normalize + hygiene keep
    // (t23) → quality + topic guess (t1/t2 formulas on the EXTRACTED
    // text) → quality floor → exact dedup (min-URI keeper per text md5)
    // → per-domain cap (t24). Three shuffles total after the fixture:
    // dedup window on text_md5, cap window on domain, final sort —
    // every earlier stage is a per-row map riding the blob scan.
    Q("p3_web_e2e",
      (s, d) => {
        val parsed = WebCrawl.parseRecords(WebCrawl.synthWarc(
            Tables.documentsSpread(s, d)))
          .where(col("status") === 200 && col("len_ok"))
        val extracted = HtmlExtract.withMainText(parsed, "html")
          .select(col("uri"), col("main_text"))
        dedupCapTail(scoreExtracted(extracted))
      },
      Some(p3OracleSql)),

    // p3b — the same pipeline with the crawl arriving as a STREAM: the
    // WARC blobs land across three micro-batches, each batch runs the
    // stateless front half (split → sanity → extract → url hygiene →
    // quality floor) into a checkpointed exactly-once parquet store,
    // and the stateful tail (dedup keeper, domain cap) runs batch over
    // the accumulated store — so the final corpus is hash-identical to
    // batch p3 and the ONE flat oracle pins both. §2.8's crawl member.
    Q("p3b_web_stream",
      (s, d) => {
        val tag = d.replaceAll("[^A-Za-z0-9]", "_")
        val root = new java.io.File(sys.props("java.io.tmpdir"),
          s"graft_web_p3b/$tag/${graft.Sessions.sessionTag(s)}").getAbsolutePath
        val marker = s"graft_p3b_marker_$tag"
        if (!s.catalog.tableExists(marker)) {
          val landing = s"$root/landing"
          val blobs = WebCrawl.synthWarc(Tables.documentsSpread(s, d))
          (0 until 3).foreach { i =>
            blobs.where(col("file_id") % 3 === i).coalesce(1)
              .write.mode("append").parquet(landing)
          }
          val q = graft.streaming.WebStream.crawlIngest(
            s, landing, s"$root/store", s"$root/ckpt", maxFilesPerTrigger = 1)
          try q.processAllAvailable() finally q.stop()
          s.emptyDataFrame.createOrReplaceTempView(marker)
        }
        dedupCapTail(s.read.parquet(s"$root/store"))
      },
      Some(p3OracleSql)),

    // t27 — robots.txt parsing (RFC 9309 group structure): directive
    // lines with comment stripping, UA-group numbering via one line
    // window, agent flags per group, and the group-selection verdict
    // (agent-specific groups override `*`). The fixture files plant
    // every edge the parser claims — junk lines, orphan rules before
    // any group, empty Disallow, multi-UA groups, crawl-delay. Parse is
    // per-robots-file column work over one row per HOST: at 100 TB this
    // frame is the broadcast dimension, never the fact side.
    Q("t27_robots_parse",
      (s, _) => graft.ingest.Robots.parseGate(s),
      Some(graft.ingest.Robots.parseOracleSql)),

    // t28 — the per-URL crawl-permission decision over the t23 synth
    // universe: effective rules broadcast-joined on host, prefix match
    // in the join condition (a URL matching no rule survives as
    // allowed), longest-path rule wins with Allow beating Disallow on
    // ties, composed with the hygiene verdict as fetch_ok. The only
    // shuffle is the per-URL pick window.
    Q("t28_robots_filter",
      (s, d) => graft.ingest.Robots.filterGate(s, Tables.documents(s, d)),
      Some(graft.ingest.Robots.filterOracleSql))
  )

  /** One flat oracle for BOTH p3 forms (batch and stream-ingested) —
    * the full crawl replay: fixture pages/urls → WARC framing → parse →
    * extract → hygiene → score → dedup → cap. */
  private lazy val p3OracleSql: String =
    s"""WITH pages AS (${HtmlExtract.duckPages("documents")}),
          urls AS (${WebCrawl.duckUrls("documents")}),
          ${WebCrawl.duckWarcCtes},
          extracted AS (
            SELECT uri, ${HtmlExtract.duckMainText("html")} AS main_text
            FROM parsed
            WHERE status = 200 AND clen = len(html) + ${WebCrawl.duckHttpPrefixLen}),
          flags AS (${WebCrawl.duckUrlNorm("(SELECT uri, uri AS url FROM extracted)", "uri")}),
          scored AS (
            SELECT tx.uri, f.domain,
              CAST(len(t) AS INT) AS n_tokens,
              CAST(len(tx.main_text) AS INT) AS n_chars,
              0.4 * (CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)) +
              0.3 * (1.0 - CAST(len(list_filter(t, x -> x IN ('the','a','and','of'))) AS DOUBLE)
                       / CAST(len(t) AS DOUBLE)) +
              0.3 * least(1.0, (CAST(len(tx.main_text) AS DOUBLE) / CAST(len(t) AS DOUBLE)) / 10.0)
                AS quality,
              $duckGuess AS guess,
              md5(tx.main_text) AS text_md5
            FROM (SELECT uri, main_text, string_split(lower(main_text), ' ') AS t
                  FROM extracted) tx
            JOIN flags f USING (uri)
            WHERE f.keep),
          filtered AS (
            SELECT * FROM scored
            WHERE n_tokens >= $MinTokens AND quality >= $QualityFloor),
          deduped AS (
            SELECT * FROM (
              SELECT *, row_number() OVER (PARTITION BY text_md5 ORDER BY uri) AS dr
              FROM filtered) WHERE dr = 1),
          capped AS (
            SELECT *, row_number() OVER (
              PARTITION BY domain ORDER BY quality DESC, uri) AS rn
            FROM deduped)
        SELECT uri, domain, guess, n_tokens, n_chars, text_md5
        FROM capped WHERE rn <= $DomainCap ORDER BY uri"""
}
