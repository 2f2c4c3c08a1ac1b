package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing + crawl gating — the compliance step between URL
  * hygiene (t23) and the fetch: a polite 100 TB crawl decides, per URL,
  * whether the host's robots.txt permits fetching it. Semantics follow
  * the public REP (RFC 9309 / the original 1994 protocol): directive
  * names are case-insensitive, values keep their case (paths ARE
  * case-sensitive), `#` starts a comment, a `User-agent` line opens a
  * group (consecutive UA lines share one), rules before any UA line
  * belong to no group and are ignored, an empty `Disallow:` value means
  * "no restriction", the most specific (longest-path) rule wins and
  * `Allow` beats `Disallow` on a length tie, a group naming our agent
  * exactly overrides the `*` group entirely, and no matching rule (or no
  * robots.txt at all) means allowed. Prefix matching only — the 1994
  * rule; RFC 9309 wildcards are out of scope and documented as such.
  *
  * Ingest posture mirrors the reference's XML decode
  * (`xml_observation.rs:5-87`) and the WARC/HTML clamps: a hostile
  * robots.txt can only ever produce FEWER effective rules, never an
  * error — junk lines miss the directive regex and drop, torn values
  * degrade to empty strings which (for Disallow) mean allow-all.
  *
  * Scale shape: parsing is per-robots-file column work over a frame with
  * one row per HOST — at any corpus scale that frame is dwarfed by the
  * URL set, so the effective rule table is a classic broadcast
  * dimension. The decision join is `urls ⋈ rules` on the host equi-key
  * (broadcast), a prefix filter, and a per-URL longest-match pick; the
  * only shuffle is the final per-URL aggregation, which AQE sizes.
  */
object Robots {

  /** Our crawler's product token (lowercased for the UA match). */
  val Agent = "graftbot"

  /** Fixture robots.txt per host of the t23 URL universe — one source of
    * truth serving both engines ([[robotsText]] joins with real
    * newlines, [[duckRobotsExpr]] with `chr(10)`). Every REP edge case
    * the parser claims is planted in at least one file: specific-agent
    * override (example.com — the `*` group would block /shop/, the
    * graftbot group doesn't), longest-match in both directions
    * (example.com: Allow /a/deep/ beats Disallow /a/, then the longer
    * Disallow /a/deep/path/x/ beats both), junk lines and comments
    * (blog), empty Disallow = allow-all (blog), orphan rules before any
    * UA line (docs), allow-wins-length-tie (spam-casino), and a
    * multi-UA-line group (spam-casino). */
  val Fixtures: Seq[(String, Seq[String])] = Seq(
    "example.com" -> Seq(
      "# fixture: specific-agent group overrides *",
      "User-agent: MegaCrawler",
      "Disallow: /",
      "",
      "User-agent: GraftBot",
      "Disallow: /a/",
      "Allow: /a/deep/",
      "Disallow: /a/deep/path/x/",
      "Crawl-delay: 2",
      "",
      "User-agent: *",
      "Disallow: /shop/"),
    "blog.example.com" -> Seq(
      "junk line without a separator",
      "User-agent: *",
      "Disallow:",
      "# empty Disallow value = no restriction"),
    "docs.example.com" -> Seq(
      "Disallow: /guide/",
      "# the line above precedes any User-agent group: ignored",
      "User-agent: *",
      "Disallow: /guide/",
      "Allow: /guide/1"),
    "spam-casino.biz" -> Seq(
      "User-agent: graftbot",
      "User-agent: otherbot",
      "Allow: /win/",
      "Disallow: /win/"))

  /** One robots.txt blob per host: `(domain, robots)`. */
  def fixtureBlobs(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Fixtures.map { case (d, ls) => (d, ls.mkString("\n")) }.toDF("domain", "robots")
  }

  /** Directive-line shape: name `:` value, comments stripped first.
    * `(?i)` + `\s` parse identically in Java regex and RE2; the lazy
    * value group stops before trailing whitespace (which also eats a
    * stray `\r` from CRLF files). */
  private val DirectiveRe = "(?i)^\\s*(user-agent|allow|disallow|crawl-delay)\\s*:\\s*(.*?)\\s*$"

  /** Parse robots blobs into directive lines with REP group structure.
    * Input `(domain, robots)`; output one row per recognized directive:
    * `(domain, line_no, kind, value, group_id)` where `kind` is the
    * lowercased directive name, `group_id` numbers UA groups from 1 in
    * file order (0 = before any group), and consecutive `User-agent`
    * lines share a group. Junk lines (no directive match) vanish here —
    * they can't carry state into later lines. */
  def parseLines(blobs: DataFrame): DataFrame = {
    val noComment = regexp_replace(col("raw"), "#.*$", "")
    val byLine = Window.partitionBy("domain").orderBy("line_no")
    blobs
      .select(col("domain"), posexplode(split(col("robots"), "\n")).as(Seq("line_no", "raw")))
      .withColumn("kind", lower(regexp_extract(noComment, DirectiveRe, 1)))
      .withColumn("value", regexp_extract(noComment, DirectiveRe, 2))
      .withColumn("is_ua", col("kind") === "user-agent")
      .withColumn("new_group",
        col("is_ua") && !coalesce(lag(col("is_ua"), 1).over(byLine), lit(false)))
      .withColumn("group_id",
        sum(col("new_group").cast("int"))
          .over(byLine.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("int"))
      .where(col("kind") =!= "")
      .select("domain", "line_no", "kind", "value", "group_id")
  }

  /** Add per-(domain, group) agent flags and the REP group-selection
    * verdict: `chosen` is true for every directive row of the group(s)
    * that govern [[Agent]] on that host — the groups naming the agent
    * exactly if any exist, else the `*` groups. */
  def withChosen(lines: DataFrame): DataFrame = {
    val flags = lines
      .groupBy("domain", "group_id")
      .agg(
        max(col("kind") === "user-agent" && lower(col("value")) === Agent).as("grp_bot"),
        max(col("kind") === "user-agent" && col("value") === "*").as("grp_star"))
      .withColumn("dom_bot",
        max(col("grp_bot")).over(Window.partitionBy("domain")))
    lines.join(flags, Seq("domain", "group_id"))
      .withColumn("chosen",
        col("group_id") >= 1 &&
          (when(col("dom_bot"), col("grp_bot")).otherwise(col("grp_star"))))
  }

  /** Effective path rules for [[Agent]]: `(domain, rule_path, is_allow)`
    * from the chosen groups. An empty-valued `Disallow` (no restriction)
    * or `Allow` contributes nothing. At scale this output is the
    * broadcast dimension the decision join consumes. */
  def effectiveRules(blobs: DataFrame): DataFrame =
    withChosen(parseLines(blobs))
      .where(col("chosen") && col("kind").isin("allow", "disallow") && col("value") =!= "")
      .select(col("domain"), col("value").as("rule_path"),
        (col("kind") === "allow").as("is_allow"))

  /** Decide fetchability per URL: longest-prefix rule wins, `Allow` wins
    * a length tie, no match (or unknown host) means allowed. `urls` must
    * carry `domain` and `path`; emits the input plus
    * `(rule_path, rule_allow, robots_ok)`. The rules side is tiny —
    * broadcast it so the decision is a map-side join at 100 TB. */
  def decide(urls: DataFrame, rules: DataFrame): DataFrame = {
    val keyCols = urls.columns.map(col).toSeq
    // Prefix match inside the JOIN condition: a URL whose host has rules
    // but matches none must survive as a null-rule row (allowed), not
    // vanish under a post-join filter.
    val r = rules.select(col("domain").as("__rdom"), col("rule_path"), col("is_allow"))
    val matched = urls.join(broadcast(r),
      col("domain") === col("__rdom") && startswith(col("path"), col("rule_path")),
      "left")
    val pick = Window.partitionBy(urls.columns.map(col): _*)
      .orderBy(length(col("rule_path")).desc, col("is_allow").desc, col("rule_path"))
    matched
      .withColumn("__rk", row_number().over(pick))
      .where(col("__rk") === 1)
      .select(keyCols :+ col("rule_path") :+ col("is_allow").as("rule_allow") :+
        coalesce(col("is_allow"), lit(true)).as("robots_ok"): _*)
  }

  /** URL universe for the t28 gate: the t23 synth URLs normalized, with
    * the robots match key (`domain`, query-free `path`). */
  def gateUrls(docs: DataFrame): DataFrame =
    WebCrawl.withUrlNorm(docs.select(col("doc_id"), WebCrawl.synthUrl(col("doc_id")).as("url")), "url")
      .withColumn("path",
        regexp_extract(col("url_norm"), "^[a-z]+://[^/?]*([^?]*)", 1))
      .withColumn("path", when(col("path") === "", "/").otherwise(col("path")))
      .select("doc_id", "domain", "path", "keep")

  /** t27 gate frame: every parsed directive with its group structure and
    * selection verdict — a drift in comment stripping, grouping, agent
    * matching, or group selection lands here. */
  def parseGate(spark: org.apache.spark.sql.SparkSession): DataFrame =
    withChosen(parseLines(fixtureBlobs(spark)))
      .select(col("domain"), col("line_no").cast("int").as("line_no"),
        col("kind"), col("value"), col("group_id"),
        col("grp_bot"), col("grp_star"), col("chosen"))
      .orderBy("domain", "line_no")

  /** t28 gate frame: the per-URL fetch decision over the synth universe,
    * composing robots with the t23 hygiene verdict
    * (`fetch_ok = keep AND robots_ok`). */
  def filterGate(spark: org.apache.spark.sql.SparkSession, docs: DataFrame): DataFrame =
    decide(gateUrls(docs), effectiveRules(fixtureBlobs(spark)))
      .withColumn("fetch_ok", col("keep") && col("robots_ok"))
      .select("doc_id", "domain", "path", "rule_path", "rule_allow", "robots_ok", "fetch_ok")
      .orderBy("doc_id")

  // ------------------------------------------------------------- oracles

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB VALUES list rebuilding [[Fixtures]] byte-for-byte. */
  private def duckFixtures: String =
    Fixtures.map { case (d, ls) =>
      s"(${q(d)}, ${ls.map(q).mkString(" || chr(10) || ")})"
    }.mkString(",\n          ")

  /** Shared CTE chain `lines` → `flagged` replaying [[parseLines]] +
    * [[withChosen]] in DuckDB (same regexes, same window shapes). */
  private def duckParseCtes: String =
    s"""blobs(domain, robots) AS (VALUES
          $duckFixtures),
        rawlines AS (
          SELECT domain, unnest(range(1, len(l) + 1)) AS i, l
          FROM (SELECT domain, string_split(robots, chr(10)) AS l FROM blobs)),
        parsed AS (
          SELECT domain, CAST(i - 1 AS INT) AS line_no,
            lower(regexp_extract(regexp_replace(l[i], '#.*$$', ''), '(?i)^\\s*(user-agent|allow|disallow|crawl-delay)\\s*:\\s*(.*?)\\s*$$', 1)) AS kind,
            regexp_extract(regexp_replace(l[i], '#.*$$', ''), '(?i)^\\s*(user-agent|allow|disallow|crawl-delay)\\s*:\\s*(.*?)\\s*$$', 2) AS value
          FROM rawlines),
        marked AS (
          SELECT domain, line_no, kind, value,
            CASE WHEN kind = 'user-agent' AND NOT coalesce(
                lag(kind = 'user-agent') OVER (PARTITION BY domain ORDER BY line_no), false)
              THEN 1 ELSE 0 END AS new_group
          FROM parsed),
        grouped AS (
          SELECT domain, line_no, kind, value,
            CAST(SUM(new_group) OVER (
                PARTITION BY domain ORDER BY line_no
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS group_id
          FROM marked),
        lines AS (
          SELECT * FROM grouped WHERE kind <> ''),
        flags AS (
          SELECT domain, group_id,
            bool_or(kind = 'user-agent' AND lower(value) = '$Agent') AS grp_bot,
            bool_or(kind = 'user-agent' AND value = '*') AS grp_star
          FROM lines GROUP BY domain, group_id),
        flags2 AS (
          SELECT *, bool_or(grp_bot) OVER (PARTITION BY domain) AS dom_bot FROM flags),
        flagged AS (
          SELECT l.domain, l.line_no, l.kind, l.value, l.group_id,
            f.grp_bot, f.grp_star,
            (l.group_id >= 1 AND
             CASE WHEN f.dom_bot THEN f.grp_bot ELSE f.grp_star END) AS chosen
          FROM lines l JOIN flags2 f USING (domain, group_id))"""

  /** t27 oracle. */
  def parseOracleSql: String =
    s"""WITH $duckParseCtes
      SELECT domain, line_no, kind, value, group_id, grp_bot, grp_star, chosen
      FROM flagged ORDER BY domain, line_no"""

  /** t28 oracle: effective rules ⋈ normalized synth URLs, longest-match
    * pick, hygiene compose. */
  def filterOracleSql: String =
    s"""WITH $duckParseCtes,
        rules AS (
          SELECT domain, value AS rule_path, kind = 'allow' AS is_allow
          FROM flagged
          WHERE chosen AND kind IN ('allow', 'disallow') AND value <> ''),
        urls AS (${WebCrawl.duckUrls("documents")}),
        normed AS (
          SELECT doc_id, domain,
            CASE WHEN p = '' THEN '/' ELSE p END AS path, keep
          FROM (SELECT doc_id, domain, keep,
              regexp_extract(url_norm, '^[a-z]+://[^/?]*([^?]*)', 1) AS p
            FROM (${WebCrawl.duckUrlNorm("urls", "doc_id")}))),
        ranked AS (
          SELECT n.doc_id, n.domain, n.path, n.keep, r.rule_path, r.is_allow,
            ROW_NUMBER() OVER (PARTITION BY n.doc_id
              ORDER BY len(r.rule_path) DESC, r.is_allow DESC, r.rule_path) AS rk
          FROM normed n LEFT JOIN rules r
            ON n.domain = r.domain AND starts_with(n.path, r.rule_path))
      SELECT doc_id, domain, path, rule_path, is_allow AS rule_allow,
        coalesce(is_allow, true) AS robots_ok,
        keep AND coalesce(is_allow, true) AS fetch_ok
      FROM ranked WHERE rk = 1 ORDER BY doc_id"""
}
