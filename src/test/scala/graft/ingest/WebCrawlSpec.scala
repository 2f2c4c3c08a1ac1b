package graft.ingest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hostile-input + rule contract for the crawl front door (exactness is
  * t22/t23/p3's oracle gates; this spec pins the CLAMPS and each
  * normalization rule in isolation): record parsing never throws,
  * Content-Length lies are surfaced not trusted, torn blobs degrade to
  * fewer records, and every URL rule fires on a table-driven fixture.
  */
class WebCrawlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val Crlf = "\r\n"

  private def rec(uri: String, html: String, clen: Option[Int] = None): String = {
    val http = s"HTTP/1.1 200 OK${Crlf}Content-Type: text/html$Crlf$Crlf$html"
    s"WARC/1.0${Crlf}WARC-Type: response${Crlf}WARC-Target-URI: $uri$Crlf" +
      s"Content-Length: ${clen.getOrElse(http.length)}$Crlf$Crlf$http$Crlf$Crlf"
  }

  private def parse(blobs: (Long, String)*): Seq[(Long, Int, String, Any, Boolean, String)] = {
    import spark.implicits._
    WebCrawl.parseRecords(blobs.toSeq.toDF("file_id", "blob"))
      .select(col("file_id"), col("rec_idx"), col("uri"), col("clen"),
        coalesce(col("len_ok"), lit(false)).as("len_ok"), col("html"))
      .as[(Long, Int, String, Option[Int], Boolean, String)].collect().toSeq
      .map(t => (t._1, t._2, t._3, t._4.orNull, t._5, t._6))
  }

  test("well-formed blob: every record parses, len_ok everywhere") {
    val out = parse((0L, rec("https://a/1", "<p>one</p>") + rec("https://a/2", "<p>two two</p>")))
    assert(out.map(r => (r._2, r._3, r._5, r._6)) ==
      Seq((1, "https://a/1", true, "<p>one</p>"), (2, "https://a/2", true, "<p>two two</p>")))
  }

  test("poison blobs: torn head, lying Content-Length, truncation, junk — no throw") {
    val torn = "URI: lost\r\n\r\nhalf a record" // resumed mid-record: parks in piece 0
    val out = parse(
      (0L, torn + rec("https://a/1", "<p>ok</p>")),
      // Content-Length lies by 10: surfaced as len_ok=false, html still framed
      (1L, rec("https://a/2", "<p>liar</p>", clen = Some(9999))),
      // truncated record (no trailing blank line): html extract misses -> ''
      (2L, rec("https://a/3", "<p>gone</p>").dropRight(4)),
      // header missing entirely
      (3L, s"WARC/1.0${Crlf}no headers at all"),
      // junk blob without any version line: zero records
      (4L, "complete garbage, no records"),
      (5L, ""))
    val byFile = out.groupBy(_._1)
    assert(byFile(0L).map(r => (r._3, r._5)) == Seq(("https://a/1", true)))
    assert(byFile(1L).map(r => (r._3, r._4, r._5, r._6)) ==
      Seq(("https://a/2", 9999, false, "<p>liar</p>")))
    assert(byFile(2L).map(r => (r._5, r._6)) == Seq((false, "")))
    assert(byFile(3L).map(r => (r._3, r._6)) == Seq(("", "")))
    assert(!byFile.contains(4L) && !byFile.contains(5L))
  }

  test("url normalization: every rule fires on its own fixture row") {
    import spark.implicits._
    val cases = Seq(
      // (url, expected url_norm, domain, reg_domain, depth, keep)
      ("HTTP://Example.COM:80/a", "http://example.com/a", "example.com", "example.com", 1, true),
      ("https://example.com:8443/a", "https://example.com:8443/a", "example.com", "example.com", 1, true), // NON-default port survives
      ("https://www.foo.org/", "https://foo.org/", "foo.org", "foo.org", 0, true),
      ("http://foo.org", "http://foo.org/", "foo.org", "foo.org", 0, true),
      ("http://foo.org/a/?utm_a=1&ref=x", "http://foo.org/a", "foo.org", "foo.org", 1, true), // emptied query drops '?'
      ("http://foo.org/a?b=2&utm_x=1&c=3#frag", "http://foo.org/a?b=2&c=3", "foo.org", "foo.org", 1, true), // order kept
      ("http://foo.org//x///y/z", "http://foo.org/x/y/z", "foo.org", "foo.org", 3, true),
      ("https://sub.spam-casino.biz/x", "https://sub.spam-casino.biz/x", "sub.spam-casino.biz", "spam-casino.biz", 1, false), // subdomain evasion blocked
      ("http://foo.org/1/2/3/4/5/6/7", "http://foo.org/1/2/3/4/5/6/7", "foo.org", "foo.org", 7, false), // depth cap
      ("http://foo.org/" + "x" * 120, "http://foo.org/" + "x" * 120, "foo.org", "foo.org", 1, false)) // length cap
    val out = WebCrawl.withUrlNorm(
        cases.map(_._1).zipWithIndex.map { case (u, i) => (i, u) }.toDF("i", "url"), "url")
      .orderBy("i")
      .select("url_norm", "domain", "reg_domain", "path_depth", "keep")
      .as[(String, String, String, Int, Boolean)].collect().toSeq
    cases.zip(out).foreach { case (c, o) =>
      assert(o == (c._2, c._3, c._4, c._5, c._6), s"for url ${c._1}")
    }
  }

  test("p3 composition on sf0.001: blocklist absent, caps hold, dedup holds") {
    val out = graft.SparkEntry.queries("p3_web_e2e")(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length > 0)
    val domains = rows.map(_.getString(1))
    assert(!domains.exists(_.contains("spam-casino")))
    // per-domain cap
    assert(domains.groupBy(identity).values.forall(_.length <= graft.queries.HtmlOps.DomainCap))
    // exact dedup: text_md5 unique
    val md5s = rows.map(_.getString(5))
    assert(md5s.distinct.length == md5s.length)
    // no cartesian anywhere in the composed plan
    val physical = out.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"), physical.take(2000))
  }
}
