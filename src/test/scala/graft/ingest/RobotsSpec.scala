package graft.ingest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** REP contract + hostile-input clamps for robots.txt (exactness of the
  * fixture parse/decision is t27/t28's oracle gates; this spec pins each
  * rule in isolation and the degrade-never-throw posture on inputs the
  * fixture doesn't carry: CRLF files, missing robots, rule-less hosts,
  * directive case soup, whitespace-only files).
  */
class RobotsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def rules(robots: (String, String)*): Seq[(String, String, Boolean)] = {
    import spark.implicits._
    Robots.effectiveRules(robots.toSeq.toDF("domain", "robots"))
      .as[(String, String, Boolean)].collect().toSeq.sortBy(r => (r._1, r._2))
  }

  private def decide(urls: Seq[(String, String)], robots: (String, String)*): Map[String, Boolean] = {
    import spark.implicits._
    Robots.decide(
        urls.toDF("domain", "path"),
        Robots.effectiveRules(robots.toSeq.toDF("domain", "robots")))
      .select(concat_ws("|", col("domain"), col("path")), col("robots_ok"))
      .as[(String, Boolean)].collect().toMap
  }

  test("directive names case-insensitive, values case-preserved, CRLF tolerated") {
    val r = rules("h" -> "USER-AGENT: GRAFTBOT\r\nDISALLOW: /CaseSensitive/\r\nallow: /CaseSensitive/Sub/\r\n")
    assert(r == Seq(("h", "/CaseSensitive/", false), ("h", "/CaseSensitive/Sub/", true)))
  }

  test("hostile files degrade to fewer rules, never throw") {
    val r = rules(
      // no colon, colon-only, directive with empty value, unknown
      // directive, rules before any UA, whitespace-only, empty file
      "a" -> "garbage\n:\nUser-agent: *\nDisallow:\nNoSuchDirective: /x\nAllow:",
      "b" -> "Disallow: /orphan/\nAllow: /orphan/too/",
      "c" -> "   \n\t\n",
      "d" -> "")
    assert(r.isEmpty)
  }

  test("agent-specific group wins; star group ignored when agent named") {
    val f = "User-agent: *\nDisallow: /all/\nUser-agent: graftbot\nDisallow: /bot/"
    assert(rules("h" -> f) == Seq(("h", "/bot/", false)))
  }

  test("multiple star groups all apply when agent is unnamed") {
    val f = "User-agent: *\nDisallow: /one/\n\nUser-agent: *\nDisallow: /two/"
    assert(rules("h" -> f).map(_._2) == Seq("/one/", "/two/"))
  }

  test("decide: missing robots, rule-less host, no-prefix-match all allow") {
    val d = decide(
      Seq(("norobots.com", "/x"), ("hasrules.com", "/unmatched/"), ("hasrules.com", "/blocked/q")),
      "hasrules.com" -> "User-agent: *\nDisallow: /blocked/")
    assert(d("norobots.com|/x"))
    assert(d("hasrules.com|/unmatched/"))
    assert(!d("hasrules.com|/blocked/q"))
  }

  test("decide: longest match wins both directions, allow wins length ties") {
    val f = "User-agent: *\nDisallow: /a/\nAllow: /a/pub/\nDisallow: /a/pub/priv/\nAllow: /tie/\nDisallow: /tie/"
    val d = decide(
      Seq(("h", "/a/x"), ("h", "/a/pub/x"), ("h", "/a/pub/priv/x"), ("h", "/tie/x")),
      "h" -> f)
    assert(!d("h|/a/x") && d("h|/a/pub/x") && !d("h|/a/pub/priv/x") && d("h|/tie/x"))
  }

  test("decision join is broadcast, no cartesian") {
    import spark.implicits._
    val plan = Robots.decide(
        Seq(("h", "/p")).toDF("domain", "path"),
        Robots.effectiveRules(Seq(("h", "User-agent: *\nDisallow: /p")).toDF("domain", "robots")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
