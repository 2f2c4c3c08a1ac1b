package graft.ingest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hostile-input contract for the HTML front door — the upload-fuzz
  * posture applied to markup (exactness is t21's oracle gate; this spec
  * pins the CLAMPS): nothing throws, script payload never reaches
  * `main_text`, torn markup degrades toward emptier output, and
  * non-HTML passes through as one prose block.
  */
class HtmlExtractSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def extractOf(htmls: Seq[String]): Seq[(Long, String)] = {
    import spark.implicits._
    HtmlExtract.extract(
      htmls.zipWithIndex.map { case (h, i) => (i.toLong, h) }
        .toDF("doc_id", "html"))
      .select("doc_id", "main_text").as[(Long, String)].collect().toSeq
  }

  test("poison inputs: no throw, scripts clamp, non-HTML passes through") {
    val poison = Seq(
      // 0: closed script — payload must vanish, prose survives
      "<div><script>evil()</script>real text here that is long enough</div>",
      // 1: UNTERMINATED script — everything after the opener is eaten
      //    (the safe direction: code never leaks into training text)
      "<div>kept prose before anything torn</div><script>evil(",
      // 2: nested-looking script (lazy match ends at the FIRST close;
      //    the dangling tail's '</script>' is tag-stripped)
      "<div><script>a<script>b</script>plain words long enough to keep</div>",
      // 3: not HTML at all — one block of prose, kept verbatim
      "just a plain sentence with no markup at all",
      // 4: unclosed anchor — no captured link text, block scores as prose
      "<div><a href=\"/x\">dangling anchor prose that keeps going and going</div>",
      // 5: null byte + control chars survive tag-stripping without error
      "<div>text with a \u0000 null and a \u0007 bell inside it okay</div>",
      // 6: pathological attribute (no '>' for 100k chars) — the open tag
      //    never closes, so the regex treats the rest as tag innards
      "<div " + ("x" * 100000) + ">tail</div>",
      // 7: empty string
      "",
      // 8: only boilerplate — everything dropped, empty main_text
      "<div><a href=\"/a\">A</a> <a href=\"/b\">B</a></div>")
    val out = extractOf(poison).toMap
    assert(out.size == 9)

    assert(out(0L) == "real text here that is long enough")
    assert(!out(0L).contains("evil"))
    assert(out(1L) == "kept prose before anything torn")
    assert(out(2L) == "plain words long enough to keep")
    assert(out(3L) == "just a plain sentence with no markup at all")
    assert(out(4L).contains("dangling anchor prose"))
    assert(out(5L).contains("null") && out(5L).contains("bell"))
    // 6: '<div x…' never closes; '>tail</div' has no opening '<'…'>' pair
    // left after the unterminated tag eats to the first '>' — whatever
    // remains must be tag-free prose, and the call must not blow up
    assert(!out(6L).contains("<"))
    assert(out(7L) == "")
    assert(out(8L) == "")
  }

  test("title and block accounting on a well-formed page") {
    import spark.implicits._
    val page = "<html><head><title>T1</title><style>p{}</style></head><body>" +
      "<div><a href=\"/\">Home</a> <a href=\"/b\">B</a></div>" +
      "<div><p>actual content prose of reasonable length</p></div>" +
      "</body></html>"
    val row = HtmlExtract.extract(
      Seq((1L, page)).toDF("doc_id", "html")).head()
    assert(row.getAs[String]("title") == "T1")
    assert(row.getAs[String]("main_text") ==
      "actual content prose of reasonable length")
    assert(row.getAs[Int]("n_kept") == 1)
    assert(row.getAs[Int]("n_blocks") >= 2)
  }
}
