package graft.queries

import graft.Tables

/** Gate registration for the HTML ingest front door
  * ([[graft.ingest.HtmlExtract]]). */
object HtmlOps {

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
      Some(graft.ingest.HtmlExtract.oracleSql))
  )
}
