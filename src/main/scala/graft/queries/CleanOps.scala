package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.Tables

/** Corpus-hygiene ingest operators: JSONL (the LLM corpus wire format)
  * and Unicode normalization — the two cleaning steps between "bytes
  * arrived" and every downstream hash-keyed operator (exact dedup,
  * shingles, tokenizer merges all assume one canonical byte form per
  * visible string).
  *
  * Same ingest posture as the XML/WARC decoders (reference
  * `xml_observation.rs:5-87`: pure function over hostile payload,
  * degrade never throw): a torn JSONL line parses to nulls and is
  * dropped — surfaced by the gate's row set, not an error.
  */
object CleanOps {

  // ---------------------------------------------------------------- t25

  private val JsonSchema = new StructType()
    .add("id", LongType).add("lang", StringType).add("text", StringType)

  /** JSON string-escape of a text column — only `\` and `"` need
    * escaping for the synth corpus contract (no control characters in
    * `documents.text`; a full escaper would add the  class).
    * Built with `replace` on REAL characters (no SQL-literal layer). */
  private def jsonEsc(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    replace(replace(c, lit("\\"), lit("\\\\")), lit("\""), lit("\\\""))

  /** Deterministic JSONL fixture: one line per document; every 13th
    * line TORN at its midpoint. A torn line is always invalid JSON by
    * construction — after escaping, every quote inside the text region
    * is backslash-escaped, so no prefix of the line can close both the
    * string and the object. */
  private def synthLines(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
      concat(lit("{\"id\":"), col("doc_id"),
        lit(",\"lang\":\""), col("lang"),
        lit("\",\"text\":\""), jsonEsc(col("text")), lit("\"}")).as("l"))
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0,
          col("l").substr(lit(1), (length(col("l")) / 2).cast("int")))
          .otherwise(col("l")).as("line"))

  // ---------------------------------------------------------------- t26

  /** Control characters (C0 minus \t\n\r, plus DEL) and zero-width
    * code points (ZWSP/ZWNJ/ZWJ/BOM) — the standard pre-normalization
    * strip. `\x{...}` escapes parse identically in Java regex and RE2,
    * so ONE pattern string serves both engines. */
  private[graft] val StripRe =
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]|[\\x{200B}-\\x{200D}]|\\x{FEFF}"

  private def nfc(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.NfcNormalize(ColumnBridge.expression(c)))
  }

  /** Deterministic decoration planting each cleanup class: decomposed
    * e+acute (NFC composes), decomposed A+ring, control + zero-width
    * characters (stripped), and untouched text. */
  private def decorated(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 4 === 0, concat(col("text"), lit(" café nfc")))
        .when(col("doc_id") % 4 === 1, concat(col("text"), lit(" Ångstrom")))
        .when(col("doc_id") % 4 === 2, concat(col("text"), lit("ctrl​zw")))
        .otherwise(col("text")).as("d"))

  val all: Seq[Q] = Seq(

    // t25 — JSONL ingest, the format LLM corpora actually ship in: one
    // JSON object per line, parsed with an explicit schema; malformed
    // lines (every 13th, torn mid-string) parse to nulls and drop out
    // — pinned by the surviving row SET hash-matching the oracle's
    // json_valid-guarded replay. Pure per-row parse riding the scan;
    // the JSON unescape is pinned too (fixture text goes through the
    // escape/unescape round trip on both engines).
    Q("t25_jsonl_ingest",
      (s, d) => {
        val parsed = synthLines(Tables.documents(s, d))
          .select(from_json(col("line"), JsonSchema).as("p"))
        parsed
          .where(col("p.id").isNotNull && col("p.text").isNotNull)
          .select(col("p.id").as("id"), col("p.lang").as("lang"),
            length(col("p.text")).cast("int").as("n_chars"),
            md5(col("p.text")).as("text_md5"))
          .orderBy("id")
      },
      Some(raw"""WITH lines AS (
          SELECT doc_id,
            CASE WHEN doc_id % 13 = 0 THEN substr(l, 1, len(l) // 2)
                 ELSE l END AS line
          FROM (SELECT doc_id,
              '{"id":' || doc_id || ',"lang":"' || lang || '","text":"' ||
              replace(replace(text, '\', '\\'), '"', '\"') || '"}' AS l
            FROM documents)),
        parsed AS (
          SELECT
            CAST(CASE WHEN json_valid(line)
                 THEN json_extract_string(line, '$$.id') END AS BIGINT) AS id,
            CASE WHEN json_valid(line)
                 THEN json_extract_string(line, '$$.lang') END AS lang,
            CASE WHEN json_valid(line)
                 THEN json_extract_string(line, '$$.text') END AS txt
          FROM lines)
        SELECT id, lang, CAST(len(txt) AS INT) AS n_chars, md5(txt) AS text_md5
        FROM parsed WHERE id IS NOT NULL AND txt IS NOT NULL
        ORDER BY id""")),

    // t26 — Unicode cleanup: strip control/zero-width characters, then
    // NFC-normalize (graft.functions.NfcNormalize — Spark has no
    // normalizer builtin; the oracle runs utf8proc's nfc_normalize,
    // both UAX #15, so the md5 matches bit-for-bit). The decoration
    // plants every class: decomposed sequences that must COMPOSE
    // (n_clean < n_raw), junk characters that must VANISH, and
    // untouched text that must survive byte-identical (changed=false).
    // Per-row map, no shuffle; the isNormalized quick-check makes the
    // already-clean common case allocation-free.
    Q("t26_unicode_clean",
      (s, d) => {
        val dec = decorated(Tables.documents(s, d))
        val clean = nfc(regexp_replace(col("d"), StripRe, ""))
        dec.select(col("doc_id"),
            length(col("d")).cast("int").as("n_raw"),
            length(clean).cast("int").as("n_clean"),
            (clean =!= col("d")).as("changed"),
            md5(clean).as("clean_md5"))
          .orderBy("doc_id")
      },
      Some(raw"""WITH dec AS (
          SELECT doc_id, CASE CAST(doc_id % 4 AS INT)
              WHEN 0 THEN text || ' cafe' || chr(769) || ' nfc'
              WHEN 1 THEN text || ' A' || chr(778) || 'ngstrom'
              WHEN 2 THEN text || chr(7) || 'ctrl' || chr(8203) || 'zw'
              ELSE text END AS d
          FROM documents),
        cleaned AS (
          SELECT doc_id, d,
            nfc_normalize(regexp_replace(d,
              '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]|[\x{200B}-\x{200D}]|\x{FEFF}',
              '', 'g')) AS c
          FROM dec)
        SELECT doc_id, CAST(len(d) AS INT) AS n_raw,
          CAST(len(c) AS INT) AS n_clean, c <> d AS changed,
          md5(c) AS clean_md5
        FROM cleaned ORDER BY doc_id"""))
  )
}
