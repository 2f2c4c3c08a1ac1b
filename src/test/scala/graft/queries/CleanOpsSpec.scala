package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Clamp + property contract for the corpus-hygiene operators
  * (exactness is t25/t26's oracle gates): hostile JSONL never throws,
  * escape/unescape round-trips, and NFC delivers the property the
  * pipeline needs — composed and decomposed spellings of the same text
  * become ONE byte form, so content hashes unify. */
class CleanOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  import org.apache.spark.sql.graft.ColumnBridge
  private def nfcCol(c: org.apache.spark.sql.Column) =
    ColumnBridge.column(graft.functions.NfcNormalize(ColumnBridge.expression(c)))

  test("jsonl parse: hostile lines drop, never throw; escapes round-trip") {
    import spark.implicits._
    val texts = Seq(
      """back\slash and "quotes" mixed \" tricky""", // escape round trip
      "plain text", "")
    val lines = texts.zipWithIndex.map { case (t, i) =>
      val esc = t.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"id":$i,"lang":"en","text":"$esc"}"""
    } ++ Seq(
      "not json at all",
      "{\"id\":99,\"lang\":\"en\",\"te", // torn mid-key
      "{}",                              // valid, fields missing
      "{\"id\":7}",                      // valid, text missing
      "")
    val parsed = lines.toDF("line")
      .select(from_json(col("line"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, lang STRING, text STRING")).as("p"))
      .where(col("p.id").isNotNull && col("p.text").isNotNull)
      .select(col("p.id"), col("p.text"))
      .as[(Long, String)].collect().toMap
    // only the three well-formed full lines survive; text round-trips
    assert(parsed == texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toMap)
  }

  test("nfc: decomposed and composed spellings hash to one byte form") {
    import spark.implicits._
    val decomposed = "café Ångstrom"
    val composed = "café Ångstrom"
    val out = Seq(decomposed, composed, "plain ascii", "")
      .toDF("t")
      .select(nfcCol(col("t")).as("c"), md5(nfcCol(col("t"))).as("m"))
      .as[(String, String)].collect()
    assert(out(0) == out(1), "NFC must unify the two spellings")
    assert(out(0)._1 == composed)
    assert(out(2)._1 == "plain ascii") // already-NFC passes through
    assert(out(3)._1 == "")
    // idempotence: nfc(nfc(x)) == nfc(x)
    val twice = Seq(decomposed).toDF("t")
      .select(nfcCol(nfcCol(col("t")))).as[String].head()
    assert(twice == composed)
  }

  test("strip pattern: controls and zero-widths vanish, tabs/newlines survive") {
    import spark.implicits._
    val s = "ab​c‍d﻿e\tf\ng"
    val out = Seq(s).toDF("t")
      .select(regexp_replace(col("t"), CleanOps.StripRe, "")).as[String].head()
    assert(out == "abcde\tf\ng")
  }
}
