package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RedactSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("emails, phones, and SSNs are counted and replaced") {
    val docs = Seq(
      (1L, "contact Jo.Smith+spam@sub.example.co.uk or call 555-123-4567 today"),
      (2L, "ssn 123-45-6789 appears once; phone 555.987.6543 uses dots"),
      (3L, "no pii here, just text with-dashes and dots. end"),
      (4L, "two mails: a@b.io c@d.org and a fake 12-345-6789 non-match")
    ).toDF("doc_id", "text")
    val out = Redact.scrub(docs).collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones"),
        r.getAs[Int]("n_ssns"), r.getAs[String]("redacted")))).toMap

    assert(out(1L)._1 == 1 && out(1L)._2 == 1 && out(1L)._3 == 0)
    assert(out(1L)._4 == "contact <EMAIL> or call <PHONE> today")
    assert(out(2L)._3 == 1 && out(2L)._2 == 1)
    assert(out(2L)._4 == "ssn <SSN> appears once; phone <PHONE> uses dots")
    assert(out(3L) == ((0, 0, 0, "no pii here, just text with-dashes and dots. end")))
    assert(out(4L)._1 == 2 && out(4L)._2 == 0 && out(4L)._3 == 0)
    assert(out(4L)._4 == "two mails: <EMAIL> <EMAIL> and a fake 12-345-6789 non-match")
  }

  test("scrubbing is idempotent") {
    val once = Seq((1L, "x a@b.io 555-123-4567 123-45-6789")).toDF("doc_id", "text")
    val first = Redact.scrub(once).select("redacted").as[String].head()
    val second = Redact.scrub(
      Seq((1L, first)).toDF("doc_id", "text")).select("redacted").as[String].head()
    assert(first == second)
  }

  test("extended classes: IPv4 and cards redact; phone/IP shapes stay disjoint") {
    val df = Seq(
      (1L, "host 10.0.0.1 card 4111-1111-1111-1111 done"),
      // dotted phone (two dots) must NOT count as an IP (three dots)
      (2L, "call 555.867.1234 from 192.168.0.255"),
      // bare 16 digits must NOT count as a card
      (3L, "order id 4111111111111111 intact")
    ).toDF("doc_id", "text")
    val out = Redact.scrubExtended(df)
      .select("doc_id", "n_ips", "n_cards", "n_phones", "redacted")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(1L)._1 == 1 && out(1L)._2 == 1)
    assert(out(1L)._4 == "host <IP> card <CARD> done")
    assert(out(2L)._1 == 1 && out(2L)._2 == 0 && out(2L)._3 == 1)
    assert(out(2L)._4 == "call <PHONE> from <IP>")
    assert(out(3L)._2 == 0 && out(3L)._4.contains("4111111111111111"))
  }
}
