package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for a training corpus: detect and redact email
  * addresses, North-American phone numbers, and SSN-shaped ids, keeping
  * per-document match counts for the data-quality report. Pure
  * `regexp_replace`/`regexp_count` column work — codegen'd, no UDF, runs
  * map-side at any scale. Patterns use the common regex subset (no
  * lookbehind) so they behave identically across RE2-family and
  * Java-regex engines.
  */
object Redact {

  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhonePattern = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** Replace every PII span with a type token; order matters (SSN before
    * phone would also work — the shapes are disjoint by their middle
    * group length). */
  def scrubText(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailPattern, "<EMAIL>"),
        SsnPattern, "<SSN>"),
      PhonePattern, "<PHONE>")

  /** (redacted text, per-type counts) per document. */
  def scrub(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_emails", regexp_count(col(textCol), lit(EmailPattern)).cast("int"))
      .withColumn("n_phones", regexp_count(col(textCol), lit(PhonePattern)).cast("int"))
      .withColumn("n_ssns", regexp_count(col(textCol), lit(SsnPattern)).cast("int"))
      .withColumn("redacted", scrubText(col(textCol)))

  // Extended classes (r2): IPv4 addresses and separator-formatted card
  // numbers. The card pattern requires separators on purpose — 16 bare
  // digits would false-positive on ids/timestamps; formatted numbers
  // are the overwhelmingly common leak shape. IPv4 needs THREE dots, so
  // dotted phone numbers (two dots) never collide with it.
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val CardPattern = "\\b[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}\\b"

  /** [[scrub]] plus the extended classes; counts for all five, redacted
    * text with all five replaced. Kept separate so r1's and the
    * composed pipeline's gated outputs are unchanged. */
  def scrubExtended(df: DataFrame, textCol: String = "text"): DataFrame =
    scrub(df, textCol)
      .withColumn("n_ips", regexp_count(col(textCol), lit(Ipv4Pattern)).cast("int"))
      .withColumn("n_cards", regexp_count(col(textCol), lit(CardPattern)).cast("int"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("redacted"),
          CardPattern, "<CARD>"), Ipv4Pattern, "<IP>"))
}
