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
}
