package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan, ParsedStatement}

/** Ad-hoc SQL surface (SURVEY §3.3): the reference's browser console runs
  * arbitrary user SQL over the downloaded parquet tables via duckdb-wasm
  * (crates/oracle/ui/main.js:112-141) — with a SELECT-only guard left as
  * a TODO (main.js:130). Here the guard is real: the statement is parsed
  * with Spark's own parser and rejected unless it is a pure query.
  */
object AdHoc {

  final case class NotAQueryException(msg: String) extends RuntimeException(msg)

  /** True iff the parsed plan is a read-only query (no commands, no
    * inserts, no DDL). */
  def isReadOnly(plan: LogicalPlan): Boolean = {
    val bad = plan.collectFirst {
      case c: Command => c
      case i: InsertIntoStatement => i
      case p: ParsedStatement => p
    }
    bad.isEmpty
  }

  /** Parse + guard + run. Throws [[NotAQueryException]] for non-SELECTs. */
  def run(spark: SparkSession, sql: String): DataFrame = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    if (!isReadOnly(plan))
      throw NotAQueryException(s"only read-only queries are allowed: ${plan.nodeName}")
    spark.sql(sql)
  }

  /** P7 — parameterized form: named `:param` markers bound as TYPED
    * literals by Spark itself, replacing the reference's regex rewrite of
    * `$1..$n` placeholders (weather_data.rs:57-69) — no string splicing,
    * so a hostile parameter value cannot change the statement shape, and
    * the guard still sees the full parsed plan. */
  def run(spark: SparkSession, sql: String, params: Map[String, Any]): DataFrame = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    if (!isReadOnly(plan))
      throw NotAQueryException(s"only read-only queries are allowed: ${plan.nodeName}")
    spark.sql(sql, params)
  }

  /** Register the weather views like the UI's CREATE TABLE ... AS
    * read_parquet (main.js:112-128). */
  def registerViews(spark: SparkSession, tables: Map[String, DataFrame]): Unit =
    tables.foreach { case (name, df) => df.createOrReplaceTempView(name) }
}
