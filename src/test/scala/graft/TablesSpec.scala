package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `Tables.events` must be self-contained: the parquet file is
  * TIMESTAMP(NANOS), which Spark's schema inference rejects unless the
  * session was built with the `nanosAsLong` legacy flag. The loader reads
  * through an explicit schema instead, so a DEFAULT session — the ad-hoc
  * notebook case — must work, and the µs truncation must match what the
  * flag-based read produced (DuckDB's own ns→µs floor).
  */
class TablesSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("events loads from a vanilla SparkSession (no nanosAsLong flag)") {
    // A sibling session of the shared test context: default conf, no flag.
    val vanilla = TestSpark.spark.newSession()
    assert(vanilla.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").forall(_ == "false"))
    val ev = Tables.events(vanilla, dir)
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(ev.count() > 0)
  }

  test("explicit-schema read truncates ns→µs identically to the raw long") {
    val s = TestSpark.spark
    import s.implicits._
    val viaLoader = Tables.events(s, dir)
      .selectExpr("event_id", "unix_micros(ts) AS us").as[(Long, Long)].collect().toMap
    val raw = s.read
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$dir/events.parquet")
      .selectExpr("event_id", "ts div 1000 AS us").as[(Long, Long)].collect().toMap
    assert(viaLoader == raw)
  }
}
