package graft.oracle

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Ports the reference's golden ETL integration test verbatim
  * (crates/oracle/tests/api/etl_workflow.rs:61-334): same fixture rows ⇒
  * same scores 409899 / 309799 / 409699 / 109599 and the same winner
  * ordering. This pins A6 scoring, the UUIDv7 tiebreak, rounding
  * semantics, and A7/W3 ranking.
  */
class ScoringSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Entry ids pinned to timestamps 2024-08-11T00:00:00.{10,20,30,40}Z
  // (etl_workflow.rs:21-37,103-198).
  private val e1 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.100Z"), 0, 0)
  private val e2 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.200Z"), 0, 0)
  private val e3 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.300Z"), 0, 0)
  private val e4 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.400Z"), 0, 0)

  // Aggregated fixtures (etl_workflow.rs:336-412; FIXTURES.md §4).
  private def forecasts = Seq(
    ("PFNO", 9L, 35L, 8L), ("KSAW", 17L, 25L, 3L),
    ("PAPG", 14L, 17L, 6L), ("KWMC", 31L, 33L, 11L)
  ).toDF("station_id", "temp_low", "temp_high", "wind_speed")

  private def observations = Seq(
    ("PFNO", 9.4, 35.0, 11L), ("KSAW", 22.0, 25.0, 10L),
    ("PAPG", 15.0, 16.0, 6L), ("KWMC", 32.8, 34.4, 11L)
  ).toDF("station_id", "temp_low", "temp_high", "wind_speed")

  // (entry_id, station, temp_low, temp_high, wind_speed) choices.
  private def choices = Seq(
    (e1, "PFNO", Some("under"), None, Some("over")),
    (e1, "KSAW", None, None, Some("over")),
    (e1, "KWMC", Some("par"), Some("under"), Some("par")),
    (e2, "PFNO", Some("par"), None, Some("par")),
    (e2, "KSAW", Some("par"), None, Some("over")),
    (e2, "KWMC", Some("par"), Some("under"), None),
    (e3, "PFNO", Some("par"), None, Some("under")),
    (e3, "KSAW", Some("over"), None, Some("over")),
    (e3, "KWMC", Some("par"), None, Some("under")),
    (e4, "PFNO", Some("over"), None, Some("par")),
    (e4, "KSAW", None, Some("under"), Some("over")),
    (e4, "KWMC", Some("par"), None, Some("under"))
  ).toDF("entry_id", "station", "temp_low", "temp_high", "wind_speed")

  test("golden ETL scores match the reference exactly") {
    val scores = Scoring.scoreEntries(choices, forecasts, observations)
      .collect().map(r => r.getAs[String]("entry_id") -> r.getAs[Long]("score")).toMap
    assert(scores(e1) == 409899L)
    assert(scores(e2) == 309799L)
    assert(scores(e3) == 409699L)
    assert(scores(e4) == 109599L)
  }

  test("winnersByEvent ranks within each event independently") {
    val scores = Scoring.scoreEntries(choices, forecasts, observations)
    // duplicate the golden scores under two event ids: per-event ranking
    // must reproduce the single-event answer twice
    val bulk = scores.withColumn("event_id", org.apache.spark.sql.functions.lit("evA"))
      .unionByName(scores.withColumn("event_id", org.apache.spark.sql.functions.lit("evB")))
    val w = Scoring.winnersByEvent(bulk, 3).collect()
    assert(w.length == 6)
    for (ev <- Seq("evA", "evB")) {
      val rows = w.filter(_.getAs[String]("event_id") == ev)
      assert(rows.map(_.getAs[String]("entry_id")).toSeq == Seq(e1, e3, e2))
      assert(rows.map(_.getAs[Long]("outcome_index")).toSeq == Seq(0L, 2L, 1L))
    }
  }

  test("winner ranking and outcome indices match the reference") {
    val scores = Scoring.scoreEntries(choices, forecasts, observations)
    val w = Scoring.winners(scores, 3).collect()
    // top-3 by score: e1 (409899), e3 (409699), e2 (309799)
    assert(w.map(_.getAs[String]("entry_id")).toSeq == Seq(e1, e3, e2))
    // outcome indices are positions in id-sorted order: e1=0,e2=1,e3=2,e4=3
    assert(w.map(_.getAs[Long]("outcome_index")).toSeq == Seq(0L, 2L, 1L))
    // the reference's winner byte encoding (big-endian u64 per index)
    val bytes = Scoring.winningBytes(Seq(0L, 2L, 1L))
    assert(bytes.length == 24)
    assert(bytes(7) == 0 && bytes(15) == 2 && bytes(23) == 1)
  }

  test("entries without matching stations score base 0 but keep tiebreak") {
    val ids = Seq(e1, e4).toDF("entry_id")
    val noChoices = Seq.empty[(String, String, Option[String], Option[String], Option[String])]
      .toDF("entry_id", "station", "temp_low", "temp_high", "wind_speed")
    val all = Scoring.scoreAllEntries(ids, noChoices, forecasts, observations)
      .collect().map(r => r.getAs[String]("entry_id") -> r.getAs[Long]("score")).toMap
    assert(all(e1) == 9899L)
    assert(all(e4) == 9599L)
  }

  test("uuid7 millis roundtrip and validity") {
    val t = Instant.parse("2024-08-11T00:00:00.100Z")
    val u = Uuid7.generateDeterministic(t, 123, 456)
    assert(Uuid7.isValid(u))
    assert(Uuid7.millis(u) == t.toEpochMilli)
    // SQL expression agrees with the Scala extraction
    val viaSql = Seq(u).toDF("id")
      .selectExpr(Uuid7.millisSqlExpr("id") + " as ms")
      .head().getAs[Long]("ms")
    assert(viaSql == t.toEpochMilli)
  }
}
