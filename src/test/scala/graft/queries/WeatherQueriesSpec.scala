package graft.queries

import java.sql.Timestamp
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WeatherQueriesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  test("A1 level-1 dedups duplicate slots across overlapping snapshots") {
    // The same 3-h slot appears in two hourly snapshot files with the
    // same values (the reference's duplicate acknowledgment,
    // weather_data.rs:92-146): a naive single-level MAX(wind) would be
    // right but SUM-like semantics would not; level 1 collapses per
    // (station, begin_time) first.
    val f = Seq(
      // snapshot 1
      ("KXYZ", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T03:00:00Z"), 10L, 30L, 5L),
      ("KXYZ", ts("2024-08-12T03:00:00Z"), ts("2024-08-12T06:00:00Z"), 12L, 28L, 7L),
      // snapshot 2 duplicates slot 1 with a drifted min_temp
      ("KXYZ", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T03:00:00Z"), 11L, 30L, 5L)
    ).toDF("station_id", "begin_time", "end_time", "min_temp", "max_temp", "wind_speed")

    val out = WeatherQueries.forecastsDaily(f).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("date") == "2024-08-12")
    assert(r.getAs[Timestamp]("start_time") == ts("2024-08-12T00:00:00Z"))
    assert(r.getAs[Timestamp]("end_time") == ts("2024-08-12T06:00:00Z"))
    // level1 slot1: min(min_temp)=10 (across dup rows), slot2: 12 → day min 10
    assert(r.getAs[Long]("temp_low") == 10L)
    assert(r.getAs[Long]("temp_high") == 30L)
    assert(r.getAs[Long]("wind_speed") == 7L)
  }

  test("A1 station in-list and day-trunc range predicates") {
    val f = Seq(
      ("AAA", ts("2024-08-12T01:00:00Z"), ts("2024-08-12T04:00:00Z"), 1L, 2L, 3L),
      ("BBB", ts("2024-08-12T01:00:00Z"), ts("2024-08-12T04:00:00Z"), 1L, 2L, 3L),
      ("AAA", ts("2024-08-14T01:00:00Z"), ts("2024-08-14T04:00:00Z"), 1L, 2L, 3L)
    ).toDF("station_id", "begin_time", "end_time", "min_temp", "max_temp", "wind_speed")
    val out = WeatherQueries.forecastsDaily(f, Seq("AAA"),
      Some(ts("2024-08-12T00:00:00Z")), Some(ts("2024-08-13T00:00:00Z")))
      .collect()
    assert(out.length == 1 && out.head.getAs[String]("station_id") == "AAA")
  }

  test("A2 observation summary min/max") {
    val o = Seq(
      ("AAA", ts("2024-08-12T01:00:00Z"), Some(10.5), Some(5L)),
      ("AAA", ts("2024-08-12T05:00:00Z"), Some(22.1), Some(9L)),
      ("AAA", ts("2024-08-12T09:00:00Z"), None, None)
    ).toDF("station_id", "generated_at", "temperature_value", "wind_speed")
    val r = WeatherQueries.observationSummary(o).collect().head
    assert(r.getAs[Timestamp]("start_time") == ts("2024-08-12T01:00:00Z"))
    assert(r.getAs[Timestamp]("end_time") == ts("2024-08-12T09:00:00Z"))
    assert(r.getAs[Double]("temp_low") == 10.5)
    assert(r.getAs[Double]("temp_high") == 22.1)
    assert(r.getAs[Long]("wind_speed") == 9L)
  }

  test("A3 stations distinct") {
    val o = Seq(
      ("AAA", "Alpha", 1.0, 2.0), ("AAA", "Alpha", 1.0, 2.0), ("BBB", "Beta", 3.0, 4.0)
    ).toDF("station_id", "station_name", "latitude", "longitude")
    assert(WeatherQueries.stations(o).count() == 2)
  }
}
