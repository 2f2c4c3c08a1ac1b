package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's three weather query shapes (SURVEY §2.4 A1-A3),
  * expressed as DataFrame → DataFrame transforms over the pruned scans
  * produced by [[graft.store.WeatherStore]].
  */
object WeatherQueries {

  /** A1 — flagship daily forecast rollup (weather_data.rs:92-146).
    *
    * Two levels on purpose: level 1 groups by (station_id, begin_time),
    * collapsing duplicate rows for the same slot across overlapping
    * hourly snapshot files; level 2 re-aggregates per day. A single
    * group-by would double-count MIN/MAX over duplicated slots.
    */
  def forecastsDaily(
      forecasts: DataFrame,
      stationIds: Seq[String] = Nil,
      start: Option[Timestamp] = None,
      end: Option[Timestamp] = None): DataFrame = {

    var df = forecasts
    if (stationIds.nonEmpty) df = df.where(col("station_id").isin(stationIds: _*))
    start.foreach(s => df = df.where(date_trunc("day", col("begin_time")) >= lit(s)))
    end.foreach(e => df = df.where(date_trunc("day", col("end_time")) <= lit(e)))

    val level1 = df
      .groupBy(col("station_id"), col("begin_time"))
      .agg(
        first(date_format(date_trunc("day", col("begin_time")), "yyyy-MM-dd")).as("date"),
        min("begin_time").as("start_time"),
        max("end_time").as("end_time"),
        min("min_temp").as("temp_low"),
        max("max_temp").as("temp_high"),
        max("wind_speed").as("wind_speed"))

    level1
      .groupBy(col("station_id"), col("date"))
      .agg(
        min("start_time").as("start_time"),
        max("end_time").as("end_time"),
        min("temp_low").as("temp_low"),
        max("temp_high").as("temp_high"),
        max("wind_speed").as("wind_speed"))
  }

  /** A2 — observation summary per station over a time window
    * (weather_data.rs:161-222). */
  def observationSummary(
      observations: DataFrame,
      stationIds: Seq[String] = Nil,
      start: Option[Timestamp] = None,
      end: Option[Timestamp] = None): DataFrame = {

    var df = observations
    if (stationIds.nonEmpty) df = df.where(col("station_id").isin(stationIds: _*))
    start.foreach(s => df = df.where(col("generated_at") >= lit(s)))
    end.foreach(e => df = df.where(col("generated_at") <= lit(e)))

    df.groupBy("station_id")
      .agg(
        min("generated_at").as("start_time"),
        max("generated_at").as("end_time"),
        min("temperature_value").as("temp_low"),
        max("temperature_value").as("temp_high"),
        max("wind_speed").as("wind_speed"))
  }

  /** A3 — distinct stations seen in recent observations
    * (weather_data.rs:224-259; the caller supplies the last-4-hours
    * pruned scan). */
  def stations(observations: DataFrame): DataFrame =
    observations
      .select("station_id", "station_name", "latitude", "longitude")
      .distinct()
}
