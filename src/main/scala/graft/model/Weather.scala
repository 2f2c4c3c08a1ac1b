package graft.model

import java.sql.Timestamp

/** Core weather rows (SURVEY §1.1-1.2; FIXTURES.md §1-2).
  *
  * Upgrades vs the reference: timestamps are real `TimestampType` (UTC)
  * instead of RFC-3339 strings (the reference's strings are a
  * parquet_derive artifact — every query casts them back, e.g.
  * crates/oracle/src/db/weather_data.rs:94-128). RFC-3339 string views
  * belong at the API boundary only.
  */

/** One METAR surface observation, flattened
  * (crates/daemon/src/domains/observations/download_observations.rs:81-96). */
final case class Observation(
    station_id: String,
    station_name: String,
    latitude: Double,
    longitude: Double,
    generated_at: Timestamp,
    temperature_value: Option[Double],
    temperature_unit_code: String,
    wind_direction: Option[Long],
    wind_direction_unit_code: String,
    wind_speed: Option[Long],
    wind_speed_unit_code: String,
    dewpoint_value: Option[Double],
    dewpoint_unit_code: String)

/** One 3-hour forecast slot, flattened from DWML
  * (crates/daemon/src/domains/forecasts/download_forecast.rs:65-88). */
final case class Forecast(
    station_id: String,
    station_name: String,
    latitude: String,
    longitude: String,
    generated_at: Timestamp,
    begin_time: Timestamp,
    end_time: Timestamp,
    max_temp: Option[Long],
    min_temp: Option[Long],
    temperature_unit_code: String,
    wind_speed: Option[Long],
    wind_speed_unit_code: String,
    wind_direction: Option[Long],
    wind_direction_unit_code: String,
    relative_humidity_max: Option[Long],
    relative_humidity_min: Option[Long],
    relative_humidity_unit_code: String,
    liquid_precipitation_amt: Option[Double],
    liquid_precipitation_unit_code: String,
    twelve_hour_probability_of_precipitation: Option[Long],
    twelve_hour_probability_of_precipitation_unit_code: String)

/** A weather station from the NOAA index
  * (crates/daemon/src/coordinates.rs:163-231). */
final case class Station(
    station_id: String,
    station_name: String,
    latitude: Double,
    longitude: Double,
    elevation_m: Option[Double],
    country: Option[String],
    state: Option[String])

object Units {
  val Celsius = "celcius" // sic — matches the reference's spelling
  val Fahrenheit = "fahrenheit"
  val Knots = "knots"
  val DegreesTrue = "degrees true"
  val Percent = "percent"
  val Inches = "inches"
}

/** The 51 allowed state codes (50 states + DC,
  * crates/daemon/src/coordinates.rs:126-132). */
object UsStates {
  val codes: Set[String] = Set(
    "AL", "AK", "AZ", "AR", "CA", "CO", "CT", "DE", "DC", "FL", "GA", "HI",
    "ID", "IL", "IN", "IA", "KS", "KY", "LA", "ME", "MT", "NE", "NV", "NH",
    "NJ", "NM", "NY", "NC", "ND", "OH", "OK", "OR", "MD", "MA", "MI", "MN",
    "MS", "MO", "PA", "RI", "SC", "SD", "TN", "TX", "UT", "VT", "VA", "WA",
    "WV", "WI", "WY")
}
