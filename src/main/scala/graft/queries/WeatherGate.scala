package graft.queries

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{Dwml, DwmlFlatten}
import graft.oracle.Scoring
import graft.oracle.Uuid7

/** Weather-domain semantics in the driver's correctness gate: these
  * queries run the real engine code (DWML flatten, A1/A2 rollups, A6/A7
  * scoring) over pinned in-code fixtures, with DuckDB oracle SQL that
  * recomputes the expected result independently (generate_series for the
  * 3-h grid, VALUES + CASE for scoring). The sfDir argument is unused —
  * the fixtures ARE the dataset, like the reference's golden ETL test.
  */
object WeatherGate {

  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  // ---- w1: DWML flatten (S6 + W1 + W2) --------------------------------

  private val dwmlXml =
    """<dwml><head><product><creation-date>2024-08-12T00:00:00Z</creation-date></product></head>
      |<data>
      |<location><location-key>point1</location-key>
      |  <point latitude="44.56" longitude="-95.12"/>
      |  <station-id>KXYZ</station-id></location>
      |<time-layout><layout-key>k-p24h-n2-1</layout-key>
      |  <start-valid-time>2024-08-12T00:00:00-00:00</start-valid-time>
      |  <start-valid-time>2024-08-13T00:00:00-00:00</start-valid-time></time-layout>
      |<parameters applicable-location="point1">
      |  <temperature type="maximum" units="Fahrenheit" time-layout="k-p24h-n2-1">
      |    <value>83</value><value>79</value></temperature>
      |  <temperature type="minimum" units="Fahrenheit" time-layout="k-p24h-n2-1">
      |    <value>61</value><value>58</value></temperature>
      |  <wind-speed type="sustained" units="knots" time-layout="k-p24h-n2-1">
      |    <value>9</value><value>11</value></wind-speed>
      |</parameters></data></dwml>""".stripMargin

  // ---- w2/w3 fixtures: forecast slots with a duplicated slot ----------

  private def forecastSlots(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("KXYZ", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T03:00:00Z"), 10L, 30L, 5L),
      ("KXYZ", ts("2024-08-12T03:00:00Z"), ts("2024-08-12T06:00:00Z"), 12L, 28L, 7L),
      // duplicate slot from an overlapping snapshot, drifted min_temp
      ("KXYZ", ts("2024-08-12T00:00:00Z"), ts("2024-08-12T03:00:00Z"), 11L, 30L, 5L),
      ("KXYZ", ts("2024-08-13T02:00:00Z"), ts("2024-08-13T05:00:00Z"), 9L, 25L, 4L),
      ("KABC", ts("2024-08-12T06:00:00Z"), ts("2024-08-12T09:00:00Z"), 15L, 33L, 11L)
    ).toDF("station_id", "begin_time", "end_time", "min_temp", "max_temp", "wind_speed")
  }

  private val forecastSlotsSql =
    """(VALUES
      ('KXYZ', TIMESTAMP '2024-08-12 00:00:00', TIMESTAMP '2024-08-12 03:00:00', 10, 30, 5),
      ('KXYZ', TIMESTAMP '2024-08-12 03:00:00', TIMESTAMP '2024-08-12 06:00:00', 12, 28, 7),
      ('KXYZ', TIMESTAMP '2024-08-12 00:00:00', TIMESTAMP '2024-08-12 03:00:00', 11, 30, 5),
      ('KXYZ', TIMESTAMP '2024-08-13 02:00:00', TIMESTAMP '2024-08-13 05:00:00', 9, 25, 4),
      ('KABC', TIMESTAMP '2024-08-12 06:00:00', TIMESTAMP '2024-08-12 09:00:00', 15, 33, 11)
     ) f(station_id, begin_time, end_time, min_temp, max_temp, wind_speed)"""

  private def observationRows(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      ("KXYZ", ts("2024-08-12T01:00:00Z"), Some(10.5), Some(5L)),
      ("KXYZ", ts("2024-08-12T05:00:00Z"), Some(22.1), Some(9L)),
      ("KXYZ", ts("2024-08-12T09:00:00Z"), None, None),
      ("KABC", ts("2024-08-12T02:00:00Z"), Some(30.0), Some(12L))
    ).toDF("station_id", "generated_at", "temperature_value", "wind_speed")
  }

  private val observationRowsSql =
    """(VALUES
      ('KXYZ', TIMESTAMP '2024-08-12 01:00:00', 10.5, 5),
      ('KXYZ', TIMESTAMP '2024-08-12 05:00:00', 22.1, 9),
      ('KXYZ', TIMESTAMP '2024-08-12 09:00:00', NULL, NULL),
      ('KABC', TIMESTAMP '2024-08-12 02:00:00', 30.0, 12)
     ) o(station_id, generated_at, temperature_value, wind_speed)"""

  // ---- w4/w5 fixtures: the golden ETL scoring inputs ------------------

  private val e1 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.100Z"), 0, 0)
  private val e2 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.200Z"), 0, 0)
  private val e3 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.300Z"), 0, 0)
  private val e4 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.400Z"), 0, 0)

  private val choiceRows: Seq[(String, String, Option[String], Option[String], Option[String])] = Seq(
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
    (e4, "KWMC", Some("par"), None, Some("under")))

  private def sqlOpt(v: Option[String]) = v.map(x => s"'$x'").getOrElse("NULL")

  private val scoringCtes = {
    val choiceValues = choiceRows.map { case (id, st, lo, hi, w) =>
      s"('$id', '$st', ${sqlOpt(lo)}, ${sqlOpt(hi)}, ${sqlOpt(w)})"
    }.mkString(",\n      ")
    s"""choices(entry_id, station, temp_low, temp_high, wind_speed) AS (VALUES
      $choiceValues),
    f(station, f_low, f_high, f_wind) AS (VALUES
      ('PFNO', 9, 35, 8), ('KSAW', 17, 25, 3), ('PAPG', 14, 17, 6), ('KWMC', 31, 33, 11)),
    o(station, o_low, o_high, o_wind) AS (
      SELECT station, CAST(round(lo) AS BIGINT), CAST(round(hi) AS BIGINT), w FROM (VALUES
        ('PFNO', 9.4, 35.0, 11), ('KSAW', 22.0, 25.0, 10),
        ('PAPG', 15.0, 16.0, 6), ('KWMC', 32.8, 34.4, 11)) t(station, lo, hi, w)),
    pts AS (
      SELECT entry_id,
        CASE WHEN temp_low = 'over'  AND f_low < o_low THEN 10
             WHEN temp_low = 'par'   AND f_low = o_low THEN 20
             WHEN temp_low = 'under' AND f_low > o_low THEN 10 ELSE 0 END +
        CASE WHEN temp_high = 'over'  AND f_high < o_high THEN 10
             WHEN temp_high = 'par'   AND f_high = o_high THEN 20
             WHEN temp_high = 'under' AND f_high > o_high THEN 10 ELSE 0 END +
        CASE WHEN wind_speed = 'over'  AND f_wind < o_wind THEN 10
             WHEN wind_speed = 'par'   AND f_wind = o_wind THEN 20
             WHEN wind_speed = 'under' AND f_wind > o_wind THEN 10 ELSE 0 END AS p
      FROM choices JOIN f USING (station) JOIN o USING (station)),
    scores AS (
      SELECT entry_id, CAST(SUM(p) AS BIGINT) AS base_score,
        CAST(SUM(p) * 10000 + (9999 - CAST(list_sum(list_transform(range(0, 12),
          i -> (strpos('0123456789abcdef', substr(replace(entry_id, '-', ''), i + 1, 1)) - 1)
               * CAST(16 ** (11 - i) AS BIGINT))) AS BIGINT) % 10000) AS BIGINT) AS score
      FROM pts GROUP BY entry_id)"""
  }

  private def scoresDf(s: SparkSession): DataFrame = {
    import s.implicits._
    val choices = choiceRows.toDF("entry_id", "station", "temp_low", "temp_high", "wind_speed")
    val f = Seq(("PFNO", 9L, 35L, 8L), ("KSAW", 17L, 25L, 3L),
      ("PAPG", 14L, 17L, 6L), ("KWMC", 31L, 33L, 11L))
      .toDF("station_id", "temp_low", "temp_high", "wind_speed")
    val o = Seq(("PFNO", 9.4, 35.0, 11L), ("KSAW", 22.0, 25.0, 10L),
      ("PAPG", 15.0, 16.0, 6L), ("KWMC", 32.8, 34.4, 11L))
      .toDF("station_id", "temp_low", "temp_high", "wind_speed")
    Scoring.scoreEntries(choices, f, o)
  }

  val all: Seq[Q] = Seq(

    // S6 + W1 + W2 — the DWML flatten itself: 3-h grid over one week,
    // interval-index assignment, per-metric forward fill. The oracle
    // recomputes the grid independently with generate_series.
    Q("w1_dwml_flatten",
      (s, d) => {
        val now = ts("2024-08-12T00:00:00Z")
        DwmlFlatten.flatten(s, Dwml.parse(dwmlXml, now), now)
          .select(col("station_id"), col("begin_time"), col("end_time"),
            col("max_temp"), col("min_temp"), col("wind_speed"),
            col("temperature_unit_code"), col("wind_speed_unit_code"))
          .orderBy("begin_time")
      },
      Some("""SELECT 'KXYZ' AS station_id, g AS begin_time,
          g + INTERVAL 3 HOUR AS end_time,
          CASE WHEN g < TIMESTAMP '2024-08-13 00:00:00' THEN 83 ELSE 79 END AS max_temp,
          CASE WHEN g < TIMESTAMP '2024-08-13 00:00:00' THEN 61 ELSE 58 END AS min_temp,
          CASE WHEN g < TIMESTAMP '2024-08-13 00:00:00' THEN 9 ELSE 11 END AS wind_speed,
          'fahrenheit' AS temperature_unit_code, 'knots' AS wind_speed_unit_code
        FROM generate_series(TIMESTAMP '2024-08-12 00:00:00',
                             TIMESTAMP '2024-08-19 00:00:00', INTERVAL 3 HOUR) t(g)
        ORDER BY begin_time""")),

    // A1 — the flagship two-level daily forecast rollup over slot rows
    // with a duplicated slot (level 1 must collapse it).
    Q("w2_forecast_daily",
      (s, d) => WeatherQueries.forecastsDaily(forecastSlots(s))
        .orderBy("station_id", "date"),
      Some(s"""WITH l1 AS (
          SELECT station_id, begin_time,
            strftime(date_trunc('day', begin_time), '%Y-%m-%d') AS date,
            MIN(begin_time) AS start_time, MAX(end_time) AS end_time,
            CAST(MIN(min_temp) AS BIGINT) AS temp_low,
            CAST(MAX(max_temp) AS BIGINT) AS temp_high,
            CAST(MAX(wind_speed) AS BIGINT) AS wind_speed
          FROM $forecastSlotsSql GROUP BY station_id, begin_time)
        SELECT station_id, date, MIN(start_time) AS start_time, MAX(end_time) AS end_time,
          MIN(temp_low) AS temp_low, MAX(temp_high) AS temp_high, MAX(wind_speed) AS wind_speed
        FROM l1 GROUP BY station_id, date ORDER BY station_id, date""")),

    // A2 — observation summary with null temperature/wind rows.
    Q("w3_observation_summary",
      (s, d) => WeatherQueries.observationSummary(observationRows(s))
        .orderBy("station_id"),
      Some(s"""SELECT station_id, MIN(generated_at) AS start_time, MAX(generated_at) AS end_time,
          MIN(CAST(temperature_value AS DOUBLE)) AS temp_low,
          MAX(CAST(temperature_value AS DOUBLE)) AS temp_high,
          CAST(MAX(wind_speed) AS BIGINT) AS wind_speed
        FROM $observationRowsSql GROUP BY station_id ORDER BY station_id""")),

    // A6 — the golden ETL scoring (409899/309799/409699/109599): choice ⋈
    // forecast ⋈ observation, rust-round semantics, UUIDv7 tiebreak. The
    // oracle recomputes everything from VALUES, including the millis
    // extraction from the uuid string.
    Q("w4_scoring_golden",
      (s, d) => scoresDf(s).orderBy("entry_id"),
      Some(s"""WITH $scoringCtes
        SELECT entry_id, base_score, score FROM scores ORDER BY entry_id""")),

    // A7/W3 — winner ranking + stable outcome indices over the golden
    // scores.
    Q("w5_winners",
      (s, d) => Scoring.winners(scoresDf(s), 3),
      Some(s"""WITH $scoringCtes,
        indexed AS (
          SELECT entry_id, score,
            CAST(ROW_NUMBER() OVER (ORDER BY entry_id) - 1 AS BIGINT) AS outcome_index
          FROM scores)
        SELECT CAST(rnk AS INT) AS rank, entry_id, score, outcome_index FROM (
          SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, entry_id) AS rnk FROM indexed)
        WHERE rnk <= 3 ORDER BY rank"""))
  )
}
