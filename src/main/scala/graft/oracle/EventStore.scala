package graft.oracle

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Event-store rows (crates/oracle/src/db/event_db_migrations.rs:36-111;
  * FIXTURES.md §3). Enums become validated strings; the weather STRUCT
  * columns are native Spark structs — the reference needed ~400 LoC of
  * manual OrderedMap marshalling for these (db/mod.rs:775-1215).
  */
final case class WeatherReading(
    reading_date: Timestamp,
    temp_low: Long,
    temp_high: Long,
    wind_speed: Long)

final case class EventRow(
    id: String,
    total_allowed_entries: Int,
    number_of_places_win: Int,
    number_of_values_per_entry: Int,
    signing_date: Timestamp,
    observation_date: Timestamp,
    locations: Seq[String],
    coordinator_pubkey: String,
    nonce: Option[Array[Byte]],
    event_announcement: Option[Array[Byte]],
    attestation_signature: Option[Array[Byte]],
    created_at: Timestamp,
    updated_at: Timestamp)

final case class EntryRow(
    id: String,
    event_id: String,
    score: Long,
    created_at: Timestamp,
    updated_at: Timestamp)

final case class ChoiceRow(
    id: Long,
    entry_id: String,
    station: String,
    temp_low: Option[String],
    temp_high: Option[String],
    wind_speed: Option[String])

final case class WeatherRow(
    id: String,
    station_id: String,
    observed: Option[WeatherReading],
    forecasted: Option[WeatherReading],
    created_at: Timestamp,
    updated_at: Timestamp)

final case class EventWeatherRow(
    id: String,
    event_id: String,
    weather_id: String,
    created_at: Timestamp)

/** Parquet-backed relational event store (SURVEY §2.1 S13) with
  * MERGE-style updates done as read-join-swap (J5). Single-writer by
  * design, like the reference's lock-retried DuckDB file; the API is
  * Delta-shaped so a transactional table format can slot in unchanged.
  */
final class EventStore(spark: SparkSession, root: String) {
  import spark.implicits._

  val choiceValues: Set[String] = Set("over", "par", "under")

  private def path(table: String) = s"$root/$table"

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableExists(table: String): Boolean = fs.exists(new Path(path(table)))

  private def readOr[T: org.apache.spark.sql.Encoder](table: String): Dataset[T] =
    if (tableExists(table)) spark.read.parquet(path(table)).as[T]
    else spark.emptyDataset[T]

  def events: Dataset[EventRow] = readOr[EventRow]("events")
  def entries: Dataset[EntryRow] = readOr[EntryRow]("events_entries")
  def choices: Dataset[ChoiceRow] = readOr[ChoiceRow]("expected_observations")
  def weather: Dataset[WeatherRow] = readOr[WeatherRow]("weather")
  def eventWeather: Dataset[EventWeatherRow] = readOr[EventWeatherRow]("events_weather")

  def insertEvents(rows: Seq[EventRow]): Unit = append("events", rows.toDS().toDF())

  def insertEntries(rows: Seq[EntryRow], rowChoices: Seq[ChoiceRow]): Unit = {
    require(rowChoices.forall(c =>
      Seq(c.temp_low, c.temp_high, c.wind_speed).flatten.forall(choiceValues.contains)),
      s"choice values must be one of $choiceValues")
    append("events_entries", rows.toDS().toDF())
    append("expected_observations", rowChoices.toDS().toDF())
  }

  def insertWeather(rows: Seq[WeatherRow], links: Seq[EventWeatherRow]): Unit = {
    append("weather", rows.toDS().toDF())
    append("events_weather", links.toDS().toDF())
  }

  private def append(table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(path(table))

  /** J5 — correlated-update equivalent (event_data.rs:405-448):
    * entries.score = scores.score where matched. Read-join-swap. */
  def updateScores(scores: DataFrame): Unit = {
    // scores usually derive from this very table (read → score → write
    // back); localCheckpoint breaks the lineage so the swap below can't
    // invalidate the plan mid-write.
    val s = scores.select(col("entry_id"), col("score").as("new_score"))
      .localCheckpoint(true)
    val updated = entries.toDF()
      .join(broadcast(s), col("id") === col("entry_id"), "left")
      .withColumn("score", coalesce(col("new_score"), col("score")))
      .drop("entry_id", "new_score")
    swapWrite("events_entries", updated)
  }

  /** Attestation write-back (event_data.rs:385-402). */
  def updateAttestation(eventId: String, signature: Array[Byte]): Unit = {
    val updated = events.toDF()
      .withColumn("attestation_signature",
        when(col("id") === eventId, lit(signature)).otherwise(col("attestation_signature")))
    swapWrite("events", updated)
  }

  /** Overwrite a table that is also the read source: materialize to a
    * temp dir, then atomically swap directories. */
  private def swapWrite(table: String, df: DataFrame): Unit = {
    val tmp = new Path(path(table) + ".tmp")
    val dst = new Path(path(table))
    val bak = new Path(path(table) + ".bak")
    df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(dst)) fs.rename(dst, bak)
    fs.rename(tmp, dst)
    fs.delete(bak, true)
  }

  /** J4 + A4 + P6 — active events (no attestation yet) with entry counts,
    * COALESCE(total_entries, 0) (event_data.rs:700-738). */
  def activeEvents(): DataFrame = {
    val counts = entries.groupBy(col("event_id")).agg(count(lit(1)).as("total_entries"))
    events.toDF()
      .where(col("attestation_signature").isNull)
      .join(counts, col("id") === col("event_id"), "left")
      .drop("event_id")
      .na.fill(0L, Seq("total_entries"))
  }

  /** J1 — per-event weather rows via the 3-way join (event_data.rs:450-472). */
  def eventWeatherRows(eventId: String): DataFrame =
    eventWeather.toDF().where(col("event_id") === eventId)
      .join(events.toDF().select(col("id").as("event_id")).where(col("event_id") === eventId), Seq("event_id"))
      .join(weather.toDF().select(col("id").as("weather_id"), col("station_id"),
        col("observed"), col("forecasted")), Seq("weather_id"))

  /** J3 + J6 — entries of an event with their choices collected into an
    * ordered struct array (replaces the Rust-side HashMap merge,
    * event_data.rs:474-537). */
  def entriesWithChoices(eventId: String): DataFrame =
    entries.toDF().where(col("event_id") === eventId)
      .join(choices.toDF().select(col("entry_id"), col("id").as("choice_id"),
          col("station"), col("temp_low"), col("temp_high"), col("wind_speed")),
        col("id") === col("entry_id"), "left")
      .groupBy(col("id"), col("event_id"), col("score"), col("created_at"))
      .agg(sort_array(collect_list(struct(
        col("choice_id"), col("station"),
        col("temp_low"), col("temp_high"), col("wind_speed")))).as("expected_observations"))
}
