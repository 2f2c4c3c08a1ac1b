package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ingest.{Dwml, DwmlFlatten, XmlSources}
import graft.oracle._
import graft.queries.WeatherQueries
import graft.sql.AdHoc
import graft.store.WeatherStore
import graft.store.WeatherStore.Kinds

/** End-to-end drive of the weather engine through its public API:
  * XML ingest → DWML flatten → partitioned store → pruned read →
  * A1/A2/A3 queries → event store → scoring → winners. The runnable
  * equivalent of the reference's §3.1/§3.2 query lifecycles.
  */
object WeatherDemo {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val now = Timestamp.from(Instant.parse("2024-08-12T00:00:00Z"))
    val root = java.nio.file.Files.createTempDirectory("graft-demo").toString

    // 1. ingest: METAR observations + DWML forecasts
    val metarXml =
      """<response><data>
        |<METAR><station_id>KXYZ</station_id>
        |  <observation_time>2024-08-12T01:00:00Z</observation_time>
        |  <latitude>44.56</latitude><longitude>-95.12</longitude>
        |  <temp_c>21.5</temp_c><wind_speed_kt>8</wind_speed_kt></METAR>
        |<METAR><station_id>KXYZ</station_id>
        |  <observation_time>2024-08-12T07:00:00Z</observation_time>
        |  <latitude>44.56</latitude><longitude>-95.12</longitude>
        |  <temp_c>28.0</temp_c><wind_speed_kt>12</wind_speed_kt></METAR>
        |</data></response>""".stripMargin
    val observations = XmlSources.metarsDataset(spark, metarXml)

    val dwmlXml =
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
    val forecasts = DwmlFlatten.flatten(spark, Dwml.parse(dwmlXml, now), now)

    // 2. store: partitioned snapshots + pruned read-back
    val store = new WeatherStore(spark, root)
    store.write(observations.toDF(), Kinds.Observations, Timestamp.from(Instant.parse("2024-08-12T02:00:00Z")))
    store.write(forecasts.toDF(), Kinds.Forecasts, Timestamp.from(Instant.parse("2024-08-12T01:00:00Z")))

    val end = Timestamp.from(Instant.parse("2024-08-13T00:00:00Z"))
    val fRead = store.read(Kinds.Forecasts, now, end).get
    val oRead = store.read(Kinds.Observations, now, end).get

    // 3. queries: A1 / A2 / A3 + ad-hoc SQL with the SELECT-only guard
    val daily = WeatherQueries.forecastsDaily(fRead, Seq("KXYZ"), Some(now), Some(end))
    val summary = WeatherQueries.observationSummary(oRead, Seq("KXYZ"), Some(now), Some(end))
    println("A1 daily forecast rollup:")
    daily.show(false)
    println("A2 observation summary:")
    summary.show(false)
    println("A3 stations: " + WeatherQueries.stations(oRead).count())

    AdHoc.registerViews(spark, Map("observations" -> oRead, "forecasts" -> fRead))
    println("ad-hoc SQL rows: " + AdHoc.run(spark,
      "SELECT station_id, count(*) AS n FROM forecasts GROUP BY station_id").collect().mkString)

    // 4. oracle: event + entries + scoring + winners
    val events = new EventStore(spark, s"$root/events")
    val eventId = Uuid7.generate()
    events.insertEvents(Seq(EventRow(eventId, 4, 1, 6, end, now, Seq("KXYZ"), "pk",
      Some(Array[Byte](1)), None, None, now, now)))
    val entry1 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.100Z"), 0, 0)
    val entry2 = Uuid7.generateDeterministic(Instant.parse("2024-08-11T00:00:00.200Z"), 0, 0)
    events.insertEntries(
      Seq(EntryRow(entry1, eventId, 0, now, now), EntryRow(entry2, eventId, 0, now, now)),
      Seq(ChoiceRow(1, entry1, "KXYZ", Some("par"), Some("under"), Some("over")),
        ChoiceRow(2, entry2, "KXYZ", Some("over"), Some("par"), Some("under"))))

    val fAgg = daily.select(col("station_id"), col("temp_low"), col("temp_high"), col("wind_speed"))
    val oAgg = summary.select(col("station_id"), col("temp_low"), col("temp_high"), col("wind_speed"))
    val choiceDf = events.choices.toDF().select(
      col("entry_id"), col("station"), col("temp_low"), col("temp_high"), col("wind_speed"))
    val scores = Scoring.scoreAllEntries(
      events.entries.select(col("id").as("entry_id")).toDF(), choiceDf, fAgg, oAgg)
      .localCheckpoint(true) // materialize before the merge swaps the entry files
    events.updateScores(scores.select(col("entry_id"), col("score")))
    println("scores after merge:")
    events.entries.toDF().select("id", "score").show(false)

    val w = Scoring.winners(scores, 3).collect()
    println("winners: " + w.map(r =>
      s"rank=${r.getAs[Int]("rank")} idx=${r.getAs[Long]("outcome_index")} score=${r.getAs[Long]("score")}").mkString(", "))
    val bytes = Scoring.winningBytes(w.map(_.getAs[Long]("outcome_index")).toSeq)
    events.updateAttestation(eventId, bytes)
    println("active events after signing: " + events.activeEvents().count())

    // 5. streaming: snapshot landing dir → dedup ingest (AvailableNow)
    val landing = s"$root/landing"; val streamed = s"$root/streamed"
    forecasts.toDF().coalesce(1).write.parquet(s"$landing/snap1")
    forecasts.toDF().coalesce(1).write.parquet(s"$landing/snap2") // duplicate snapshot
    val q = graft.streaming.SnapshotStream.dedupedIngest(
      spark, s"$landing/*", forecasts.toDF().schema,
      Seq("station_id", "begin_time"), "begin_time", "1 day",
      streamed, s"$root/ckpt")
    q.awaitTermination()
    val streamedCount = spark.read.parquet(streamed).count()
    println(s"streamed dedup: ${forecasts.count() * 2} raw -> $streamedCount unique")

    // 6. multimodal: binary payload column + stubbed partition-local decode
    val media = graft.llm.Multimodal.mediaFromDocuments(spark,
      Seq((1L, "payload one"), (2L, "payload two")).toDF("doc_id", "text"))
    val feats = graft.llm.Multimodal.extractFeatures(media).collect()
    println("media features: " + feats.map(f => s"${f.doc_id}:${f.media_type}:${f.n_bytes}B").mkString(", "))

    println("DEMO OK")
    spark.stop()
  }
}
