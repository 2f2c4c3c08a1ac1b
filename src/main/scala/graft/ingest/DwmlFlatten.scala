package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{Forecast, Units}

/** Spark-first re-expression of the reference's DWML flatten — the
  * trickiest semantics in the system ("THIS IS WHERE THE FLATTENING OF
  * THE DATA OCCURS", download_forecast.rs:315).
  *
  * Reference algorithm (download_forecast.rs:316-589):
  *  1. per location, build a 3-hour slot grid over [now, now + 1 week]
  *     (:792-829);
  *  2. per (slot, metric): interval index = (# of layout range starts ≤
  *     slot begin) − 1, i.e. assignment by *last start at-or-before*,
  *     ends ignored (:573-589);
  *  3. value = reading.values[index] if it parses, else the last value
  *     seen while walking slots in time order (single accumulator,
  *     :431-571) — i.e. per-metric forward fill.
  *
  * Spark mapping: slot grid = `explode(sequence(...))` (W-grid, no
  * driver loop); interval assignment = equi-join on layout_key with a
  * `start ≤ begin` predicate + max(idx) aggregation (W2); forward fill =
  * `last(col, ignoreNulls = true)` over an unbounded-preceding window
  * per (location, metric) (W1). No UDFs, no custom Catalyst work —
  * everything stays in whole-stage codegen.
  *
  * Scale: slots are data-parallel per location; layouts per document are
  * tiny (≤ ~60 ranges) → broadcast; the only shuffle is the final window
  * partitioned by location_key.
  */
object DwmlFlatten {

  private val longMetrics =
    Seq("max_temp", "min_temp", "rh_max", "rh_min", "pop12", "wind_speed", "wind_dir")

  /** The grid/interval/fill/pivot pipeline shared by the single-document
    * and corpus entry points, parameterized by the grouping-key prefix
    * (`Seq()` for one document, `Seq("doc_id")` for a corpus — the keys
    * join every join, aggregation, and window partition) and by a
    * dimension hint (`broadcast` for the tiny single-document frames,
    * identity for corpus-sized ones).
    *
    * @param locations (keys..., locationKey, latitude, longitude,
    *                  stationId, generated_at)
    * @param layouts   (keys..., layoutKey, idx, rangeStart)
    * @param readings  (keys..., locationKey, metric, units, layoutKey, values)
    * @return keys... followed by [[Forecast]]'s columns */
  private def flattenFrames(locations: DataFrame, layouts: DataFrame,
      readings: DataFrame, keys: Seq[String], now: Timestamp,
      dimHint: DataFrame => DataFrame): DataFrame = {

    // 1. 3-hour slot grid per (keys, location): [now, now+1w] inclusive.
    val slots = locations.select((keys :+ "locationKey").map(col): _*)
      .withColumn("begin_time",
        explode(sequence(
          lit(now), lit(new Timestamp(now.getTime + 7L * 24 * 3600 * 1000)),
          expr("INTERVAL 3 HOURS"))))
      .withColumn("end_time", col("begin_time") + expr("INTERVAL 3 HOURS"))

    // 2. interval index per (slot, reading): last layout start ≤ begin.
    //    Layout columns are l_-renamed so the range join is unambiguous.
    val layoutsR = dimHint(layouts.select(
      keys.map(k => col(k).as(s"l_$k")) ++
        Seq(col("layoutKey").as("l_layoutKey"), col("idx"), col("rangeStart")): _*))
    val layoutCond = keys
      .map(k => col(k) === col(s"l_$k"))
      .foldLeft(col("layoutKey") === col("l_layoutKey") &&
        col("rangeStart") <= col("begin_time"))(_ && _)
    val slotReadings = slots
      .join(readings, keys :+ "locationKey")
      .join(layoutsR, layoutCond, "left")
      .groupBy((keys ++ Seq("locationKey", "begin_time", "end_time",
        "metric", "units", "values")).map(col): _*)
      .agg(max(col("idx")).as("interval_idx"))

    // 3. raw value at the index (null when no interval, when the layout
    //    has more range starts than the reading has values — the
    //    reference's `values.get(idx)` returning None — or when
    //    unparseable), then per-(keys, location, metric) forward fill in
    //    slot order.
    // try_element_at, not element_at: under ANSI mode the latter THROWS
    // on an out-of-range interval index (caught by DwmlFlattenFuzzSpec).
    // try_cast = the reference's `value.parse::<i64>().ok()` (null on
    // malformed, e.g. the empty strings NDFD emits at layout tails).
    val valued = slotReadings
      .withColumn("raw", expr("try_element_at(values, interval_idx + 1)"))
      .withColumn("val_long",
        when(col("metric").isin(longMetrics: _*), expr("try_cast(raw AS BIGINT)")))
      .withColumn("val_double",
        when(col("metric") === "precip", expr("try_cast(raw AS DOUBLE)")))

    val w = Window.partitionBy((keys ++ Seq("locationKey", "metric")).map(col): _*)
      .orderBy("begin_time")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valued
      .withColumn("fill_long", last(col("val_long"), ignoreNulls = true).over(w))
      .withColumn("fill_double", last(col("val_double"), ignoreNulls = true).over(w))

    // 4. pivot metrics to columns.
    def metricCol(m: String) = max(when(col("metric") === m,
      if (m == "precip") col("fill_double") else col("fill_long"))).as(m)
    def unitCol(m: String, default: String, name: String) =
      coalesce(max(when(col("metric") === m, col("units"))), lit(default)).as(name)

    val pivoted = filled
      .groupBy((keys ++ Seq("locationKey", "begin_time", "end_time")).map(col): _*)
      .agg(
        metricCol("max_temp"), metricCol("min_temp"), metricCol("rh_max"),
        metricCol("rh_min"), metricCol("precip"), metricCol("pop12"),
        metricCol("wind_speed"), metricCol("wind_dir"),
        unitCol("max_temp", Units.Fahrenheit, "temperature_unit_code"),
        unitCol("wind_speed", Units.Knots, "wind_speed_unit_code"),
        unitCol("wind_dir", Units.DegreesTrue, "wind_direction_unit_code"),
        unitCol("rh_max", Units.Percent, "relative_humidity_unit_code"),
        unitCol("precip", Units.Inches, "liquid_precipitation_unit_code"),
        unitCol("pop12", Units.Percent,
          "twelve_hour_probability_of_precipitation_unit_code"))

    // Locations with no readings at all still get their (empty) grid —
    // join back to slots to preserve them, like the reference's
    // pre-seeded per-location vectors.
    val grid = slots.join(pivoted,
      keys ++ Seq("locationKey", "begin_time", "end_time"), "left")

    // 5. station ids + fixed columns; drop locations without a station id
    //    (download_forecast.rs:404-412).
    grid
      .join(dimHint(locations), keys :+ "locationKey")
      .where(col("stationId").isNotNull)
      .select(keys.map(col) ++ Seq(
        col("stationId").as("station_id"),
        lit("").as("station_name"),
        col("latitude"),
        col("longitude"),
        col("generated_at"),
        col("begin_time"),
        col("end_time"),
        col("max_temp"),
        col("min_temp"),
        coalesce(col("temperature_unit_code"), lit(Units.Fahrenheit)).as("temperature_unit_code"),
        col("wind_speed"),
        coalesce(col("wind_speed_unit_code"), lit(Units.Knots)).as("wind_speed_unit_code"),
        col("wind_dir").as("wind_direction"),
        coalesce(col("wind_direction_unit_code"), lit(Units.DegreesTrue)).as("wind_direction_unit_code"),
        col("rh_max").as("relative_humidity_max"),
        col("rh_min").as("relative_humidity_min"),
        coalesce(col("relative_humidity_unit_code"), lit(Units.Percent)).as("relative_humidity_unit_code"),
        col("precip").as("liquid_precipitation_amt"),
        coalesce(col("liquid_precipitation_unit_code"), lit(Units.Inches)).as("liquid_precipitation_unit_code"),
        col("pop12").as("twelve_hour_probability_of_precipitation"),
        coalesce(col("twelve_hour_probability_of_precipitation_unit_code"), lit(Units.Percent))
          .as("twelve_hour_probability_of_precipitation_unit_code")): _*)
  }

  /** Flatten one decoded DWML document into the 3-h Forecast grid.
    *
    * One document is small by construction (≤ 50 stations/chunk × ~56
    * slots), so its frames are built single-partition: the per-stage task
    * fan-out would otherwise dominate runtime (32 near-empty tasks ×
    * every stage). Corpus-level parallelism comes from flattening MANY
    * documents — each an independent flatten over its own partition — not
    * from splitting one document across the cluster. */
  def flatten(spark: SparkSession, doc: DwmlDoc, now: Timestamp): Dataset[Forecast] = {
    import spark.implicits._

    // Dwml.parse guarantees this (last block wins); a hand-built doc
    // with duplicates would tie nondeterministically in the fill window.
    require(doc.readings.map(r => (r.locationKey, r.metric)).distinct.size ==
      doc.readings.size,
      "duplicate (location, metric) readings — parse with Dwml.parse (last block wins)")

    def one[T: org.apache.spark.sql.Encoder](rows: Seq[T]): Dataset[T] =
      spark.createDataset(rows).coalesce(1)

    flattenFrames(
      one(doc.locations).toDF().withColumn("generated_at", lit(doc.generatedAt)),
      one(doc.layouts).toDF(),
      one(doc.readings).toDF(),
      keys = Seq.empty, now = now, dimHint = broadcast)
      .as[Forecast]
  }

  /** Flatten MANY DWML documents in ONE job — corpus-level parallelism
    * as an API, not a per-document driver loop. The reference processes
    * ≤50-coordinate chunks in a loop (download_forecast.rs:683-720);
    * here every chunk's XML is one input row and the whole corpus is a
    * single plan: partition-local parse (`map`, the only imperative
    * step), then the same grid/interval/fill/pivot pipeline as
    * [[flatten]] with `doc_id` added to every join key, aggregation key,
    * and window partition — so a million documents shuffle by document,
    * and no per-document work ever serializes through the driver.
    *
    * The parsed corpus is materialized once because four plan subtrees
    * consume it (grid, readings, layouts, final location join); without
    * it each subtree would re-parse the XML. Two modes:
    *  - default (`reliableCache = false`): eager `localCheckpoint` —
    *    blocks are auto-released by the ContextCleaner once the result
    *    plan is collected (no CacheManager pinning for a
    *    fire-and-forget API), but a LOST executor aborts the job
    *    because the truncated lineage cannot recompute its blocks;
    *  - `reliableCache = true`: `persist(MEMORY_AND_DISK)` — lost
    *    blocks recompute from lineage (use under dynamic allocation /
    *    preemptible executors), at the cost that the cached corpus
    *    stays pinned until `spark.catalog.clearCache()`.
    *
    * @param docs (doc_id, dwml xml) rows; doc_id must be unique
    * @param stationIndex optional station index (station_id,
    *   station_name, latitude: Double, longitude: Double). Wild DWML
    *   carries no station ids, and the reference attaches them by
    *   2-dp coordinate match against its station list BEFORE building
    *   rows (download_forecast.rs:831-863) — locations that match
    *   nothing are the ones flattenFrames then drops. Supply it here
    *   for that ingest behavior; omit it for pre-labelled documents.
    * @return [[flatten]]'s Forecast columns, plus `doc_id` first */
  def flattenAll(spark: SparkSession, docs: Dataset[(String, String)],
      now: Timestamp, reliableCache: Boolean = false,
      stationIndex: Option[DataFrame] = None): DataFrame = {
    import spark.implicits._

    // one malformed document must not kill a million-document job: drop
    // it (with an executor-side warning) and flatten the rest — the
    // same skip-and-continue the single-doc ingest loop gets from its
    // per-cycle retry
    val parsedBase = docs
      .flatMap { case (id, xml) =>
        scala.util.Try(Dwml.parse(xml, now)) match {
          case scala.util.Success(doc) => Some((id, doc))
          case scala.util.Failure(e) =>
            org.slf4j.LoggerFactory.getLogger(getClass)
              .warn(s"skipping unparseable DWML doc '$id': ${e.getMessage}")
            None
        }
      }
      .toDF("doc_id", "doc")
    val parsed =
      if (reliableCache)
        parsedBase.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else parsedBase.localCheckpoint(true)

    val locationsRaw = parsed.select(col("doc_id"),
        col("doc.generatedAt").as("generated_at"),
        explode(col("doc.locations")).as("loc"))
      .select(col("doc_id"), col("generated_at"),
        col("loc.locationKey").as("locationKey"),
        col("loc.latitude").as("latitude"),
        col("loc.longitude").as("longitude"),
        col("loc.stationId").as("stationId"))
    // Pre-flatten station attach: fill missing ids by broadcast 2-dp
    // coordinate equi-join (the station index is small — the NOAA list
    // is ~thousands of rows — so this never shuffles the corpus).
    // format_string("%.2f") — NOT format_number, whose HALF_EVEN differs
    // from the HALF_UP of the String.format("%.2f") that produced the
    // DWML location strings (Fetch.StationCoord): a midpoint coordinate
    // would mismatch and silently drop the station.
    val locations = stationIndex.fold(locationsRaw) { idx =>
      val st = idx.select(
        col("station_id").as("st_id"),
        format_string("%.2f", col("latitude")).as("st_lat"),
        format_string("%.2f", col("longitude")).as("st_lon"))
      locationsRaw
        .join(broadcast(st),
          locationsRaw("latitude") === col("st_lat") &&
            locationsRaw("longitude") === col("st_lon"),
          "left")
        .withColumn("stationId", coalesce(col("stationId"), col("st_id")))
        .drop("st_id", "st_lat", "st_lon")
    }
    val layouts = parsed.select(col("doc_id"), explode(col("doc.layouts")).as("lay"))
      .select(col("doc_id"), col("lay.layoutKey").as("layoutKey"),
        col("lay.idx").as("idx"), col("lay.rangeStart").as("rangeStart"))
    val readings = parsed.select(col("doc_id"), explode(col("doc.readings")).as("r"))
      .select(col("doc_id"), col("r.locationKey").as("locationKey"),
        col("r.metric").as("metric"), col("r.units").as("units"),
        col("r.layoutKey").as("layoutKey"), col("r.values").as("values"))

    flattenFrames(locations, layouts, readings,
      keys = Seq("doc_id"), now = now, dimHint = identity)
  }

  /** Station-name enrichment via the 2-dp coordinate equi-match (J8,
    * download_forecast.rs:831-863): DWML locations carry no station ids
    * in the wild; they are matched to the station index by exact
    * 2-decimal string equality of (lat, lon). */
  def matchStations(forecasts: DataFrame, stations: DataFrame): DataFrame = {
    val st = stations.select(
      col("station_id").as("st_id"),
      col("station_name").as("st_name"),
      format_string("%.2f", col("latitude")).as("st_lat"),
      format_string("%.2f", col("longitude")).as("st_lon"))
    forecasts
      .join(broadcast(st),
        forecasts("latitude") === col("st_lat") &&
          forecasts("longitude") === col("st_lon"),
        "left")
      .withColumn("station_id",
        when(col("station_id") === "" || col("station_id").isNull, col("st_id"))
          .otherwise(col("station_id")))
      .withColumn("station_name", coalesce(col("st_name"), col("station_name")))
      .drop("st_id", "st_name", "st_lat", "st_lon")
  }
}
