package graft.ingest

import java.sql.Timestamp
import java.time.OffsetDateTime

import scala.xml.{Elem, Node, XML}

/** Decoded DWML (NDFD forecast) document
  * (crates/daemon/src/domains/forecasts/xml_forecast.rs:7-261).
  *
  * `layouts` keeps only range start times: interval assignment in the
  * reference ignores end times entirely (download_forecast.rs:573-589 —
  * index = count of starts ≤ slot begin, minus one).
  */
final case class DwmlDoc(
    generatedAt: Timestamp,
    locations: Seq[DwmlLocation],
    layouts: Seq[DwmlLayoutEntry],
    readings: Seq[DwmlReading])

final case class DwmlLocation(
    locationKey: String,
    latitude: String, // kept as 2-dp strings for the coordinate equi-match (J8)
    longitude: String,
    stationId: Option[String])

/** One (layout, index) → range start row. */
final case class DwmlLayoutEntry(layoutKey: String, idx: Int, rangeStart: Timestamp)

/** One parameter reading: values indexed by the layout's interval index. */
final case class DwmlReading(
    locationKey: String,
    metric: String, // one of Dwml.metrics
    units: String,
    layoutKey: String,
    values: Seq[String])

object Dwml {

  /** Internal metric keys → Forecast column names. */
  val metrics: Seq[String] = Seq(
    "max_temp", "min_temp", "rh_max", "rh_min", "precip", "pop12",
    "wind_speed", "wind_dir")

  /** DWML times look like `2024-08-12T06:00:00-04:00` (no millis). */
  private def ts(s: String): Timestamp =
    Timestamp.from(OffsetDateTime.parse(s).toInstant)

  private def attr(n: Node, a: String): String = (n \ s"@$a").text

  /** Parse a DWML document string. `now` drives generated_at fallback. */
  def parse(xml: String, now: Timestamp): DwmlDoc = {
    val root: Elem = XML.loadString(xml)
    val data = (root \ "data").head

    val generatedAt = (root \ "head" \ "product" \ "creation-date").headOption
      .map(n => ts(n.text.trim)).getOrElse(now)

    val locations = (data \ "location").map { loc =>
      val point = (loc \ "point").head
      DwmlLocation(
        locationKey = (loc \ "location-key").text.trim,
        latitude = attr(point, "latitude"),
        longitude = attr(point, "longitude"),
        stationId = {
          val s = (loc \ "station-id").text.trim
          if (s.isEmpty) None else Some(s)
        })
    }

    val layouts = (data \ "time-layout").flatMap { tl =>
      val key = (tl \ "layout-key").text.trim
      (tl \ "start-valid-time").zipWithIndex.map { case (svt, i) =>
        DwmlLayoutEntry(key, i, ts(svt.text.trim))
      }
    }

    // element → (metric key, type attribute)
    val specs = Seq(
      ("temperature", "maximum", "max_temp"),
      ("temperature", "minimum", "min_temp"),
      ("humidity", "maximum relative", "rh_max"),
      ("humidity", "minimum relative", "rh_min"),
      ("precipitation", "liquid", "precip"),
      ("probability-of-precipitation", "12 hour", "pop12"),
      ("wind-speed", "sustained", "wind_speed"),
      ("direction", "wind", "wind_dir"))

    val readings = (data \ "parameters").flatMap { params =>
      val locKey = attr(params, "applicable-location")
      specs.flatMap { case (elem, typ, metric) =>
        (params \ elem).filter(n => attr(n, "type") == typ).map { n =>
          DwmlReading(
            locationKey = locKey,
            metric = metric,
            units = attr(n, "units").toLowerCase,
            layoutKey = attr(n, "time-layout"),
            values = (n \ "value").map(_.text.trim))
        }
      }
    }

    // Last block wins when a document repeats a (location, metric) —
    // the reference's sequential walk overwrites its per-location vector
    // per parameter block (download_forecast.rs:431-571). Deduplicating
    // at parse time keeps that deterministic semantic; two readings per
    // key in one flatten plan would otherwise tie in the forward-fill
    // window with nondeterministic order.
    val lastWins = readings
      .groupBy(r => (r.locationKey, r.metric))
      .valuesIterator.map(_.last).toSeq
      .sortBy(r => (r.locationKey, r.metric)) // deterministic seq order

    DwmlDoc(generatedAt, locations, layouts, lastWins)
  }
}
