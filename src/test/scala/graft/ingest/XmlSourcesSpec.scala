package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

class XmlSourcesSpec extends AnyFunSuite {

  test("stations: US + state filter, numeric parsing") {
    val xml =
      """<response><data>
        |<Station><station_id>KMSP</station_id><latitude>44.88</latitude>
        |  <longitude>-93.22</longitude><elevation_m>256.0</elevation_m>
        |  <site>Minneapolis</site><country>US</country><state>MN</state></Station>
        |<Station><station_id>CYYZ</station_id><latitude>43.68</latitude>
        |  <longitude>-79.63</longitude><site>Toronto</site>
        |  <country>CA</country><state>ON</state></Station>
        |<Station><station_id>XXXX</station_id><latitude>10.0</latitude>
        |  <longitude>10.0</longitude><site>NoState</site><country>US</country></Station>
        |</data></response>""".stripMargin
    val out = XmlSources.parseStations(xml)
    assert(out.map(_.station_id) == Seq("KMSP"))
    assert(out.head.station_name == "Minneapolis")
    assert(out.head.elevation_m.contains(256.0))
  }

  test("metars: rows missing temp/lat/lon/time are dropped (P4)") {
    val xml =
      """<response><data>
        |<METAR><station_id>KMSP</station_id>
        |  <observation_time>2024-08-12T10:00:00Z</observation_time>
        |  <latitude>44.88</latitude><longitude>-93.22</longitude>
        |  <temp_c>21.5</temp_c><dewpoint_c>12.0</dewpoint_c>
        |  <wind_dir_degrees>180</wind_dir_degrees><wind_speed_kt>8</wind_speed_kt></METAR>
        |<METAR><station_id>KBAD</station_id>
        |  <latitude>40.0</latitude><longitude>-90.0</longitude></METAR>
        |</data></response>""".stripMargin
    val out = XmlSources.parseMetars(xml)
    assert(out.map(_.station_id) == Seq("KMSP"))
    val o = out.head
    assert(o.temperature_value.contains(21.5))
    assert(o.wind_speed.contains(8L))
    assert(o.wind_direction.contains(180L))
    assert(o.dewpoint_value.contains(12.0))
    assert(o.temperature_unit_code == "celcius")
    assert(o.generated_at.toInstant == java.time.Instant.parse("2024-08-12T10:00:00Z"))
  }

  test("a malformed feed yields zero rows instead of killing the cycle") {
    // the reference's daemon logs the serde failure and retries next
    // hour; a truncated download must not throw
    val truncated = "<response><data><Station><station_id>KX"
    assert(XmlSources.parseStations(truncated).isEmpty)
    assert(XmlSources.parseMetars(truncated).isEmpty)
    assert(XmlSources.parseStations("not xml at all").isEmpty)
    assert(XmlSources.parseMetars("").isEmpty)
  }
}
