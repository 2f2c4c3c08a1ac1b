package graft.ingest

import java.sql.Timestamp
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** DWML flatten semantics (download_forecast.rs:315-589): exact 3-h grid,
  * interval-index assignment by last-start-≤-begin, per-metric forward
  * fill, unparseable values carried.
  */
class DwmlFlattenSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val now = Timestamp.from(Instant.parse("2024-08-12T00:00:00Z"))
  private def ts(s: String) = Timestamp.from(Instant.parse(s))

  private val loc = DwmlLocation("point1", "44.56", "-95.12", Some("KXYZ"))

  /** One 24-h max-temp layout over two days + a 3-h wind layout. */
  private def doc = DwmlDoc(
    generatedAt = now,
    locations = Seq(loc),
    layouts = Seq(
      DwmlLayoutEntry("k-p24h-n2-1", 0, ts("2024-08-12T00:00:00Z")),
      DwmlLayoutEntry("k-p24h-n2-1", 1, ts("2024-08-13T00:00:00Z")),
      DwmlLayoutEntry("k-p3h-n4-2", 0, ts("2024-08-12T00:00:00Z")),
      DwmlLayoutEntry("k-p3h-n4-2", 1, ts("2024-08-12T03:00:00Z")),
      DwmlLayoutEntry("k-p3h-n4-2", 2, ts("2024-08-12T06:00:00Z")),
      DwmlLayoutEntry("k-p3h-n4-2", 3, ts("2024-08-12T09:00:00Z"))),
    readings = Seq(
      DwmlReading("point1", "max_temp", "fahrenheit", "k-p24h-n2-1", Seq("91", "88")),
      // index 2 is unparseable -> forward-filled from index 1
      DwmlReading("point1", "wind_speed", "knots", "k-p3h-n4-2", Seq("7", "12", "", "9"))))

  private lazy val rows = DwmlFlatten.flatten(spark, doc, now)
    .collect().sortBy(_.begin_time.getTime)

  test("grid is exactly 3-h spaced over [now, now + 1 week] inclusive") {
    assert(rows.length == 57) // 56 slots + the inclusive endpoint
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.begin_time.getTime - a.begin_time.getTime == 3L * 3600 * 1000)
    }
    assert(rows.head.begin_time == now)
    rows.foreach(r => assert(r.end_time.getTime - r.begin_time.getTime == 3L * 3600 * 1000))
    assert(rows.forall(_.station_id == "KXYZ"))
  }

  test("24-h layout value repeats across all its slots, then carries forward") {
    val day1 = rows.filter(r => r.begin_time.getTime < ts("2024-08-13T00:00:00Z").getTime)
    assert(day1.forall(_.max_temp.contains(91L)))
    val day2 = rows.filter(r => r.begin_time.getTime >= ts("2024-08-13T00:00:00Z").getTime &&
      r.begin_time.getTime < ts("2024-08-14T00:00:00Z").getTime)
    assert(day2.forall(_.max_temp.contains(88L)))
    // beyond the last range: carried forward (the reference's prev accumulator)
    val tail = rows.filter(r => r.begin_time.getTime >= ts("2024-08-14T00:00:00Z").getTime)
    assert(tail.forall(_.max_temp.contains(88L)))
  }

  test("unparseable value is carried from the previous slot") {
    def windAt(s: String) = rows.find(_.begin_time == ts(s)).get.wind_speed
    assert(windAt("2024-08-12T00:00:00Z").contains(7L))
    assert(windAt("2024-08-12T03:00:00Z").contains(12L))
    assert(windAt("2024-08-12T06:00:00Z").contains(12L)) // "" -> carried
    assert(windAt("2024-08-12T09:00:00Z").contains(9L))
    assert(windAt("2024-08-12T12:00:00Z").contains(9L)) // past layout -> carried
  }

  test("metrics never read are null throughout") {
    assert(rows.forall(_.min_temp.isEmpty))
    assert(rows.forall(_.liquid_precipitation_amt.isEmpty))
    // unit codes still present (defaults)
    assert(rows.forall(_.temperature_unit_code == "fahrenheit"))
    assert(rows.forall(_.wind_speed_unit_code == "knots"))
  }

  test("locations without station ids are dropped") {
    val doc2 = doc.copy(locations = Seq(loc, DwmlLocation("point2", "1.00", "2.00", None)))
    val ids = DwmlFlatten.flatten(spark, doc2, now).collect().map(_.station_id).distinct
    assert(ids.toSeq == Seq("KXYZ"))
  }

  test("XML end-to-end: parse + flatten") {
    val xml =
      s"""<dwml><head><product><creation-date>2024-08-12T00:00:00Z</creation-date></product></head>
         |<data>
         |<location><location-key>point1</location-key>
         |  <point latitude="44.56" longitude="-95.12"/>
         |  <station-id>KXYZ</station-id></location>
         |<time-layout time-coordinate="local">
         |  <layout-key>k-p24h-n1-1</layout-key>
         |  <start-valid-time>2024-08-12T00:00:00-00:00</start-valid-time>
         |  <end-valid-time>2024-08-13T00:00:00-00:00</end-valid-time>
         |</time-layout>
         |<parameters applicable-location="point1">
         |  <temperature type="maximum" units="Fahrenheit" time-layout="k-p24h-n1-1">
         |    <value>77</value>
         |  </temperature>
         |</parameters>
         |</data></dwml>""".stripMargin
    val parsed = Dwml.parse(xml, now)
    assert(parsed.generatedAt == now)
    assert(parsed.locations == Seq(loc))
    assert(parsed.layouts == Seq(DwmlLayoutEntry("k-p24h-n1-1", 0, ts("2024-08-12T00:00:00Z"))))
    assert(parsed.readings.head.values == Seq("77"))
    val out = DwmlFlatten.flatten(spark, parsed, now).collect()
    assert(out.forall(_.max_temp.contains(77L)))
    assert(out.forall(_.temperature_unit_code == "fahrenheit"))
  }

  test("a repeated (location, metric) block: last block wins, like the reference walk") {
    val xml =
      """<dwml><head><product><creation-date>2024-08-12T00:00:00Z</creation-date></product></head>
        |<data>
        |<location><location-key>point1</location-key>
        |  <point latitude="44.56" longitude="-95.12"/>
        |  <station-id>KDUP</station-id></location>
        |<time-layout><layout-key>k1</layout-key>
        |  <start-valid-time>2024-08-12T00:00:00-00:00</start-valid-time></time-layout>
        |<parameters applicable-location="point1">
        |  <temperature type="maximum" units="Fahrenheit" time-layout="k1">
        |    <value>50</value></temperature>
        |  <temperature type="maximum" units="Celsius" time-layout="k1">
        |    <value>77</value></temperature>
        |</parameters></data></dwml>""".stripMargin
    val parsed = Dwml.parse(xml, now)
    val maxTemps = parsed.readings.filter(_.metric == "max_temp")
    assert(maxTemps.map(r => (r.values, r.units)) == Seq((Seq("77"), "celsius")))
    val out = DwmlFlatten.flatten(spark, parsed, now).collect()
    assert(out.forall(_.max_temp.contains(77L)))
    assert(out.forall(_.temperature_unit_code == "celsius"))
  }

  test("flatten rejects hand-built docs with duplicate (location, metric) readings") {
    val dup = doc.copy(readings = doc.readings ++ doc.readings.take(1))
    val e = intercept[IllegalArgumentException] {
      DwmlFlatten.flatten(spark, dup, now)
    }
    assert(e.getMessage.contains("duplicate"))
  }

  private def corpusXml(i: Int): String =
    s"""<dwml><head><product><creation-date>2024-08-12T00:00:00Z</creation-date></product></head>
       |<data>
       |<location><location-key>point1</location-key>
       |  <point latitude="44.56" longitude="-95.12"/>
       |  <station-id>K$i%03dA</station-id></location>
       |<time-layout><layout-key>k-p24h-n2-1</layout-key>
       |  <start-valid-time>2024-08-12T00:00:00-00:00</start-valid-time>
       |  <start-valid-time>2024-08-13T00:00:00-00:00</start-valid-time></time-layout>
       |<parameters applicable-location="point1">
       |  <temperature type="maximum" units="Fahrenheit" time-layout="k-p24h-n2-1">
       |    <value>${60 + i % 30}</value><value>${55 + i % 30}</value></temperature>
       |  <wind-speed type="sustained" units="knots" time-layout="k-p24h-n2-1">
       |    <value>${i % 15}</value><value>${1 + i % 15}</value></wind-speed>
       |</parameters></data></dwml>""".stripMargin
      .replace(s"K$i%03dA", f"K$i%03dA")

  test("flattenAll drops unparseable documents and flattens the rest") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(
      ("good", corpusXml(1)),
      ("bad", "<dwml><data><location>truncated"),
      ("worse", "not xml")))
    val out = DwmlFlatten.flattenAll(spark, docs, now)
    val ids = out.select("doc_id").distinct().as[String].collect()
    assert(ids.toSeq == Seq("good"))
    assert(out.count() == 57)
  }

  test("flattenAll: 120 documents in ONE job, one partitioned window, matches flatten") {
    import spark.implicits._
    val n = 120
    val docs = spark.createDataset((0 until n).map(i => (f"doc$i%03d", corpusXml(i))))
      .repartition(8) // corpus parallelism: parse runs 8-way, not per-doc
    val all = DwmlFlatten.flattenAll(spark, docs, now)

    // single plan: exactly one Window operator, partitioned — never a
    // per-document driver loop of 120 window plans
    val plan = all.queryExecution.executedPlan.toString
    assert("(?m)^\\s*[+:*-]*\\s*Window ".r.findAllIn(plan).size <= 1 &&
      plan.contains("Window"), s"expected one Window operator:\n$plan")
    assert(!plan.contains("No Partition"), plan)

    val collected = all.collect()
    assert(collected.length == n * 57) // the w-grid per document
    assert(collected.map(_.getAs[String]("doc_id")).distinct.length == n)

    // per-document results are identical to the single-document flatten
    val one = DwmlFlatten.flatten(spark, Dwml.parse(corpusXml(7), now), now)
      .collect().map(_.toString).sorted
    val fromAll = all.where($"doc_id" === "doc007").drop("doc_id")
      .as[graft.model.Forecast].collect().map(_.toString).sorted
    assert(fromAll.toSeq == one.toSeq)
  }
}
