package graft.ingest

import java.sql.Timestamp
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Differential fuzz for the flatten semantics — the trickiest logic in
  * the system (download_forecast.rs:316-589). A driver-side brute-force
  * interpreter implements the reference algorithm LITERALLY (walk slots
  * in time order per (location, metric): interval index = last layout
  * start at-or-before the slot begin; value = parse(values[idx]) or
  * carry the accumulator) and every randomized document must flatten to
  * exactly the interpreter's output — catching any drift between the
  * declarative join/window pipeline and the imperative spec. */
class DwmlFlattenFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val now = Timestamp.from(Instant.parse("2024-08-12T00:00:00Z"))
  private val hourMs = 3600L * 1000L

  private val metrics =
    Seq("max_temp", "min_temp", "rh_max", "rh_min", "pop12", "wind_speed",
      "wind_dir", "precip")

  /** Random doc: 1-3 locations (1 in 4 without a station id), 1-3
    * layouts with sorted random hour-offset starts (some before `now`,
    * some past the grid end), readings over random metric subsets with
    * values that are sometimes unparseable or short. */
  private def randomDoc(rnd: scala.util.Random): DwmlDoc = {
    val locs = (0 until 1 + rnd.nextInt(3)).map { i =>
      DwmlLocation(s"point$i", f"${40 + i}.12", f"${-95 - i}.34",
        if (rnd.nextInt(4) == 0) None else Some(f"K$i%03dX"))
    }
    val layouts = (0 until 1 + rnd.nextInt(3)).flatMap { l =>
      val n = 1 + rnd.nextInt(6)
      val starts = Seq.fill(n)(-30L + rnd.nextInt(220))
        .sorted.distinct // hours relative to now; layouts are sorted
      starts.zipWithIndex.map { case (h, idx) =>
        DwmlLayoutEntry(s"k-$l", idx, new Timestamp(now.getTime + h * hourMs))
      }
    }
    val layoutKeys = layouts.map(_.layoutKey).distinct
    val readings = for {
      loc <- locs
      m <- metrics if rnd.nextInt(3) > 0
    } yield {
      val lk = layoutKeys(rnd.nextInt(layoutKeys.length))
      val n = layouts.count(_.layoutKey == lk)
      val values = Seq.fill(math.max(1, n - rnd.nextInt(2))) {
        rnd.nextInt(5) match {
          case 0 => "" // NDFD's empty tail values
          case 1 => "NA" // unparseable
          case _ => (rnd.nextInt(100) - 20).toString
        }
      }
      DwmlReading(loc.locationKey, m, s"unit-$m", lk, values)
    }
    DwmlDoc(now, locs, layouts, readings)
  }

  /** The reference algorithm, literally. */
  private def interpret(doc: DwmlDoc): Map[(String, Long, String), Option[AnyVal]] = {
    val slotStarts = (0 until (7 * 24 / 3 + 1))
      .map(i => now.getTime + i * 3L * hourMs)
    val out = scala.collection.mutable.Map[(String, Long, String), Option[AnyVal]]()
    for (loc <- doc.locations if loc.stationId.isDefined; m <- metrics) {
      val rs = doc.readings.filter(r => r.locationKey == loc.locationKey && r.metric == m)
      for (r <- rs) {
        val starts = doc.layouts.filter(_.layoutKey == r.layoutKey)
        var accLong: Option[Long] = None
        var accDouble: Option[Double] = None
        for (slot <- slotStarts) {
          val idx = starts.filter(_.rangeStart.getTime <= slot)
            .map(_.idx).maxOption
          val raw = idx.flatMap(i => r.values.lift(i))
          if (m == "precip") {
            raw.flatMap(_.toDoubleOption).foreach(v => accDouble = Some(v))
            out((loc.locationKey, slot, m)) = accDouble
          } else {
            raw.flatMap(_.toLongOption).foreach(v => accLong = Some(v))
            out((loc.locationKey, slot, m)) = accLong
          }
        }
      }
    }
    out.toMap
  }

  test("seeded fuzz: 12 random docs flatten exactly per the reference walk") {
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 12) {
      val doc = randomDoc(rnd)
      val want = interpret(doc)
      val got = DwmlFlatten.flatten(spark, doc, now).collect()
      val byStation = doc.locations.collect {
        case l if l.stationId.isDefined => l.stationId.get -> l.locationKey
      }.toMap
      val nStations = byStation.size
      assert(got.length == nStations * 57, s"trial $trial row count")
      for (f <- got) {
        val lk = byStation(f.station_id)
        val slot = f.begin_time.getTime
        def check(m: String, v: Option[Long]): Unit =
          assert(v == want.getOrElse((lk, slot, m), None),
            s"trial $trial $lk $m @ ${f.begin_time}")
        check("max_temp", f.max_temp); check("min_temp", f.min_temp)
        check("rh_max", f.relative_humidity_max)
        check("rh_min", f.relative_humidity_min)
        check("pop12", f.twelve_hour_probability_of_precipitation)
        check("wind_speed", f.wind_speed); check("wind_dir", f.wind_direction)
        assert(f.liquid_precipitation_amt ==
          want.getOrElse((lk, slot, "precip"), None),
          s"trial $trial $lk precip @ ${f.begin_time}")
      }
    }
  }
}
