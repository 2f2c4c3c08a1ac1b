package graft.oracle

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Differential fuzz for the scoring math (oracle.rs:445-617): a
  * driver-side interpreter implements the reference loop literally —
  * per choice row, if BOTH a forecast and an observation exist for the
  * station, add Par=20 / Over=Under=10 per matched direction, with
  * observed temps rounded half-away-from-zero (Rust `f64::round`), wind
  * compared as integers; total = base·10000 + (9999 − uuidv7ms%10000).
  * Randomized inputs stress exactly the risky edges: negative .5 temps
  * (HALF_UP vs Math.round divergence), missing stations, null choice
  * directions, entries with no qualifying choices. */
class ScoringFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Rust f64::round — half away from zero (Java Math.round is
    * half-toward-positive-infinity: wrong at -2.5). */
  private def rustRound(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  private def pts(choice: Option[String], f: Long, o: Long): Long = choice match {
    case Some("over") if f < o => 10L
    case Some("par") if f == o => 20L
    case Some("under") if f > o => 10L
    case _ => 0L
  }

  test("seeded fuzz: 6 random rounds match the reference loop exactly") {
    val rnd = new scala.util.Random(61)
    val dirs = Seq(Some("over"), Some("par"), Some("under"), None)
    for (round <- 1 to 6) {
      val stations = (0 until 6).map(i => s"ST$i")
      // temps include negative halves; forecasts are longs
      val forecasts = stations.filter(_ => rnd.nextInt(4) > 0).map(st =>
        (st, rnd.nextInt(60).toLong - 20L, rnd.nextInt(60).toLong - 10L,
          rnd.nextInt(30).toLong))
      val observations = stations.filter(_ => rnd.nextInt(4) > 0).map(st =>
        (st, (rnd.nextInt(240) - 120) * 0.5, (rnd.nextInt(240) - 80) * 0.5,
          rnd.nextInt(30).toLong))
      val entryIds = (0 until 5).map(i =>
        Uuid7.generateDeterministic(
          Instant.ofEpochMilli(1723420800000L + rnd.nextInt(1000000)),
          rnd.nextLong(), rnd.nextLong()))
      val choices = for {
        e <- entryIds
        st <- stations if rnd.nextInt(3) > 0
      } yield (e, st, dirs(rnd.nextInt(4)), dirs(rnd.nextInt(4)), dirs(rnd.nextInt(4)))

      // ---- reference loop, literally ----
      val fMap = forecasts.map(f => f._1 -> f).toMap
      val oMap = observations.map(o => o._1 -> o).toMap
      val want = entryIds.map { e =>
        val base = choices.filter(_._1 == e).map { case (_, st, tl, th, ws) =>
          (fMap.get(st), oMap.get(st)) match {
            case (Some(f), Some(o)) =>
              pts(tl, f._2, rustRound(o._2)) + pts(th, f._3, rustRound(o._3)) +
                pts(ws, f._4, o._4)
            case _ => 0L // missing either side: contributes nothing
          }
        }.sum
        e -> (base, base * 10000L + (9999L - Uuid7.millis(e) % 10000L))
      }.toMap

      // ---- the declarative plan ----
      val got = Scoring.scoreAllEntries(
        entryIds.toDF("entry_id"),
        choices.toDF("entry_id", "station", "temp_low", "temp_high", "wind_speed"),
        forecasts.toDF("station_id", "temp_low", "temp_high", "wind_speed"),
        observations.toDF("station_id", "temp_low", "temp_high", "wind_speed"))
        .collect()
        .map(r => r.getAs[String]("entry_id") ->
          (r.getAs[Long]("base_score"), r.getAs[Long]("score"))).toMap

      assert(got == want, s"round $round")
    }
  }

  test("winnersByEvent ranks match a driver-side sort on random scores") {
    val rnd = new scala.util.Random(67)
    val rows = for {
      ev <- Seq("evA", "evB", "evC")
      i <- 0 until 8
    } yield (ev, f"$ev-e$i%02d", rnd.nextInt(40).toLong * 10000L + rnd.nextInt(10000))
    val got = Scoring.winnersByEvent(rows.toDF("event_id", "entry_id", "score"), k = 3)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
    val want = rows.groupBy(_._1).toSeq.flatMap { case (ev, es) =>
      es.sortBy(e => (-e._3, e._2)).take(3).zipWithIndex
        .map { case (e, i) => (ev, i + 1, e._2) }
    }.sortBy(w => (w._1, w._2))
    assert(got == want)
  }
}
