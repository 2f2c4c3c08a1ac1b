package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Soundness of the implied-range pushdown: results with the rule active
  * must be IDENTICAL to the semantic answer computed directly from the raw
  * values — across comparison ops, operand orders, negative (pre-1970)
  * nanos, and boundary values where trunc-div rounding direction matters.
  */
class ImpliedScanRangesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Raw nanos chosen to straddle the div-1000 boundaries and zero:
  // exact multiples, ±1 around multiples, and negatives (trunc toward 0).
  private val raws: Seq[Long] = Seq(
    -2000001L, -2000000L, -1999999L, -1001L, -1000L, -999L, -1L, 0L,
    1L, 999L, 1000L, 1001L, 999999L, 1000000L, 1000001L,
    1723420800L * 1000000000L, // 2024-08-12T00:00:00Z in ns
    1723420800L * 1000000000L + 999L,
    1723420800L * 1000000000L + 1000L)

  private def df = raws.toDF("raw")
    .withColumn("ts", timestamp_micros(expr("raw div 1000")))

  // Long./ truncates toward zero — exactly Spark's `div` — so the
  // expected sets below are computed with plain `r / 1000L`.
  private val t0 = 1723420800L * 1000000L // micros literal

  test("each comparison op keeps exactly the semantic row set") {
    val lit0 = timestamp_micros(lit(t0))
    val cases: Seq[(String, org.apache.spark.sql.Column, Long => Boolean)] = Seq(
      ("lt", col("ts") < lit0, _ / 1000L < t0),
      ("le", col("ts") <= lit0, _ / 1000L <= t0),
      ("gt", col("ts") > lit0, _ / 1000L > t0),
      ("ge", col("ts") >= lit0, _ / 1000L >= t0),
      ("eq", col("ts") === lit0, _ / 1000L == t0),
      ("lt-flipped", lit0 > col("ts"), _ / 1000L < t0),
      ("ge-flipped", lit0 <= col("ts"), _ / 1000L >= t0))
    for ((tag, cond, p) <- cases) {
      val got = df.where(cond).select("raw").as[Long].collect().map(_ / 1000L).toSet
      assert(got == raws.filter(p).map(_ / 1000L).toSet, s"case $tag")
    }
  }

  test("negative and boundary nanos survive a wide range filter") {
    val lo = timestamp_micros(lit(-3000L))
    val got = df.where(col("ts") >= lo && col("ts") < timestamp_micros(lit(2000L)))
      .select("raw").as[Long].collect().toSet
    val want = raws.filter(r => r / 1000L >= -3000L && r / 1000L < 2000L).toSet
    assert(got == want)
  }

  test("date_trunc lower bound still returns every qualifying row") {
    val got = df.where(date_trunc("day", col("ts")) >= lit("2024-08-12").cast("timestamp"))
      .select("raw").as[Long].collect().toSet
    // trunc(day, tsμ) ≥ 2024-08-12 ⟺ tsμ ≥ that midnight (all test values
    // ≥ it are exactly at/after midnight of that day)
    val want = raws.filter(_ / 1000L >= t0).toSet
    assert(got == want)
  }

  test("seeded fuzz: random nanos × random thresholds × every op lose no rows") {
    val rnd = new scala.util.Random(42)
    val fuzzRaws = Seq.fill(300) {
      // mix magnitudes so div boundaries at every scale get hit
      val mag = Seq(1L, 1000L, 1000000L, 3600L * 1000000000L)(rnd.nextInt(4))
      rnd.nextLong() % (mag * 1000)
    }
    val fdf = fuzzRaws.toDF("raw")
      .withColumn("ts", timestamp_micros(expr("raw div 1000"))).cache()
    val thresholds = Seq.fill(4)(rnd.nextLong() % 4000000L)
    for (t <- thresholds) {
      val lit0 = timestamp_micros(lit(t))
      val cases = Seq[(String, org.apache.spark.sql.Column, Long => Boolean)](
        ("lt", col("ts") < lit0, _ / 1000L < t),
        ("le", col("ts") <= lit0, _ / 1000L <= t),
        ("gt", col("ts") > lit0, _ / 1000L > t),
        ("ge", col("ts") >= lit0, _ / 1000L >= t),
        ("eq", col("ts") === lit0, _ / 1000L == t))
      for ((tag, cond, p) <- cases) {
        val got = fdf.where(cond).select("raw").as[Long].collect().sorted.toSeq
        assert(got == fuzzRaws.filter(p).sorted, s"t=$t case=$tag")
      }
    }
    fdf.unpersist()
  }

  test("date_trunc upper/equality bounds return every qualifying row") {
    // t0 is midnight UTC, so trunc('day') of every test value lands on a
    // clean boundary; the rule's +maxLen slack must never drop a row.
    val day = lit("2024-08-12").cast("timestamp")
    val cases: Seq[(String, org.apache.spark.sql.Column, Long => Boolean)] = Seq(
      ("trunc-le", date_trunc("day", col("ts")) <= day, r => r / 1000L < t0 + 86400000000L),
      ("trunc-lt", date_trunc("day", col("ts")) < day, _ / 1000L < t0),
      ("trunc-eq", date_trunc("day", col("ts")) === day,
        r => r / 1000L >= t0 && r / 1000L < t0 + 86400000000L),
      ("trunc-le-flipped", day >= date_trunc("day", col("ts")),
        r => r / 1000L < t0 + 86400000000L),
      ("trunc-gt-flipped", day > date_trunc("hour", col("ts")), _ / 1000L < t0))
    for ((tag, cond, p) <- cases) {
      val got = df.where(cond).select("raw").as[Long].collect().toSet
      assert(got == raws.filter(p).toSet, s"case $tag")
    }
  }

  test("seeded fuzz: date_trunc × every unit × every op lose no rows") {
    val rnd = new scala.util.Random(7)
    // cluster values around unit boundaries of 2024-08-12 so truncation
    // actually discriminates
    val base = 1723420800L * 1000000000L
    val fuzzRaws = Seq.fill(200) {
      val span = Seq(1000000L, 3600L * 1000000000L, 40L * 86400L * 1000000000L)(rnd.nextInt(3))
      base + (rnd.nextLong() % span)
    }
    val fdf = fuzzRaws.toDF("raw")
      .withColumn("ts", timestamp_micros(expr("raw div 1000"))).cache()
    // independent truncation oracle: java.time in the session zone (UTC)
    def truncUtc(unit: String, us: Long): Long = {
      import java.time._, java.time.temporal.ChronoUnit
      val ldt = LocalDateTime.ofInstant(
        Instant.EPOCH.plus(us, ChronoUnit.MICROS), ZoneOffset.UTC)
      val t = unit match {
        case "second" => ldt.truncatedTo(ChronoUnit.SECONDS)
        case "minute" => ldt.truncatedTo(ChronoUnit.MINUTES)
        case "hour" => ldt.truncatedTo(ChronoUnit.HOURS)
        case "day" => ldt.truncatedTo(ChronoUnit.DAYS)
        case "week" => // Spark truncates to Monday
          ldt.truncatedTo(ChronoUnit.DAYS).minusDays(ldt.getDayOfWeek.getValue - 1L)
        case "month" => ldt.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1)
        case "quarter" =>
          LocalDateTime.of(ldt.getYear, ((ldt.getMonthValue - 1) / 3) * 3 + 1, 1, 0, 0)
        case "year" => LocalDateTime.of(ldt.getYear, 1, 1, 0, 0)
      }
      ChronoUnit.MICROS.between(Instant.EPOCH, t.toInstant(ZoneOffset.UTC))
    }
    val t0us = 1723420800L * 1000000L // 2024-08-12T00:00:00Z
    for (unit <- Seq("second", "minute", "hour", "day", "week", "month", "quarter", "year")) {
      val thr = lit("2024-08-12 00:00:00").cast("timestamp")
      val truncOf: Map[Long, Long] = fuzzRaws.map(r => r -> truncUtc(unit, r / 1000L)).toMap
      val cases: Seq[(String, org.apache.spark.sql.Column, Long => Boolean)] = Seq(
        ("le", date_trunc(unit, col("ts")) <= thr, r => truncOf(r) <= t0us),
        ("lt", date_trunc(unit, col("ts")) < thr, r => truncOf(r) < t0us),
        ("ge", date_trunc(unit, col("ts")) >= thr, r => truncOf(r) >= t0us),
        ("gt", date_trunc(unit, col("ts")) > thr, r => truncOf(r) > t0us),
        ("eq", date_trunc(unit, col("ts")) === thr, r => truncOf(r) == t0us))
      for ((tag, cond, p) <- cases) {
        val got = fdf.where(cond).select("raw").as[Long].collect().sorted.toSeq
        assert(got == fuzzRaws.filter(p).sorted, s"unit=$unit case=$tag")
      }
    }
    fdf.unpersist()
  }

  test("IN-list keeps exactly the member rows and pushes its hull") {
    val members = Seq(0L, 1000L, t0) // micros values present in raws
    val cond = col("ts").isInCollection(members.map(m => timestamp_micros(lit(m))))
    val got = df.where(cond).select("raw").as[Long].collect().toSet
    assert(got == raws.filter(r => members.contains(r / 1000L)).toSet)

    val dir = java.nio.file.Files.createTempDirectory("isr-in").toString
    raws.toDF("raw").write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .withColumn("ts", timestamp_micros(expr("raw div 1000")))
      .where(col("ts").isInCollection(members.map(m => timestamp_micros(lit(m)))))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(raw") && plan.contains("LessThan(raw"),
      s"IN hull not pushed:\n$plan")
    assert(q.select("raw").as[Long].collect().toSet == got)
  }

  test("a 12-member IN-list (the InSet path) still pushes its hull") {
    // past spark.sql.optimizer.inSetConversionThreshold (10), OptimizeIn
    // rewrites In → InSet before this rule sees it
    val members = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 1000L, 1001L, 2000L, t0)
    val dir = java.nio.file.Files.createTempDirectory("isr-inset").toString
    raws.toDF("raw").write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .withColumn("ts", timestamp_micros(expr("raw div 1000")))
      .where(col("ts").isInCollection(members.map(m => timestamp_micros(lit(m)))))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(raw") && plan.contains("LessThan(raw"),
      s"InSet hull not pushed:\n$plan")
    assert(q.select("raw").as[Long].collect().toSet ==
      raws.filter(r => members.contains(r / 1000L)).toSet)
  }

  test("the date_trunc upper bound reaches the parquet PushedFilters") {
    val dir = java.nio.file.Files.createTempDirectory("isr-ub").toString
    raws.toDF("raw").write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .withColumn("ts", timestamp_micros(expr("raw div 1000")))
      .where(date_trunc("day", col("ts")) <= lit("2024-08-12").cast("timestamp"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(raw), LessThan(raw"),
      s"implied raw upper bound not pushed:\n$plan")
    assert(q.select("raw").as[Long].collect().toSet ==
      raws.filter(_ / 1000L < t0 + 86400000000L + 26L * 3600000000L).toSet)
  }

  test("date_trunc on a PLAIN timestamp column pushes to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("isr-plain").toString
    raws.map(r => new java.sql.Timestamp(r / 1000000L)).toDF("ts")
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .where(date_trunc("day", col("ts")) >= lit("2024-08-12").cast("timestamp"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"plain-column trunc bound not pushed:\n$plan")
    val got = q.select("ts").collect().map(_.getTimestamp(0).getTime).toSet
    val want = raws.map(_ / 1000000L).filter(_ >= 1723420800000L).toSet
    assert(got == want)
  }

  test("the rule is idempotent (safe inside a fixed-point batch)") {
    // every bound-producing shape at once: range op, date_trunc, IN hull
    val q = df.where(
      col("ts") >= timestamp_micros(lit(t0)) &&
        date_trunc("day", col("ts")) <= lit("2024-08-12").cast("timestamp") &&
        col("ts").isInCollection(Seq(0L, 1000L, t0).map(m => timestamp_micros(lit(m)))))
    val once = ImpliedScanRanges(q.queryExecution.analyzed)
    val twice = ImpliedScanRanges(once)
    assert(once.canonicalized == twice.canonicalized,
      s"second application changed the plan:\n$once\nvs\n$twice")
  }

  test("seeded fuzz: NTZ-cast scan column × date_trunc × every op lose no rows") {
    // Same soundness sweep as the raw-nanos fuzz, but over the shape the
    // NTZ events branch produces: a TimestampNTZ scan column wrapped in
    // an explicitly-UTC cast. The rule's PushableTs base cases emit
    // bounds on the cast, Spark's UnwrapCastInBinaryComparison rewrites
    // them to NTZ-attribute bounds — this asserts the combination never
    // drops a qualifying row.
    val rnd = new scala.util.Random(11)
    val base = 1723420800L * 1000000L // 2024-08-12T00:00:00Z µs
    val fuzzUs = Seq.fill(200) {
      val span = Seq(1000000L, 3600L * 1000000L, 40L * 86400L * 1000000L)(rnd.nextInt(3))
      base + (rnd.nextLong() % span)
    }
    val dir =
      java.nio.file.Files.createTempDirectory("isr-ntz").toString + "/t"
    fuzzUs.toDF("us")
      .selectExpr("us", "cast(timestamp_micros(us) AS timestamp_ntz) AS tsn")
      .write.parquet(dir)
    val fdf = spark.read.parquet(dir)
      .withColumn("ts", expr("cast(tsn AS timestamp)")).cache()
    assert(fdf.schema("tsn").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val t0us = base + 3600L * 1000000L // an hour in, so both sides populated
    val thr = timestamp_micros(lit(t0us))
    val cases: Seq[(String, org.apache.spark.sql.Column, Long => Boolean)] = Seq(
      ("lt", col("ts") < thr, _ < t0us),
      ("le", col("ts") <= thr, _ <= t0us),
      ("gt", col("ts") > thr, _ > t0us),
      ("ge", col("ts") >= thr, _ >= t0us),
      ("trunc-ge", date_trunc("hour", col("ts")) >= thr,
        us => us / (3600L * 1000000L) * (3600L * 1000000L) >= t0us),
      ("trunc-le", date_trunc("hour", col("ts")) <= thr,
        us => us / (3600L * 1000000L) * (3600L * 1000000L) <= t0us),
      ("trunc-eq-day", date_trunc("day", col("ts")) === timestamp_micros(lit(
          base / (86400L * 1000000L) * (86400L * 1000000L))),
        us => us / (86400L * 1000000L) == base / (86400L * 1000000L)))
    for ((tag, cond, p) <- cases) {
      val got = fdf.where(cond).select("us").as[Long].collect().sorted.toSeq
      assert(got == fuzzUs.filter(p).sorted, s"case $tag")
    }
    fdf.unpersist()
  }

  test("q5-shaped predicates reach PushedFilters under BOTH events encodings") {
    // The round-5 regression taught that the events physical encoding can
    // flip under the repo. Whichever branch Tables.events takes — native
    // timestamp (micros/NTZ footer) or raw-long nanos — a
    //   date_trunc('day', ts) >= A AND ts < B
    // filter must land range bounds on the scan: as plain (possibly
    // cast-unwrapped) ts bounds on the native branch, as derived raw-long
    // bounds on the nanos branch. At 100 TB the difference is a pruned
    // time slice vs a full-table scan.
    val root = java.nio.file.Files.createTempDirectory("isr-enc").toString
    val base = 1704240000L * 1000000L // 2024-01-03T00:00:00Z µs
    val fixture = (0 until 10).map(i => (i.toLong, base + i * 86400L * 1000000L))

    // native branch: NTZ micros (pyarrow-style, the round-5+ driver shape)
    fixture.toDF("event_id", "us")
      .selectExpr("event_id", "cast(timestamp_micros(us) AS timestamp_ntz) AS ts",
        "event_id AS user_id", "'c' AS event_type", "1.0 AS value", "'' AS props")
      .write.parquet(s"$root/ntz/events.parquet")
    // nanos branch: raw INT64 ns (pre-round-5 / ScaleBuild replica shape)
    fixture.toDF("event_id", "us")
      .selectExpr("event_id", "us * 1000 AS ts",
        "event_id AS user_id", "'c' AS event_type", "1.0 AS value", "'' AS props")
      .write.parquet(s"$root/raw/events.parquet")

    for (enc <- Seq("ntz", "raw")) {
      val q = graft.Tables.events(spark, s"$root/$enc")
        .where(date_trunc("day", col("ts")) >= lit("2024-01-05").cast("timestamp") &&
          col("ts") < lit("2024-01-08").cast("timestamp"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,")
          || plan.contains("PushedFilters: [IsNotNull(ts), LessThan(ts,"),
        s"encoding $enc: no ts range bound reached the scan:\n$plan")
      assert(plan.contains("GreaterThanOrEqual(ts,") && plan.contains("LessThan(ts,"),
        s"encoding $enc: expected BOTH bounds pushed:\n$plan")
      assert(q.count() == 3, s"encoding $enc: wrong surviving rows") // Jan 5,6,7
    }
  }

  test("the implied bound reaches the parquet PushedFilters") {
    val dir = java.nio.file.Files.createTempDirectory("isr").toString
    raws.toDF("raw").write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .withColumn("ts", timestamp_micros(expr("raw div 1000")))
      .where(col("ts") >= timestamp_micros(lit(t0)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(raw), GreaterThanOrEqual(raw"),
      s"implied raw bound not pushed:\n$plan")
    assert(q.select("raw").as[Long].collect().toSet ==
      raws.filter(_ / 1000L >= t0).toSet)
  }
}
