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
