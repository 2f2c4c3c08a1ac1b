package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized differential for q49's boundary-bucket rank selection —
  * the most intricate arithmetic in ScaleOps. Fixtures are built to
  * stress exactly what real data rarely does: values tied ACROSS bucket
  * boundaries, groups with one row, groups where every value is equal,
  * groups entirely inside a single bucket, and ranks landing on the
  * first/last row of a bucket.
  */
class HierPercentileFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Flat one-window nearest-rank reference over the same fixture. */
  private def flat(rows: Seq[(String, Double)]): Seq[Seq[Any]] = {
    import spark.implicits._
    rows.toDF("rf", "v").createOrReplaceTempView("hp_fixture")
    spark.sql("""WITH ranked AS (
        SELECT rf, v,
          ROW_NUMBER() OVER (PARTITION BY rf ORDER BY v) AS rn,
          COUNT(*) OVER (PARTITION BY rf) AS n
        FROM hp_fixture)
      SELECT rf AS l_returnflag, CAST(MAX(n) AS BIGINT) AS n_rows,
        MAX(CASE WHEN rn = CAST(ceil(0.25 * n) AS BIGINT) THEN v END) AS p25,
        MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS p50,
        MAX(CASE WHEN rn = CAST(ceil(0.75 * n) AS BIGINT) THEN v END) AS p75,
        MAX(CASE WHEN rn = n THEN v END) AS p100
      FROM ranked GROUP BY rf ORDER BY rf""")
      .collect().toSeq.map(_.toSeq)
  }

  private def hier(rows: Seq[(String, Double)]): Seq[Seq[Any]] = {
    import spark.implicits._
    ScaleOps.hierPercentiles(
      rows.toDF("rf", "v")
        .withColumn("c", floor(col("v") * 100 + 0.5).cast("long")))
      .collect().toSeq.map(_.toSeq)
  }

  test("seeded random fixtures with heavy cross-bucket ties") {
    val rnd = new scala.util.Random(20260814L)
    for (round <- 1 to 5) {
      // values cluster at multiples of the bucket width ($163.84) so
      // ties straddle boundaries; a few uniform values fill in between
      val rows = (1 to 400).map { _ =>
        val g = s"g${rnd.nextInt(4)}"
        val v =
          if (rnd.nextBoolean()) 163.84 * (1 + rnd.nextInt(5)) // exact boundary
          else math.floor(rnd.nextDouble() * 100000) / 100.0
        (g, v)
      }
      assert(hier(rows) == flat(rows), s"round $round diverged")
    }
  }

  test("degenerate groups: single-row, all-equal, single-bucket") {
    val rows =
      Seq(("one", 42.0)) ++                         // single row
        (1 to 50).map(_ => ("same", 163.84)) ++     // all equal, ON a boundary
        (1 to 30).map(i => ("tiny", 10.0 + i / 100.0)) // whole group in 1 bucket
    assert(hier(rows) == flat(rows))
  }

  test("ranks landing on first/last row of a bucket") {
    // 8 values per bucket over 4 buckets → n=32; ceil(.25*32)=8 (last of
    // bucket 1), ceil(.5*32)=16 (last of bucket 2), ceil(.75*32)=24
    val rows = (0 until 32).map { i =>
      ("edge", 163.84 * (i / 8) + 1.0 + (i % 8))
    }
    assert(hier(rows) == flat(rows))
  }

  test("count-frame merge path (q50 form) equals the from-scratch hierarchy") {
    import spark.implicits._
    // Split each fixture into 3 arbitrary "days", aggregate per-day
    // count states, MERGE them, and feed hierPercentilesFrom — must be
    // bit-identical to hierPercentiles computing the frame from the
    // scan (counts are an exact monoid; any split merges back).
    val rnd = new scala.util.Random(50L)
    for (round <- 1 to 3) {
      val rows = (1 to 500).map { i =>
        (s"g${rnd.nextInt(5)}", math.floor(rnd.nextDouble() * 100000) / 100.0, i % 3)
      }
      val df = rows.toDF("rf", "v", "part")
        .withColumn("c", floor(col("v") * 100 + 0.5).cast("long"))
        .withColumn("bucket", expr("c div 16384"))
      val merged = df.groupBy("rf", "part", "bucket")
        .agg(count(lit(1)).as("bc"))          // per-"day" stored states
        .groupBy("rf", "bucket").agg(sum("bc").as("bc")) // grain merge
      val got = ScaleOps.hierPercentilesFrom(
          df.select("rf", "v", "c", "bucket"), merged)
        .collect().toSeq.map(_.toSeq)
      val want = ScaleOps.hierPercentiles(
          df.select(col("rf"), col("v"), col("c")))
        .collect().toSeq.map(_.toSeq)
      assert(got == want, s"round $round diverged")
    }
  }

  test("high-cardinality groups: correct, and ordered window stays on the prefilter") {
    import org.apache.spark.sql.catalyst.expressions.WindowExpression
    import org.apache.spark.sql.catalyst.expressions.RowNumber
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}
    import spark.implicits._
    // 1,500 groups — the regime where a forced broadcast of the
    // per-(group, bucket) count frame would be groups-proportional
    // driver memory. The hints are gone (AQE size-gates at runtime);
    // this asserts the SEMANTIC shape survived: the row_number window
    // still consumes the boundary-bucket prefilter JOIN, never the raw
    // input, so only ~4 buckets per group ever pay an ordered sort.
    val rnd = new scala.util.Random(7L)
    val rows = (1 to 6000).map { i =>
      val g = f"g${i % 1500}%04d"
      val v = math.floor(rnd.nextDouble() * 200000) / 100.0
      (g, v)
    }
    assert(hier(rows) == flat(rows))

    // the lazy twin: the production form's plan ends in
    // Sort(ExistingRDD) since the r14 pre-sort checkpoint
    val df = ScaleOps.hierPercentilesLazyPlan(
      rows.toDF("rf", "v")
        .withColumn("c", floor(col("v") * 100 + 0.5).cast("long")))
    val plan = df.queryExecution.optimizedPlan
    val rowNumWindows = plan.collect {
      case w: LWindow if w.windowExpressions.exists(_.exists {
        case we: WindowExpression => we.windowFunction.isInstanceOf[RowNumber]
        case _ => false
      }) => w
    }
    assert(rowNumWindows.nonEmpty, "expected a row_number window in the plan")
    for (w <- rowNumWindows) {
      val joinsBelow = w.child.collect { case j: Join => j }
      assert(joinsBelow.nonEmpty,
        s"ordered row_number window runs over raw input (no prefilter join below it):\n$w")
    }
  }
}
