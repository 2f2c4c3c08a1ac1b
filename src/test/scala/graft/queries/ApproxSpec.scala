package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** Error-bound gates for the sketch-based operators (x1/x2): they have
  * no DuckDB oracle (sketch internals are engine-specific), so this spec
  * is their correctness contract — each approximate answer must land
  * within the documented error envelope of the exact computation on the
  * same data.
  */
class ApproxSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = TestSpark.spark

  test("x1_approx_ndv: HLL ndv within 5% of exact per group") {
    val approx = SparkEntry.queries("x1_approx_ndv")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("ndv"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, e) <- exact) {
      val a = approx(flag)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"flag $flag: approx $a vs exact $e exceeds 5%")
    }
  }

  test("x2_approx_quantile: each percentile's true rank is within epsilon of target") {
    val approx = SparkEntry.queries("x2_approx_quantile")(spark, sf)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    val byFlag = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // percentile_approx(accuracy = 10000) guarantees rank error
    // <= n / accuracy; allow one extra element for boundary ties.
    for ((flag, qs) <- approx; (q, target) <- qs.zip(Seq(0.5, 0.95, 0.99))) {
      val xs = byFlag(flag)
      val n = xs.length
      val rank = xs.count(_ <= q)
      val eps = n.toDouble / 10000.0 + 1
      assert(math.abs(rank - target * n) <= eps + 1,
        s"flag $flag p$target: value $q has rank $rank of $n (ε=$eps)")
    }
  }

  test("x3_cms_heavy_hitters: exact <= estimate <= exact + eps*N") {
    val rows = SparkEntry.queries("x3_cms_heavy_hitters")(spark, sf).collect()
    assert(rows.length == 20)
    val totalTokens = Tables.documents(spark, sf)
      .select(explode(TextOps.tokens).as("tok"))
      .count()
    val epsN = 0.001 * totalTokens
    for (r <- rows) {
      val (tok, exact, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= exact, s"$tok: estimate $est below exact $exact")
      assert(est <= exact + epsN,
        s"$tok: estimate $est exceeds exact $exact + ε·N ($epsN)")
    }
  }
}
