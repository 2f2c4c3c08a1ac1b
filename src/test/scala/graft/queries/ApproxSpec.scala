package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** Error-bound gates for the sketch-based operators (x1/x2/x3). Since
  * round 4 the gated queries themselves emit `*_ok` booleans (the
  * error-bound contract computed in-plan, hash-compared against the
  * DuckDB oracle's TRUE) — this spec asserts those booleans hold AND
  * re-derives the numeric envelopes from the raw sketch values, so a
  * bound loosened by accident in the query is still caught here.
  */
class ApproxSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = TestSpark.spark

  test("x1_approx_ndv: in-plan gate green and HLL ndv within 5% of exact per group") {
    val gated = SparkEntry.queries("x1_approx_ndv")(spark, sf).collect()
    assert(gated.nonEmpty)
    assert(gated.forall(_.getAs[Boolean]("ndv_ok")),
      s"ndv_ok false for: ${gated.filterNot(_.getAs[Boolean]("ndv_ok")).mkString(",")}")

    val both = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("a"),
        countDistinct(col("l_orderkey")).as("e"))
      .collect()
    for (r <- both) {
      val (a, e) = (r.getAs[Long]("a"), r.getAs[Long]("e"))
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"flag ${r.getString(0)}: approx $a vs exact $e exceeds 5%")
    }
  }

  test("x2_approx_quantile: in-plan gate green and true ranks within epsilon") {
    val gated = SparkEntry.queries("x2_approx_quantile")(spark, sf).collect()
    assert(gated.nonEmpty)
    for (r <- gated; okCol <- Seq("ok_p50", "ok_p95", "ok_p99"))
      assert(r.getAs[Boolean](okCol), s"${r.getString(0)}: $okCol false")

    val approx = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"),
        array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("qs"))
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Double]]("qs")).toMap
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

  test("x3_cms_heavy_hitters: in-plan gate green and exact <= estimate <= exact + eps*N") {
    val gated = SparkEntry.queries("x3_cms_heavy_hitters")(spark, sf).collect()
    assert(gated.length == 20)
    assert(gated.forall(_.getAs[Boolean]("cms_ok")),
      s"cms_ok false for: ${gated.filterNot(_.getAs[Boolean]("cms_ok")).mkString(",")}")

    // re-derive the envelope from raw estimates (same sketch params)
    val toks = Tables.documents(spark, sf).select(explode(TextOps.tokens).as("tok"))
    val sketch = toks.agg(expr("count_min_sketch(tok, 0.001d, 0.99d, 42)").as("cms"))
    val top = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("tok")).limit(20)
    val est = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.CmsEstimate(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("cms")),
        org.apache.spark.sql.graft.ColumnBridge.expression(col("tok"))))
    val rows = top.crossJoin(broadcast(sketch))
      .select(col("tok"), col("exact_n"), est.as("est_n")).collect()
    val totalTokens = toks.count()
    val epsN = 0.001 * totalTokens
    for (r <- rows) {
      val (tok, exact, e) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(e >= exact, s"$tok: estimate $e below exact $exact")
      assert(e <= exact + epsN, s"$tok: estimate $e exceeds exact $exact + ε·N ($epsN)")
    }
  }
}
