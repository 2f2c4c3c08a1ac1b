package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Structural contract of the DSIR importance weights (t18 gates the
  * arithmetic against DuckDB; THIS pins that the weights mean what the
  * paper needs them to mean): documents from the target distribution
  * must score higher than documents from every other slice, weights
  * are exact integers (deterministic across runs by construction), and
  * the feature table stays bucket-bounded.
  */
class DsirSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def weights = SparkEntry.queries("t18_dsir_weights")(spark, sf)

  test("target-language documents outscore every other language slice") {
    val byLang = weights.groupBy("lang")
      .agg(avg(col("dsir_bits")).as("mean_w"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val en = byLang("en")
    for ((lang, w) <- byLang if lang != "en")
      assert(en > w,
        f"target slice en ($en%.2f) must outscore $lang ($w%.2f) — " +
          "importance weights are not tracking the target distribution")
  }

  test("weights are exact integers, stable across two evaluations") {
    val a = weights.collect().map(_.toSeq).toSeq
    val b = weights.collect().map(_.toSeq).toSeq
    assert(a == b, "re-evaluation changed a weight — nondeterminism")
    assert(a.nonEmpty)
  }

  test("the qlr feature table is bucket-bounded (broadcast side)") {
    // the per-feature log-ratio table must stay ≤ the 1024 hash
    // buckets no matter the corpus size — that is what makes it the
    // broadcast side of the per-doc join at 100 TB
    val plan = weights.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("broadcast"),
      s"qlr table is not broadcast:\n${plan.take(3000)}")
  }
}
