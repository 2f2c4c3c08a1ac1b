package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** d14_bloom_decontaminate — the Bloom-prefiltered decontamination path.
  *
  * The operator's whole contract is "the prefilter loses nothing": Bloom
  * filters have no false negatives, so after the exact confirm join the
  * answer must be byte-identical to d8's. The first test checks exactly
  * that, differentially, at sf0.01. The sketch-level tests pin the
  * no-false-negative property and a sane false-positive rate on seeded
  * keys, and the plan test pins the scale shape (scalar-subquery bloom
  * prefilter, broadcast confirm join, no sort-merge on the corpus path).
  */
class BloomDecontamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = TestSpark.spark

  private def bloomAgg(h: Column, items: Long) =
    ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ColumnBridge.expression(h), items)
        .toAggregateExpression())

  private def mightContain(bfScalar: Column, h: Column) =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bfScalar),
      ColumnBridge.expression(h)))

  test("d14 equals d8 row-for-row (the prefilter drops no true overlap)") {
    val exact = SparkEntry.queries("d8_decontaminate")(spark, sf).collect()
    val bloom = SparkEntry.queries("d14_bloom_decontaminate")(spark, sf).collect()
    assert(exact.nonEmpty, "d8 returned no rows — differential test is vacuous")
    assert(bloom.length == exact.length,
      s"row counts differ: d8 ${exact.length} vs d14 ${bloom.length}")
    for ((e, b) <- exact.zip(bloom))
      assert(e == b, s"row mismatch: d8 $e vs d14 $b")
  }

  test("no false negatives: every inserted key probes true") {
    val keys = spark.range(0, 10000).select(xxhash64(col("id")).as("h"))
    val bf = keys.agg(bloomAgg(col("h"), 1000000L).as("bf"))
    val misses = spark.range(0, 10000).select(xxhash64(col("id")).as("h"))
      .where(!mightContain(bf.scalar(), col("h")))
      .count()
    assert(misses == 0L, s"$misses inserted keys probed false")
  }

  test("false-positive rate on absent keys stays far under the fpp budget") {
    val keys = spark.range(0, 10000).select(xxhash64(col("id")).as("h"))
    val bf = keys.agg(bloomAgg(col("h"), 1000000L).as("bf"))
    // 100k keys never inserted; at 10k items in a 1M-capacity filter the
    // fill factor is ~1%, so false positives should be ≪ the 3% design
    // fpp — gate at 1%.
    val fps = spark.range(10000, 110000).select(xxhash64(col("id")).as("h"))
      .where(mightContain(bf.scalar(), col("h")))
      .count()
    assert(fps < 1000L, s"$fps false positives in 100k absent keys (≥1%)")
  }

  test("plan shape: scalar-subquery prefilter, broadcast confirm join, no sort-merge") {
    val df = SparkEntry.queries("d14_bloom_decontaminate")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"confirm join is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"sort-merge join in plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    // the bloom rides a scalar subquery, not a join — the corpus path
    // must carry NO nested-loop join at all
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in plan (bloom should be a scalar subquery):\n$plan")
    assert(plan.contains("might_contain"),
      s"bloom prefilter missing from plan:\n$plan")
  }
}
