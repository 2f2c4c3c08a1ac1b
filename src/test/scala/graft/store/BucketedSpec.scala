package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BucketedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("co-bucketed tables join with no shuffle exchange") {
    val a = (1 to 5000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "va")
    val b = (1 to 3000).map(i => (i.toLong % 97, i * 10L)).toDF("k", "vb")
    Bucketed.write(a, "bk_a", Seq("k"), numBuckets = 8)
    Bucketed.write(b, "bk_b", Seq("k"), numBuckets = 8)
    try {
      // sort-merge path must be available for the bucketed merge-join
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      // and it is still the correct join
      val expected = a.join(b, "k").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }

  test("aggregation on the bucket key also skips the exchange") {
    val a = (1 to 2000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    Bucketed.write(a, "bk_agg", Seq("k"), numBuckets = 4)
    try {
      val agg = spark.table("bk_agg").groupBy("k").agg(sum("v"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed groupBy should not shuffle:\n$plan")
      assert(agg.count() == 50)
    } finally spark.sql("DROP TABLE IF EXISTS bk_agg")
  }
}
