package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** MinKDistinctLongs — differential gate across the full aggregate
  * lifecycle: repartitioning the input forces partial buffers, shuffle
  * serialization, and merges, and the result must equal the obvious
  * driver-side `distinct.sorted.take(k)` on every key. Covers groups
  * smaller than k, heavy duplication (the dedup path), nulls (skipped),
  * and k = 1 (degenerate min).
  */
class MinKSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def minkCol(k: Int) = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinKDistinctLongs(
      ColumnBridge.expression(col("v")), k).toAggregateExpression())
  }

  test("seeded fuzz: equals distinct.sorted.take(k) on every key, across partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    for (k <- Seq(1, 8, 64)) {
      val rows = (1 to 5000).map { _ =>
        ("k" + rnd.nextInt(7), rnd.nextInt(300).toLong - 150L) // heavy dups, negatives
      }
      val expected = rows.groupBy(_._1)
        .view.mapValues(_.map(_._2).distinct.sorted.take(k)).toMap
      val got = rows.toDF("key", "v").repartition(8)
        .groupBy("key").agg(minkCol(k).as("mink"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got == expected, s"k=$k")
    }
  }

  test("nulls are skipped; an all-null group yields an empty sketch") {
    import spark.implicits._
    val df = Seq(("a", Some(5L)), ("a", None), ("a", Some(2L)), ("b", None))
      .toDF("key", "v").repartition(3)
    val got = df.groupBy("key").agg(minkCol(4).as("mink"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got == Map("a" -> Seq(2L, 5L), "b" -> Seq.empty))
  }
}
