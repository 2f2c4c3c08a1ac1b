package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SortedIntersectCountSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def viaSpark(pairs: Seq[(Array[Long], Array[Long])]): Seq[Int] = {
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.functions._
    val df = pairs.toDF("a", "b")
    df.select(ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(sort_array(col("a"))),
      ColumnBridge.expression(sort_array(col("b"))))).as("c"))
      .collect().map(_.getInt(0)).toSeq
  }

  test("property: equals set-intersection cardinality on random inputs") {
    val sets = Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.toArray)
    val pairs = (0 until 60).flatMap { i =>
      for {
        a <- sets(Gen.Parameters.default, Seed(i.toLong))
        b <- sets(Gen.Parameters.default, Seed(i.toLong + 1000))
      } yield (a, b)
    }
    val expected = pairs.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    assert(viaSpark(pairs) == expected)
  }

  test("edge cases: empty, disjoint, identical, interleaved") {
    val cases = Seq(
      (Array.empty[Long], Array.empty[Long], 0),
      (Array(1L, 2L, 3L), Array.empty[Long], 0),
      (Array(1L, 3L, 5L), Array(2L, 4L, 6L), 0),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L), 3),
      (Array(Long.MinValue, 0L, Long.MaxValue), Array(Long.MinValue, Long.MaxValue), 2))
    cases.foreach { case (a, b, want) =>
      assert(viaSpark(Seq((a, b))) == Seq(want), s"${a.toSeq} ∩ ${b.toSeq}")
    }
  }
}
