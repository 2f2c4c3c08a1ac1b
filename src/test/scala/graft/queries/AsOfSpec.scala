package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The union+window as-of encoding vs a brute-force per-row reference on
  * seeded random data — including keys with no match, exact-tie
  * timestamps, and interleaved histories. */
class AsOfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(ms: Long) = new Timestamp(ms)

  test("matches the brute-force point-in-time lookup on random data") {
    val rnd = new scala.util.Random(7)
    val leftRows = (1 to 300).map { i =>
      (i.toLong, s"k${rnd.nextInt(12)}", t(rnd.nextInt(100000).toLong))
    }
    // key k11 never appears on the right → always a miss
    val rightRows = (1 to 200).map { i =>
      (s"k${rnd.nextInt(11)}", t(rnd.nextInt(100000).toLong), 1000L + i)
    }.distinct
      // unique (key, ts): keep the max payload like q22's pre-aggregation
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq

    val left = leftRows.toDF("id", "k", "ts")
    val right = rightRows.toDF("k", "ts", "v")

    val got = AsOf.joinBackward(left, right, Seq("k"), "ts", "ts")
      .select(col("id"), col("asof").getField("v").as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap

    val byKey = rightRows.groupBy(_._1)
    for ((id, k, ts) <- leftRows) {
      val expected = byKey.getOrElse(k, Seq.empty)
        .filter(!_._2.after(ts)) // right.ts <= left.ts, ties included
        .sortBy(r => (r._2.getTime, r._3)).lastOption.map(_._3)
      assert(got(id) == expected, s"left id=$id k=$k ts=$ts")
    }
  }

  test("a right row at exactly left.ts is visible (>= contract)") {
    val left = Seq((1L, "a", t(1000))).toDF("id", "k", "ts")
    val right = Seq(("a", t(1000), 7L)).toDF("k", "ts", "v")
    val out = AsOf.joinBackwardFlat(left, right, Seq("k"), "ts", "ts")
      .collect().head
    assert(out.getAs[Long]("asof_v") == 7L)
  }

  test("no preceding right row yields the default") {
    val left = Seq((1L, "a", t(500))).toDF("id", "k", "ts")
    val right = Seq(("a", t(1000), 7L)).toDF("k", "ts", "v")
    val out = AsOf.joinBackwardFlat(left, right, Seq("k"), "ts", "ts",
      defaults = Map("v" -> lit(-1L))).collect().head
    assert(out.getAs[Long]("asof_v") == -1L)
  }

  test("the plan is a single window over the union — no nested-loop join") {
    val left = Seq((1L, "a", t(500))).toDF("id", "k", "ts")
    val right = Seq(("a", t(1000), 7L)).toDF("k", "ts", "v")
    val plan = AsOf.joinBackward(left, right, Seq("k"), "ts", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Window"), plan)
  }
}
