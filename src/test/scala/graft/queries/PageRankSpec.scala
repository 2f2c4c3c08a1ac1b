package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** d16 — fixed-point integer PageRank: exact invariants a float
  * implementation could only approximate, plus a brute-force
  * differential on a non-regular topology.
  */
class PageRankSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    TextOps.pageRank(edges.toDF("doc_a", "doc_b"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Literal integer-unit interpreter of the same recurrence. */
  private def brute(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val ed = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = ed.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var rank = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = ed.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = rank.keys.map(n => n -> (150000L + 85L * contrib(n) / 100L)).toMap
    }
    rank
  }

  test("regular graph is an exact fixed point: every rank stays 10^6") {
    // 6-cycle: each node gets two contributions of 10^6/2; damping maps
    // the sum straight back to 10^6 with zero floor loss — exactly.
    val cycle = (0L to 5L).map(i => i -> (i + 1) % 6)
    for (iters <- Seq(1, 5))
      assert(run(cycle, iters).values.toSet == Set(1000000L))
  }

  test("star + chain topology matches the literal interpreter exactly") {
    val star = (1L to 5L).map(l => 0L -> l)
    val chain = Seq(5L -> 6L, 6L -> 7L, 7L -> 8L)
    val edges = star ++ chain
    assert(run(edges, 5) == brute(edges, 5))
    // the hub of the star must outrank every leaf
    val r = run(edges, 5)
    assert((1L to 4L).forall(l => r(0L) > r(l)))
  }

  test("gate runs on real data and ranks are in the damped band") {
    val rows = SparkEntry.queries("d16_pagerank")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    // every rank ≥ the damping floor 0.15·10^6; total mass cannot exceed
    // the initial n·10^6 (integer floors only ever lose mass)
    val ranks = rows.map(_.getLong(1))
    assert(ranks.forall(_ >= 150000L))
    assert(ranks.sum <= rows.length * 1000000L)
  }
}
