package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Differential fuzz for [[TextOps.dupGraphMetrics]]: brute-force degree
  * and triangle enumeration over random canonical edge sets must match
  * the distributed ordered-edge join exactly. Random G(n, p) graphs at
  * several densities exercise the shapes the LSH graph rarely produces
  * (isolated edges, long paths with zero triangles, near-cliques where
  * every node sits in many triangles).
  */
class DupGraphFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def reference(edges: Set[(Long, Long)]): Map[Long, (Int, Int)] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val adj = nodes.map(n => n ->
      edges.collect { case (a, b) if a == n => b; case (a, b) if b == n => a })
      .toMap
    val triangles = for {
      (a, b) <- edges
      c <- nodes if b < c && edges((b, c)) && edges((a, c))
    } yield (a, b, c)
    nodes.map { n =>
      n -> (adj(n).size, triangles.count(t => t._1 == n || t._2 == n || t._3 == n))
    }.toMap
  }

  test("seeded fuzz: 10 random graphs match brute-force degree/triangle counts") {
    val rnd = new scala.util.Random(103)
    for (round <- 1 to 10) {
      val n = 4 + rnd.nextInt(10)
      val p = Seq(0.1, 0.3, 0.7)(rnd.nextInt(3))
      val edges = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if rnd.nextDouble() < p
      } yield (a, b)).toSet
      if (edges.nonEmpty) {
        val expected = reference(edges)
        import spark.implicits._
        val got = TextOps.dupGraphMetrics(edges.toSeq.toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
        assert(got == expected, s"round $round (n=$n p=$p): $got vs $expected")
      }
    }
  }
}
