package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hash-min label propagation vs a driver-side union-find on random
  * graphs: every node must land in the component of its true minimum
  * reachable id. */
class ComponentsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(x => x -> find(x)).toMap
  }

  test("random graphs: components equal union-find roots") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val n = 120
      val edges = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val got = Components.connectedComponents(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(n, edges)
      assert(got == want, s"trial $trial")
    }
  }

  test("a long chain converges (worst-case diameter)") {
    val chain = (0L until 30L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = Components.connectedComponents(chain.toDF("a", "b"), maxIters = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(0L))
    assert(got.size == 30)
  }

  test("disjoint cliques keep separate canonical ids") {
    val cliqueA = for (i <- 0 to 3; j <- (i + 1) to 3) yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 10 to 13; j <- (i + 1) to 13) yield (i.toLong, j.toLong)
    val got = Components.connectedComponents((cliqueA ++ cliqueB).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).forall(got(_) == 0L))
    assert((10L to 13L).forall(got(_) == 10L))
  }
}
