package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** ANN QUALITY gate: the k-means-trained IVF index must actually
  * retrieve near neighbors, not just run — recall@10 against the exact
  * brute-force ranking, measured per nprobe. (v5 gates the operator
  * SHAPE with pinned centroids; this spec gates the trained path's
  * retrieval quality end to end.) Deterministic: farthest-first k-means
  * init, no RNG anywhere.
  */
class AnnRecallSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = TestSpark.spark

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("k-means IVF recall@10 grows with nprobe and hits 1.0 at full probe") {
    val k = 16
    val topK = 10
    val nQueries = 20

    val (centroids, assignDf) = KMeans.fit(Tables.embeddings(spark, sf), k)
    val cells: Map[Long, Int] = assignDf.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs: Map[Long, Array[Float]] = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray).toMap
    val queries = vecs.keys.toSeq.sorted.take(nQueries)

    // exact top-10 per query (ties by id, same rule as v1)
    val exact: Map[Long, Set[Long]] = queries.map { q =>
      q -> vecs.keySet.filter(_ != q).toSeq
        .sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(topK).toSet
    }.toMap

    // probe ranking uses SQUARED L2 — the same metric KMeans.assignCell
    // used to place the vectors (a mismatched probe metric would rank
    // loose small-norm centroids differently than assignment did)
    def centL2sq(q: Array[Float], c: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < q.length) {
        val d = q(i).toDouble - c(i); s += d * d
        i += 1
      }
      s
    }

    def recallAt(nprobe: Int): Double = {
      val r = queries.map { q =>
        val probeCells = centroids.indices
          .sortBy(ci => (centL2sq(vecs(q), centroids(ci)), ci)).take(nprobe).toSet
        val cand = vecs.keySet.filter(n => n != q && probeCells.contains(cells(n)))
        val got = cand.toSeq.sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(topK).toSet
        (got intersect exact(q)).size.toDouble / topK
      }
      r.sum / r.length
    }

    val r1 = recallAt(1); val r4 = recallAt(4); val rAll = recallAt(k)
    info(f"recall@10: nprobe=1 $r1%.3f  nprobe=4 $r4%.3f  nprobe=$k $rAll%.3f")
    assert(rAll == 1.0, "full probe must recover the exact ranking")
    assert(r4 >= r1 - 1e-9, "recall must not degrade with more probes")
    assert(r4 >= 0.5, f"nprobe=4 recall collapsed: $r4%.3f")
    assert(r1 >= 0.2, f"nprobe=1 recall collapsed: $r1%.3f")
  }
}
