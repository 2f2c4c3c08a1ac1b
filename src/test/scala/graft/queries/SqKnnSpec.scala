package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** v7_sq_knn QUALITY + contract gate (the oracle gates cross-engine
  * agreement; this spec gates what the numbers mean):
  *
  *  - retrieval quality: the int8-quantized candidate stage must
  *    actually preserve neighborhoods — the exact double-cosine top-3
  *    per query must be recovered from the quantized top-10 candidate
  *    set for (almost) every query. int8 over 64 dims keeps enough
  *    resolution that recall@3-through-10 should be essentially 1;
  *    the gate allows one miss across all queries.
  *  - code contract: every emitted candidate's integer score equals the
  *    driver-recomputed floor(x·2^7) dot product — 2^7 scaling shifts
  *    the float exponent without rounding, so codes are exact, which is
  *    what makes the cross-engine gate bit-stable.
  */
class SqKnnSpec extends AnyFunSuite {

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

  private def code(a: Array[Float]): Array[Int] =
    a.map(x => math.floor(x.toDouble * 128.0).toInt)

  test("quantized candidates preserve the exact top-3; integer scores match the driver") {
    val vecs: Map[Long, Array[Float]] = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val queries = vecs.keys.filter(_ < 20).toSeq.sorted

    // exact top-3 by double cosine (same tie rule as the query: id asc)
    val exactTop3: Map[Long, Seq[Long]] = queries.map { q =>
      q -> vecs.keySet.filter(_ != q).toSeq
        .sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(3)
    }.toMap

    val out = SparkEntry.queries("v7_sq_knn")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(4)))

    // integer-score contract, exact
    for ((qid, nid, _, dotQ, _) <- out) {
      val qc = code(vecs(qid)); val nc = code(vecs(nid))
      val expected = qc.zip(nc).map { case (a, b) => a * b }.sum
      assert(dotQ == expected, s"q=$qid n=$nid int8 dot: $dotQ vs $expected")
    }

    // recall: the emitted 3 (exact re-rank of quantized top-10) vs exact top-3
    val misses = queries.map { q =>
      val got = out.filter(_._1 == q).sortBy(_._3).map(_._2).toSeq
      exactTop3(q).count(n => !got.contains(n))
    }.sum
    assert(misses <= 1,
      s"int8 candidate stage lost $misses of ${queries.size * 3} exact top-3 neighbors")
  }
}
