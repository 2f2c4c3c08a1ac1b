package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** v14_binary_quant QUALITY + contract gate (the oracle gates
  * cross-engine agreement; this spec gates what the numbers mean):
  *
  *  - code contract, exact: every vector's packed 64-bit word equals
  *    the driver-recomputed sign pattern of icode[d]·N − Σcorpus
  *    icode[d] (floor(x·2^7) codes are exact, the per-dim compare is
  *    pure bigint — nothing in the bit derivation can drift);
  *  - retrieval quality, honestly coarse: 1 bit/dim over 64 dims keeps
  *    recall@3-from-top-20 at ~0.48 on this corpus (measured; floor
  *    pinned at 0.40) — the documented BQ trade: a 32× smaller scan
  *    whose recall lever is CANDIDATE DEPTH, not code width. Measured
  *    depth curve at sf0.01: 20→0.483, 40→0.683, 80→0.817, 160→0.950;
  *    the depth-160 floor (≥0.90) pins the lever's shape so a bit
  *    regression can't hide behind the coarse depth-20 number.
  *  - the rerank stage is exact by construction (double cosine over
  *    survivors), so within the candidate pool the final top-3 IS the
  *    pool's true cosine top-3 — asserted directly.
  */
class BqKnnSpec extends AnyFunSuite {

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

  private lazy val vecs: Map[Long, Array[Float]] = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding")).collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private lazy val bitWords: Map[Long, Long] = {
    val icode: Map[Long, Array[Long]] =
      vecs.map { case (id, v) => id -> v.map(x => math.floor(x.toDouble * 128.0).toLong) }
    val n = icode.size.toLong
    val t = icode.values.reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
    icode.map { case (id, c) =>
      var w = 0L
      for (d <- 0 until 64 if c(d) * n > t(d)) w |= 1L << d
      id -> w
    }
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("packed word contract is exact; rerank returns the pool's true cosine top-3") {
    val out = SparkEntry.queries("v14_binary_quant")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getDouble(4)))

    // hamming contract: every emitted distance matches the driver-side words
    for ((qid, nid, _, ham, _) <- out)
      assert(ham == hamming(bitWords(qid), bitWords(nid)),
        s"q=$qid n=$nid hamming drift")

    // within-pool exactness: final top-3 == exact cosine top-3 of the
    // driver-recomputed hamming top-20 pool (same tie rules)
    val queries = vecs.keys.filter(_ < 20).toSeq.sorted
    for (q <- queries) {
      val pool = vecs.keySet.filter(_ != q).toSeq
        .sortBy(n => (hamming(bitWords(q), bitWords(n)), n)).take(20)
      val expect = pool.sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(3)
      val got = out.filter(_._1 == q).sortBy(_._3).map(_._2).toSeq
      assert(got == expect, s"q=$q rerank drift: $got vs $expect")
    }
  }

  test("recall floors: >=0.40 at depth 20; the depth lever reaches >=0.90 at 160") {
    val queries = vecs.keys.filter(_ < 20).toSeq.sorted
    def recallAt(depth: Int): Double = {
      var hit = 0
      for (q <- queries) {
        val exact = vecs.keySet.filter(_ != q).toSeq
          .sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(3).toSet
        val pool = vecs.keySet.filter(_ != q).toSeq
          .sortBy(n => (hamming(bitWords(q), bitWords(n)), n)).take(depth).toSet
        hit += exact.count(pool)
      }
      hit.toDouble / (queries.size * 3)
    }
    val r20 = recallAt(20)
    val r160 = recallAt(160)
    assert(r20 >= 0.40, s"depth-20 recall@3 regressed: $r20")
    assert(r160 >= 0.90, s"depth-160 recall@3 regressed: $r160")
  }
}
