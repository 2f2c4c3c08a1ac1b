package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** Dedup QUALITY gate: d2's MinHash-LSH-verified pairs measured against
  * the exact all-pairs ground truth, computed independently in plain
  * Scala at sf0.001 (500 docs — all-pairs is feasible there and only
  * there, which is exactly why the engine uses LSH).
  *
  *  - PRECISION must be 1.0 and jaccard values must agree exactly: the
  *    verify stage (shingling → xxhash64 → SortedIntersectCount) is
  *    differentially validated against naive string-set intersection.
  *  - RECALL is the documented LSH trade: pairs must share at least one
  *    of 8 minhash bands to be candidates. P(seen) = 1-(1-j)^8, so
  *    high-similarity pairs are near-certain and the 0.05-floor tail is
  *    knowingly lossy. The spec pins measured recall per similarity
  *    band so a banding regression (fewer effective bands, broken
  *    kernel) shows up as a recall drop.
  */
class DedupRecallSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("d2 pairs: precision 1.0, exact jaccards, recall per similarity band") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] = {
      val toks = t.toLowerCase.split(" ", -1)
      if (toks.length < 3) Set.empty
      else (0 to toks.length - 3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }

    // exact all-pairs truth at the same 0.05 floor d2 verifies at
    val ids = sh.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (sh(a) intersect sh(b)).size
      union = sh(a).size + sh(b).size - inter
      if union > 0
      jac = inter.toDouble / union
      if jac >= 0.05
    } yield (a, b) -> jac).toMap

    val got = SparkEntry.queries("d2_dedup_ngram_jaccard")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap

    // precision 1.0 + exact agreement on every reported jaccard
    for ((pair, jac) <- got) {
      assert(truth.contains(pair), s"false positive pair $pair")
      assert(truth(pair) == jac, s"pair $pair: engine $jac vs exact ${truth(pair)}")
    }

    def recall(lo: Double, hi: Double): (Int, Int) = {
      val band = truth.filter { case (_, j) => j >= lo && j < hi }
      (band.keys.count(got.contains), band.size)
    }
    val (hiHit, hiN) = recall(0.5, 1.01)
    val (midHit, midN) = recall(0.2, 0.5)
    val (loHit, loN) = recall(0.05, 0.2)
    info(s"recall j>=0.5: $hiHit/$hiN  0.2<=j<0.5: $midHit/$midN  0.05<=j<0.2: $loHit/$loN")
    // 8 single-hash bands: P(miss) = (1-j)^8 — <0.4% at j=0.5
    assert(hiN == 0 || hiHit == hiN,
      s"high-similarity pair missed by LSH: $hiHit/$hiN")
    assert(midN == 0 || midHit.toDouble / midN >= 0.75,
      s"mid-band recall collapsed: $midHit/$midN")
  }
}
