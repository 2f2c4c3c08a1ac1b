package graft.oracle

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's permutation-count tests
  * (crates/oracle/src/db/outcome_generator.rs:21-70). */
class OutcomesSpec extends AnyFunSuite {

  test("nP3 sizes match the reference test thresholds") {
    assert(Outcomes.permutations(5, 3).size == 60)
    assert(Outcomes.permutations(20, 3).size == 6840)
    assert(Outcomes.permutations(25, 3).size == 13800)
    assert(Outcomes.count(100, 3) == 970200L)
  }

  test("permutations are distinct, ordered, and k-length") {
    val ps = Outcomes.permutations(4, 2).toSeq
    assert(ps.length == 12)
    assert(ps.distinct.length == 12)
    assert(ps.forall(_.length == 2))
    assert(ps.forall(p => p.distinct.length == 2))
    assert(ps.head == Seq(0, 1)) // lexicographic
  }

  test("count matches materialized size") {
    assert(Outcomes.count(7, 4) == Outcomes.permutations(7, 4).size.toLong)
  }

  test("distributed generator produces exactly the iterator's space") {
    val spark = graft.TestSpark.spark
    val fromDf = Outcomes.permutationsDF(spark, 6, 3).collect()
      .map(r => Seq(r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt))
      .toSet
    val fromIter = Outcomes.permutations(6, 3).toSet
    assert(fromDf == fromIter)
    assert(fromDf.size == Outcomes.count(6, 3))
    // k=1 edge: no distinctness predicate at all
    assert(Outcomes.permutationsDF(spark, 4, 1).count() == 4)
  }
}
