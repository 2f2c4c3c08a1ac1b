package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** Structural contract of the MMR rerank (v13): the greedy diversity
  * pass must actually diversify — not just replay the relevance order —
  * while keeping the relevance anchor (first pick) and determinism.
  * The exact scores are oracle-gated (v13_mmr_rerank); this pins the
  * properties a score-level gate can't express.
  */
class MmrSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = TestSpark.spark

  private def picks(): Seq[Long] =
    SparkEntry.queries("v13_mmr_rerank")(spark, sf)
      .orderBy("rnk").select("nid").collect().map(_.getLong(0)).toSeq

  private def relevanceTop(n: Int): Seq[Long] = {
    val e = Tables.embeddings(spark, sf)
    val q0 = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    e.where(col("vec_id") =!= 0).crossJoin(broadcast(q0))
      .select(col("vec_id"),
        VectorOps.cosine(col("qe"), col("embedding")).as("simq"))
      .orderBy(col("simq").desc, col("vec_id")).limit(n)
      .collect().map(_.getLong(0)).toSeq
  }

  test("10 distinct picks, all from the top-25 pool, anchored at the relevance argmax") {
    val p = picks()
    assert(p.size == 10 && p.distinct.size == 10)
    val pool = relevanceTop(25)
    assert(p.forall(pool.contains), s"picks escaped the candidate pool: $p")
    assert(p.head == pool.head,
      "first MMR pick must be the pure-relevance argmax")
  }

  test("diversity has teeth: MMR order and membership differ from pure relevance") {
    val p = picks()
    val rel = relevanceTop(10)
    assert(p != rel, "MMR replayed the relevance order — λ had no effect")
    assert(p.toSet != rel.toSet,
      "MMR kept exactly the relevance top-10 — diversity never swapped a member")
  }

  test("deterministic: two serves agree exactly") {
    assert(picks() == picks())
  }
}
