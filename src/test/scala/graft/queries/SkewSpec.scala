package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Salted shapes must be pure plan rewrites: byte-identical results to the
  * unsalted forms, with the shuffle key provably widened. */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // one pathologically hot key (90% of rows) + a long tail
  private lazy val skewed = (1 to 2000).map { i =>
    val k = if (i % 10 != 0) "hot" else s"k${i / 10}"
    (k, i.toLong)
  }.toDF("k", "v")

  private lazy val dim = (Seq("hot") ++ (1 to 200).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, i * 100) }.toDF("k", "w")

  test("saltedJoin returns exactly the plain inner-join rows") {
    val plain = skewed.join(dim, Seq("k")).select("k", "v", "w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), factor = 8)
      .select("k", "v", "w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sorted
    assert(salted.toSeq == plain.toSeq)
    assert(plain.length == 2000) // every skewed row matched exactly once
  }

  test("saltedJoin widens the join key with the salt column") {
    val plan = Skew.saltedJoin(skewed, dim, Seq("k"), factor = 8)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__graft_salt"), plan)
  }

  test("saltedAgg merges partials to the exact unsalted aggregate") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"), max("v").as("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val salted = Skew.saltedAgg(skewed, Seq("k"), factor = 8)(
      partial = Seq(sum("v").as("p_sv"), count(lit(1)).as("p_n"), max("v").as("p_mx")),
      merge = Seq(sum("p_sv").cast("long").as("sv"), sum("p_n").cast("long").as("n"),
        max("p_mx").as("mx")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(salted.toSeq == plain.toSeq)
  }

  test("factor 1 degenerates to the plain shapes") {
    val j = Skew.saltedJoin(skewed, dim, Seq("k"), factor = 1).count()
    assert(j == 2000)
  }
}
