package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Learning + decision contracts for the trained NB-vote classifier
  * (arithmetic exactness is t29's oracle gate; the driver corpus has no
  * class signal, so LEARNING is proven here on planted markers).
  */
class ClassifySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def frame(rows: Seq[(Long, Boolean, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "label_pos", "text")
      .select(col("doc_id"), col("label_pos"),
        split(lower(col("text")), " ").as("toks"))
  }

  private def run(train: Seq[(Long, Boolean, String)], eval: Seq[(Long, Boolean, String)]) = {
    import spark.implicits._
    Classify.score(frame(eval), Classify.tokenVotes(frame(train)))
      .select("doc_id", "votes", "pred_pos", "correct")
      .as[(Long, Long, Boolean, Boolean)].collect().toSeq.sortBy(_._1)
  }

  test("planted markers separate perfectly on held-out docs") {
    val train = (0L until 40L).map { i =>
      val pos = i % 2 == 0
      val marker = if (pos) "wiki cite" else "casino pills"
      (i, pos, s"shared filler words $marker more shared filler")
    }
    val eval = Seq(
      (100L, true, "filler wiki words cite shared"),
      (101L, false, "casino shared pills filler"),
      (102L, true, "wiki wiki cite casino")) // 3 pos votes vs 1 neg
    val out = run(train, eval)
    assert(out.forall(_._4), s"all held-out docs must classify correctly: $out")
    assert(out.map(_._3) == Seq(true, false, true))
  }

  test("unseen tokens vote zero; all-unseen doc ties to crawl") {
    val train = Seq((0L, true, "alpha"), (1L, false, "beta"))
    val out = run(train, Seq((10L, true, "neverseen tokens only here")))
    assert(out == Seq((10L, 0L, false, false)))
  }

  test("exact tie predicts crawl (conservative side)") {
    // balanced marker pulls +1 and -1 in one doc
    val train = Seq((0L, true, "up up"), (1L, false, "down down"))
    val out = run(train, Seq((10L, true, "up down")))
    assert(out.head._2 == 0L && !out.head._3)
  }

  test("vote sign matches the smoothed log-odds sign (differential)") {
    val train = Seq(
      (0L, true, "a a a b c"), (1L, true, "a b b"),
      (2L, false, "c c c b"), (3L, false, "a c"))
    import spark.implicits._
    val votes = Classify.tokenVotes(frame(train))
      .as[(String, Int)].collect().toMap
    // recompute with doubles (test-only; prod path never uses ln)
    val toks = train.flatMap { case (_, p, t) => t.split(" ").map((_, p)) }
    val (tp, tn) = (toks.count(_._2), toks.count(!_._2))
    val v = toks.map(_._1).distinct.size
    for (tok <- toks.map(_._1).distinct) {
      val cp = toks.count(x => x._1 == tok && x._2)
      val cn = toks.count(x => x._1 == tok && !x._2)
      val lo = math.log((cp + 1.0) / (tp + v)) - math.log((cn + 1.0) / (tn + v))
      assert(votes(tok) == math.signum(lo).toInt, s"tok=$tok votes=${votes(tok)} lo=$lo")
    }
  }

  test("vote and score joins broadcast, no cartesian") {
    val train = frame(Seq((0L, true, "a b"), (1L, false, "c d")))
    val plan = Classify.score(train, Classify.tokenVotes(train))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
