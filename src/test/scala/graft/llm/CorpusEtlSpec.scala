package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The composed corpus pipeline on a hand-built corpus with one of each
  * pathology: an exact duplicate, a near duplicate, a repetition-spam
  * document, a too-short document, and embedded PII. */
class CorpusEtlSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ≥5 tokens, low repetition, distinct enough not to near-dup each other
  private val bodyA = ("the quick brown fox jumps over a lazy dog while " +
    "seventeen sparrows argue about breadcrumbs near the old stone bridge")
  private val bodyB = ("every database engine eventually reinvents half of " +
    "a distributed filesystem plus an optimizer nobody fully trusts anymore")
  // near-dup of bodyA: one token changed mid-sentence → most 3-gram
  // shingles shared, jaccard well above 0.05 but not 1.0
  private val bodyANear = bodyA.replace("seventeen", "eighteen")

  private def corpus = Seq(
    // (doc_id, lang, text)
    (1L, "en", bodyA),
    (2L, "en", bodyA), // exact duplicate of 1 → folded into 1
    (5L, "en", bodyANear), // near-dup of 1 → clustered under 1
    (3L, "en", bodyB + " mail me at a.b@c.example.org today"),
    (4L, "en", "too short to keep"), // < 5 tokens → filtered
    (6L, "en", Seq.fill(40)("spam").mkString(" ")) // top-token frac 1.0 → filtered
  ).toDF("doc_id", "lang", "text")

  test("filter, exact dedup, near-dup clustering and scrub compose") {
    val out = CorpusEtl.prepare(corpus).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))

    val r1 = out(0) // keeper of {1 exact-dup 2, near-dup 5}
    assert(r1.getAs[Int]("n_copies") == 2)
    assert(r1.getAs[Int]("cluster_size") == 2)
    assert(r1.getAs[Int]("n_emails") == 0)

    val r3 = out(1) // unique doc with one email
    assert(r3.getAs[Int]("n_copies") == 1)
    assert(r3.getAs[Int]("cluster_size") == 1)
    assert(r3.getAs[Int]("n_emails") == 1)
    assert(r3.getAs[String]("redacted").contains("<EMAIL>"))
    assert(!r3.getAs[String]("redacted").contains("example.org"))
  }

  test("near-dup threshold is configurable: at 0.99 the near pair splits") {
    val out = CorpusEtl.prepare(corpus, CorpusEtlConfig(minJaccard = 0.99))
      .orderBy("doc_id").collect()
    // doc 5 no longer clusters under 1 — both survive as their own cluster
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L))
    assert(out.forall(_.getAs[Int]("cluster_size") == 1))
  }

  test("pipeline is idempotent: preparing the prepared corpus drops nothing") {
    val once = CorpusEtl.prepare(corpus)
      .selectExpr("doc_id", "lang", "redacted AS text")
    val twice = CorpusEtl.prepare(once).orderBy("doc_id").collect()
    assert(twice.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(twice.forall(r =>
      r.getAs[Int]("n_copies") == 1 && r.getAs[Int]("cluster_size") == 1))
  }

  test("plan is cartesian-free (the only pair step is LSH-bucketed)") {
    val plan = CorpusEtl.prepare(corpus).queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join Cross"), plan)
  }
}
