package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Seeded fuzz: Tokenize.applyMerge's single-fold array rewrite must
  * match a direct Scala implementation of greedy leftmost-first
  * non-overlapping pair merging on random symbol sequences (including
  * adversarial runs like a a a a where overlap handling matters).
  */
class BpeFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def referenceMerge(syms: Seq[String], a: String, b: String): Seq[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
      else acc :+ x
    }

  test("seeded fuzz: applyMerge matches the Scala reference on 300 random words") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val alphabet = Vector("a", "b", "ab", "c")
    val words = (0 until 300).map { i =>
      val len = 1 + rnd.nextInt(12)
      (i.toLong, Vector.fill(len)(alphabet(rnd.nextInt(alphabet.length))))
    }
    val df = words.map { case (id, syms) => (id, syms, 1L) }
      .toDF("id", "symbols", "wc")
    // merge (a, b) — with "ab" also a standalone symbol, so the fold's
    // fused-output-cannot-refuse invariant is actually exercised
    val got = Tokenize.applyMerge(df, "a", "b")
      .select("id", "symbols").as[(Long, Seq[String])].collect().toMap
    for ((id, syms) <- words)
      assert(got(id) === referenceMerge(syms, "a", "b"),
        s"word $id: ${syms.mkString(" ")}")
    // and the (a, a) self-merge on runs
    val gotAA = Tokenize.applyMerge(df, "a", "a")
      .select("id", "symbols").as[(Long, Seq[String])].collect().toMap
    for ((id, syms) <- words)
      assert(gotAA(id) === referenceMerge(syms, "a", "a"),
        s"word $id (a,a): ${syms.mkString(" ")}")
  }
}
