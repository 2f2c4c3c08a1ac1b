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

  /** Full-trainer reference: greedy argmax (count desc, "a b" asc) over
    * a word-count map, same rules as BpeSpec's but driven here by random
    * corpora so tie-breaking and merge interaction get exercised. */
  private def referenceTrain(
      words: Map[String, Long], nMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toVector } {
        case (_, c) => c
      }(_ + _)
    val out = Seq.newBuilder[(String, String)]
    var i = 0
    var stop = false
    while (i < nMerges && !stop) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- vocab; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) =
          counts.getOrElse((syms(j), syms(j + 1)), 0L) + c
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), _) = counts.minBy { case ((x, y), n) => (-n, s"$x $y") }
        out += ((a, b))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
            else acc :+ x
          }
        } { case (_, c) => c }(_ + _)
      }
      i += 1
    }
    out.result()
  }

  test("seeded fuzz: bpeTrain matches the reference on 5 random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(1313)
    for (trial <- 0 until 5) {
      // tiny alphabet → dense pair-count ties, the hard case for the
      // deterministic tie-break
      val letters = "abc"
      val words = Seq.fill(30)(
        (0 until (1 + rnd.nextInt(6))).map(_ => letters(rnd.nextInt(3))).mkString)
      val docs = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
      val wcs = words.groupMapReduce(identity)(_ => 1L)(_ + _)
      val expected = referenceTrain(wcs, 4)
      val (got, vocab) = Tokenize.bpeTrain(docs, 4)
      vocab.unpersist()
      assert(got === expected, s"trial $trial words=$words")
    }
  }
}
