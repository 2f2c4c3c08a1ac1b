package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Differential fuzz for [[TextOps.bm25]]: a driver-side interpreter
  * computes the same rational-idf BM25 in plain Scala doubles, in the
  * exact IEEE operation order the Spark expression declares, and every
  * score must match BIT-exactly (not approximately — the whole point of
  * the rational idf is that the score is reproducible to the last bit
  * across engines). Random corpora stress the edges: terms absent from
  * every document (df=0), documents that are all one term, empty-ish
  * one-token docs, and tf=0 rows (score contribution must be exactly 0).
  */
class Bm25FuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Reference scorer — mirrors the expression tree of TextOps.bm25
    * literally: long stats, left-associative +, and the same cast points
    * (Spark's Divide over longs widens both sides to double). */
  private def reference(
      docs: Seq[(Long, String)], terms: Seq[String]): Map[Long, Double] = {
    val toks = docs.map { case (id, text) => id -> text.toLowerCase.split(" ", -1).toSeq }
    val nDocs = docs.size.toLong
    val sumDl = toks.map(_._2.size.toLong).sum
    val df = terms.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    toks.map { case (id, ts) =>
      val dl = ts.size
      val avgdl = sumDl.toDouble / nDocs.toDouble
      val score = terms.map { t =>
        val tf = ts.count(_ == t)
        ((nDocs - df(t)) + 0.5) / (df(t) + 0.5) *
          (tf * 2.2) /
          (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
      }.reduceLeft(_ + _)
      id -> score
    }.toMap
  }

  test("seeded fuzz: 8 random corpora score bit-identically to the reference") {
    val rnd = new scala.util.Random(82)
    val vocab = Vector("spark", "join", "hash", "scan", "row", "agg", "col")
    for (round <- 1 to 8) {
      val terms = rnd.shuffle(vocab).take(1 + rnd.nextInt(3))
      val docs = (0L until (3 + rnd.nextInt(20)).toLong).map { id =>
        val n = 1 + rnd.nextInt(30)
        // occasionally a doc of one repeated token / a term-free doc
        val pool =
          if (rnd.nextInt(5) == 0) Vector(vocab(rnd.nextInt(vocab.size)))
          else if (rnd.nextInt(5) == 0) vocab.filterNot(terms.contains)
          else vocab
        id -> Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString(" ")
      }
      val expected = reference(docs, terms)

      import spark.implicits._
      val df = docs.toDF("doc_id", "text")
      val got = TextOps.bm25(df, terms).collect()
        .map(r => r.getLong(0) -> r.getDouble(r.length - 1)).toMap

      assert(got.keySet == expected.keySet, s"round $round: doc sets differ")
      for ((id, s) <- got)
        assert(java.lang.Double.doubleToLongBits(s) ==
          java.lang.Double.doubleToLongBits(expected(id)),
          s"round $round doc $id: spark=$s reference=${expected(id)} " +
            s"(terms=$terms)")
    }
  }
}
