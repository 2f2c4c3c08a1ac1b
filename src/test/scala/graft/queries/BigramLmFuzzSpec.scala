package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Differential fuzz for [[TextOps.bigramLm]]: a driver-side interpreter
  * trains the same bigram model (plain hash maps) and scores each
  * document with the same order-independent statistics; every field must
  * match exactly (probabilities bit-for-bit — single divisions of exact
  * longs). Random corpora from a small vocabulary force heavy bigram
  * collisions across documents (the interesting regime for conditional
  * counts), plus sub-2-token documents that must vanish from the output.
  */
class BigramLmFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def reference(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Double, Double)] = {
    val bgOf = docs.map { case (id, text) =>
      id -> text.toLowerCase.split(" ", -1).toSeq.sliding(2).toSeq
        .filter(_.size == 2).map(_.mkString(" "))
    }.toMap
    val cBg = bgOf.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cW1 = cBg.toSeq.groupBy(_._1.split(" ")(0))
      .view.mapValues(_.map(_._2).sum).toMap
    bgOf.collect { case (id, bgs) if bgs.nonEmpty =>
      val ps = bgs.map(bg => cBg(bg).toDouble / cW1(bg.split(" ")(0)).toDouble)
      id -> (bgs.size.toLong, bgs.count(bg => cBg(bg) <= 1).toLong,
        ps.min, ps.max)
    }
  }

  test("seeded fuzz: 8 random corpora match the reference model exactly") {
    val rnd = new scala.util.Random(97)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    for (round <- 1 to 8) {
      val docs = (0L until (3 + rnd.nextInt(15)).toLong).map { id =>
        val n = rnd.nextInt(12) // includes 0- and 1-token docs
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val expected = reference(docs)

      import spark.implicits._
      val got = TextOps.bigramLm(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap

      assert(got.keySet == expected.keySet,
        s"round $round: doc sets differ (${got.keySet} vs ${expected.keySet})")
      for ((id, e) <- expected) {
        val g = got(id)
        assert(g._1 == e._1 && g._2 == e._2, s"round $round doc $id counts: $g vs $e")
        assert(java.lang.Double.doubleToLongBits(g._3) ==
          java.lang.Double.doubleToLongBits(e._3), s"round $round doc $id min_p")
        assert(java.lang.Double.doubleToLongBits(g._4) ==
          java.lang.Double.doubleToLongBits(e._4), s"round $round doc $id max_p")
      }
    }
  }
}
