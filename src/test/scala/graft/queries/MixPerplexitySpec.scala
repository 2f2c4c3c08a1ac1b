package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Differential references for the two round-6 additions:
  *
  *  - t13_perplexity_filter — a driver-side interpreter trains the same
  *    bigram model and quantizes each occurrence's surprisal with exact
  *    integer bit-length (`63 - nlz(c_w1 / c_bg)`), the same value the
  *    query computes via `length(conv(q, 10, 2)) - 1`; every field must
  *    match exactly, mean_bits bit-for-bit (one division of exact longs).
  *  - c8_temperature_mix — a driver-side model recomputes the quantized
  *    sqrt weights, integer keep thresholds, and md5-bucket membership
  *    on a skewed multi-source corpus (sources sized 1 / 4 / 16 docs, so
  *    temperature visibly compresses the range of upsample factors).
  */
class MixPerplexitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def corpusDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mixppl").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def bits(cW1: Long, cBg: Long): Long =
    63L - java.lang.Long.numberOfLeadingZeros(cW1 / cBg)

  test("t13 seeded fuzz: quantized surprisal matches the integer reference exactly") {
    val rnd = new scala.util.Random(131)
    val vocab = Vector("a", "b", "c", "d", "e")
    for (round <- 1 to 6) {
      val docs = (0L until (3 + rnd.nextInt(12)).toLong).map { id =>
        val n = rnd.nextInt(14) // includes sub-2-token docs → absent from output
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "), "s0")
      }
      val bgOf = docs.map { case (id, text, _) =>
        id -> text.toLowerCase.split(" ", -1).toSeq.sliding(2).toSeq
          .filter(_.size == 2).map(_.mkString(" "))
      }.toMap
      val cBg = bgOf.values.flatten.groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val cW1 = cBg.toSeq.groupBy(_._1.split(" ")(0))
        .view.mapValues(_.map(_._2).sum).toMap
      val expected = bgOf.collect { case (id, bgs) if bgs.nonEmpty =>
        val bs = bgs.map(bg => bits(cW1(bg.split(" ")(0)), cBg(bg)))
        val mean = bs.sum.toDouble / bs.size.toDouble
        id -> (bs.size.toLong, bs.sum, mean, mean <= 6.0)
      }

      val got = SparkEntry.queries("t13_perplexity_filter")(spark, corpusDir(docs))
        .collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
      assert(got.keySet == expected.keySet, s"round $round: doc sets differ")
      for ((id, e) <- expected) {
        val g = got(id)
        assert(g._1 == e._1 && g._2 == e._2 && g._4 == e._4,
          s"round $round doc $id: $g vs $e")
        assert(java.lang.Double.doubleToLongBits(g._3) ==
          java.lang.Double.doubleToLongBits(e._3),
          s"round $round doc $id mean_bits: ${g._3} vs ${e._3}")
      }
    }
  }

  test("c8 planted skewed sources: weights, factors, thresholds, membership all exact") {
    val rnd = new scala.util.Random(7)
    def text(n: Int) = Seq.fill(n)("tok" + rnd.nextInt(9)).mkString(" ")
    var id = -1L
    val docs =
      (1 to 1).map  { _ => id += 1; (id, text(30 + rnd.nextInt(40)), "tiny")  } ++
      (1 to 4).map  { _ => id += 1; (id, text(30 + rnd.nextInt(40)), "mid")   } ++
      (1 to 16).map { _ => id += 1; (id, text(30 + rnd.nextInt(40)), "large") }

    // driver-side model, mirroring the query's integer contract
    val per = docs.groupBy(_._3).map { case (src, ds) =>
      val nDocs = ds.size.toLong
      val sumChars = ds.map(_._2.length.toLong).sum
      (src, nDocs, sumChars,
        math.floor(math.sqrt(sumChars.toDouble) * 100).toLong)
    }.toSeq
    val totalW = per.map(_._4).sum
    val nTotal = per.map(_._2).sum
    def bucket(docId: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
      java.lang.Integer.parseInt(f"${md(0) & 0xff}%02x", 16)
    }
    val expected = per.map { case (src, nDocs, sumChars, w) =>
      val keepBuckets = math.min(256L, (nTotal * w * 256L) / (totalW * nDocs))
      val sampled = docs.count(d => d._3 == src && bucket(d._1) < keepBuckets)
      src -> ((nDocs, sumChars, w,
        w.toDouble / totalW.toDouble,
        (nTotal * w).toDouble / (totalW * nDocs).toDouble,
        sampled.toLong))
    }.toMap

    // temperature property: α=1/2 compresses a 16:1 doc-count skew into
    // upsample factors that still favor the small source but by ≪ 16×
    val fTiny = expected("tiny")._5
    val fLarge = expected("large")._5
    assert(fTiny > fLarge && fTiny / fLarge < 8.0,
      s"sqrt temperature should compress the 16:1 skew: $fTiny vs $fLarge")

    val got = SparkEntry.queries("c8_temperature_mix")(spark, corpusDir(docs))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getLong(6)))).toMap
    assert(got.keySet == expected.keySet)
    for ((src, e) <- expected) {
      val g = got(src)
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._6 == e._6,
        s"$src integer fields: $g vs $e")
      assert(java.lang.Double.doubleToLongBits(g._4) ==
        java.lang.Double.doubleToLongBits(e._4), s"$src mix_share")
      assert(java.lang.Double.doubleToLongBits(g._5) ==
        java.lang.Double.doubleToLongBits(e._5), s"$src upsample_factor")
    }
  }
}
