package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** d15_cdc_dup — content-defined chunking duplication.
  *
  * A driver-side interpreter re-derives the full contract (token-level
  * FastCDC cuts where md5_byte0(last-4-token window) mod 8 == 0, chunk
  * digests, two-level duplicate aggregation) and the query must match
  * it exactly on random corpora. The planted case pins the reason d15
  * exists: a passage at an arbitrary token offset — the misalignment
  * d9's stride grid documents as undetectable — IS detected, because
  * content-defined boundaries depend only on the passage text.
  */
class CdcDupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def corpusDir(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cdc").toString
    docs.map { case (id, text) => (id, text, "en", "srcX", text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def md5Byte0(sb: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(sb.getBytes("UTF-8"))
    md(0) & 0xff
  }

  private def md5Hex(sb: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(sb.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** (digest -> (n_docs, n_occ, min_doc, max_doc, n_tokens)), n_docs>=2. */
  private def reference(docs: Seq[(Long, String)])
      : Map[String, (Int, Int, Long, Long, Int)] = {
    val chunks = docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split(" ", -1).toSeq
      val n = toks.size
      val cuts = (1 until n).filter(i =>
        i >= 4 && md5Byte0(toks.slice(i - 4, i).mkString(" ")) % 8 == 0)
      val starts = 1 +: cuts.map(_ + 1)
      val ends = cuts :+ n
      starts.zip(ends).map { case (s, e) =>
        (id, md5Hex(toks.slice(s - 1, e).mkString(" ")), e - s + 1)
      }
    }
    chunks.groupBy(_._2).collect {
      case (digest, occs) if occs.map(_._1).distinct.size >= 2 =>
        digest -> (occs.map(_._1).distinct.size, occs.size,
          occs.map(_._1).min, occs.map(_._1).max, occs.map(_._3).min)
    }.toMap
  }

  private def run(docs: Seq[(Long, String)]): Map[String, (Int, Int, Long, Long, Int)] =
    SparkEntry.queries("d15_cdc_dup")(spark, corpusDir(docs))
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getInt(5)))).toMap

  test("seeded fuzz: 6 random corpora match the driver CDC reference exactly") {
    val rnd = new scala.util.Random(211)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    for (round <- 1 to 6) {
      val docs = (0L until (4 + rnd.nextInt(10)).toLong).map { id =>
        val n = 1 + rnd.nextInt(60)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      assert(run(docs) == reference(docs), s"round $round mismatch")
    }
  }

  test("planted: misaligned shared passage (d9's documented blind spot) is detected") {
    val rnd = new scala.util.Random(3)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "kilo", "lima",
      "mike", "nova", "oscar", "papa")
    val passage = Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = Seq(
      0L -> passage,
      // offset 3 tokens + different tail: no shared offset grid with doc 0
      1L -> ("zz yy xx " + passage + " qq rr"),
      2L -> Seq.fill(50)("unrelated" + rnd.nextInt(40)).mkString(" "))
    val got = run(docs)
    val crossPair = got.values.filter(v => v._3 == 0L && v._4 == 1L)
    assert(crossPair.nonEmpty,
      s"content-defined chunks must flag the misaligned passage: $got")
    assert(got.values.forall(v => v._4 <= 1L),
      s"the unrelated doc must never appear in a duplicate chunk: $got")
    assert(got == reference(docs))
  }
}
