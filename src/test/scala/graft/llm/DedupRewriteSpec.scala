package graft.llm

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** c9_dedup_rewrite — duplicate-span removal. A driver-side interpreter
  * replays the whole contract (d15's content-defined cuts, global
  * keeper = first (doc_id, idx) occurrence of a cross-doc digest,
  * in-order reassembly) and the query must agree exactly, including
  * clean-text md5s. The planted cases pin the semantics that matter:
  * a passage copied at a DIFFERENT offset is removed from the copier
  * but kept in the keeper, and an exact-duplicate document is erased
  * to the empty string (every chunk's keeper lives elsewhere).
  */
class DedupRewriteSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def corpusDir(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-rewrite").toString
    docs.map { case (id, text) => (id, text, "en", "srcX", text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def md5Byte0(sb: String): Int =
    java.security.MessageDigest.getInstance("MD5")
      .digest(sb.getBytes("UTF-8"))(0) & 0xff

  private def md5Hex(sb: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(sb.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** doc -> (n_chunks, n_dropped, clean_md5). */
  private def reference(docs: Seq[(Long, String)]): Map[Long, (Int, Int, String)] = {
    val chunks = docs.flatMap { case (id, text) =>
      val toks = text.toLowerCase.split(" ", -1).toSeq
      val n = toks.size
      val cuts = (1 until n).filter(i =>
        i >= 4 && md5Byte0(toks.slice(i - 4, i).mkString(" ")) % 8 == 0)
      val starts = 1 +: cuts.map(_ + 1)
      val ends = cuts :+ n
      starts.zip(ends).zipWithIndex.map { case ((s, e), idx) =>
        (id, idx, toks.slice(s - 1, e).mkString(" "))
      }
    }
    val byDigest = chunks.groupBy(c => md5Hex(c._3))
    val keepers: Map[String, (Long, Int)] = byDigest.collect {
      case (dg, occs) if occs.map(_._1).distinct.size >= 2 =>
        val kdoc = occs.map(_._1).min
        dg -> (kdoc, occs.filter(_._1 == kdoc).map(_._2).min)
    }.toMap
    docs.map { case (id, _) =>
      val mine = chunks.filter(_._1 == id).sortBy(_._2)
      val kept = mine.filter { case (d, i, t) =>
        keepers.get(md5Hex(t)).forall(_ == (d, i))
      }
      id -> (mine.size, mine.size - kept.size,
        md5Hex(kept.map(_._3).mkString(" ")))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, (Int, Int, String)] =
    SparkEntry.queries("c9_dedup_rewrite")(spark, corpusDir(docs))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap

  test("planted: misaligned copy is stripped from the copier, exact dup erased entirely") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "kilo", "lima",
      "mike", "nova", "oscar", "papa")
    val passage = Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = Seq(
      0L -> passage,
      1L -> ("zz yy xx " + passage + " qq rr"), // offset copy
      2L -> passage,                            // exact duplicate of doc 0
      3L -> Seq.fill(40)("unrelated" + rnd.nextInt(50)).mkString(" "))
    val expected = reference(docs)
    val got = run(docs)
    assert(got == expected)
    // doc 0 is the keeper: drops nothing
    assert(got(0L)._2 == 0)
    // the offset copy loses its interior passage chunks but not everything
    assert(got(1L)._2 > 0 && got(1L)._2 < got(1L)._1)
    // the exact duplicate is fully erased (md5 of the empty string)
    assert(got(2L)._2 == got(2L)._1 &&
      got(2L)._3 == "d41d8cd98f00b204e9800998ecf8427e")
    // the unrelated doc is untouched
    assert(got(3L)._2 == 0)
  }

  test("seeded fuzz: 5 random heavy-dup corpora match the reference exactly") {
    val rnd = new scala.util.Random(149)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    for (round <- 1 to 5) {
      val docs = (0L until (4 + rnd.nextInt(8)).toLong).map { id =>
        id -> Seq.fill(1 + rnd.nextInt(50))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      assert(run(docs) == reference(docs), s"round $round")
    }
  }
}
