package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** c7 overlapping-window chunking invariants on a corpus spanning every
  * edge: shorter than one window, exactly one window, one token past a
  * stride boundary, and long multi-window docs. */
class ChunkOverlapSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val L = 128
  private val S = 96

  test("windows cover every token, stride and size hold, text slices are exact") {
    val sizes = Seq(1, 5, L - 1, L, L + 1, S, S + 1, 2 * S, 400, 1000)
    val docs = sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, "en", "src", (0 until n).map(t => s"w$t").mkString(" "), n.toLong)
    }.toDF("doc_id", "lang", "source", "text", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-c7").toString
    docs.write.parquet(s"$dir/documents.parquet")

    val q = CorpusEtl.all.find(_.name == "c7_chunk_overlap").get
    val out = q.fn(spark, dir)
      .select("doc_id", "chunk_id", "tok_start", "tok_len", "chunk_text")
      .as[(Long, Long, Long, Long, String)].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)

    for ((docId, chunks0) <- out) {
      val n = sizes(docId.toInt)
      val chunks = chunks0.sortBy(_._2)
      val expected = if (n > L) 1 + (n - L + S - 1) / S else 1
      assert(chunks.length == expected, s"doc $docId: chunk count")
      for ((_, k, start, len, text) <- chunks) {
        assert(start == k * S, s"doc $docId chunk $k: stride")
        assert(len == math.min(L, n - start), s"doc $docId chunk $k: length")
        // the slice is the actual tokens, not an offset mix-up
        val toks = text.split(" ", -1)
        assert(toks.length == len, s"doc $docId chunk $k: text token count")
        assert(toks.head == s"w$start" && toks.last == s"w${start + len - 1}",
          s"doc $docId chunk $k: slice bounds")
      }
      // coverage: the union of [start, start+len) is exactly [0, n)
      val covered = chunks.flatMap { case (_, _, st, ln, _) => st until (st + ln) }.toSet
      assert(covered == (0L until n.toLong).toSet, s"doc $docId: token coverage")
    }
  }
}
