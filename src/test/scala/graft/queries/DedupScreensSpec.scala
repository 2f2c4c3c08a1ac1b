package graft.queries

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Planted-case semantics for the two screening operators added on top
  * of the doc-level dedup family: d8 (benchmark decontamination) and d9
  * (substring-level duplication). The oracle gates prove cross-engine
  * agreement on the synthetic corpus; these tests pin the CONTRACT on
  * hand-planted cases — including d9's documented recall boundary
  * (detection requires the shared passage's occurrences to agree on
  * start offset mod stride).
  */
class DedupScreensSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Write a tiny documents.parquet the SparkEntry queries can read. */
  private def corpusDir(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-screens").toString
    docs.map { case (id, text) => (id, text, "en", "srcX", text.length) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d8 flags a doc sharing >=2 shingles with a benchmark doc, ignores 1-shingle overlap") {
    // doc 0 (0 % 41 == 0) is the benchmark; doc 1 copies 4 consecutive
    // tokens (= 2 shared 3-gram shingles); doc 2 copies only 3 tokens
    // (= 1 shared shingle); doc 3 is disjoint.
    val bench = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      0L -> bench,
      1L -> "alpha beta gamma delta unrelated filler words here",
      2L -> "gamma delta epsilon totally different tail tokens",
      3L -> "completely disjoint vocabulary in this document")
    val out = SparkEntry.queries("d8_decontaminate")(spark, corpusDir(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(out == Set((1L, 0L, 2)), s"got $out")
  }

  test("d9 catches aligned duplicated passages and exact copies; misaligned passages are out of contract") {
    val passage = "0123456789" * 8 // 80 chars, grid-aligned when planted at offset 0/20/...
    val docs = Seq(
      10L -> passage,                      // exact copy pair: shares all windows
      11L -> passage,
      12L -> ("x" * 20 + passage),         // same passage at offset 20 — aligned
      13L -> ("y" * 7 + passage + "zzz"),  // offset 7 — misaligned: undetectable
      14L -> ("unique text long enough to produce several windows " * 3))
    val rows = SparkEntry.queries("d9_substring_dup")(spark, corpusDir(docs))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(3), r.getLong(4)))
    // every reported window spans only the docs holding the aligned passage
    assert(rows.nonEmpty)
    val docsSeen = rows.map(t => (t._3, t._4))
    assert(docsSeen.forall { case (lo, hi) => lo >= 10L && hi <= 12L },
      s"misaligned/unique docs leaked into duplicate windows: $rows")
    // the exact-copy pair must share windows with the aligned copy too:
    // some window seen in >= 3 docs (10, 11, 12)
    assert(rows.exists(_._2 >= 3), s"aligned passage not caught: $rows")
    // doc 13's misaligned copy shares no window (recall contract): no
    // reported window includes it — implied by the bounds check above.
  }
}
