package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Property contract for paragraph-level dedup (exactness is d20's
  * oracle gate): first-occurrence semantics across documents AND within
  * one document, rewrite order, empty-document handling — on a
  * hand-built corpus where every keep/drop decision is known. Plus the
  * c14 funnel's structural invariants (disjoint stages summing to the
  * corpus, rule-order attribution) at sf0.001. */
class ParaOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def paras(rows: (Long, Int, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "idx", "para")
  }

  test("paragraph dedup: first (doc_id, idx) occurrence wins, everywhere else drops") {
    import spark.implicits._
    val out = ParaOps.dedupeParagraphs(paras(
      (1L, 0, "alpha"), (1L, 1, "header"), (1L, 2, "beta"),
      (2L, 0, "header"), (2L, 1, "gamma"),            // cross-doc dup drops
      (3L, 0, "delta"), (3L, 1, "delta"), (3L, 2, "header"), // within-doc dup + cross
      (4L, 0, "header")))                              // all paras duplicate
      .select($"doc_id", $"n_paras", $"n_kept", $"n_dropped", $"rebuilt_md5")
      .as[(Long, Int, Int, Int, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 3 && out(1L)._3 == 3 && out(1L)._4 == 0)
    assert(out(2L)._3 == 1 && out(2L)._4 == 1) // header dropped, gamma kept
    assert(out(3L)._3 == 1 && out(3L)._4 == 2) // second delta AND header drop
    assert(out(4L)._3 == 0 && out(4L)._4 == 1) // fully-duplicate doc stays as a row
    // rebuild is the surviving paragraphs joined in ORIGINAL order
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L)._5 == m("alpha\nheader\nbeta"))
    assert(out(2L)._5 == m("gamma"))
    assert(out(3L)._5 == m("delta"))
    assert(out(4L)._5 == m(""))
  }

  test("paragraph dedup: kept paragraphs across the corpus = distinct paragraph set") {
    import spark.implicits._
    val p = paras((1L, 0, "x"), (1L, 1, "y"), (2L, 0, "x"), (2L, 1, "z"),
      (3L, 0, "y"), (3L, 1, "w"))
    val out = ParaOps.dedupeParagraphs(p)
    val totKept = out.agg(sum($"n_kept")).as[Long].head()
    val distinctParas = p.select($"para").distinct().count()
    assert(totKept == distinctParas)
  }

  test("c14 funnel: stages are disjoint and sum to the corpus; verdicts ordered") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("c14_removal_funnel")(spark, sf)
    val rows = out.collect()
    val total = rows.map(_.getAs[Int]("n_docs").toLong).sum
    val corpus = graft.Tables.documents(spark, sf).count()
    assert(total == corpus, s"funnel rows must sum to the corpus: $total vs $corpus")
    val verdicts = rows.map(_.getAs[String]("verdict")).toSet
    assert(verdicts.subsetOf(Set("1_too_short", "2_pii", "3_repetitive",
      "4_low_quality", "5_kept")))
  }

  test("t27 langVote: token-weighted winner, full tie chain deterministic") {
    import spark.implicits._
    val scored = Seq(
      // doc 1: 'a' wins on tokens (10 vs 6) despite fewer paragraphs
      (1L, 10, "a"), (1L, 3, "b"), (1L, 3, "b"),
      // doc 2: token tie (5 vs 5) → paragraph count elects 'b'
      (2L, 5, "a"), (2L, 2, "b"), (2L, 3, "b"),
      // doc 3: token AND paragraph tie → lexicographic 'a'
      (3L, 4, "b"), (3L, 4, "a"),
      // doc 4: monolingual → frac exactly 1.0
      (4L, 7, "c"), (4L, 1, "c"))
      .toDF("doc_id", "n_tok", "guess")
    val out = ParaOps.langVote(scored)
      .select($"doc_id", $"major_lang", $"n_paras", $"n_major_paras",
        $"n_major_toks", $"frac_major_toks")
      .as[(Long, String, Int, Int, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 == "a" && out(1L)._5 == 10L)
    assert(out(2L)._2 == "b" && out(2L)._4 == 2)
    assert(out(3L)._2 == "a")
    assert(out(4L)._2 == "c" && out(4L)._6 == 1.0)
    assert(out(1L)._3 == 3 && out(1L)._6 == 10.0 / 16.0)
    assert(out.size == 4) // one winner row per document, never more
  }

  test("d21 dupWeightRollup: ppm weights are exact integer accounting") {
    import spark.implicits._
    // source s1: a triple (m=3, w=333333 ppm) + a unique doc
    // source s2: a cross-source pair member (m=2 with s1? no — hashes
    //   are corpus-wide, so the pair spans sources deliberately)
    val docs = Seq(
      ("s1", "h3", 10), ("s1", "h3", 10), ("s1", "h3", 10),
      ("s1", "hu", 7),
      ("s1", "hp", 4), ("s2", "hp", 4),
      ("s2", "hv", 9))
      .toDF("source", "h", "n_tok")
    val out = ParaOps.dupWeightRollup(docs)
      .select($"source", $"n_docs", $"n_dup_docs", $"sum_tokens", $"eff_tokens_ppm")
      .as[(String, Int, Int, Long, Long)].collect().map(r => r._1 -> r).toMap
    // s1: 3×10·(1000000 div 3) + 7·1000000 + 4·(1000000 div 2)
    assert(out("s1")._2 == 5 && out("s1")._3 == 4)
    assert(out("s1")._5 == 3L * 10 * 333333 + 7L * 1000000 + 4L * 500000)
    // s2: the other pair member + a unique doc
    assert(out("s2")._3 == 1)
    assert(out("s2")._5 == 4L * 500000 + 9L * 1000000)
    // no duplicates anywhere ⇒ eff mass equals raw mass exactly
    val solo = ParaOps.dupWeightRollup(
      Seq(("s", "x", 3), ("s", "y", 5)).toDF("source", "h", "n_tok"))
      .select($"sum_tokens", $"eff_tokens_ppm").as[(Long, Long)].head()
    assert(solo._2 == solo._1 * 1000000L)
  }

  test("p5 token shards: piece totals conserve (sum over sequences = corpus encode length)") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("p5_token_shards")(spark, sf)
      .agg(sum(col("n_pieces")), max(col("n_pieces"))).collect()(0)
    val totalPieces = out.getLong(0)
    val maxSeq = out.getInt(1)
    // every sequence is ≤ L, and the corpus piece count matches t17's
    // per-doc encode totals — packing neither drops nor double-counts.
    assert(maxSeq <= 256)
    val t17Total = SparkEntry.queries("t17_bpe_encode")(spark, sf)
      .agg(sum(col("n_pieces"))).collect()(0).getLong(0)
    assert(totalPieces == t17Total,
      s"packed pieces $totalPieces must equal encoded pieces $t17Total")
  }
}
