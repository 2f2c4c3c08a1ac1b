package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The incremental refresh's exactness contract: any batching of a
  * corpus through successive [[CorpusRefresh.refresh]] calls must leave
  * [[CorpusRefresh.prepared]] equal, row for row, to
  * [[CorpusEtl.prepare]] run from scratch on the union — including the
  * cross-batch cases with no per-batch shortcut (a new edge merging two
  * old clusters; a smaller-id exact twin demoting an old keeper), and
  * the crash window (replay of a refresh that died before its commit
  * marker).
  */
class CorpusRefreshSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.select("doc_id", "lang", "n_tokens", "n_copies", "cluster_size",
        "n_emails", "n_phones", "n_ssns", "redacted")
      .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])

  test("two batches equal the from-scratch prepare, bit-for-bit") {
    val dir = Files.createTempDirectory("graft-refresh").toString
    val docs = Tables.documents(spark, sf)
    CorpusRefresh.refresh(spark, dir, docs.where(col("doc_id") % 2 === 1))
    CorpusRefresh.refresh(spark, dir, docs.where(col("doc_id") % 2 === 0))
    val expected = rows(CorpusEtl.prepare(docs))
    assert(expected.nonEmpty)
    assert(rows(CorpusRefresh.prepared(spark, dir)) == expected)
  }

  test("cross-batch exact twin demotes the old keeper; clusters merge across batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-refresh2").toString
    def d(id: Long, text: String) = (id, "en", text)
    // batch 1: doc 10 (keeper of its hash), near-dup partner 11, and an
    // unrelated 12; batch 2: doc 2 with IDENTICAL text to 10 (smaller id
    // → exact-keeper demotion 10→2, and 2 must inherit 10's near-dup
    // edge to 11), plus a bridge doc 13 near-dup of BOTH 11 and 12,
    // merging two previously-separate clusters
    val t10 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t11 = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val t12 = "one two three four five six seven eight nine ten"
    val t13 = "alpha beta gamma delta epsilon zeta eta theta nine ten one two three four five six"
    val b1 = Seq(d(10, t10), d(11, t11), d(12, t12)).toDF("doc_id", "lang", "text")
    val b2 = Seq(d(2, t10), d(13, t13)).toDF("doc_id", "lang", "text")
    CorpusRefresh.refresh(spark, dir, b1)
    CorpusRefresh.refresh(spark, dir, b2)
    val expected = rows(CorpusEtl.prepare(b1.unionByName(b2)))
    val got = rows(CorpusRefresh.prepared(spark, dir))
    assert(got == expected)
    // and the fixture actually exercised what it claims: doc 2 is a
    // canonical keeper, doc 10 is gone (demoted exact twin)
    val ids = got.map(_.head.asInstanceOf[Long]).toSet
    assert(ids.contains(2L) && !ids.contains(10L),
      s"demotion not exercised: canonical ids $ids")
    val copies = got.find(_.head == 2L).get(3)
    assert(copies == 2, s"doc 2 must represent both exact copies, got $copies")
  }

  test("replay of a refresh that died before its commit marker heals exactly") {
    val dir = Files.createTempDirectory("graft-refresh3").toString
    val docs = Tables.documents(spark, sf)
    val (b1, b2) = (docs.where(col("doc_id") % 2 === 1),
      docs.where(col("doc_id") % 2 === 0))
    CorpusRefresh.refresh(spark, dir, b1)
    CorpusRefresh.refresh(spark, dir, b2)
    // simulate the crash: batch 2's exact rows + index + pairs + scrub
    // all landed, but the writer died before creating _commit_ — readers
    // must see only batch 1...
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val markers = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("_commit_")).sorted
    fs.delete(new org.apache.hadoop.fs.Path(dir, markers.last), false)
    assert(rows(CorpusRefresh.prepared(spark, dir)) ==
      rows(CorpusEtl.prepare(b1)),
      "uncommitted refresh visible to readers")
    // ...and replaying the batch lands on the full-union state exactly
    CorpusRefresh.refresh(spark, dir, b2)
    assert(rows(CorpusRefresh.prepared(spark, dir)) ==
      rows(CorpusEtl.prepare(docs)))
  }
}
