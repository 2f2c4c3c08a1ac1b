package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Deletion/tombstone contract of the incremental dedup index: removed
  * docs stop matching (membership, candidates, verification) without a
  * rebuild, a re-add after a removal is a fresh membership that behaves
  * exactly like never-removed (pairs re-emitted, lookups identical),
  * a torn tombstone append is invisible, and compaction physically
  * reclaims dead rows.
  */
class DedupTombstoneSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  private def pairsOf(docs: DataFrame): Set[(Long, Long, Int, Double)] =
    graft.queries.TextOps.jaccardPairsOf(docs)
      .select("doc_a", "doc_b", "n_common", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  private def matchSet(dir: String, q: DataFrame): Set[(Long, Long, Int, Double)] =
    DedupIndex.matches(spark, dir, q).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  test("remove stops matching; lookups equal the batch pipeline on survivors") {
    val dir = Files.createTempDirectory("graft-dedup-tomb").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    DedupIndex.checkAndAdd(spark, dir, docs.where(col("doc_id") % 2 === 0))
    DedupIndex.checkAndAdd(spark, dir, docs.where(col("doc_id") % 2 =!= 0))
    val all = docs.count()
    assert(DedupIndex.size(spark, dir) == all)

    val victims = docs.where(col("doc_id") % 7 === 3)
    val survivors = docs.where(col("doc_id") % 7 =!= 3)
    DedupIndex.remove(spark, dir, victims.select("doc_id"))
    assert(DedupIndex.size(spark, dir) == all - victims.count())
    // the live index must answer exactly like the batch pipeline run on
    // the surviving corpus — victims gone as members AND candidates
    assert(matchSet(dir, survivors) == pairsOf(survivors))
    // removing already-removed ids is a no-op
    DedupIndex.remove(spark, dir, victims.select("doc_id"))
    assert(DedupIndex.size(spark, dir) == all - victims.count())
  }

  test("add -> remove -> add-again behaves exactly like never-removed") {
    val dir = Files.createTempDirectory("graft-dedup-tomb2").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    DedupIndex.checkAndAdd(spark, dir, docs)
    val expected = pairsOf(docs)

    val back = docs.where(col("doc_id") % 9 === 4)
    DedupIndex.remove(spark, dir, back.select("doc_id"))
    // the re-add is a FRESH membership: it must re-emit exactly the
    // pairs its docs participate in (the at-least-once contract a pair
    // consumer relies on after a takedown reversal)
    val reEmitted = DedupIndex.checkAndAdd(spark, dir, back).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val backIds = back.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(reEmitted ==
      expected.filter(p => backIds(p._1) || backIds(p._2)),
      "re-added docs must re-complete exactly their pair set")
    assert(DedupIndex.size(spark, dir) == docs.count())
    assert(matchSet(dir, docs) == expected)
  }

  test("torn tombstone append (no _tcommit_) is invisible to readers") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dedup-tomb3").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .where(col("doc_id") < 200)
    DedupIndex.checkAndAdd(spark, dir, docs)
    val before = matchSet(dir, docs)
    val n = DedupIndex.size(spark, dir)
    Seq(0L, 1L, 2L).toDF("doc_id").select(lit(99L).as("gen"), col("doc_id"))
      .write.mode("append").parquet(s"$dir/tombs")
    assert(DedupIndex.size(spark, dir) == n, "uncommitted tombstones applied")
    assert(matchSet(dir, docs) == before)
  }

  test("compact reclaims tombstoned rows and stale postings") {
    val dir = Files.createTempDirectory("graft-dedup-tomb4").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    DedupIndex.checkAndAdd(spark, dir, docs.where(col("doc_id") % 2 === 0))
    DedupIndex.checkAndAdd(spark, dir, docs.where(col("doc_id") % 2 =!= 0))
    val victims = docs.where(col("doc_id") % 7 === 3)
    val survivors = docs.where(col("doc_id") % 7 =!= 3)
    DedupIndex.remove(spark, dir, victims.select("doc_id"))
    val expected = pairsOf(survivors)
    assert(matchSet(dir, survivors) == expected)

    DedupIndex.compact(spark, dir, numFiles = 2)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/tombs")))
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .exists(_.getPath.getName.startsWith("_tcommit_")))
    // dead rows physically gone, answers unchanged
    assert(spark.read.parquet(s"$dir/sigs").count() == survivors.count())
    assert(matchSet(dir, survivors) == expected)
    // the reclaimed id is re-addable after the fold
    DedupIndex.checkAndAdd(spark, dir, victims)
    assert(DedupIndex.size(spark, dir) == docs.count())
    assert(matchSet(dir, docs) == pairsOf(docs))
  }
}
