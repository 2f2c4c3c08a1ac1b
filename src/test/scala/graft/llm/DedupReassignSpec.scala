package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The keeper-handover primitive of the incremental dedup index
  * ([[DedupIndex.reassign]]): a live id's memberships transfer to a new
  * id WITHOUT text (valid only under the byte-identical-content
  * contract), the old id is tombstoned in the same generation, replays
  * and torn-marker crashes heal idempotently, and the enforced
  * preconditions (unique new ids, old/new disjointness) fail fast with
  * nothing written. Also pins the legacy-schema upgrade: a pre-`gen`-
  * column index dir removes/reassigns correctly with NO manual compact
  * step (legacy rows read as generation 0, strictly below every
  * tombstone the marker counter can hand out).
  */
class DedupReassignSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import scala.jdk.CollectionConverters._

  private def docsDf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }
  private def mapDf(rows: (Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "new_id")
  }
  private def matchSet(dir: String, q: DataFrame): Set[(Long, Long)] =
    DedupIndex.matches(spark, dir, q).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val tB = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
  private val tC = "one two three four five six seven eight nine ten"

  /** Handover must be indistinguishable from having indexed the new id
    * from its own (identical) text: membership, candidates, verify. */
  test("reassign transfers memberships exactly; old id dies; idempotent replay") {
    val dir = Files.createTempDirectory("graft-reassign").toString
    DedupIndex.checkAndAdd(spark, dir, docsDf(10L -> tA, 11L -> tB, 12L -> tC))
    assert(DedupIndex.size(spark, dir) == 3)

    DedupIndex.reassign(spark, dir, mapDf(10L -> 2L))
    assert(DedupIndex.size(spark, dir) == 3, "handover must not change size")
    // query with 11's near-dup text: the partner is now 2, never 10
    val q = docsDf(99L -> tB)
    assert(matchSet(dir, q) == Set((2L, 99L), (11L, 99L)),
      s"got ${matchSet(dir, q)}")
    // replay with the same mapping: heals to the identical state
    DedupIndex.reassign(spark, dir, mapDf(10L -> 2L))
    assert(DedupIndex.size(spark, dir) == 3)
    assert(matchSet(dir, q) == Set((2L, 99L), (11L, 99L)))
    // and the transferred membership verifies like a from-text index:
    // querying with 2's own (identical) text finds its partner 11
    val m = DedupIndex.matches(spark, dir, docsDf(2L -> tA))
    assert(m.where(col("doc_a") === 2L && col("doc_b") === 11L).count() == 1,
      "handed-over id must verify against partners from stored sigs")
  }

  test("crash windows heal: torn tombstone marker, sigs-landed-first replay") {
    val dir = Files.createTempDirectory("graft-reassign2").toString
    DedupIndex.checkAndAdd(spark, dir, docsDf(10L -> tA, 11L -> tB))
    DedupIndex.reassign(spark, dir, mapDf(10L -> 2L))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the torn tombstone: the _tcommit_ marker never landed —
    // the old id is live again (copied sigs also live: size grows), and
    // ONLY a replay may be observed mid-heal
    val tmarks = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("_tcommit_")).sorted
    fs.delete(new org.apache.hadoop.fs.Path(dir, tmarks.last), false)
    assert(DedupIndex.size(spark, dir) == 3,
      "torn tombstone must leave old id live (copied row also live)")
    // replay the same mapping: old id re-tombstoned, copy skipped
    DedupIndex.reassign(spark, dir, mapDf(10L -> 2L))
    assert(DedupIndex.size(spark, dir) == 2)
    assert(matchSet(dir, docsDf(99L -> tB)) == Set((2L, 99L), (11L, 99L)))
    // compaction after the dust settles reclaims every dead row
    DedupIndex.compact(spark, dir, numFiles = 1)
    assert(DedupIndex.size(spark, dir) == 2)
    assert(matchSet(dir, docsDf(99L -> tB)) == Set((2L, 99L), (11L, 99L)))
  }

  test("preconditions fail fast with nothing written") {
    val dir = Files.createTempDirectory("graft-reassign3").toString
    DedupIndex.checkAndAdd(spark, dir, docsDf(10L -> tA, 11L -> tB, 12L -> tC))
    // two live old ids handing over to ONE new id
    val e1 = intercept[RuntimeException](
      DedupIndex.reassign(spark, dir, mapDf(10L -> 7L, 11L -> 7L)))
    assert(e1.getMessage.contains("not unique"))
    // identity / swap / chain shapes: old and new sets overlap
    val e2 = intercept[RuntimeException](
      DedupIndex.reassign(spark, dir, mapDf(10L -> 11L, 11L -> 20L)))
    assert(e2.getMessage.contains("overlap"))
    val e3 = intercept[RuntimeException](
      DedupIndex.reassign(spark, dir, mapDf(10L -> 10L)))
    assert(e3.getMessage.contains("overlap"))
    // nothing was written by any failed call
    assert(DedupIndex.size(spark, dir) == 3)
    assert(matchSet(dir, docsDf(99L -> tB)) == Set((10L, 99L), (11L, 99L)))
  }

  test("legacy pre-gen-column dir: remove works with NO manual compact (auto-upgrade)") {
    val dir = Files.createTempDirectory("graft-legacy").toString
    DedupIndex.checkAndAdd(spark, dir, docsDf(10L -> tA, 11L -> tB, 12L -> tC))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // rewrite sigs/ WITHOUT the gen column and drop the _gen_ marker —
    // exactly what an index written by the pre-tombstone-era code looks
    // like on disk
    val legacy = spark.read.parquet(s"$dir/sigs").drop("gen")
      .collect()
    val schema = spark.read.parquet(s"$dir/sigs").drop("gen").schema
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/sigs"), true)
    spark.createDataFrame(legacy.toSeq.asJava, schema)
      .write.parquet(s"$dir/sigs")
    fs.listStatus(new org.apache.hadoop.fs.Path(dir)).map(_.getPath.getName)
      .filter(_.startsWith("_gen_")).foreach(m =>
        fs.delete(new org.apache.hadoop.fs.Path(dir, m), false))

    // first touch is a REMOVE — the old rows must read as generation 0,
    // strictly below the tombstone's, with no compact run first
    DedupIndex.remove(spark, dir, docsDf(10L -> tA).select("doc_id"))
    assert(DedupIndex.size(spark, dir) == 2)
    assert(matchSet(dir, docsDf(99L -> tB)) == Set((11L, 99L)))
    // re-add after removal on the upgraded dir: fresh membership
    DedupIndex.checkAndAdd(spark, dir, docsDf(10L -> tA))
    assert(DedupIndex.size(spark, dir) == 3)
    assert(matchSet(dir, docsDf(99L -> tB)) == Set((10L, 99L), (11L, 99L)))
    // compact now forces a real rewrite (legacy files present) and
    // re-stamps everything at one generation — and answers don't move
    val folded = DedupIndex.compact(spark, dir, numFiles = 1)
    assert(folded("sigs")._2 == 1, s"legacy files must force a rewrite: $folded")
    assert(spark.read.parquet(s"$dir/sigs").where(col("gen").isNull).isEmpty)
    assert(matchSet(dir, docsDf(99L -> tB)) == Set((10L, 99L), (11L, 99L)))
  }
}
