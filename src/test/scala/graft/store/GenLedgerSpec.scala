package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Direct contract tests for the shared generation-ledger machinery —
  * previously covered only transitively through the DedupIndex /
  * KnnGraphIndex suites. Every behavior here is load-bearing for a
  * crash contract in three services, so each gets its own pin: the
  * marker-file counter (including the pre-marker-era fallback), the
  * commit/retire marker set, the interrupted-swap guard, and the atomic
  * directory swap itself.
  */
class GenLedgerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def tmp() = Files.createTempDirectory("graft-genledger").toString
  private def fs(p: String) = GenLedger.fsOf(spark, p)
  private def path(p: String, n: String) = new org.apache.hadoop.fs.Path(p, n)

  test("nextGen: monotone from 1, one marker file at a time, stale retired") {
    val dir = tmp()
    assert(GenLedger.nextGen(spark, dir) == 1L)
    assert(GenLedger.nextGen(spark, dir) == 2L)
    assert(GenLedger.nextGen(spark, dir) == 3L)
    val markers = fs(dir).listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName)
      .filter(_.startsWith(GenLedger.GenPrefix))
    assert(markers.toSeq == Seq(GenLedger.GenPrefix + "3"),
      s"stale gen markers not retired: ${markers.toSeq}")
  }

  test("nextGen: hwmFallback bootstraps a pre-marker-era dir ABOVE its data") {
    val dir = tmp()
    // no _gen_ marker at all, but a table whose rows are stamped up to 7
    assert(GenLedger.nextGen(spark, dir, hwmFallback = 7L) == 8L)
    // once the marker exists the fallback is never consulted again
    assert(GenLedger.nextGen(spark, dir, hwmFallback = 99L) == 9L)
  }

  test("maxGenIn: absent dir and gen-less schema are generation 0; mixed schemas merge") {
    val dir = tmp()
    assert(GenLedger.maxGenIn(spark, s"$dir/nope") == 0L)
    // legacy file without the gen column
    spark.range(3).select(col("id").as("doc_id"))
      .write.parquet(s"$dir/t")
    assert(GenLedger.maxGenIn(spark, s"$dir/t") == 0L)
    // a stamped file lands next to it: the merge must see the column
    // (a non-merged read could resolve to the legacy file's schema and
    // silently bootstrap the counter below generations already used)
    spark.range(2).select(col("id").as("doc_id"), lit(5L).as("gen"))
      .write.mode("append").parquet(s"$dir/t")
    assert(GenLedger.maxGenIn(spark, s"$dir/t") == 5L)
  }

  test("commit markers: committedMarkers sees exactly the committed set; retire removes") {
    val dir = tmp()
    GenLedger.commit(spark, dir, "_c_", 1L)
    GenLedger.commit(spark, dir, "_c_", 3L)
    GenLedger.commit(spark, dir, "_x_", 2L) // different prefix: invisible
    assert(GenLedger.committedMarkers(spark, dir, "_c_") == Seq(1L, 3L))
    assert(GenLedger.markerNames(spark, dir, "_c_").sorted ==
      Seq("_c_1", "_c_3"))
    GenLedger.retireMarkers(spark, dir, "_c_", Seq(1L))
    assert(GenLedger.committedMarkers(spark, dir, "_c_") == Seq(3L))
  }

  test("guardCompaction refuses while an interrupted swap's .old dir exists") {
    val dir = tmp()
    GenLedger.guardCompaction(spark, dir, Seq("sigs", "bands")) // clean: fine
    fs(dir).mkdirs(path(dir, "sigs.old"))
    val e = intercept[RuntimeException](
      GenLedger.guardCompaction(spark, dir, Seq("sigs", "bands")))
    assert(e.getMessage.contains("sigs.old"))
    fs(dir).delete(path(dir, "sigs.old"), true)
    GenLedger.guardCompaction(spark, dir, Seq("sigs", "bands")) // recovered
  }

  test("swapIn: atomic content replacement, stale .compacting leftovers tolerated") {
    val dir = tmp()
    val t = s"$dir/t"
    spark.range(100).select(col("id")).repartition(10).write.parquet(t)
    assert(GenLedger.dataFileCount(spark, t) == 10)
    // a previous aborted WRITE left a half-written .compacting dir
    spark.range(1).write.parquet(t + ".compacting")
    val n = GenLedger.swapIn(spark, t,
      spark.range(50).select(col("id")), numFiles = 2)
    assert(n == 2 && GenLedger.dataFileCount(spark, t) == 2)
    assert(spark.read.parquet(t).count() == 50, "swapped content must win")
    assert(!fs(dir).exists(path(dir, "t.old")), "old dir must be gone")
    assert(!fs(dir).exists(path(dir, "t.compacting")))
  }

  test("hasData: false for absent, marker-only, and _SUCCESS-only dirs") {
    val dir = tmp()
    assert(!GenLedger.hasData(spark, s"$dir/t"))
    fs(dir).mkdirs(path(dir, "t"))
    fs(dir).create(path(s"$dir/t", "_SUCCESS"), true).close()
    assert(!GenLedger.hasData(spark, s"$dir/t"))
    spark.range(1).write.mode("append").parquet(s"$dir/t")
    assert(GenLedger.hasData(spark, s"$dir/t"))
  }
}
