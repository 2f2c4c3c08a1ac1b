package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The data-skipping claim behind q42/[[ZOrder]], measured on real file
  * layouts: clustering files by the rank-quantile Morton key keeps BOTH
  * key columns locally narrow, so footer min/max pruning on EITHER
  * column's predicate eliminates most files — single-column clustering
  * only prunes its own key, and RAW-bit interleave degenerates under
  * domain skew (l_suppkey spans 4 bits to l_partkey's 8, so the wide
  * key's high bits dominate the raw sort order).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val files = 16

  /** Per-"file" (range partition of `layoutCol`) [min,max] spans of the
    * RAW keys — what a parquet footer would carry. */
  private def spans(layoutCol: String) = {
    val li = ZOrder.zkey(
      graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk")),
      "pk", "sk", bits = 4)
    li.repartitionByRange(files, col(layoutCol))
      .select(col("pk"), col("sk"), spark_partition_id().as("file"))
      .groupBy("file")
      .agg(min("pk").as("pk_lo"), max("pk").as("pk_hi"),
        min("sk").as("sk_lo"), max("sk").as("sk_hi"))
      .collect()
      .map(r => (r.getAs[Long]("pk_lo"), r.getAs[Long]("pk_hi"),
        r.getAs[Long]("sk_lo"), r.getAs[Long]("sk_hi")))
  }

  /** How many files a point predicate on each key must scan. */
  private def filesScanned(ss: Array[(Long, Long, Long, Long)],
      pk: Long, sk: Long): (Int, Int) =
    (ss.count { case (lo, hi, _, _) => lo <= pk && pk <= hi },
      ss.count { case (_, _, lo, hi) => lo <= sk && sk <= hi })

  test("rank-quantile z-order prunes BOTH keys; single-column sort only one") {
    val zs = spans("zkey")
    val ps = spans("pk") // single-column clustering baseline

    val (pkProbe, skProbe) = (101L, 5L) // domain medians
    val (zPk, zSk) = filesScanned(zs, pkProbe, skProbe)
    val (pPk, pSk) = filesScanned(ps, pkProbe, skProbe)

    // Single-column layout is perfect on its own key...
    assert(pPk <= 2, s"pk-sorted layout should nearly-prune pk probes, scanned $pPk/$files")
    // ...but blind on the other: an sk predicate scans ~every file.
    assert(pSk >= files - 2, s"pk-sorted layout should NOT prune sk, scanned $pSk/$files")
    // Z-order prunes meaningfully on BOTH keys simultaneously.
    assert(zPk <= files / 2, s"z-order should prune pk probes, scanned $zPk/$files")
    assert(zSk <= files / 2, s"z-order should prune sk probes, scanned $zSk/$files")
  }
}
