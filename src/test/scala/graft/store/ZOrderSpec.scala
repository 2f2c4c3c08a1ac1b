package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Z-order layout: bit-interleave correctness against a plain Scala
  * reference, and the actual skipping benefit — per-file min/max ranges
  * under a z-ordered layout must exclude most files for a selective
  * filter on EITHER z column, where a single-column sort only helps its
  * own column.
  */
class ZOrderSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("interleaveBits matches the Morton reference on random pairs") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.interleaveBits(Seq(col("a"), col("b")), 16).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1), 16),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-ordered layout skips files on both columns; rows are unchanged") {
    // a 64x64 grid of (x, y) — every (x row-block, y) combination present,
    // so a linear sort by x leaves y's per-file range full-width
    val n = 64
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
    val df = grid.toDF("x", "y")
    val base = Files.createTempDirectory("graft-zorder").toString

    ZOrder.writeZOrdered(df, Seq("x", "y"), s"$base/zordered", numFiles = 16, bits = 6)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(s"$base/xsorted")

    // identical content
    val back = spark.read.parquet(s"$base/zordered")
    assert(back.count() == df.count())
    assert(back.select("x", "y").as[(Long, Long)].collect().toSet == grid.toSet)

    /** Fraction of files whose [min, max] range of `c` covers `v` — what
      * parquet footer stats let a scan skip without reading data. */
    def coverage(dir: String, c: String, v: Long): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.toString)
      val covering = files.count { f =>
        val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).collect()(0)
        r.getLong(0) <= v && v <= r.getLong(1)
      }
      covering.toDouble / files.length
    }

    // x-sorted: perfect on x, useless on y (every file spans all of y)
    assert(coverage(s"$base/xsorted", "x", 17) <= 0.25)
    assert(coverage(s"$base/xsorted", "y", 17) == 1.0)
    // z-ordered: BOTH columns' ranges are narrow per file
    assert(coverage(s"$base/zordered", "x", 17) <= 0.5)
    assert(coverage(s"$base/zordered", "y", 17) <= 0.5)
  }
}
