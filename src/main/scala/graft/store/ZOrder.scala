package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file clustering — the layout lever for data
  * skipping when scans filter on MORE than one column (the public
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`).
  *
  * A sort by (a, b) gives perfect skipping on `a` and none on `b`;
  * interleaving the bits of both into one sort key gives every filtered
  * column narrow per-file min/max ranges, so parquet footer stats let
  * the scan skip most files/row groups for a selective predicate on ANY
  * of the z columns. The whole thing is native column arithmetic
  * (shift/and/or inside whole-stage codegen) + one range repartition —
  * no UDF, no custom writer.
  *
  * Scale notes: the min/max normalization pass is a single tiny
  * aggregate (the same planning-time stats ANALYZE keeps); the write is
  * `repartitionByRange` on the z-value — one shuffle, and range
  * boundaries come from Spark's reservoir sampling, so skewed z-values
  * still split into balanced files.
  */
object ZOrder {

  /** Bit-interleave already-normalized non-negative columns (each in
    * `[0, 2^bits)`): bit `b` of column `i` lands at position
    * `b * n + i`. Pure shift/and/or expression tree — codegen-friendly,
    * deterministic. */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"need cols.size * bits <= 63, got ${cols.size} * $bits")
    (0 until bits).foldLeft(lit(0L)) { (acc, b) =>
      cols.zipWithIndex.foldLeft(acc) { case (a, (c, i)) =>
        a.bitwiseOR(shiftleft(
          shiftright(c, b).bitwiseAND(lit(1L)), b * cols.size + i))
      }
    }
  }

  /** Z-value of numeric columns, min/max-normalized to `bits` bits each.
    * `mins(i)/maxs(i)` bound column `i` (constant-width buckets; a
    * degenerate span maps to 0). */
  def zValue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
      bits: Int = 16): Column = {
    val top = (1L << bits) - 1
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      val span = maxs(i) - mins(i)
      if (span <= 0) lit(0L)
      else least(lit(top), greatest(lit(0L),
        floor((c.cast("double") - lit(mins(i))) * lit(top / span)).cast("long")))
    }
    interleaveBits(scaled, bits)
  }

  /** Rewrite `df` into `numFiles` z-ordered parquet files at `path`.
    * One stats aggregate (driver-sized: 2 doubles per z column) + one
    * range shuffle on the z-value + a within-partition sort. */
  def writeZOrdered(df: DataFrame, zCols: Seq[String], path: String,
      numFiles: Int, bits: Int = 16): Unit = {
    require(zCols.nonEmpty, "need at least one z column")
    val aggs = zCols.flatMap(c => Seq(min(col(c)).cast("double").as(s"min_$c"),
      max(col(c)).cast("double").as(s"max_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    // empty input / all-null column: min/max are null — degrade to a
    // constant z (layout is irrelevant when there is nothing to order)
    def statAt(i: Int): Double = if (stats.isNullAt(i)) 0.0 else stats.getDouble(i)
    val mins = zCols.indices.map(i => statAt(2 * i))
    val maxs = zCols.indices.map(i => statAt(2 * i + 1))
    val z = zValue(zCols.map(col), mins, maxs, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
