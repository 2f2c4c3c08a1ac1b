package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys for multi-column min/max data skipping —
  * the 2-key generalization of the reference's date-partition pruning
  * (`crates/oracle/src/file_access.rs:119-145` prunes on the single
  * directory date; clustering by a Morton key lets footer min/max prune
  * on EITHER of two predicate columns).
  *
  * Two layers:
  *  - [[interleaveExpr]] — the raw bit interleave (q42's oracle-gated
  *    kernel): 2·bits shift/mask terms, a pure zero-shuffle map.
  *  - [[zkey]] — the PRODUCTION layout key: each column is first mapped
  *    to its equi-depth 2^bits rank bucket (boundaries from a one-pass
  *    quantile sketch, driver-sized — the same sample-then-map shape as
  *    Spark's RangePartitioner), THEN interleaved. Raw-bit interleave
  *    degenerates when one key's domain is narrower than the other's
  *    (the wide key's high bits dominate the sort and the narrow key
  *    never prunes — measured in ZOrderSpec); rank-bucketing spends the
  *    full interleave budget on both keys regardless of domain skew,
  *    which is why Delta/Iceberg OPTIMIZE ZORDER rank-maps too.
  */
object ZOrder {

  /** Morton interleave of two `bits`-bit non-negative int columns
    * (values in [0, 2^bits)); disjoint target bits, so `+` composes. */
  def interleaveExpr(aCol: String, bCol: String, bits: Int): Column =
    expr((0 until bits).map(i =>
      s"((($aCol >> $i) & 1) << ${2 * i}) + ((($bCol >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + "))

  /** Equi-depth bucket id (0 .. 2^bits−1) of `c` given sorted boundary
    * values: the count of boundaries ≤ v — monotone in v, so per-file
    * min/max of the RAW column still bound the bucket range (footer
    * stats keep working without storing the bucket). Zero-shuffle: the
    * boundaries ride the plan as an array literal. */
  private def bucket(c: String, bounds: Array[Double]): Column =
    size(filter(array(bounds.map(lit(_)): _*), x => x <= col(c).cast("double")))

  /** Append a `zkey` rank-quantile Morton column over two numeric
    * columns. `relativeError` feeds the quantile sketch; boundaries are
    * 2·(2^bits−1) doubles on the driver — bounded by construction. */
  def zkey(df: DataFrame, a: String, b: String, bits: Int = 8,
      relativeError: Double = 0.01): DataFrame = {
    val k = 1 << bits
    val probs = (1 until k).map(_.toDouble / k).toArray
    val Seq(qa, qb) = Seq(a, b).map(c =>
      df.stat.approxQuantile(c, probs, relativeError))
    df.withColumn("__za", bucket(a, qa))
      .withColumn("__zb", bucket(b, qb))
      .withColumn("zkey", interleaveExpr("__za", "__zb", bits))
      .drop("__za", "__zb")
  }
}
