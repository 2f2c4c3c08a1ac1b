package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SCALING.md "Knobs that matter"): AQE's
  * skew-join splitting covers sort-merge joins at runtime, but two shapes
  * still need explicit salting at 100 TB — a shuffled join whose build
  * side is replicable, and a groupBy whose hot key floods one task. Both
  * helpers are pure plan rewrites: same results, shuffle key widened from
  * `keys` to `(keys, salt)` so a hot key spreads over `factor` tasks.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Deterministic per-row salt in [0, factor): xxhash64 over the whole
    * row (struct of all columns). Duplicate rows share a salt — harmless,
    * uniformity only needs distinct rows to spread. No rand(): identical
    * inputs must replay identically under task retry. */
  private def rowSalt(df: DataFrame, factor: Int): Column =
    pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(factor.toLong))

  /** Inner equi-join where `skewed`'s key distribution has hot keys and
    * `other` is small enough to replicate `factor`× (but too big or too
    * dynamic to broadcast): salt the skewed side, explode the other side
    * across all salt values, join on (keys, salt). Result is identical to
    * `skewed.join(other, keys)` — every skewed row meets every matching
    * other row exactly once, under exactly one salt value. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val s = skewed.withColumn(SaltCol, rowSalt(skewed, factor))
    val o = other.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    s.join(o, keys :+ SaltCol).drop(SaltCol)
  }

  /** Two-phase aggregation for a skewed groupBy: aggregate on
    * (keys, salt) first — the hot key's rows combine in `factor` parallel
    * tasks — then merge the partials per key. The caller supplies each
    * aggregate twice: its partial form and the merge of the partial
    * column, e.g. `sum(x) as p` then `sum(p)`; `count(*) as p` then
    * `sum(p)`; `max(x) as p` then `max(p)`.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], factor: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val salted = df.withColumn(SaltCol, rowSalt(df, factor))
    val phase1 = salted
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
