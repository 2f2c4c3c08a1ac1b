package graft.oracle

/** Outcome-space permutation generator — nPk orderings of entry indices
  * (crates/oracle/src/db/outcome_generator.rs:5-19). Driver-side: the
  * outcome space parameterizes the DLC announcement, it is not a
  * distributed computation (n ≤ ~25 entries, k ≤ 5 places after the
  * clamps at oracle.rs:194-204).
  */
object Outcomes {

  /** All ordered k-permutations of 0 until n, in lexicographic order. */
  def permutations(n: Int, k: Int): Iterator[Seq[Int]] = {
    def go(chosen: Vector[Int], remaining: Vector[Int], depth: Int): Iterator[Seq[Int]] =
      if (depth == 0) Iterator.single(chosen)
      else remaining.iterator.flatMap(i => go(chosen :+ i, remaining.filterNot(_ == i), depth - 1))
    go(Vector.empty, (0 until n).toVector, k)
  }

  /** nPk = n!/(n−k)! without materializing. */
  def count(n: Int, k: Int): Long =
    (n - k + 1 to n).foldLeft(1L)(_ * _)

  /** Distributed permutation generation for large outcome spaces — the
    * reference's generator is a single-threaded Rust loop whose own tests
    * mark n=200 "slow" and >500 players >60 s
    * (outcome_generator.rs:48-69); as a cross-product of index ranges
    * with distinctness predicates it parallelizes across the cluster and
    * never materializes on the driver. The cross join is intentional —
    * the SEMANTICS are the full product (filtered to permutations), not a
    * pair join. */
  def permutationsDF(spark: org.apache.spark.sql.SparkSession, n: Int, k: Int)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    require(n >= 1 && k >= 1 && k <= 5, "supported outcome space: n>=1, 1<=k<=5")
    val cols = (0 until k).map(i => s"p$i")
    val base = spark.range(n).toDF(cols.head)
    val product = cols.tail.foldLeft(base)((df, c) => df.crossJoin(spark.range(n).toDF(c)))
    val allDistinct = (for { i <- 0 until k; j <- i + 1 until k }
      yield col(cols(i)) =!= col(cols(j))).reduceOption(_ && _)
    allDistinct.fold(product)(product.where)
  }
}
