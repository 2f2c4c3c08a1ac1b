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
}
