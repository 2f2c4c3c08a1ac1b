package graft

/** Diagnostic-only main: times selected queries repeatedly to separate
  * per-plan fixed cost (first run: analysis + codegen) from steady-state
  * execution, with clearCache on/off. Not part of the driver contract.
  *
  * Usage: runMain graft.BenchProbe <sfDir> <reps> <clearCache> [names...]
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val clear = args.length > 2 && args(2).toBoolean
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local("32", "graft-bench-probe")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    for (n <- names) {
      val times = (1 to reps).map { _ =>
        if (clear) spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $n%-24s " + times.map(t => f"$t%6.2f").mkString(" "))
    }
    spark.stop()
  }
}
