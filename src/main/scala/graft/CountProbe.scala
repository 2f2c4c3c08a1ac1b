package graft

/** Diagnostic-only main: row count + wall time for selected queries at a
  * given table dir — the quick "did the output size explode or the plan
  * degrade?" check behind ScaleProbe findings.
  *
  * Usage: runMain graft.CountProbe <dir> <names...>
  */
object CountProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("d4_minhash_pairs")
    val spark = Sessions.local("32", "graft-count-probe")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (n <- names) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, dir).count()
      println(f"[count] $n%-26s rows=$rows%-10d ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    spark.stop()
  }
}
