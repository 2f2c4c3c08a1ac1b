package graft

/** Diagnostic-only main: measures a fixed sub-second query set under the
  * Bench protocol with optional Spark conf overrides injected as system
  * properties BEFORE the session builds (so static confs apply too) —
  * the apples-to-apples harness for the fixed-floor experiments
  * (VERDICT r6 task 8). Not part of the driver contract.
  *
  * Usage: runMain graft.FloorProbe [k=v ...]
  */
object FloorProbe {

  private val Names = Seq(
    "q16_sort_limit", "q2_daily_rollup", "q5_time_range", "q6_null_guard",
    "q7_threeway_join", "q8_join_groupby", "t2_quality_score", "t3_token_count",
    "t6_repetition", "w2_forecast_daily", "x1_approx_ndv", "v3_vector_norms")

  def main(args: Array[String]): Unit = {
    args.foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      System.setProperty(k, v)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("32", "graft-floor-probe")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // reuse=true: build the DataFrame once per query and re-run only the
    // action — isolates how much of the floor is plan CONSTRUCTION +
    // analysis (cached on the DataFrame) vs optimization + physical
    // planning + execution (paid per action either way)
    val reuse = sys.env.get("FLOOR_REUSE").contains("1")
    def runOnce(name: String,
        df: => org.apache.spark.sql.DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def measure(name: String): Double = {
      System.gc()
      val cached =
        if (reuse) Some(SparkEntry.queries(name)(spark, sfDir)) else None
      def df = cached.getOrElse(SparkEntry.queries(name)(spark, sfDir))
      runOnce(name, df) // warm
      var runs = List(runOnce(name, df))
      while (runs.length < 4 &&
          (runs.length < 2 || runs.max > runs.min * 1.15))
        runs = runOnce(name, df) :: runs
      runs.min
    }

    val results = Names.map(n => n -> measure(n))
    results.foreach { case (n, t) => println(f"[floor] $n%-20s $t%6.3f") }
    println(f"[floor] TOTAL ${results.map(_._2).sum}%6.3f  overrides=${args.mkString(",")}")
    spark.stop()
  }
}
