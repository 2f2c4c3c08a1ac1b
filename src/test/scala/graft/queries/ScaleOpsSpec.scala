package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** The three scale-pattern exemplars (q45/q46/x5) — each test pins the
  * property that makes the pattern valid at 100 TB, not just the gated
  * result values (the oracle gate already hash-compares those).
  */
class ScaleOpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("q45: merged partial states equal the one-pass full recompute") {
    val merged = SparkEntry.queries("q45_incremental_rollup")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    val full = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100 + 0.5).cast("long")) / 100.0)
          .as("total_value"),
        min("value"), max("value"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(2) / r.getLong(1))).toMap
    assert(merged == full)
  }

  test("q45: ANY batch split merges to the same state (3-way by id mod)") {
    // The commutative-monoid property incremental maintenance relies on:
    // cut the input along a dimension uncorrelated with time, merge the
    // three partial states, get bit-identical results.
    val ev = Tables.events(spark, sf)
    val parts = (0 to 2).map(i =>
      ev.where(col("event_id") % 3 === i)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"),
          min("value").as("vmin"), max("value").as("vmax")))
    val merged = parts.reduce(_ unionAll _)
      .groupBy("event_type")
      .agg(sum("cnt").as("n"), (sum("cents") / 100.0).as("total_value"),
        min("vmin").as("min_value"), max("vmax").as("max_value"))
      .withColumn("avg_value", col("total_value") / col("n"))
      .orderBy("event_type").collect().toSeq
    val gated = SparkEntry.queries("q45_incremental_rollup")(spark, sf)
      .collect().toSeq
    assert(merged == gated)
  }

  test("q45: merge equals recompute for ANY cutoff, including the extremes") {
    // The property must hold when one side is empty (cutoff before/after
    // all data) and at arbitrary interior points — not just the gate's
    // pinned date.
    import org.apache.spark.sql.DataFrame
    val ev = Tables.events(spark, sf)
    def partial(df: DataFrame) = df.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"),
        min("value").as("vmin"), max("value").as("vmax"))
    val full = partial(ev)
      .select(col("event_type"), col("cnt"), col("cents"), col("vmin"),
        col("vmax")).orderBy("event_type").collect().toSeq
    for (cut <- Seq("1970-01-01", "2024-01-05", "2024-01-22", "2030-01-01")) {
      val c = lit(cut).cast("timestamp")
      val merged = partial(ev.where(col("ts") < c))
        .unionAll(partial(ev.where(col("ts") >= c || col("ts").isNull)))
        .groupBy("event_type")
        .agg(sum("cnt").as("cnt"), sum("cents").as("cents"),
          min("vmin").as("vmin"), max("vmax").as("vmax"))
        .orderBy("event_type").collect().toSeq
      assert(merged == full, s"cutoff $cut diverged")
    }
  }

  test("q46: bucketed join runs with ZERO shuffle exchanges (broadcast off)") {
    // Materialize via the gated query first (memoized per session+dir).
    SparkEntry.queries("q46_bucketed_join")(spark, sf).collect()
    val (ordersT, lineitemT) = ScaleOps.bucketTableNames(spark, sf)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bare = spark.table(lineitemT)
        .join(spark.table(ordersT),
          col("l_orderkey") === col("o_orderkey"))
      val plan = bare.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join plan still shuffles:\n$plan")
      // …and the same join over the UNBUCKETED tables does shuffle, so
      // the assertion above is demonstrably non-vacuous.
      val unbucketed = Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_extendedprice")
        .join(Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("q46: bucketed result equals the unbucketed join-aggregate") {
    val gated = SparkEntry.queries("q46_bucketed_join")(spark, sf)
      .collect().toSeq
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")) / 100.0)
          .as("total_price"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(gated == plain)
  }

  test("q47: runtime pruning filter reaches the fact scan's PartitionFilters") {
    val q = SparkEntry.queries("q47_dpp_join")(spark, sf)
    // materialize once so the partitioned layout exists, then inspect
    q.collect()
    val plan = SparkEntry.queries("q47_dpp_join")(spark, sf)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
  }

  test("q49: hierarchical result equals q41-style one-window nearest rank") {
    // sf0.01 — richer value distribution than the spec-default sf0.001
    val big = "/root/testdata/sf0.01"
    val hier = SparkEntry.queries("q49_percentile_hier")(spark, big)
      .collect().toSeq
    // the oracle string IS the one-window contract and is valid Spark
    // SQL — single-sourced, so a contract change can't desynchronize
    // this differential from the DuckDB gate
    val flat = {
      Tables.registerAll(spark, big)
      spark.sql(SparkEntry.oracleSql("q49_percentile_hier")).collect().toSeq
    }
    assert(hier == flat)
  }

  test("q49: every window in the plan is partitioned (no per-group global sort)") {
    import org.apache.spark.sql.functions._
    // the lazy twin: the gate's plan ends in Sort(ExistingRDD) since
    // the r14 pre-sort checkpoint, so shape assertions read this form
    val windows = ScaleOps.hierPercentilesLazyPlan(
        Tables.lineitem(spark, sf)
          .select(col("l_returnflag").as("rf"),
            col("l_extendedprice").as("v"),
            Relational.cents(col("l_extendedprice")).as("c")))
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }
    assert(windows.nonEmpty)
    for (w <- windows)
      assert(w.partitionSpec.nonEmpty, s"unpartitioned window: $w")
    // the in-bucket rank window partitions by (group, bucket) — the rows
    // it sorts are a boundary bucket, never the whole group
    assert(windows.exists(_.partitionSpec.size == 2))
  }

  test("q52: dispatch flips exactly at the crossover; both paths bit-equal") {
    import org.apache.spark.sql.functions._
    val in = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("rf"),
        col("l_extendedprice").as("v"),
        Relational.cents(col("l_extendedprice")).as("c"))
    def hasJoin(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.nonEmpty
    // the hierarchy's signature is its boundary-bucket joins; the
    // one-window plan has none — the rowsHint sweep pins the flip point
    // (lazy twins: the production forms' plans are checkpoint-truncated)
    val below = ScaleOps.exactPercentiles(in,
      Some(ScaleOps.HierCrossoverRows - 1), materializeFinal = false)
    val atCut = ScaleOps.exactPercentiles(in,
      Some(ScaleOps.HierCrossoverRows), materializeFinal = false)
    assert(!hasJoin(below), "below the crossover must be the one-window plan")
    assert(hasJoin(atCut), "at/above the crossover must be the hierarchical plan")
    // the dispatch is semantically invisible: identical rows either way
    assert(below.collect().toSeq == atCut.collect().toSeq)
    // the default (stats-estimated) path at this SF is below the
    // crossover and agrees too
    assert(ScaleOps.exactPercentiles(in).collect().toSeq == below.collect().toSeq)
  }

  test("x5: merged weekly estimate within bound, one stored sketch per day") {
    val gated = SparkEntry.queries("x5_sketch_rollup")(spark, sf).collect()
    assert(gated.nonEmpty)
    assert(gated.forall(_.getAs[Boolean]("ndv_ok")))
    // The stored artifact really is per-day (the finest grain scanned
    // from raw data): one sketch row per distinct day in the table.
    val ev = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"),
        concat_ws("|", col("user_id"), col("props")).as("uk"))
    val nDays = ev.select("day").distinct().count()
    val daily = ev.groupBy("day").agg(hll_sketch_agg(col("uk"), lit(12)).as("sk"))
    assert(daily.count() == nDays)
    // Merging the daily states is as accurate as sketching the week
    // directly — both within the same ±5% of exact.
    val direct = ev.groupBy(trunc(col("day"), "week").as("week"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("uk"), lit(12))).as("est"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exact = ev.select(trunc(col("day"), "week").as("week"), col("uk"))
      .distinct().groupBy("week").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    for ((wk, e) <- exact)
      assert(math.abs(direct(wk) - e).toDouble / e <= 0.05,
        s"direct weekly sketch off-bound for $wk: ${direct(wk)} vs $e")
  }
}
