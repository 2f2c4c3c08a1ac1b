package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Plan-shape contract of the p1 end-to-end pipeline gate (correctness
  * is oracle-gated): the composed serve path must stay one lazy
  * DataFrame program with scale-safe shapes — no cartesian joins, no
  * corpus-sized unpartitioned window, and no stage eagerly
  * materializing through the driver between the index serves and the
  * packed output.
  */
class PipelineE2eSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  // builds the state once (session-memoized marker), returns the lazy
  // serve-path frame
  private def serve = SparkEntry.queries("p1_pipeline_e2e")(spark, sf)

  test("no cartesian join; every cross join attaches a 1-row stats frame") {
    val plan = serve.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"p1 plan contains CartesianProduct:\n$plan")
    // cross joins ARE present — TextIndex.search's corpus-stats attach
    // — but each must broadcast a global (1-row) aggregate, never pair
    // two data-sized sides
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val crosses = serve.queryExecution.optimizedPlan.collect {
      case j: Join if j.condition.isEmpty => j
    }
    for (j <- crosses) {
      val oneRowSide = Seq(j.left, j.right).exists { side =>
        side.maxRows.exists(_ <= 1) ||
          side.collectFirst {
            case a: Aggregate if a.groupingExpressions.isEmpty => a
          }.isDefined
      }
      assert(oneRowSide, s"cross join without a 1-row side:\n$j")
    }
  }

  test("every window is partitioned, except the bounded bucket-offset frame") {
    // the pack stage's cumulative offsets ride ONE unpartitioned window
    // whose input is the ≤256-row bucket aggregate — every other window
    // (in-bucket numbering, search ranking, plan greedy) must carry a
    // partition spec, or an epoch-wide single-partition sort snuck in.
    // Inspect the LAZY twin: the gate's frame ends in Sort(ExistingRDD)
    // since the r13 pre-sort checkpoint (the pageRankLazyPlan posture).
    val windows = PipelineE2e.p1ServeLazyPlan(spark, sf)
      .queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.size <= 1,
      s"more than one unpartitioned window:\n${unpartitioned.mkString("\n")}")
    for (w <- unpartitioned) {
      val bucketAgg = w.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
            if a.groupingExpressions.size == 1 &&
              a.groupingExpressions.head.references.toSeq
                .exists(_.name == "bucket") => a
      }
      assert(bucketAgg.nonEmpty,
        s"unpartitioned window not over the bucket aggregate: $w")
    }
  }

  test("p2 shard extension: every unpartitioned window stays on a bounded bucket aggregate") {
    // p2 = p1 + one more hierarchical permutation, so the budget is two
    // unpartitioned windows — both must consume ≤256-row bucket frames
    val plan = graft.SparkEntry.queries("p2_pipeline_shards")(spark, sf)
      .queryExecution.optimizedPlan
    val unpartitioned = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.size <= 2,
      s"more than two unpartitioned windows:\n${unpartitioned.mkString("\n")}")
    for (w <- unpartitioned)
      assert(w.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
            if a.groupingExpressions.size == 1 &&
              a.groupingExpressions.head.references.toSeq
                .exists(_.name == "bucket") => a
      }.nonEmpty, s"unpartitioned window not over a bucket aggregate: $w")
  }

  test("composing the serve path never materializes corpus data to the driver") {
    serve.count() // state built + marker set before we start measuring
    // composition legitimately runs cluster-side jobs (the live-pair CC
    // loop inside prepared(), index metadata loads) — the contract is
    // that what crosses to the DRIVER stays driver-bounded: convergence
    // counts, the k×dim centroid list, generation markers. A stage that
    // collect()ed documents or postings would blow the result-size cap.
    val resultBytes = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        resultBytes.addAndGet(s.stageInfo.taskMetrics.resultSize)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = serve // construction only — no action on the output
      assert(df.columns.toSeq == Seq("doc_id", "rep", "pos", "n_tokens",
        "start_off", "first_seq", "last_seq"))
      Thread.sleep(500)
      assert(resultBytes.get < 8L * 1024 * 1024,
        s"serve-path composition moved ${resultBytes.get} bytes to the " +
          "driver — a stage is collecting data-sized state")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
