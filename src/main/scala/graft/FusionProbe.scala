package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Diagnostic-only main: star rounds on the d13 chain, FUSED
  * (convergence verdict cross-joined into the round job — the shape
  * VERDICT r10 #4 proposed) vs the shipped two-action shape, with plan
  * stats printed per round. This probe produced the round-11 numbers
  * that REJECTED the fusion (SCALING.md "fusing the CC convergence
  * check"): exchange reuse fires on round 0 and silently stops from
  * round 1 on, re-executing the round lineage once per consumer.
  * Not part of the driver contract. */
object FusionProbe {

  /** The rejected fused round, kept here verbatim so the measurement
    * is reproducible: one large+small star pass, deduped, with the
    * 1-row star-forest violation count broadcast back onto every row. */
  private def fusedStarRound(edges0: DataFrame): DataFrame = {
    val sym = edges0.select(col("u"), col("v"))
      .unionByName(edges0.select(col("v").as("u"), col("u").as("v")))
    val largeMins = sym.groupBy("u")
      .agg(least(min(col("v")), first(col("u"))).as("m"))
    val afterLarge = sym.where(col("v") > col("u"))
      .join(largeMins, Seq("u"))
      .select(col("v").as("u"), col("m").as("v"))
    val smallMins = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
    val deduped = afterLarge.join(smallMins, Seq("u"))
      .where(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
      .unionByName(smallMins.select(col("u"), col("m").as("v")))
      .distinct()
    val viol = deduped
      .select(col("u").as("n"), lit(1).as("deg"), lit(0).as("p"))
      .unionByName(deduped.select(col("v").as("n"), lit(0).as("deg"), lit(1).as("p")))
      .groupBy("n").agg(sum(col("deg")).as("deg"), max(col("p")).as("p"))
      .where((col("p") === 1 && col("deg") > 0) || col("deg") > 1)
      .agg(count(lit(1)).as("__viol"))
    deduped.crossJoin(broadcast(viol))
  }
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("32", "graft-fusion-probe")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val ids = Tables.documents(spark, sfDir).select(col("doc_id"))
    val p2 = ids.select(col("doc_id").as("doc_a"))
      .join(ids.select(col("doc_id").as("doc_b")),
        col("doc_b") === col("doc_a") + 1)
      .where(col("doc_a") % 200 =!= 199)
    var edges = p2
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("v"))
      .where(col("u") =!= col("v")).distinct().localCheckpoint(true)
    val parts = edges.rdd.getNumPartitions
    println(s"[fp] edges=${edges.count()} parts=$parts")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)

    def oldRound(edges0: DataFrame): DataFrame = {
      val sym = edges0.select(col("u"), col("v"))
        .unionByName(edges0.select(col("v").as("u"), col("u").as("v")))
      val largeMins = sym.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val afterLarge = sym.where(col("v") > col("u"))
        .join(largeMins, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
      val smallMins = afterLarge.groupBy("u").agg(min(col("v")).as("m"))
      afterLarge.join(smallMins, Seq("u"))
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(smallMins.select(col("u"), col("m").as("v")))
        .distinct()
    }
    def isStarForest(df: DataFrame): Boolean =
      df.select(col("u").as("n"), lit(1).as("deg"), lit(0).as("p"))
        .unionByName(df.select(col("v").as("n"), lit(0).as("deg"), lit(1).as("p")))
        .groupBy("n").agg(sum(col("deg")).as("deg"), max(col("p")).as("p"))
        .where((col("p") === 1 && col("deg") > 0) || col("deg") > 1)
        .isEmpty

    // plan shape of the fused round BEFORE checkpoint truncates it
    val fusedDf = fusedStarRound(edges)
    val plan = fusedDf.queryExecution.executedPlan.toString
    println(s"[fp] fused plan: Exchange=${"- Exchange".r.findAllIn(plan).size} " +
      s"ReusedExchange=${"ReusedExchange".r.findAllIn(plan).size} " +
      s"BroadcastExchange=${"BroadcastExchange".r.findAllIn(plan).size}")

    // job/stage accounting per variant
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
      }
    })
    def counted[T](label: String)(body: => T): T = {
      jobs.set(0); stages.set(0); taskMs.set(0)
      val t0 = System.nanoTime()
      val r = body
      Thread.sleep(300) // let listener events drain
      println(f"[fp] $label%-10s ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"jobs=${jobs.get} stages=${stages.get} taskMs=${taskMs.get}")
      r
    }

    // alternate 5 rounds each way on the SAME state (JIT warms both)
    var e1 = edges
    var e2 = edges
    for (i <- 0 until 5) {
      e1 = counted(s"fused $i") {
        val df = fusedStarRound(e1)
        val p = df.queryExecution.executedPlan.toString
        println(s"[fp]   plan$i: Exchange=${"- Exchange".r.findAllIn(p).size} " +
          s"ReusedExchange=${"ReusedExchange".r.findAllIn(p).size} " +
          s"rddScans=${"Scan ExistingRDD".r.findAllIn(p).size} lines=${p.linesIterator.size}")
        if (i == 1) println(p)
        val next = df.localCheckpoint(true)
        next.select("__viol").take(1).head.getLong(0)
        // hypothesis test: re-checkpoint to a clean 2-col scan — if
        // reuse returns in round i+1, the drop-Project was the trigger
        next.drop("__viol").localCheckpoint(true)
      }
      e2 = counted(s"old $i") {
        val nextO = oldRound(e2).localCheckpoint(true)
        isStarForest(nextO)
        nextO
      }
    }
    spark.stop()
  }
}
