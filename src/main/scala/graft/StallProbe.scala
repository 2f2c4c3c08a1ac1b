package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler._

/** Diagnostic-only main: hunts the random in-sweep stall. Runs queries
  * under the Bench protocol (clearCache + System.gc between runs) with a
  * listener recording every job's [start, end]; for each run prints the
  * wall time, the summed job time, the largest single job, and the
  * largest gap not covered by any running job (= driver-side stall).
  * Not part of the driver contract.
  *
  * Usage: runMain graft.StallProbe <sfDir> <reps> [names...]
  */
object StallProbe {
  private final case class J(id: Int, start: Long, var end: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("c1_corpus_prep", "d7_dedup_clusters", "d10_dup_graph_metrics",
        "d12_quality_keeper", "d13_cc_chain")
    val spark = Sessions.local("32", "graft-stall-probe")
    val jobs = new ConcurrentLinkedQueue[J]()
    val open = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = J(e.jobId, e.time, -1L); open.put(e.jobId, j); jobs.add(j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = open.remove(e.jobId); if (j != null) j.end = e.time
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()

    for (n <- names; r <- 1 to reps) {
      System.gc()
      jobs.clear()
      val t0 = System.currentTimeMillis()
      spark.catalog.clearCache()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val t1 = System.currentTimeMillis()
      val wall = (t1 - t0) / 1e3
      // snapshot: jobs of THIS run (listener is async — drain after a beat)
      Thread.sleep(50)
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toVector.filter(_.end > 0).sortBy(_.start)
      val jobSum = js.map(j => j.end - j.start).sum / 1e3
      val maxJob = js.map(j => j.end - j.start).maxOption.getOrElse(0L) / 1e3
      // largest wall interval not covered by any job
      var cover = t0
      var maxGap = 0L
      var gapAt = 0L
      for (j <- js) {
        if (j.start > cover) {
          if (j.start - cover > maxGap) { maxGap = j.start - cover; gapAt = cover - t0 }
        }
        cover = math.max(cover, j.end)
      }
      if (t1 > cover && t1 - cover > maxGap) { maxGap = t1 - cover; gapAt = cover - t0 }
      println(f"[stall] $n%-24s r$r wall=$wall%7.2f jobs=${js.size}%3d " +
        f"jobSum=$jobSum%7.2f maxJob=$maxJob%6.2f maxGap=${maxGap / 1e3}%6.2f at=${gapAt / 1e3}%6.1f")
    }
    spark.stop()
  }
}
