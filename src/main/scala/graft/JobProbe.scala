package graft

import scala.collection.mutable

import org.apache.spark.scheduler._

/** Diagnostic-only main: runs selected queries once (after a warm run)
  * with a listener that attributes wall time to individual Spark JOBS —
  * the unit that matters for multi-action queries (iterative CC, the
  * pipeline serves, trainers): per job it prints duration, stage count,
  * task count, total task time, shuffle read/write bytes and the first
  * line of the job's call site. Not part of the driver contract.
  *
  * Usage: runMain graft.JobProbe <sfDir> [names...]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("p1_pipeline_e2e")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "graft-job-probe")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    final case class JobRec(id: Int, site: String, var start: Long = 0L,
      var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
      var taskMs: Long = 0L, var shufR: Long = 0L, var shufW: Long = 0L)
    val jobs = mutable.LinkedHashMap.empty[Int, JobRec]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        val r = JobRec(e.jobId, site)
        r.start = e.time
        r.stages = e.stageIds.size
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        jobs(e.jobId) = r
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = jobs.synchronized {
        for (jid <- stageToJob.get(e.stageId); r <- jobs.get(jid)) {
          r.tasks += 1
          val m = e.taskMetrics
          if (m != null) {
            r.taskMs += m.executorRunTime
            r.shufR += m.shuffleReadMetrics.totalBytesRead
            r.shufW += m.shuffleWriteMetrics.bytesWritten
          }
        }
      }
    }

    for (n <- names) {
      // warm run: codegen + page cache, outside the attributed window
      spark.catalog.clearCache()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      // let straggler events drain before reading the map
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      println(f"\n===== $n  total=$total%.2f s =====")
      val snap = jobs.synchronized { jobs.values.toSeq }
      var prevEnd = 0L
      snap.foreach { r =>
        val dur = (r.end - r.start) / 1e3
        val gap = if (prevEnd == 0) 0.0 else (r.start - prevEnd) / 1e3
        prevEnd = r.end
        println(f"job ${r.id}%3d dur=$dur%7.3f gap=$gap%7.3f stages=${r.stages}%2d " +
          f"tasks=${r.tasks}%4d taskMs=${r.taskMs}%6d " +
          f"shufR=${r.shufR}%9d shufW=${r.shufW}%9d  ${r.site}")
      }
      val sumDur = snap.map(r => (r.end - r.start) / 1e3).sum
      println(f"jobs=${snap.size} sum(job dur)=$sumDur%.2f s (driver gaps = ${total - sumDur}%.2f s)")
    }
    spark.stop()
  }
}
