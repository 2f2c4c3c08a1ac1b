package graft

import org.apache.spark.sql.functions._

/** Measured scaling for the incremental corpus-prep service
  * (SCALING.md): as the PREPARED CORPUS grows 10×, does refreshing one
  * fixed-size batch stay batch-sized — and how does it compare against
  * the from-scratch [[graft.llm.CorpusEtl.prepare]] on the union, which
  * re-reads every byte of text each time?
  *
  * Usage: `runMain graft.RefreshScaleProbe <mult>` (1 or a replica
  * multiple ScaleProbe/ScaleBuild already built under
  * /tmp/graft-scale). Fresh JVM per multiple, same as IndexScaleProbe.
  *
  * The honest expectation: the batch's text work (filter stats, md5,
  * MinHash, scrub) is constant; the accumulated-state joins (hash
  * ledger, pair endpoints, CC over the pair graph) grow with the corpus
  * but are id-keyed rows, not text — so refresh growth should sit far
  * below 10× while prepare-from-scratch grows ~linearly.
  */
object RefreshScaleProbe {

  def main(args: Array[String]): Unit = {
    val m = args.headOption.getOrElse("1").toInt
    val base = "/root/testdata/sf0.1"
    val spark = Sessions.local("32", "graft-refresh-scale")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def timed[T](label: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[rscale] ${m}%2dx $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val docs =
      if (m == 1) spark.read.parquet(s"$base/documents.parquet")
      else {
        val cands = Seq(s"/tmp/graft-scale/${m}x/documents.parquet",
          s"/tmp/graft-scale/full${m}x/documents.parquet")
        val hit = cands.find(p => new java.io.File(p).exists())
          .getOrElse(sys.error(s"no ${m}x documents replica; run ScaleProbe or ScaleBuild first"))
        spark.read.parquet(hit)
      }
    val nDocs = docs.count()

    // fixed probe batch: rotation replicas outside the corpus's rotation
    // range (IndexScaleProbe's recipe), so shingle/hash work is real
    val abc = "bcdfghjklmnpqrstvwz"
    val rot = abc.drop(15) + abc.take(15)
    val batch = spark.read.parquet(s"$base/documents.parquet")
      .limit(500)
      .withColumn("doc_id", col("doc_id") + lit(100000000L))
      .withColumn("text", translate(col("text"), abc, rot))
      .localCheckpoint(true)

    val dir = java.nio.file.Files.createTempDirectory("graft-rscale").toString
    timed(s"refresh seed ($nDocs docs)") {
      graft.llm.CorpusRefresh.refresh(spark, dir, docs)
    }
    timed("refresh batch (500 docs)") {
      graft.llm.CorpusRefresh.refresh(spark, dir, batch)
    }
    timed("prepared() assembly read") {
      graft.llm.CorpusRefresh.prepared(spark, dir)
        .agg(count(lit(1))).collect()
    }
    timed(s"prepare from scratch (union)") {
      graft.llm.CorpusEtl.prepare(docs.unionByName(batch))
        .agg(count(lit(1))).collect()
    }

    // round-10 additions, AFTER the legacy timings so those stay
    // comparable across rounds. Takedown is id-keyed state joins plus
    // removal-sized index ops — the honest expectation is growth with
    // the ACCUMULATED STATE (hash ledger, pair endpoints), never with
    // corpus text; compact is the full-state fold, deliberately
    // corpus-state-sized (a maintenance op, not a per-batch one).
    val victimIds = docs.select("doc_id").orderBy("doc_id").limit(500)
      .localCheckpoint(true)
    timed("remove 500 docs (takedown)") {
      graft.llm.CorpusRefresh.remove(spark, dir, victimIds)
    }
    timed("prepared() after takedown") {
      graft.llm.CorpusRefresh.prepared(spark, dir)
        .agg(count(lit(1))).collect()
    }
    timed("compact (full-state fold)") {
      graft.llm.CorpusRefresh.compact(spark, dir)
    }

    spark.stop()
  }
}
