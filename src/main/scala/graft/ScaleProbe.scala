package graft

import org.apache.spark.sql.functions._

/** Diagnostic-only main: measure how query time scales with corpus size
  * by running selected queries at 1×, K×, … multiples of sf0.1's
  * `documents` table — the local stand-in for "would this hold at 100×?"
  * (the shuffle/join SHAPE is what transfers; absolute times don't).
  *
  * Replicas are made textually unrelated (per-replica consonant
  * rotation via `translate`), so scaling multiplies corpus size without
  * manufacturing near-duplicate clusters — the duplicate-rate stays that
  * of the base corpus, which is the realistic regime.
  *
  * Usage: runMain graft.ScaleProbe <multipliers csv> <names...>
  * Scaled tables are built under /tmp/graft-scale/<m>x (reused if
  * present; other tables are read straight from sf0.1).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val mults = args.headOption.getOrElse("1,2,4").split(",").map(_.trim.toInt).toSeq
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("d1_dedup_exact", "d2_dedup_ngram_jaccard", "d4_minhash_pairs",
        "t7_vocab", "c6_sequence_pack")
    val base = "/root/testdata/sf0.1"
    val spark = Sessions.local("32", "graft-scale-probe")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val fs = new org.apache.hadoop.fs.Path("/tmp").getFileSystem(
      spark.sparkContext.hadoopConfiguration)

    def scaledDir(m: Int): String = {
      val dir = s"/tmp/graft-scale/${m}x"
      // the marker is written LAST, so a crashed half-built dir is
      // rebuilt instead of silently accepted
      val done = new org.apache.hadoop.fs.Path(s"$dir/_built")
      if (!fs.exists(done)) {
        val src = spark.read.parquet(s"$base/documents.parquet")
        val n = src.agg(max("doc_id")).collect()(0).getLong(0) + 1
        // replica k: ids offset by k*n; consonant rotation keyed by k
        // makes every token (hence every shingle/hash) replica-specific.
        // Rotations alias with period |abc| — past that, replicas would
        // duplicate byte-for-byte and fabricate dense dup clusters, so
        // the multiplier is capped rather than silently wrapping.
        val abc = "bcdfghjklmnpqrstvwz"
        require(m <= abc.length,
          s"multiplier $m exceeds ${abc.length} distinct rotations — " +
            "replicas would alias into exact duplicates")
        val rep = (0 until m).map { k =>
          val rot = abc.drop(k) + abc.take(k)
          src.withColumn("doc_id", col("doc_id") + lit(k.toLong * n))
            .withColumn("text", translate(col("text"), abc, rot))
        }.reduce(_ unionByName _)
        rep.repartition(32).write.mode("overwrite")
          .parquet(s"$dir/documents.parquet")
        // the other tables come straight from sf0.1
        for (t <- Seq("region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "embeddings")) {
          val link = new org.apache.hadoop.fs.Path(s"$dir/$t.parquet")
          if (!fs.exists(link))
            org.apache.hadoop.fs.FileUtil.copy(fs,
              new org.apache.hadoop.fs.Path(s"$base/$t.parquet"),
              fs, link, false, spark.sparkContext.hadoopConfiguration)
        }
        fs.create(done, true).close()
      }
      dir
    }

    for (m <- mults) {
      val dir = if (m == 1) base else scaledDir(m)
      for (n <- names) {
        System.gc()
        // warm-in then steady-state, same protocol as Bench
        def once(): Double = {
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, dir)
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once()
        val t = once()
        println(f"[scale] ${m}%2dx $n%-26s $t%7.2f s")
      }
    }
    spark.stop()
  }
}
