package graft

import org.apache.spark.sql.functions._

/** Stage-attribution probe for m6_media_keeplist (VERDICT r12 #4): time
  * each stage of the keep-list pipeline in isolation at a replica dir —
  * digest materialization per modality, each band pair join, the CC
  * rounds, and the final roster aggregate — so optimization effort
  * lands where the seconds are. `runMain graft.M6Probe [dataDir]`. */
object M6Probe {

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft-scale/full10x")
    val spark = Sessions.local("32", "graft-m6-probe")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[m6] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val docs = Tables.documentsSpread(spark, d)
    val off = 1099511627776L
    val ih = timed("image digests (checkpoint)") {
      graft.llm.ImagePhash.avgHash(
        graft.llm.ImagePhash.synthAssets(docs)).toDF.localCheckpoint(true)
    }
    val ah = timed("audio digests (checkpoint)") {
      graft.llm.AudioFingerprint.envelopeHash(
        graft.llm.AudioFingerprint.synthAssets(docs)).toDF.localCheckpoint(true)
    }
    val ip = timed("image band pairs") {
      graft.llm.HammingLsh.nearDupPairs(ih, maxHamming = 7)
        .select(col("asset_a").as("doc_a"), col("asset_b").as("doc_b"))
        .localCheckpoint(true)
    }
    val ap = timed("audio band pairs") {
      graft.llm.HammingLsh.nearDupPairs(ah, maxHamming = 7)
        .select((col("asset_a") + off).as("doc_a"),
          (col("asset_b") + off).as("doc_b"))
        .localCheckpoint(true)
    }
    println(s"[m6] pair counts image=${ip.count()} audio=${ap.count()}")
    val comp = timed("connected components") {
      graft.queries.Components.connectedComponents(ip.union(ap))
        .withColumnRenamed("node", "uid").localCheckpoint(true)
    }
    timed("cc star (comparison)") {
      val (df, rounds) = graft.queries.Components
        .connectedComponentsStarStats(ip.union(ap))
      val n = df.count()
      println(s"[m6] star rounds=$rounds rows=$n")
    }
    timed("roster aggregate") {
      val assets = ih.select(col("asset_id").as("uid"))
        .union(ah.select((col("asset_id") + off).as("uid")))
      assets.join(comp, Seq("uid"), "left")
        .withColumn("component", coalesce(col("component"), col("uid")))
        .groupBy("component")
        .agg(count(lit(1)).cast("int").as("cluster_size"))
        .orderBy("component")
        .collect()
    }
    spark.stop()
  }
}
