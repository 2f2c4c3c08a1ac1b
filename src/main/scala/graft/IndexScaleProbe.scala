package graft

import org.apache.spark.sql.functions._

/** Measured scaling for the two stateful index services (SCALING.md):
  * does per-BATCH cost stay batch-sized as the INDEX grows 10×?
  *
  * Usage: `runMain graft.IndexScaleProbe <mult>` where `<mult>` is 1 or
  * a replica multiple whose documents dir `graft.ScaleProbe` has already
  * built (`/tmp/graft-scale/<m>x`). Embeddings are replicated here by
  * dimension rotation (norm-preserving, so no replica is an exact dup
  * and cell geometry stays realistic).
  *
  * Protocol: fresh JVM per multiple (run each invocation separately —
  * in-JVM sequences contaminate, see SCALING.md); stateful ops
  * (seed/add) are timed cold since they mutate; search warms once and
  * times the second run.
  */
object IndexScaleProbe {

  def main(args: Array[String]): Unit = {
    val m = args.headOption.getOrElse("1").toInt
    val base = "/root/testdata/sf0.1"
    val spark = Sessions.local("32", "graft-index-scale")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import spark.implicits._

    def timed[T](label: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[iscale] ${m}%2dx $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // ---- corpus at m× ----
    val docs =
      if (m == 1) spark.read.parquet(s"$base/documents.parquet")
      else {
        // ScaleProbe builds <m>x; ScaleBuild's full replica (full<m>x)
        // carries the same documents table — accept either
        val cands = Seq(s"/tmp/graft-scale/${m}x/documents.parquet",
          s"/tmp/graft-scale/full${m}x/documents.parquet")
        val hit = cands.find(p => new java.io.File(p).exists())
          .getOrElse(sys.error(s"no ${m}x documents replica; run ScaleProbe or ScaleBuild first"))
        spark.read.parquet(hit)
      }
    val nDocs = docs.count()

    // ---- DedupIndex: seed with the m× corpus, then one fixed batch ----
    // The probe batch is a rotation replica OUTSIDE the corpus's rotation
    // range (ScaleProbe uses k < m ≤ 10; k=15 here), so its shingles are
    // batch-specific: candidate fan-out stays honest.
    val dedupDir = java.nio.file.Files.createTempDirectory(s"graft-iscale-dedup").toString
    timed(s"dedup seed (${nDocs} docs)") {
      graft.llm.DedupIndex.checkAndAdd(spark, dedupDir, docs.select("doc_id", "text")).count()
    }
    val abc = "bcdfghjklmnpqrstvwz"
    val rot = abc.drop(15) + abc.take(15)
    val batch = spark.read.parquet(s"$base/documents.parquet")
      .limit(500)
      .withColumn("doc_id", col("doc_id") + lit(100000000L))
      .withColumn("text", translate(col("text"), abc, rot))
      .select("doc_id", "text")
      .localCheckpoint(true) // batch construction must not ride the timer
    timed("dedup checkAndAdd (500 docs)") {
      graft.llm.DedupIndex.checkAndAdd(spark, dedupDir, batch).count()
    }
    // removal must also be batch-sized: tombstone append + marker, no
    // rewrite of the accumulated postings
    timed("dedup remove (500 docs)") {
      graft.llm.DedupIndex.remove(spark, dedupDir, batch.select("doc_id"))
    }

    // ---- VectorIndex: build over m× embeddings, then a fixed search ----
    val baseEmb = spark.read.parquet(s"$base/embeddings.parquet")
      .select("vec_id", "embedding")
    val nBase = baseEmb.agg(max("vec_id")).collect()(0).getLong(0) + 1
    val dim = baseEmb.select(size(col("embedding"))).head().getInt(0)
    val emb =
      if (m == 1) baseEmb
      else (0 until m).map { k =>
        // rotate dimensions by k: distinct, norm-preserving replicas
        baseEmb.withColumn("vec_id", col("vec_id") + lit(k.toLong * nBase))
          .withColumn("embedding",
            concat(slice(col("embedding"), k + 1, dim - k),
              slice(col("embedding"), 1, k)))
      }.reduce(_ unionByName _)
    val embC = emb.localCheckpoint(true)
    val nEmb = embC.count()

    val vecDir = java.nio.file.Files.createTempDirectory(s"graft-iscale-vec").toString
    timed(s"vector build k=32 (${nEmb} vecs)") {
      graft.llm.VectorIndex.build(spark, vecDir, embC, 32)
    }
    val queries = baseEmb.limit(100)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .localCheckpoint(true)
    def searchOnce(): Long =
      graft.llm.VectorIndex.search(spark, vecDir, queries, 10, 4).count()
    searchOnce() // warm
    timed("vector search 100q k=10 np=4")(searchOnce())
    // takedown must stay removal-sized: live-ledger semi-join + tombstone
    // append + marker — never an inverted-list rewrite
    timed("vector remove (100 ids)") {
      graft.llm.VectorIndex.remove(spark, vecDir,
        queries.select(col("qid").as("vec_id")))
    }
    timed("vector search after remove")(searchOnce())

    // ---- KnnGraphIndex: seed with m× vectors, then one fixed batch ----
    // Batch = 200 rotation-replica vectors OUTSIDE the corpus's rotation
    // range (k=15; the corpus uses k < m ≤ 10), ids offset clear of every
    // replica band. What should stay batch-sized as the base grows: the
    // candidate join is pruned to the batch's buckets, and affected
    // existing vectors rejoin only their stored k rows — the base is
    // never rescanned. (Bucket OCCUPANCY itself grows with the corpus
    // under the fixed 64-bucket signature, so the honest expectation is
    // growth ∝ occupancy, far below the base-sized rebuild; SCALING.md
    // records the measured pair.)
    val knnDir = java.nio.file.Files.createTempDirectory("graft-iscale-knng").toString
    timed(s"knngraph seed k=3 (${nEmb} vecs)") {
      graft.llm.KnnGraphIndex.add(spark, knnDir, embC, 3)
    }
    val knnBatch = baseEmb.limit(200)
      .withColumn("vec_id", col("vec_id") + lit(100000000L))
      .withColumn("embedding",
        concat(slice(col("embedding"), 16, dim - 15),
          slice(col("embedding"), 1, 15)))
      .localCheckpoint(true)
    timed("knngraph add (200 vecs)") {
      graft.llm.KnnGraphIndex.add(spark, knnDir, knnBatch, 3)
    }
    // beam serve at 1× and 10× the query batch: per-hop frontier work is
    // O(frontier × degree) in both pushdown regimes (IN-list under
    // FrontierIsinMax, broadcast semi-join above), so serve time should
    // grow far slower than the batch — the flat-serve check
    def beamServe(nq: Int): Long = {
      val q = baseEmb.limit(nq)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      graft.llm.KnnGraphIndex.beamSearch(spark, knnDir, q,
        k = 3, beam = 4, hops = 2).count()
    }
    beamServe(20) // warm
    timed("knngraph beam serve (20 q)")(beamServe(20))
    timed("knngraph beam serve (200 q)")(beamServe(200))
    // graph removal pays affected-list re-ranks (victim in-degree ×
    // bucket occupancy), never a base rescan — the honest expectation
    // is the same occupancy-proportional growth as add
    timed("knngraph remove (200 vecs)") {
      graft.llm.KnnGraphIndex.remove(spark, knnDir,
        knnBatch.select("vec_id"), 3)
    }

    // ---- TextIndex: seed with the m× corpus, then one fixed batch ----
    // What should stay batch-sized: add's tokenize/groupBy touches only
    // the batch (the ledger anti-join is id-keyed, never text); remove
    // is tombstone append + marker. Search cost is term-postings-sized —
    // it grows with corpus df, which is the honest per-term expectation,
    // while the stats side stays one ledger aggregate.
    val textDir = java.nio.file.Files.createTempDirectory("graft-iscale-text").toString
    timed(s"text seed (${nDocs} docs)") {
      graft.llm.TextIndex.add(spark, textDir, docs.select("doc_id", "text"))
    }
    timed("text add (500 docs)") {
      graft.llm.TextIndex.add(spark, textDir, batch)
    }
    val terms = Seq("hash", "scan", "merge")
    def textSearch(): Long = graft.llm.TextIndex.search(spark, textDir, terms, 25).count()
    textSearch() // warm
    timed("text search 3 terms k=25")(textSearch())
    timed("text remove (500 docs)") {
      graft.llm.TextIndex.remove(spark, textDir, batch.select("doc_id"))
    }
    timed("text search after remove")(textSearch())

    spark.stop()
  }
}
