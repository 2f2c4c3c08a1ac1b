package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The stored kNN graph must be indistinguishable from v9's one-shot
  * computation no matter how the corpus was batched in — the merge
  * exactness the class doc argues (stored top-k ∪ batch edges re-ranked
  * = true top-k), plus the service-lifecycle properties: re-delivered
  * batches are no-ops and compaction preserves the resolved graph.
  */
class KnnGraphIndexSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private val K = 3
  private lazy val spark = TestSpark.spark

  /** v9's plan over an arbitrary embedding frame — the reference. */
  private def oneShot(emb: DataFrame): Seq[Seq[Any]] = {
    val e = emb.withColumn("sig", graft.queries.VectorOps.sigCol)
    val b = e.select(col("sig"), col("vec_id").as("nid"),
      col("embedding").as("ne"))
    val cand = e.join(b, Seq("sig")).where(col("vec_id") =!= col("nid"))
      .select(col("vec_id"), col("nid"),
        graft.queries.VectorOps.cosine(col("embedding"), col("ne")).as("cos_sim"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos_sim").desc, col("nid"))
    cand.withColumn("rnk", row_number().over(w).cast("int"))
      .where(col("rnk") <= K)
      .select("vec_id", "nid", "rnk", "cos_sim")
      .orderBy("vec_id", "rnk").collect().toSeq.map(_.toSeq)
  }

  private def graphOf(dir: String): Seq[Seq[Any]] =
    KnnGraphIndex.neighbors(spark, dir)
      .orderBy("vec_id", "rnk").collect().toSeq.map(_.toSeq)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-knngraph").toString

  test("batched adds equal the one-shot graph, bit-for-bit") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val expected = oneShot(emb)
    assert(expected.nonEmpty)

    // one batch
    val d1 = tmp()
    KnnGraphIndex.add(spark, d1, emb, K)
    assert(graphOf(d1) == expected)

    // three uneven batches — later batches must both finalize their own
    // rows and rewrite earlier vectors' lists they displace
    val d2 = tmp()
    KnnGraphIndex.add(spark, d2, emb.where(col("vec_id") % 3 === 0), K)
    KnnGraphIndex.add(spark, d2, emb.where(col("vec_id") % 3 === 1), K)
    KnnGraphIndex.add(spark, d2, emb.where(col("vec_id") % 3 === 2), K)
    assert(graphOf(d2) == expected)
    assert(KnnGraphIndex.size(spark, d2) == emb.count())
  }

  test("re-delivered batch is a no-op; compaction preserves the graph") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val d = tmp()
    val (b1, b2) = (emb.where(col("vec_id") < 250), emb.where(col("vec_id") >= 250))
    KnnGraphIndex.add(spark, d, b1, K)
    KnnGraphIndex.add(spark, d, b2, K)
    val before = graphOf(d)
    assert(before == oneShot(emb))

    KnnGraphIndex.add(spark, d, b1, K) // at-least-once redelivery
    assert(graphOf(d) == before)
    assert(KnnGraphIndex.size(spark, d) == emb.count())

    KnnGraphIndex.compact(spark, d, numFiles = 2)
    assert(graphOf(d) == before)
    // folded flat: exactly one generation remains
    val gens = spark.read.parquet(s"$d/graph").select("gen").distinct().count()
    assert(gens == 1L)
  }

  test("within-batch duplicate ids collapse; empty index reads as empty") {
    import spark.implicits._
    // neighbors()/size() on a never-written index: empty, not an error
    val d0 = tmp()
    assert(KnnGraphIndex.neighbors(spark, d0).count() == 0L)
    assert(KnnGraphIndex.size(spark, d0) == 0L)

    // a batch carrying the same vec_id twice (at-least-once upstream,
    // two landing files in one micro-batch) must index it ONCE — the
    // ledger anti-join can't catch it, so the in-batch dedup must
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .where(col("vec_id") < 100)
    val doubled = emb.unionAll(emb)
    val d = tmp()
    KnnGraphIndex.add(spark, d, doubled, K)
    assert(KnnGraphIndex.size(spark, d) == 100L)
    val got = graphOf(d)
    assert(got == oneShot(emb))
    // no duplicate neighbor within any list
    val dup = KnnGraphIndex.neighbors(spark, d)
      .groupBy("vec_id", "nid").count().where(col("count") > 1).count()
    assert(dup == 0L)
  }

  test("crash windows: torn appends invisible, marker-committed replay exact") {
    import org.apache.spark.sql.functions.lit
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val (b1, b2) = (emb.where(col("vec_id") < 250), emb.where(col("vec_id") >= 250))
    val expected = oneShot(emb)
    val d = tmp()
    KnnGraphIndex.add(spark, d, b1, K)
    val afterB1 = graphOf(d)

    // (a) TORN append: graph files at a generation whose commit marker
    // never appeared (writer died mid-append) — possibly PARTIAL lists.
    // Readers must not see a single row of it.
    KnnGraphIndex.neighbors(spark, d).limit(5)
      .withColumn("gen", lit(99L))
      .select("gen", "vec_id", "nid", "rnk", "cos_sim")
      .write.mode("append").parquet(s"$d/graph")
    assert(graphOf(d) == afterB1, "uncommitted generation leaked into reads")

    // (b) crash AFTER the graph commit marker but BEFORE the ledger
    // append: batch 2's merged lists are committed and visible, but the
    // membership ledger never learned the batch. Simulate by snapshotting
    // the vectors dir around a real add, then replay the same batch —
    // the idempotent merge must land exactly the one-shot graph, not
    // double-seat batch edges.
    def copyDir(src: java.io.File, dst: java.io.File): Unit = {
      dst.mkdirs()
      src.listFiles().foreach { f =>
        if (f.isDirectory) copyDir(f, new java.io.File(dst, f.getName))
        else java.nio.file.Files.copy(f.toPath,
          new java.io.File(dst, f.getName).toPath)
      }
    }
    def deleteDir(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(deleteDir)
      f.delete()
    }
    val vecDir = new java.io.File(s"$d/vectors")
    val snap = new java.io.File(s"$d/vectors.snap")
    copyDir(vecDir, snap)
    KnnGraphIndex.add(spark, d, b2, K)     // the "crashed" attempt
    deleteDir(vecDir); snap.renameTo(vecDir) // roll the ledger back
    KnnGraphIndex.add(spark, d, b2, K)     // the replay
    assert(graphOf(d) == expected, "replay after graph-commit crash diverged")
    assert(KnnGraphIndex.size(spark, d) == emb.count())

    // (c) compaction reaps the torn generation's orphan files for good
    KnnGraphIndex.compact(spark, d, numFiles = 2)
    assert(graphOf(d) == expected)
    val gens = spark.read.parquet(s"$d/graph")
      .select("gen").distinct().collect().map(_.getLong(0)).toSet
    assert(gens == Set(0L), s"expected only folded gen 0, got $gens")
  }

  test("beamSearch: takedown re-routes the walk; equals a fresh survivors-only build") {
    // beam serve over a tombstoned index must behave as if removed ids
    // never existed — as graph NODES, as NEIGHBORS en route, and as
    // the entry point (min LIVE id, not min ever-indexed id)
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val queries = emb.where(col("vec_id") < 6)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    def run(dir: String): Seq[Seq[Any]] =
      KnnGraphIndex.beamSearch(spark, dir, queries, k = 4, beam = 3, hops = 3)
        .collect().toSeq.map(_.toSeq)

    val lifecycled = tmp()
    KnnGraphIndex.add(spark, lifecycled, emb, K)
    // remove a slice INCLUDING the current entry point (id 0)
    KnnGraphIndex.remove(spark, lifecycled,
      emb.where(col("vec_id") % 10 === 0).select("vec_id"), K)
    val fresh = tmp()
    KnnGraphIndex.add(spark, fresh, emb.where(col("vec_id") % 10 =!= 0), K)
    assert(run(lifecycled) == run(fresh),
      "beam over tombstoned index must equal the survivors-only build")
  }

  test("beamSearch: per-hop adjacency read prunes to the frontier (pushed IN-list)") {
    // the 100 TB claim behind O(beam × degree) per query: each hop's
    // graph read must push the frontier ids into the parquet scan, not
    // scan the whole adjacency table per hop
    val dir = tmp()
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    KnnGraphIndex.add(spark, dir, emb, K)
    val plans = scala.collection.mutable.ArrayBuffer[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      KnnGraphIndex.beamSearch(spark, dir,
        emb.where(col("vec_id") < 4)
          .select(col("vec_id").as("qid"), col("embedding").as("qe")),
        k = 3, beam = 3, hops = 2).collect()
      Thread.sleep(1000) // onSuccess fires async; let it drain
      val withGraphScan = plans.synchronized {
        plans.filter(p => p.contains("/graph") && p.contains("PushedFilters"))
      }
      assert(withGraphScan.nonEmpty, "no graph scan captured")
      assert(withGraphScan.exists(_.contains("In(vec_id")),
        "frontier IN-list never reached a graph scan:\n" +
          withGraphScan.mkString("\n---\n").take(4000))
    } finally spark.listenerManager.unregister(listener)
  }

  test("fuzz: exact-tie fixtures across batch splits still match one-shot") {
    import spark.implicits._
    // The merge's crux is tie order: identical embeddings give exactly
    // equal cos_sim, so top-k membership is decided purely by nid — and
    // a displaced existing vector's rewritten list must slot new tied
    // neighbors into the SAME positions the one-shot window would.
    // Clones deliberately span both batch parities.
    val dim = 48 // sigCol samples dims up to 41 (1-based)
    val base = Array.fill(dim)(0.5f)
    val rnd = new scala.util.Random(20260814L)
    val rows: Seq[(Long, Array[Float])] =
      (0L until 6L).map(i => i -> base.clone()) ++          // 6 exact clones
      (6L until 10L).map { i =>                             // near-clones
        val v = base.clone(); v(0) = 0.5f + (i - 8) * 1e-3f; i -> v
      } ++
      (10L until 40L).map { i =>                            // background noise
        i -> Array.fill(dim)(rnd.nextFloat() * 2 - 1)
      }
    val emb = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .localCheckpoint(true)

    def oneShotOf(e: org.apache.spark.sql.DataFrame) = {
      val sig = e.withColumn("sig", graft.queries.VectorOps.sigCol)
      val b = sig.select(col("sig"), col("vec_id").as("nid"), col("embedding").as("ne"))
      val cand = sig.join(b, Seq("sig")).where(col("vec_id") =!= col("nid"))
        .select(col("vec_id"), col("nid"),
          graft.queries.VectorOps.cosine(col("embedding"), col("ne")).as("cos_sim"))
      val w = Window.partitionBy("vec_id").orderBy(col("cos_sim").desc, col("nid"))
      cand.withColumn("rnk", row_number().over(w).cast("int"))
        .where(col("rnk") <= K)
        .select("vec_id", "nid", "rnk", "cos_sim")
        .orderBy("vec_id", "rnk").collect().toSeq.map(_.toSeq)
    }
    val expected = oneShotOf(emb)

    for ((splitName, parts) <- Seq(
        "mod2" -> Seq(emb.where(col("vec_id") % 2 === 0), emb.where(col("vec_id") % 2 === 1)),
        "clones-last" -> Seq(emb.where(col("vec_id") >= 6), emb.where(col("vec_id") < 6)),
        "mod3" -> Seq(0, 1, 2).map(r => emb.where(col("vec_id") % 3 === r)))) {
      val d = tmp()
      parts.foreach(p => KnnGraphIndex.add(spark, d, p, K))
      assert(graphOf(d) == expected, s"split $splitName diverged from one-shot")
    }
  }

  test("doctor: clean when healthy; counts dangling edges, torn rows, stale asides") {
    val dir = tmp()
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    KnnGraphIndex.add(spark, dir, emb.where(col("vec_id") % 2 === 0), K)
    KnnGraphIndex.add(spark, dir, emb.where(col("vec_id") % 2 =!= 0), K)
    val n = emb.count()

    def report(): (Long, Long, Long, Long, Long, Int) = {
      val r = KnnGraphIndex.doctor(spark, dir).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getInt(5))
    }
    assert(report() == ((n, 0L, 0L, 0L, 0L, 0)), "healthy graph must audit clean")

    // committed takedown re-routes lists: live shrinks, NOTHING dangles
    val victims = emb.select("vec_id").orderBy("vec_id").limit(2)
    KnnGraphIndex.remove(spark, dir, victims, K)
    assert(report() == ((n - 2, 0L, 0L, 0L, 0L, 0)),
      "post-takedown graph must still audit clean (reroute + dead filter)")

    // torn graph rows (no _gcommit_ marker): counted, invisible
    import spark.implicits._
    Seq((1L, 3L, 1, 0.5, 999L)).toDF("vec_id", "nid", "rnk", "cos_sim", "gen")
      .write.mode("append").parquet(s"$dir/graph")
    assert(report()._4 == 1L, "torn graph row must be counted")

    // a committed edge to a NEVER-existing id: the one shape reroute
    // and the dead filter cannot explain — a real violation
    val sample = spark.read.parquet(s"$dir/graph")
      .where(col("gen") =!= 999L)
      .orderBy(col("gen").desc, col("vec_id")).limit(1).head()
    Seq((sample.getAs[Long]("vec_id"), 987654321L, 99, -0.99,
        sample.getAs[Long]("gen")))
      .toDF("vec_id", "nid", "rnk", "cos_sim", "gen")
      .write.mode("append").parquet(s"$dir/graph")
    assert(report()._3 == 1L, "dangling edge must be counted")

    // torn tombstone rows and a stale swap aside
    Seq((998L, 5L)).toDF("gen", "vec_id")
      .write.mode("append").parquet(s"$dir/tombs")
    assert(report()._5 == 1L, "torn tombstone row must be counted")
    assert(new java.io.File(s"$dir/graph.old").mkdirs())
    assert(report()._6 == 1)
    assert(new java.io.File(s"$dir/graph.old").delete())
  }
}
