package graft.llm

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** The persistent IVF index lifecycle: full-probe search must equal the
  * exact brute-force ranking; appended vectors are immediately
  * retrievable without retraining.
  */
class VectorIndexSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.01"
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("full-probe search equals brute force; added vectors are retrievable") {
    val dir = Files.createTempDirectory("graft-vec-index").toString
    val embeddings = Tables.embeddings(spark, sf)
    val k = 8
    assert(VectorIndex.build(spark, dir, embeddings, k) == k)

    val vecs = embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val qids = vecs.keys.toSeq.sorted.take(5)
    val queries = qids.map(q => (q, vecs(q).toSeq)).toDF("qid", "qe")

    // full probe ⇒ exact: every cell is scanned
    val got = VectorIndex.search(spark, dir, queries, k = 5, nprobe = k)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap
    for (q <- qids) {
      val exact = vecs.keySet.filter(_ != q).toSeq
        .sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(5)
      assert(got(q) == exact, s"query $q: ${got(q)} vs $exact")
    }

    // append a near-copy of query 0's vector under a fresh id: top-1 for
    // that query must become the planted neighbor, no retrain needed
    val planted = 900000L
    val plantedVec = vecs(qids.head).map(x => x * 1.0001f)
    VectorIndex.add(spark, dir,
      Seq((planted, plantedVec.toSeq)).toDF("vec_id", "embedding"))
    val after = VectorIndex.search(spark, dir,
      queries.where(col("qid") === qids.head), k = 1, nprobe = k).collect()
    assert(after.head.getLong(1) == planted,
      s"planted neighbor not found: ${after.mkString}")

    // scale shape: the vectors table is cell-partitioned and the search
    // plan prunes it DYNAMICALLY off the broadcast probe side — at scale
    // a search reads the nprobe probed inverted lists' files, never the
    // corpus (the executed plan's scan carries a dynamicpruning
    // partition filter on cell)
    val searched = VectorIndex.search(spark, dir, queries, k = 5, nprobe = 2)
    searched.collect()
    val planStr = searched.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruningexpression(cell"),
      "search must dynamic-partition-prune the vectors scan on cell")

    // index health: every vector (incl. the append) is in exactly one cell
    val stats = VectorIndex.cellStats(spark, dir).collect()
    assert(stats.map(_.getLong(1)).sum == vecs.size + 1)
    assert(stats.forall(_.getInt(0) < k))

    // re-delivered append: the vec_id ledger drops it, no duplicate rows
    VectorIndex.add(spark, dir,
      Seq((planted, plantedVec.toSeq)).toDF("vec_id", "embedding"))
    assert(VectorIndex.cellStats(spark, dir).collect()
      .map(_.getLong(1)).sum == vecs.size + 1)

    // rebuild commits a NEW version atomically; search serves it, and
    // the appended vector survives only if re-added (a rebuild re-trains
    // from the frame it was given)
    assert(VectorIndex.build(spark, dir, embeddings, k) == k)
    val rebuilt = VectorIndex.search(spark, dir, queries, k = 5, nprobe = k)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap
    for (q <- qids) {
      val exact = vecs.keySet.filter(_ != q).toSeq
        .sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(5)
      assert(rebuilt(q) == exact, s"post-rebuild query $q diverged")
    }
  }

  test("takedown: removed vectors stop being neighbors; re-add revives; torn marker invisible") {
    val dir = Files.createTempDirectory("graft-vec-takedown").toString
    val embeddings = Tables.embeddings(spark, sf)
    val k = 8
    VectorIndex.build(spark, dir, embeddings, k)
    val vecs = embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = vecs.keys.min
    val queries = Seq((q, vecs(q).toSeq)).toDF("qid", "qe")
    def top5(): Seq[Long] =
      VectorIndex.search(spark, dir, queries, k = 5, nprobe = k)
        .collect().sortBy(_.getInt(2)).map(_.getLong(1)).toSeq
    def exactTop5(excluded: Set[Long]): Seq[Long] =
      vecs.keySet.filter(n => n != q && !excluded(n)).toSeq
        .sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(5)

    val victims = top5().take(2)
    VectorIndex.remove(spark, dir, victims.toDF("vec_id"))
    assert(top5() == exactTop5(victims.toSet),
      "removed vectors must vanish from every neighbor list")
    // idempotent; never-present ids are no-ops
    VectorIndex.remove(spark, dir, (victims :+ 987654321L).toDF("vec_id"))
    assert(top5() == exactTop5(victims.toSet))
    assert(VectorIndex.cellStats(spark, dir).collect()
      .map(_.getLong(1)).sum == vecs.size - 2)

    // re-add one victim: a fresh membership above its tombstone
    VectorIndex.add(spark, dir,
      Seq((victims.head, vecs(victims.head).toSeq)).toDF("vec_id", "embedding"))
    assert(top5() == exactTop5(Set(victims(1))),
      "re-added vector must be a neighbor again")

    // torn tombstone: an append whose _tcommit_ never landed is invisible
    val verDir = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v")).map(_.toString).max
    VectorIndex.remove(spark, dir, Seq(victims.head).toDF("vec_id"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmarks = fs.listStatus(new org.apache.hadoop.fs.Path(verDir))
      .map(_.getPath.getName).filter(_.startsWith("_tcommit_")).sorted
    fs.delete(new org.apache.hadoop.fs.Path(verDir, tmarks.last), false)
    assert(top5() == exactTop5(Set(victims(1))),
      "torn tombstone append must be invisible to readers")
  }

  test("compact reclaims tombstones bit-for-bit; legacy flat dirs upgrade") {
    val dir = Files.createTempDirectory("graft-vec-compact").toString
    val embeddings = Tables.embeddings(spark, sf)
    val k = 8
    VectorIndex.build(spark, dir, embeddings, k)
    val vecs = embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = vecs.keys.min
    val queries = Seq((q, vecs(q).toSeq)).toDF("qid", "qe")
    def results(): Seq[(Long, Long, Int)] =
      VectorIndex.search(spark, dir, queries, k = 5, nprobe = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    def liveVersion(): java.io.File = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v")).maxBy(_.getName)

    val victims = results().map(_._2).take(2)
    VectorIndex.remove(spark, dir, victims.toDF("vec_id"))
    val before = results()
    VectorIndex.compact(spark, dir)
    assert(results() == before, "compact must not change search results")
    val ver = liveVersion()
    assert(!new java.io.File(ver, "tombs").exists(),
      "tombstones must not carry into the compacted version")
    assert(new java.io.File(ver, "vectors").listFiles()
      .exists(_.getName.startsWith("cell=")),
      "compacted vectors must be cell-partitioned")
    assert(VectorIndex.cellStats(spark, dir).collect()
      .map(_.getLong(1)).sum == vecs.size - 2)

    // copy the compacted version NOW (all rows live, gen 0, distinct ids)
    // into the legacy fixture's pre-partitioning, pre-gen on-disk shape —
    // before the cycle below appends more rows into it
    val snapVer = liveVersion().toString
    val legacy = Files.createTempDirectory("graft-vec-legacy").toString
    val legacyVer = s"$legacy/v00000001"
    spark.read.parquet(s"$snapVer/centroids").write.parquet(s"$legacyVer/centroids")
    spark.read.parquet(s"$snapVer/vectors")
      .select("vec_id", "embedding", "cell") // no gen column, flat layout
      .coalesce(2).write.parquet(s"$legacyVer/vectors")

    // the generation ledger restarts in the new version: remove + re-add
    // of a LIVE id still cycles correctly after a compact
    val cycled = before.head._2
    VectorIndex.remove(spark, dir, Seq(cycled).toDF("vec_id"))
    VectorIndex.add(spark, dir,
      Seq((cycled, vecs(cycled).toSeq)).toDF("vec_id", "embedding"))
    assert(results() == before, "post-compact remove/re-add cycle diverged")

    // ---- legacy flat (pre-partitioning, pre-gen) dir upgrades in place ----
    val fs = new org.apache.hadoop.fs.Path(legacy)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(legacy, "_commit_v00000001"), true).close()
    def legacyResults(): Seq[(Long, Long, Int)] =
      VectorIndex.search(spark, legacy, queries, k = 5, nprobe = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(legacyResults() == before, "legacy flat dir must serve identically")
    // an append to a flat dir stays flat (no mixed layout), rows read back
    VectorIndex.remove(spark, legacy, Seq(before.head._2).toDF("vec_id"))
    VectorIndex.add(spark, legacy,
      Seq((before.head._2, vecs(before.head._2).toSeq)).toDF("vec_id", "embedding"))
    assert(legacyResults() == before, "legacy remove/re-add cycle diverged")
    assert(!new java.io.File(s"$legacyVer/vectors").listFiles()
      .exists(_.getName.startsWith("cell=")), "legacy append must stay flat")
    // compact rewrites the legacy dir into the modern partitioned layout
    VectorIndex.compact(spark, legacy)
    assert(legacyResults() == before, "legacy compact diverged")
    assert(new java.io.File(legacy).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v")).maxBy(_.getName)
      .toPath.resolve("vectors").toFile.listFiles()
      .exists(_.getName.startsWith("cell=")),
      "compacted legacy vectors must be cell-partitioned")
  }

  test("racing add/remove vs compact keeps the search contract") {
    // concurrent maintainers serialize on the WriterLock: any interleave
    // of appends, a takedown of pre-seeded ids (never re-added by the
    // racers, so the end state is interleave-independent), and a
    // reclamation compact must land on the exact filtered top-k
    val dir = Files.createTempDirectory("graft-vec-race").toString
    val embeddings = Tables.embeddings(spark, sf)
    val k = 8
    VectorIndex.build(spark, dir, embeddings.where(col("vec_id") % 4 === 0), k)
    val vecs = embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val victims = vecs.keySet.filter(_ % 4 == 0).toSeq.sorted.take(2)

    val pool = java.util.concurrent.Executors.newFixedThreadPool(5)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val tasks: Seq[Runnable] = (1 until 4).map[Runnable] { part => () =>
      try VectorIndex.add(spark, dir,
        embeddings.where(col("vec_id") % 4 === part)
          .select("vec_id", "embedding"))
      catch { case t: Throwable => failures.add(t) }
    } :+ ({ () =>
      try VectorIndex.compact(spark, dir)
      catch { case t: Throwable => failures.add(t) }
    }: Runnable) :+ ({ () =>
      try VectorIndex.remove(spark, dir, victims.toDF("vec_id"))
      catch { case t: Throwable => failures.add(t) }
    }: Runnable)
    tasks.foreach(pool.execute)
    pool.shutdown()
    assert(pool.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS))
    assert(failures.isEmpty, s"concurrent maintainer failed: ${failures.peek()}")

    val q = vecs.keys.max
    val got = VectorIndex.search(spark, dir,
        Seq((q, vecs(q).toSeq)).toDF("qid", "qe"), k = 5, nprobe = k)
      .collect().sortBy(_.getInt(2)).map(_.getLong(1)).toSeq
    val exact = vecs.keySet.filter(n => n != q && !victims.contains(n)).toSeq
      .sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(5)
    assert(got == exact, s"racing maintainers broke the search contract: $got vs $exact")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "_writer_lock")))
  }

  test("doctor: clean on healthy state; counts misassignment, torn state, dead builds") {
    val dir = Files.createTempDirectory("graft-vec-doctor").toString
    val embeddings = Tables.embeddings(spark, sf)
    val k = 8
    VectorIndex.build(spark, dir, embeddings, k)
    val n = embeddings.count()

    def report(): (Long, Long, Long, Long, Int) = {
      val r = VectorIndex.doctor(spark, dir).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))
    }
    assert(report() == ((n, 0L, 0L, 0L, 0)), "healthy index must audit clean")

    // a committed takedown just shrinks live; nothing else moves
    val victims = embeddings.select("vec_id").orderBy("vec_id").limit(2)
    VectorIndex.remove(spark, dir, victims)
    assert(report() == ((n - 2, 0L, 0L, 0L, 0)))

    val verDir = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d{8}"))
      .maxBy(_.getName).getAbsolutePath

    // torn tombstone rows (no marker): counted, live unchanged
    victims.select(lit(999L).as("gen"), col("vec_id"))
      .write.mode("append").parquet(s"$verDir/tombs")
    assert(report() == ((n - 2, 0L, 0L, 2L, 0)))

    // a vector forged into the WRONG inverted list: real corruption —
    // probes under the assignment metric never open its cell
    val seedRow = spark.read.option("mergeSchema", "true")
      .parquet(s"$verDir/vectors").where(col("vec_id") === 5)
      .select("embedding", "cell").head()
    val seed = seedRow.getSeq[Float](0)
    val wrongCell = (seedRow.getInt(1) + 1) % k
    Seq((900001L, seed, 0L)).toDF("vec_id", "embedding", "gen")
      .withColumn("cell", lit(wrongCell))
      .write.partitionBy("cell").mode("append").parquet(s"$verDir/vectors")
    val afterForge = report()
    assert(afterForge._3 == 1L,
      s"forged wrong-cell vector must be counted misassigned: $afterForge")

    // a build that died before its commit marker: inert, counted
    assert(new java.io.File(s"$dir/v99999999").mkdirs())
    assert(report()._5 == 1, "dead build dir must be counted")
    assert(new java.io.File(s"$dir/v99999999").delete())

    // retrain repairs what compact would carry: fresh assignment, fresh
    // version, no tombstones
    VectorIndex.build(spark, dir, embeddings, k)
    assert(report() == ((n, 0L, 0L, 0L, 0)),
      "a rebuild must audit clean again")
  }

  test("filtered search: allow-list pre-filters candidates, keeps cell pruning") {
    val dir = Files.createTempDirectory("graft-vec-filtered").toString
    val embeddings = Tables.embeddings(spark, sf)
    val k = 8
    VectorIndex.build(spark, dir, embeddings, k)
    val vecs = embeddings.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = vecs.keys.min
    val queries = Seq((q, vecs(q).toSeq)).toDF("qid", "qe")
    val eligibleIds = vecs.keySet.filter(_ % 3 == 1)
    val eligible = eligibleIds.toSeq.toDF("vec_id")

    // full probe + allow-list == exact top-k over the eligible slice
    val got = VectorIndex.search(spark, dir, queries, k = 5, nprobe = k,
      eligible = Some(eligible))
    val rows = got.collect().sortBy(_.getInt(2)).map(_.getLong(1)).toSeq
    val exact = eligibleIds.filter(_ != q).toSeq
      .sortBy(n => (-cos(vecs(q), vecs(n)), n)).take(5)
    assert(rows == exact, s"filtered search diverged: $rows vs $exact")
    assert(rows.forall(eligibleIds), "a non-eligible id leaked into the result")

    // pre-filtering must not break the dynamic cell pruning (the scan
    // still reads only probed inverted lists at scale)
    val pruned = VectorIndex.search(spark, dir, queries, k = 5, nprobe = 2,
      eligible = Some(eligible))
    pruned.collect()
    assert(pruned.queryExecution.executedPlan.toString
      .contains("dynamicpruningexpression(cell"),
      "filtered search lost the dynamic partition pruning on cell")
  }
}
