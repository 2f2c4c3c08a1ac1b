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
}
