package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Deletion/tombstone contract of the stored kNN graph: removing ids
  * must leave the index indistinguishable from a one-shot build on the
  * surviving set (victims vanish as nodes AND neighbors; every affected
  * list is re-ranked over the remaining live bucket-mates, which can
  * PROMOTE a mate the stored top-k never kept), and re-adding a removed
  * id must land bit-for-bit on the never-removed build. Plus the crash
  * window the append-only layout adds: a torn tombstone append (files
  * without `_tcommit_`) is invisible, and compaction physically reclaims
  * folded tombstones.
  */
class KnnGraphTombstoneSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private val K = 3
  private lazy val spark = TestSpark.spark

  /** v9's one-shot plan over an arbitrary embedding frame. */
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
    java.nio.file.Files.createTempDirectory("graft-knngraph-tomb").toString

  private def ids(xs: Seq[Long]): DataFrame = {
    import spark.implicits._
    xs.toDF("vec_id")
  }

  test("remove equals the one-shot build on the surviving set") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val victims = emb.where(col("vec_id") % 5 === 2)
    val survivors = emb.where(col("vec_id") % 5 =!= 2)
    val d = tmp()
    KnnGraphIndex.add(spark, d, emb, K)
    val nAll = KnnGraphIndex.size(spark, d)
    KnnGraphIndex.remove(spark, d, victims.select("vec_id"), K)
    assert(graphOf(d) == oneShot(survivors),
      "post-removal graph must equal the never-added-the-victims build " +
        "(affected lists re-ranked over live mates, promotions included)")
    assert(KnnGraphIndex.size(spark, d) == nAll - victims.count())
    // removing already-removed ids is a no-op
    KnnGraphIndex.remove(spark, d, victims.select("vec_id"), K)
    assert(graphOf(d) == oneShot(survivors))
  }

  test("add -> remove -> add-again equals the never-removed build, bit-for-bit") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val expected = oneShot(emb)
    val d = tmp()
    KnnGraphIndex.add(spark, d, emb.where(col("vec_id") % 2 === 0), K)
    KnnGraphIndex.add(spark, d, emb.where(col("vec_id") % 2 =!= 0), K)
    val back = emb.where(col("vec_id") % 7 === 3)
    KnnGraphIndex.remove(spark, d, back.select("vec_id"), K)
    KnnGraphIndex.add(spark, d, back, K)
    assert(graphOf(d) == expected)
    assert(KnnGraphIndex.size(spark, d) == emb.count())
  }

  test("a vector left with zero live bucket-mates loses its list entirely") {
    import spark.implicits._
    // three vectors sharing one sign-LSH bucket (all hyperplane dims
    // positive), isolated from any corpus data by a fresh dir
    def vec(seed: Int): Array[Float] =
      Array.tabulate(64)(i => (0.1f + 0.01f * ((seed * 31 + i) % 7)))
    val emb = Seq((1L, vec(1)), (2L, vec(2)), (3L, vec(3)))
      .toDF("vec_id", "embedding")
    val d = tmp()
    KnnGraphIndex.add(spark, d, emb, K)
    assert(graphOf(d).nonEmpty)
    KnnGraphIndex.remove(spark, d, ids(Seq(2L, 3L)), K)
    // vector 1 appended no fresh rows (no live mates to rank); its stale
    // all-victim list must vanish through the read-side dead-nid filter
    assert(graphOf(d).isEmpty,
      "survivor with no live bucket-mates must resolve to an empty list")
    assert(KnnGraphIndex.size(spark, d) == 1L)
    // and a re-add restores the pairing exactly
    KnnGraphIndex.add(spark, d, emb.where(col("vec_id") === 2L), K)
    assert(graphOf(d) == oneShot(emb.where(col("vec_id") =!= 3L)))
  }

  test("torn tombstone append (no _tcommit_) is invisible to readers") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
      .where(col("vec_id") < 100)
    val d = tmp()
    KnnGraphIndex.add(spark, d, emb, K)
    val before = graphOf(d)
    // simulate the writer dying between the tombstone file write and the
    // marker create: rows land under tombs/ at a fresh generation but no
    // _tcommit_ admits them
    ids(Seq(0L, 1L, 2L)).select(lit(99L).as("gen"), col("vec_id"))
      .write.mode("append").parquet(s"$d/tombs")
    assert(graphOf(d) == before, "uncommitted tombstones must not apply")
    assert(KnnGraphIndex.size(spark, d) == emb.count())
  }

  test("compact reclaims tombstones and preserves the live graph") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val d = tmp()
    KnnGraphIndex.add(spark, d, emb.where(col("vec_id") < 250), K)
    KnnGraphIndex.add(spark, d, emb.where(col("vec_id") >= 250), K)
    KnnGraphIndex.remove(spark, d,
      emb.where(col("vec_id") % 5 === 2).select("vec_id"), K)
    val survivors = emb.where(col("vec_id") % 5 =!= 2)
    val before = oneShot(survivors)
    assert(graphOf(d) == before)
    KnnGraphIndex.compact(spark, d, numFiles = 2)
    assert(graphOf(d) == before)
    assert(KnnGraphIndex.size(spark, d) == survivors.count())
    // tombstones physically reclaimed: dir gone, no markers, and the
    // dead rows no longer exist in the vectors ledger
    val fs = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$d/tombs")))
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(d))
      .exists(_.getPath.getName.startsWith("_tcommit_")))
    assert(spark.read.parquet(s"$d/vectors").count() == survivors.count())
    // the index stays writable after the fold: a post-compact re-add of
    // a reclaimed id must not be blocked by any stale state
    KnnGraphIndex.add(spark, d,
      emb.where(col("vec_id") % 5 === 2), K)
    assert(graphOf(d) == oneShot(emb))
  }

  test("two racing adds keep the ledger consistent (WriterLock serializes)") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val (b1, b2) =
      (emb.where(col("vec_id") % 2 === 0), emb.where(col("vec_id") % 2 =!= 0))
    val d = tmp()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = Seq(b1, b2).map(b => new Thread(() =>
      try KnnGraphIndex.add(spark, d, b, K)
      catch { case t: Throwable => errs.add(t) }))
    threads.foreach(_.start())
    threads.foreach(_.join(300000))
    assert(errs.isEmpty, s"racing add failed: ${errs.peek()}")
    assert(graphOf(d) == oneShot(emb),
      "racing adds must serialize through the index WriterLock")
    assert(KnnGraphIndex.size(spark, d) == emb.count())
  }
}
