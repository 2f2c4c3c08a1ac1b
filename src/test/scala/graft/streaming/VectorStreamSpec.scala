package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, Tables, TestSpark}

/** The streaming embedding ingest must leave the stored graph exactly
  * where the one-shot kNN-join (v9's gate plan) lands — regardless of
  * how the file source slices the corpus into micro-batches — and the
  * in-loop compaction cadence must fold generation deltas mid-stream
  * without changing the resolved graph.
  */
class VectorStreamSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("graphIngest: batched stream equals one-shot graph; cadence compacts mid-stream") {
    val base = Files.createTempDirectory("graft-vecstream").toString
    val landing = s"$base/landing"; val index = s"$base/index"
    val ckpt = s"$base/ckpt"

    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    // three landing files → three micro-batches at maxFilesPerTrigger=1
    for (r <- 0 to 2)
      emb.where(col("vec_id") % 3 === r).coalesce(1)
        .write.parquet(s"$landing/p$r")
    val schema = emb.schema

    VectorStream.graphIngest(spark, s"$landing/*", schema, index, ckpt,
      k = 3, maxFilesPerTrigger = 1, compactEvery = 2, compactTargetFiles = 2)
      .awaitTermination()

    // resolved graph == v9's one-shot gate over the same corpus
    val got = graft.llm.KnnGraphIndex.neighbors(spark, index)
      .orderBy("vec_id", "rnk").collect().toSeq.map(_.toSeq)
    val want = SparkEntry.queries("v9_knn_graph")(spark, sf)
      .collect().toSeq.map(_.toSeq)
    assert(got == want)

    // cadence proof: batches 0,1,2 with compactEvery=2 → the fold ran at
    // batch 1 (generations 1,2 → 0), batch 2 appended one more — so the
    // graph holds exactly two generations, not three
    val gens = spark.read.parquet(s"$index/graph")
      .select("gen").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(gens.length == 2 && gens.head == 0L,
      s"expected folded gen 0 + one delta, got $gens")

    // a re-run with nothing new to drain is a no-op
    VectorStream.graphIngest(spark, s"$landing/*", schema, index, ckpt,
      k = 3, maxFilesPerTrigger = 1).awaitTermination()
    val again = graft.llm.KnnGraphIndex.neighbors(spark, index)
      .orderBy("vec_id", "rnk").collect().toSeq.map(_.toSeq)
    assert(again == want)
  }
}
