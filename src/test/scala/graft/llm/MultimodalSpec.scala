package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binary payload plumbing: schema, partition-local decode, determinism") {
    val docs = Seq(
      (0L, "hello world"), (1L, "some audio-ish text"), (2L, "a video payload"), (3L, "x")
    ).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    assert(media.schema("payload").dataType.typeName == "binary")

    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(feats.length == 4)
    assert(feats.map(_.media_type).toSeq == Seq("image", "audio", "video", "image"))
    assert(feats(0).n_bytes == "hello world".getBytes("UTF-8").length)
    assert(feats(0).digest == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
    assert(feats.forall(f => f.width >= 64 && f.width < 128))
    assert(feats.forall(f => f.media_type == "video" || f.n_frames == 1))
    assert(feats(2).n_frames >= 1)

    // determinism: re-run produces identical features
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(again.toSeq == feats.toSeq)
  }

  test("metadata-only projection prunes the payload column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString + "/media"
    val docs = Seq((0L, "abc"), (1L, "defg")).toDF("doc_id", "text")
    Multimodal.mediaFromDocuments(spark, docs).write.parquet(dir)
    val scan = spark.read.parquet(dir).select("doc_id", "media_type")
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("payload"))
  }
}
