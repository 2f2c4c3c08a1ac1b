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

  test("resize emits post-resize-sized payloads, deterministically, executor-side") {
    val docs = Seq((0L, "hello world"), (1L, "some audio-ish text")).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val resized = Multimodal.resize(media, 32, 16).collect().sortBy(_.doc_id)
    assert(resized.forall(_.payload.length == 32 * 16 / 8))
    val again = Multimodal.resize(media, 32, 16).collect().sortBy(_.doc_id)
    assert(resized.zip(again).forall { case (a, b) => a.payload.sameElements(b.payload) })
    // different source bytes → different resized bytes (stub is content-keyed)
    assert(!resized(0).payload.sameElements(resized(1).payload))
  }

  test("sampleFrames explodes videos by stride and passes non-video through") {
    val docs = Seq(
      (0L, "img doc"), (2L, "a video payload with frames"), (3L, "img2")
    ).toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val nFrames = Multimodal.extractFeatures(media).collect()
      .map(f => f.doc_id -> f.n_frames).toMap

    val all = Multimodal.sampleFrames(media, everyN = 1).collect()
    assert(all.count(_.doc_id == 2L) == nFrames(2L)) // every video frame
    assert(all.count(_.doc_id == 0L) == 1) // image = single frame 0
    assert(all.filter(_.doc_id == 2L).map(_.frame_idx).sorted.toSeq ==
      (0 until nFrames(2L)).toSeq)

    val strided = Multimodal.sampleFrames(media, everyN = 4).collect()
    assert(strided.count(_.doc_id == 2L) == (nFrames(2L) + 3) / 4)
    // frame payloads differ by index (a real codec decodes distinct frames)
    val f = all.filter(_.doc_id == 2L).sortBy(_.frame_idx)
    if (f.length >= 2) assert(!f(0).payload.sameElements(f(1).payload))
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
