package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Contract for the video-frame perceptual composition (exactness is
  * m8's oracle gate): container walk round-trips, torn containers clamp
  * to the frames before the tear, and a BMP re-encode's sampled frames
  * pair with the PNG original at Hamming 0.
  */
class VideoPhashSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def prefixed(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    for (f <- frames) {
      bos.write(Array(((f.length >> 24) & 0xFF).toByte,
        ((f.length >> 16) & 0xFF).toByte, ((f.length >> 8) & 0xFF).toByte,
        (f.length & 0xFF).toByte))
      bos.write(f)
    }
    bos.toByteArray
  }

  test("walkFrames round-trips; torn containers clamp, never throw") {
    val f0 = Array[Byte](1, 2, 3)
    val f1 = Array[Byte](4, 5)
    val whole = prefixed(Seq(f0, f1))
    assert(VideoPhash.walkFrames(whole).map(_._2.toSeq) ==
      Seq(f0.toSeq, f1.toSeq))
    // torn mid-frame: only the complete frame before the tear survives
    assert(VideoPhash.walkFrames(whole.dropRight(1)).map(_._2.toSeq) ==
      Seq(f0.toSeq))
    // torn mid-prefix
    assert(VideoPhash.walkFrames(whole.take(f0.length + 4 + 2)).map(_._2.toSeq) ==
      Seq(f0.toSeq))
    // length running past the end
    assert(VideoPhash.walkFrames(
      Array[Byte](0, 0, 0, 100, 1, 2)).isEmpty)
    // negative length (high bit set)
    assert(VideoPhash.walkFrames(
      Array[Byte](-1, -1, -1, -1, 1, 2)).isEmpty)
    assert(VideoPhash.walkFrames(Array.emptyByteArray).isEmpty)
  }

  test("re-encoded video's sampled frames pair at Hamming 0") {
    import spark.implicits._
    val docs = Seq(2L, 3L, 4L).toDF("doc_id") // 2 and 4 get BMP re-encodes
    val pairs = VideoPhash.nearDupFramePairs(docs, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // per even doc, sampled frames k=0 and k=2: (doc·16+k, doc·16+8+k)
    for (doc <- Seq(2L, 4L); k <- Seq(0, 2))
      assert(pairs.contains((doc * 16 + k, doc * 16 + 8 + k, 0)),
        s"missing re-encode pair for doc=$doc frame=$k in $pairs")
    // doc 3 has no re-encode: nothing pairs its frames at distance 0
    assert(!pairs.exists { case (a, b, _) =>
      a / 16 == 3L && b / 16 == 3L })
  }
}
