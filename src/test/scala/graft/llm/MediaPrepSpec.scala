package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Format-dispatching scrub + hash-preservation contract behind
  * p4_media_prep (the closed-form manifest is the oracle gate; this
  * spec pins the branches the pairing roster can't carry — the JPEG
  * dispatch, the pass-through, the poison clamp — and the invariant
  * the whole composition rests on: scrubbing never moves a hash).
  */
class MediaPrepSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("PNG branch: savings equal the injected chunk arithmetic") {
    val id = 42L
    val png = ImagePhash.encodeImage(id, 0)
    val (clean, removed) = MediaPrep.scrub(id, png).get
    val expected = PngMeta.metaChunks(id).map(_.length.toLong).sum
    assert(removed == expected)
    assert(clean.length <= png.length) // encoder ancillary chunks may also go
  }

  test("JPEG branch dispatches on signature and strips the injected segments") {
    val id = 9L
    val jpg = JpegMeta.encodeJpeg(id)
    val (_, removed) = MediaPrep.scrub(id, jpg).get
    assert(removed == JpegMeta.metaSegments(id).map(_.length.toLong).sum)
  }

  test("unknown container passes through untouched with zero savings") {
    val bmp = ImagePhash.encodeImage(7L, 1) // BMP: no metadata container
    val (clean, removed) = MediaPrep.scrub(7L, bmp).get
    assert(removed == 0L && (clean eq bmp))
  }

  test("poison container costs the row, never throws") {
    // PNG signature but torn: the PNG walk refuses -> None
    val torn = ImagePhash.encodeImage(3L, 0).take(20)
    assert(MediaPrep.scrub(3L, torn).isEmpty)
  }

  test("scrubbing never moves the perceptual hash") {
    import spark.implicits._
    val docs = Seq(0L, 1L, 5L, 6L, 12L).toDF("doc_id")
    val original = ImagePhash.avgHash(ImagePhash.synthAssets(docs))
      .collect().map(h => h.asset_id -> h.hash).toMap
    val scrubbed = MediaPrep.prep(docs)
      .collect().map(r => r.asset_id -> r.hash).toMap
    assert(scrubbed == original)
  }
}
