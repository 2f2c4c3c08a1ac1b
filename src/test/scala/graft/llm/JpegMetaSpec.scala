package graft.llm

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Marker-walk clamps + strip contract for JPEG metadata scrubbing
  * (closed-form counts are m10's oracle gate; this spec pins the
  * hostile classes the fixture can't carry, the verbatim-scan
  * guarantee, and the validity of the stripped container as seen by a
  * REAL decoder).
  */
class JpegMetaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def jpg(id: Long) = JpegMeta.encodeJpeg(id)

  test("poison payloads: short, wrong signature, torn segment, lying length, stray restart marker — walk refuses, never throws") {
    val good = jpg(7L)
    val lyingLen = {
      // first segment (right after SOI) declares a length past the buffer
      val b = good.clone(); b(4) = 0x7F.toByte; b
    }
    val strayRst = {
      // a restart marker cannot appear in the segment stream
      val b = good.clone(); b(3) = 0xD3.toByte; b
    }
    val cases = Seq[Array[Byte]](
      Array.empty,
      Array[Byte](1, 2, 3),
      "not a jpeg at all, just text".getBytes("UTF-8"),
      good.take(2),                            // SOI only
      good.take(5),                            // torn segment header
      lyingLen,
      strayRst
    )
    cases.foreach { c => assert(JpegMeta.walk(c).isEmpty, s"len=${c.length}") }
  }

  test("walk finds the scan; inject then strip converges to the base stripped form") {
    val base = jpg(42L)
    assert(JpegMeta.walk(base).isDefined)
    val injected = JpegMeta.inject(base, JpegMeta.metaSegments(42L)).get
    assert(injected.length > base.length)
    val (strippedInj, droppedInj) = JpegMeta.strip(injected).get
    val (strippedBase, _) = JpegMeta.strip(base).get
    // whatever APPn the encoder itself wrote, stripping the injected and
    // the base form must converge to the same bytes
    assert(java.util.Arrays.equals(strippedInj, strippedBase))
    assert(droppedInj.count(d => Set(0xE1, 0xED, 0xFE)(d._1)) ==
      JpegMeta.metaSegments(42L).size)
  }

  test("scan bytes survive verbatim and the stripped JPEG still decodes") {
    val base = jpg(3L)
    val injected = JpegMeta.inject(base, JpegMeta.metaSegments(3L)).get
    val (stripped, _) = JpegMeta.strip(injected).get
    val scanI = JpegMeta.walk(injected).get._2
    val scanS = JpegMeta.walk(stripped).get._2
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(injected, scanI, injected.length),
      java.util.Arrays.copyOfRange(stripped, scanS, stripped.length)))
    val img = ImageIO.read(new ByteArrayInputStream(stripped))
    assert(img != null && img.getWidth == ImagePhash.Side &&
      img.getHeight == ImagePhash.Side)
    // strip is idempotent: nothing left to drop
    val (again, droppedAgain) = JpegMeta.strip(stripped).get
    assert(droppedAgain.isEmpty && java.util.Arrays.equals(again, stripped))
  }

  test("kept segments are structural only (no COM/APP1-15 survive)") {
    val (stripped, _) =
      JpegMeta.strip(JpegMeta.inject(jpg(5L), JpegMeta.metaSegments(5L)).get).get
    val kept = JpegMeta.walk(stripped).get._1.map(_._3)
    assert(kept.forall(m => m != 0xFE && !(m >= 0xE1 && m <= 0xEF)))
  }

  test("gate frame: expected per-id counts, all invariants true") {
    import spark.implicits._
    val out = JpegMeta.gate(Seq(0L, 1L, 6L).toDF("doc_id"))
      .as[(Long, Int, Long, Boolean, Boolean, Boolean)].collect().toSeq.sortBy(_._1)
    // id 0: Exif + GPS + COM; id 1: Exif only; id 6: all three
    assert(out.map(r => (r._1, r._2)) == Seq((0L, 3), (1L, 1), (6L, 3)))
    assert(out.forall(r => r._4 && r._5 && r._6))
  }
}
