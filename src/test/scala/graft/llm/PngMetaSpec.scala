package graft.llm

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Chunk-walk clamps + strip contract for PNG metadata scrubbing
  * (closed-form counts are m9's oracle gate; this spec pins the hostile
  * classes the fixture can't carry and the validity of the stripped
  * container as seen by a REAL decoder).
  */
class PngMetaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def png(id: Long) = ImagePhash.encodeImage(id, 0)

  test("poison payloads: short, wrong signature, truncated, lying length, no IEND — walk refuses, never throws") {
    val good = png(7L)
    val cases = Seq[Array[Byte]](
      Array.empty,
      Array[Byte](1, 2, 3),
      "not a png at all, just text".getBytes("UTF-8"),
      good.dropRight(5),                       // torn mid-chunk
      good.take(8),                            // signature only
      {                                        // lying chunk length
        val b = good.clone(); b(8) = 0x7F; b
      },
      good.dropRight(12)                       // IEND removed
    )
    cases.foreach { c => assert(PngMeta.walk(c).isEmpty, s"len=${c.length}") }
  }

  test("inject then strip returns to the base stripped form; stripped PNG decodes") {
    val base = png(42L)
    val injected = PngMeta.inject(base, PngMeta.metaChunks(42L)).get
    assert(injected.length > base.length)
    val (strippedInj, droppedInj) = PngMeta.strip(injected).get
    val (strippedBase, _) = PngMeta.strip(base).get
    // whatever ancillary chunks the encoder itself wrote, stripping the
    // injected form and the base form must converge to the same bytes
    assert(java.util.Arrays.equals(strippedInj, strippedBase))
    assert(droppedInj.map(_._1).count(Set("tEXt", "tIME")) == PngMeta.metaChunks(42L).size)
    val img = ImageIO.read(new ByteArrayInputStream(strippedInj))
    assert(img != null && img.getWidth == ImagePhash.Side)
  }

  test("critical chunks survive byte-verbatim (CRCs stay valid)") {
    val base = png(3L)
    val (stripped, _) = PngMeta.strip(PngMeta.inject(base, PngMeta.metaChunks(3L)).get).get
    val kept = PngMeta.walk(stripped).get.map(_._3)
    assert(kept.head == "IHDR" && kept.last == "IEND" && kept.contains("IDAT"))
    assert(kept.forall(t => (t.charAt(0) & 0x20) == 0))
  }

  test("gate frame: poison doc ids are absent, healthy rows flagged ok") {
    import spark.implicits._
    val out = PngMeta.gate(Seq(0L, 1L, 6L).toDF("doc_id"))
      .as[(Long, Int, Long, Boolean, Boolean)].collect().toSeq.sortBy(_._1)
    // id 0: Author + GPS + tIME; id 1: Author only; id 6: all three
    assert(out.map(r => (r._1, r._2)) == Seq((0L, 3), (1L, 1), (6L, 3)))
    assert(out.forall(r => r._4 && r._5))
  }
}
