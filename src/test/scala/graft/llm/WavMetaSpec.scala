package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Chunk-walk clamps + strip contract for WAV metadata scrubbing
  * (closed-form counts are m11's oracle gate; this spec pins the
  * hostile classes the fixture can't carry, the byte-exact restore
  * invariant, and that a stripped container still DECODES through the
  * real sample path — the envelope hash is unchanged by the strip). */
class WavMetaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def wav(id: Long) = AudioFingerprint.encodeWav(id, 0)
  private def injected(id: Long) =
    WavMeta.inject(wav(id), WavMeta.listInfoChunk(WavMeta.metaTags(id))).get

  test("poison payloads: short, wrong magic, torn chunk, lying length — walk refuses, never throws") {
    val good = injected(7L)
    val cases = Seq[Array[Byte]](
      Array.empty,
      Array[Byte](1, 2, 3),
      "definitely not RIFF data here".getBytes("UTF-8"),
      good.take(11),                              // header torn mid-WAVE
      good.dropRight(3),                          // torn mid-data
      {                                           // lying chunk size
        val b = good.clone(); b(16) = 0x7F; b(17) = 0x7F; b
      })
    cases.foreach { c => assert(WavMeta.walk(c).isEmpty, s"len=${c.length}") }
  }

  test("strip restores the pre-injection container byte-exactly and is idempotent") {
    val base = wav(42L)
    val inj = injected(42L)
    assert(inj.length > base.length)
    val (stripped, metaBytes, nTags) = WavMeta.strip(inj).get
    assert(java.util.Arrays.equals(stripped, base))
    assert(metaBytes == (inj.length - base.length).toLong)
    assert(nTags == WavMeta.metaTags(42L).size)
    val (again, againBytes, _) = WavMeta.strip(stripped).get
    assert(againBytes == 0L && java.util.Arrays.equals(again, stripped))
  }

  test("stripped WAV still decodes: envelope hash unchanged by the strip") {
    for (id <- Seq(0L, 5L, 12L)) {
      val (stripped, _, _) = WavMeta.strip(injected(id)).get
      val hBase = AudioFingerprint.hashPayload(
        AudioFingerprint.AudioAsset(id * 4, id, 0, wav(id)))
      val hStripped = AudioFingerprint.hashPayload(
        AudioFingerprint.AudioAsset(id * 4, id, 0, stripped))
      assert(hBase.isDefined && hStripped.isDefined)
      assert(hBase.get.hash == hStripped.get.hash)
    }
  }

  test("a LIST chunk of a non-INFO form type survives the strip") {
    // LIST/adtl (cue labels) is NOT the PII carrier — only INFO drops.
    val adtl = {
      val tags = Seq(WavMeta.infoTag("labl", "cue-one"))
      val lc = WavMeta.listInfoChunk(tags)
      lc(8) = 'a'; lc(9) = 'd'; lc(10) = 't'; lc(11) = 'l'
      lc
    }
    val base = wav(9L)
    val withAdtl = WavMeta.inject(base, adtl).get
    val (stripped, metaBytes, nTags) = WavMeta.strip(withAdtl).get
    assert(metaBytes == 0L && nTags == 0)
    assert(java.util.Arrays.equals(stripped, withAdtl))
  }

  test("gate frame: tag counts follow the residue classes, invariants hold") {
    import spark.implicits._
    val out = WavMeta.gate(Seq(0L, 1L, 6L).toDF("doc_id"))
      .as[(Long, Int, Long, Boolean, Boolean)].collect().toSeq.sortBy(_._1)
    // id 0: IART + ICRD + ICMT; id 1: IART only; id 6: all three
    assert(out.map(r => (r._1, r._2)) == Seq((0L, 3), (1L, 1), (6L, 3)))
    assert(out.forall(r => r._4 && r._5))
  }
}
