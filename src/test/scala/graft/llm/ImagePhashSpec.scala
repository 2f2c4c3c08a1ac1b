package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.ImagePhash.{ImageAsset, ImageHash}

/** Contract for the perceptual image near-dup pass (m4):
  *  - the REAL codec round-trip (synth → PNG/BMP bytes → ImageIO decode
  *    → integer aHash) reproduces the closed-form hash computed straight
  *    from the pixel formula — the lossless-codec invariant the DuckDB
  *    oracle gate rests on;
  *  - a byte-distinct lossless re-encode (BMP vs PNG) lands at Hamming
  *    distance 0 — the pair byte-digest dedup (m3) can never see;
  *  - the one-pixel perturbed variant is a near-dup (small distance)
  *    that the banded pairing still catches;
  *  - poison payloads (garbage, truncation, wrong dims) cost exactly
  *    one dropped row each, never a task failure;
  *  - the band equi-join is COMPLETE at the ≤7 threshold: pairs found
  *    by banding == pairs found by brute force.
  */
class ImagePhashSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Hash straight from the pixel formula — no codec in the loop. */
  private def formulaHash(docId: Long, enc: Int): Long = {
    val bs = new Array[Long](64)
    var total = 0L
    for (y <- 0 until ImagePhash.Side; x <- 0 until ImagePhash.Side) {
      val g = ImagePhash.pixel(docId, enc, x, y).toLong
      bs((y / ImagePhash.Block) * ImagePhash.Grid + (x / ImagePhash.Block)) += g
      total += g
    }
    var hash = 0L
    for (b <- 0 until 64 if bs(b) * 64 > total) hash |= 1L << b
    hash
  }

  private def docsDF(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("doc_id")
  }

  test("codec round-trip hash == closed-form hash for PNG, BMP, and perturbed") {
    import spark.implicits._
    val hashed = ImagePhash.avgHash(ImagePhash.synthAssets(docsDF(0L to 23L)))
      .collect().map(h => (h.doc_id, h.enc) -> h.hash).toMap
    // every expected asset hashed (no decode drops on clean fixtures)
    val expectedKeys = (0L to 23L).flatMap { id =>
      Seq(id -> 0) ++ (if (id % 2 == 0) Seq(id -> 1) else Nil) ++
        (if (id % 3 == 0) Seq(id -> 2) else Nil)
    }.map { case (d, e) => (d, e) }
    assert(hashed.keySet == expectedKeys.toSet)
    for (((d, e), got) <- hashed)
      assert(got == formulaHash(d, e), s"hash mismatch doc=$d enc=$e")
  }

  test("re-encode (BMP) is Hamming 0; one-pixel perturbation is a small near-dup") {
    val h0 = formulaHash(6L, 0); val h1 = formulaHash(6L, 1); val h2 = formulaHash(6L, 2)
    assert(h0 == h1) // same pixels, different container
    val d02 = java.lang.Long.bitCount(h0 ^ h2)
    assert(d02 <= 7, s"perturbed variant drifted too far: $d02")
  }

  test("poison payloads cost one row each, clean rows survive") {
    import spark.implicits._
    val clean = ImagePhash.synthAssets(docsDF(Seq(1L, 2L))).collect().toSeq
    val poison = Seq(
      ImageAsset(900L, 900L, 0, Array[Byte](1, 2, 3)), // not an image
      ImageAsset(901L, 901L, 0, clean.head.payload.take(10)), // truncated PNG
      ImageAsset(902L, 902L, 0, Array.empty[Byte]))
    // wrong-dimension image: a real PNG that is not Side×Side
    val tiny = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      ImageAsset(903L, 903L, 0, bos.toByteArray)
    }
    val out = ImagePhash.avgHash(
      spark.createDataset(clean ++ poison :+ tiny)).collect()
    assert(out.map(_.asset_id).sorted.toSeq == clean.map(_.asset_id).sorted.toSeq)
  }

  test("banded pairing is complete vs brute force at Hamming <= 7") {
    import spark.implicits._
    val hashes = ImagePhash.avgHash(ImagePhash.synthAssets(docsDF(0L to 59L)))
    val banded = ImagePhash.nearDupPairs(hashes, maxHamming = 7)
      .select("asset_a", "asset_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val hs = hashes.collect()
    val brute = (for {
      a <- hs; b <- hs if a.asset_id < b.asset_id
      d = java.lang.Long.bitCount(a.hash ^ b.hash)
      if d <= 7
    } yield (a.asset_id, b.asset_id, d)).toSet
    assert(banded == brute)
    // the planted re-encodes are in there at distance 0
    for (id <- 0L to 59L if id % 2 == 0)
      assert(banded.contains((id * 4, id * 4 + 1, 0)), s"missing BMP pair for doc $id")
  }

  test("pairing plan is cartesian-free") {
    val hashes = ImagePhash.avgHash(ImagePhash.synthAssets(docsDF(0L to 9L)))
    val plan = ImagePhash.nearDupPairs(hashes).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
