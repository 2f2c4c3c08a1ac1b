package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.AudioFingerprint.{AudioAsset, AudioHash}

/** Contract for the perceptual audio near-dup pass (m5):
  *  - the REAL codec round-trip (synth → RIFF/WAVE bytes → chunk-walk
  *    PCM decode → integer envelope hash) reproduces the closed-form
  *    hash computed straight from the amplitude formula — the
  *    lossless-PCM invariant the DuckDB oracle gate rests on;
  *  - a byte-distinct container re-frame (extra LIST chunk) lands at
  *    Hamming distance 0 — the pair byte-digest dedup (m3) can never
  *    see;
  *  - the one-block perturbed variant is a near-dup (small distance)
  *    that the banded pairing still catches;
  *  - the hash is invariant to uniform GAIN (the design reason the
  *    fixture keys envelope SHAPE on doc_id);
  *  - poison payloads (garbage, truncation, wrong length/format) cost
  *    exactly one dropped row each, never a task failure;
  *  - the band equi-join is COMPLETE at the ≤7 threshold: pairs found
  *    by banding == pairs found by brute force.
  */
class AudioFingerprintSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Hash straight from the amplitude formula — no container in the
    * loop. Block |sample| sum = BlockLen·amp, so the threshold
    * `blockSum·64 > total` reduces to `amp·64 > Σamp`. */
  private def formulaHash(docId: Long, enc: Int): Long = {
    val amps = (0 until AudioFingerprint.Blocks)
      .map(m => AudioFingerprint.amp(docId, enc, m).toLong)
    val total = amps.sum
    var hash = 0L
    for (m <- 0 until AudioFingerprint.Blocks if amps(m) * 64 > total)
      hash |= 1L << m
    hash
  }

  private def docsDF(ids: Seq[Long]) = {
    import spark.implicits._
    ids.toDF("doc_id")
  }

  test("codec round-trip hash == closed-form hash for plain, re-framed, perturbed") {
    val hashed = AudioFingerprint.envelopeHash(
      AudioFingerprint.synthAssets(docsDF(0L to 23L)))
      .collect().map(h => (h.doc_id, h.enc) -> h.hash).toMap
    val expectedKeys = (0L to 23L).flatMap { id =>
      Seq(id -> 0) ++ (if (id % 2 == 0) Seq(id -> 1) else Nil) ++
        (if (id % 3 == 0) Seq(id -> 2) else Nil)
    }.toSet
    assert(hashed.keySet == expectedKeys)
    for (((d, e), got) <- hashed)
      assert(got == formulaHash(d, e), s"hash mismatch doc=$d enc=$e")
  }

  test("container re-frame is Hamming 0 on byte-distinct payloads; perturbation is near") {
    val assets = AudioFingerprint.synthAssets(docsDF(Seq(6L))).collect()
      .map(a => a.enc -> a).toMap
    // byte-distinct containers (the m3 digest would differ) ...
    assert(!java.util.Arrays.equals(assets(0).payload, assets(1).payload))
    // ... same fingerprint
    val h0 = formulaHash(6L, 0); val h1 = formulaHash(6L, 1); val h2 = formulaHash(6L, 2)
    assert(h0 == h1)
    val d02 = java.lang.Long.bitCount(h0 ^ h2)
    assert(d02 <= 7, s"perturbed variant drifted too far: $d02")
  }

  test("hash is invariant to uniform gain (envelope shape carries the identity)") {
    // scale every block amplitude 3x: same threshold sides, same hash
    def gainHash(docId: Long, g: Long): Long = {
      val amps = (0 until AudioFingerprint.Blocks)
        .map(m => AudioFingerprint.amp(docId, 0, m).toLong * g)
      val total = amps.sum
      var hash = 0L
      for (m <- 0 until AudioFingerprint.Blocks if amps(m) * 64 > total)
        hash |= 1L << m
      hash
    }
    for (id <- 0L to 9L) assert(gainHash(id, 1) == gainHash(id, 3))
  }

  test("poison payloads cost one row each, clean rows survive") {
    val clean = AudioFingerprint.synthAssets(docsDF(Seq(1L, 2L))).collect().toSeq
    val stereoOrShort = {
      // a structurally valid WAV whose data chunk is the wrong length
      val p = clean.head.payload.clone()
      p.take(44 + 10) // truncated mid-data
    }
    val poison = Seq(
      AudioAsset(900L, 900L, 0, Array[Byte](1, 2, 3)), // not RIFF
      AudioAsset(901L, 901L, 0, stereoOrShort),        // truncated data
      AudioAsset(902L, 902L, 0, Array.empty[Byte]),
      AudioAsset(903L, 903L, 0, "RIFFxxxxWAVE".getBytes("US-ASCII")), // no chunks
      // declared chunk size overruns the buffer (the truncation-walk stop)
      AudioAsset(904L, 904L, 0, clean.head.payload.take(60)))
    val out = AudioFingerprint.envelopeHash(
      spark.createDataset(clean ++ poison)(
        org.apache.spark.sql.Encoders.product[AudioAsset])).collect()
    assert(out.map(_.asset_id).sorted.toSeq == clean.map(_.asset_id).sorted.toSeq)
  }

  test("banded pairing is complete vs brute force at Hamming <= 7") {
    import spark.implicits._
    val hashes = AudioFingerprint.envelopeHash(
      AudioFingerprint.synthAssets(docsDF(0L to 59L)))
    val banded = AudioFingerprint.nearDupPairs(hashes, maxHamming = 7)
      .select("asset_a", "asset_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val hs = hashes.collect()
    val brute = (for {
      a <- hs; b <- hs if a.asset_id < b.asset_id
      d = java.lang.Long.bitCount(a.hash ^ b.hash)
      if d <= 7
    } yield (a.asset_id, b.asset_id, d)).toSet
    assert(banded == brute)
    // the planted re-frames are in there at distance 0
    for (id <- 0L to 59L if id % 2 == 0)
      assert(banded.contains((id * 4, id * 4 + 1, 0)), s"missing re-frame pair for doc $id")
  }

  test("pairing plan is cartesian-free") {
    val hashes = AudioFingerprint.envelopeHash(
      AudioFingerprint.synthAssets(docsDF(0L to 9L)))
    val plan = AudioFingerprint.nearDupPairs(hashes).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
