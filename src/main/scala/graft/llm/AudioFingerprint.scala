package graft.llm

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual (sample-level) audio near-duplicate detection — the audio
  * twin of [[ImagePhash]] (m4), filling the same gap m4 filled for
  * images: a re-encoded duplicate (same samples, different container
  * layout) has a different byte digest but the SAME audio content, and
  * byte-digest dedup (m2/m3) structurally cannot see it. Production
  * audio pipelines run an acoustic-fingerprint pass (the
  * Haitsma–Kalker / Philips robust-hash family, Chromaprint) for
  * exactly that reason.
  *
  * The fingerprint is an integer-exact 64-bit ENERGY-ENVELOPE hash (the
  * simplest member of the robust-hash family — the audio analog of
  * aHash): decode the PCM, partition the samples into 64 equal blocks,
  * bit m = 1 iff the block's absolute-amplitude SUM times 64 exceeds
  * the clip's total absolute-amplitude sum (block mean energy > global
  * mean energy, kept in pure integer arithmetic so the hash is
  * bit-identical across engines — no float energy, no rounding mode).
  * Near-dup pairing is the shared [[HammingLsh]] band equi-join
  * (complete ≤ 7 by pigeonhole — never a cartesian pair scan).
  *
  * Decode is REAL: payloads are RIFF/WAVE containers (16-bit PCM mono,
  * the public byte layout — hand-framed here, parsed back with a chunk
  * walk like [[Multimodal.MediaCodec]]'s), and the hash side reads
  * samples from the BYTES — the full encode→bytes→decode→hash path a
  * production pipeline runs, not a formula shortcut. Cross-engine
  * oracle-exactness comes from the FIXTURE being closed-form: each
  * clip's waveform alternates ±amp(doc_id, block) (below), PCM is
  * lossless, and the block's |sample| sum telescopes to
  * BlockLen·amp — so a DuckDB oracle recomputes the identical hash
  * from the amplitude formula in SQL while Spark's number travelled
  * through real container bytes. Re-encoded duplicates are planted by
  * construction: every doc gets a plain WAV (enc 0), even docs ALSO
  * get the same samples in a container with an extra LIST chunk
  * (enc 1 — different bytes, byte-dedup-invisible, Hamming 0 here),
  * and every third doc gets a one-block-perturbed clip (enc 2 — a
  * near-dup at small Hamming distance).
  *
  * The m4 formula lesson applies transposed: this hash thresholds
  * block energy vs global mean energy, so it is invariant to a uniform
  * GAIN change (every block scales together) — the fixture therefore
  * keys the envelope SHAPE on doc_id (per-block amplitude profile),
  * not an overall volume.
  *
  * Poison posture (the m-series clamp): a payload that fails to decode
  * — truncated container, not a WAV, wrong sample count/format — costs
  * exactly one dropped row, never the partition and never a throw
  * (AudioFingerprintSpec feeds garbage payloads).
  *
  * 100 TB shape: hashing is partition-local `mapPartitions` (payload
  * bytes never shuffle); pairing shuffles only (band, byte) keys + one
  * packed long per side (see [[HammingLsh]]). Reference:
  * tee8z/noaa-data-pipeline has nothing multimodal — this extends the
  * engine the way SURVEY §2's LLM additions do.
  */
object AudioFingerprint {

  /** One encoded clip: `asset_id = doc_id*4 + enc`. */
  final case class AudioAsset(asset_id: Long, doc_id: Long, enc: Int,
      payload: Array[Byte])

  /** 64-bit envelope hash packed into one long (bit m = block m; band
    * i = bits 8i..8i+7) — the [[ImagePhash.ImageHash]] packing, for the
    * same whole-stage-codegen pairing reason. */
  final case class AudioHash(asset_id: Long, doc_id: Long, enc: Int,
      hash: Long)

  val Blocks = 64       // fingerprint bits
  val BlockLen = 32     // samples per block
  val NSamples: Int = Blocks * BlockLen
  val SampleRate = 8000 // Hz, metadata only — the hash is rate-agnostic

  /** The deterministic fixture amplitude of block `m`: a doc_id-keyed
    * integer envelope in 1..251 (well inside 16-bit PCM), with enc 2
    * bumping exactly one doc_id-chosen block by +64. Pure long
    * arithmetic on non-negative operands — the DuckDB oracle states
    * the same expression in SQL. The doc enters through the envelope
    * SHAPE (block-indexed linear + quadratic terms), not a gain, for
    * the threshold-invariance reason in the scaladoc. */
  def amp(docId: Long, enc: Int, m: Int): Int = {
    val base = 1 + (((docId * 2654435761L) % 251) * (m + 1) +
      (1 + docId % 29) * ((m.toLong * m) % 97) + docId % 127) % 251
    val bump = if (enc == 2 && m == (docId % Blocks).toInt) 64 else 0
    (base + bump).toInt
  }

  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
  private def tag(out: ByteArrayOutputStream, t: String): Unit =
    out.write(t.getBytes("US-ASCII"))

  /** Frame the clip as a real RIFF/WAVE container (16-bit PCM mono,
    * offsets per the public spec). enc 1 carries the SAME samples but
    * inserts a doc-keyed LIST/INFO chunk between fmt and data — a
    * byte-distinct container any chunk-walking reader must skip. */
  private[llm] def encodeWav(docId: Long, enc: Int): Array[Byte] = {
    val dataBytes = NSamples * 2
    val listPayload: Array[Byte] =
      if (enc == 1) ("INFO" + f"gft${docId % 100}%03d").getBytes("US-ASCII")
      else Array.empty
    val listChunk = if (enc == 1) 8 + listPayload.length else 0
    val out = new ByteArrayOutputStream(44 + listChunk + dataBytes)
    tag(out, "RIFF"); le32(out, 4 + 24 + listChunk + 8 + dataBytes); tag(out, "WAVE")
    tag(out, "fmt "); le32(out, 16)
    le16(out, 1)            // PCM
    le16(out, 1)            // mono
    le32(out, SampleRate)
    le32(out, SampleRate * 2) // byte rate
    le16(out, 2)            // block align
    le16(out, 16)           // bits per sample
    if (enc == 1) { tag(out, "LIST"); le32(out, listPayload.length); out.write(listPayload) }
    tag(out, "data"); le32(out, dataBytes)
    var t = 0
    while (t < NSamples) {
      val a = amp(docId, enc, t / BlockLen)
      le16(out, (if ((t & 1) == 0) a else -a) & 0xffff)
      t += 1
    }
    out.toByteArray
  }

  /** Synthesize the fixture clips from `documents`: plain WAV for every
    * doc, a byte-distinct re-frame (extra LIST chunk) for even docs, a
    * one-block-perturbed clip for docs divisible by 3. Encode runs
    * executor-side per partition — the driver never sees payload
    * bytes. */
  def synthAssets(documents: DataFrame): Dataset[AudioAsset] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id").cast("long")).as[Long].mapPartitions { ids =>
      ids.flatMap { id =>
        val encs = Seq(0) ++ (if (id % 2 == 0) Seq(1) else Nil) ++
          (if (id % 3 == 0) Seq(2) else Nil)
        encs.iterator.map(e => AudioAsset(id * 4 + e, id, e, encodeWav(id, e)))
      }
    }
  }

  private def rle16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
  private def rle32(p: Array[Byte], off: Int): Long =
    (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
      ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
  private def rtag(p: Array[Byte], off: Int): String =
    new String(p, off, 4, "US-ASCII")

  /** Decode payload bytes (RIFF chunk walk → 16-bit PCM mono samples)
    * and compute the integer-exact 64-bit envelope hash. Returns None
    * for anything that is not a decodable [[NSamples]]-sample 16-bit
    * mono WAV — the poison clamp. The walk skips unknown chunks
    * (word-aligned) and stops on a declared size overrunning the
    * buffer, the [[Multimodal.MediaCodec]] truncation posture. */
  private[llm] def hashPayload(asset: AudioAsset): Option[AudioHash] =
    try {
      val p = asset.payload
      if (p.length < 12 || rtag(p, 0) != "RIFF" || rtag(p, 8) != "WAVE") None
      else {
        var off = 12
        var fmtOk = false
        var data: Option[(Int, Int)] = None // (offset, bytes)
        while (off + 8 <= p.length && (!fmtOk || data.isEmpty)) {
          val ct = rtag(p, off)
          val sz = rle32(p, off + 4)
          if (sz > p.length - off - 8) off = p.length // truncated: stop
          else {
            if (ct == "fmt " && sz >= 16)
              fmtOk = rle16(p, off + 8) == 1 && rle16(p, off + 10) == 1 &&
                rle16(p, off + 22) == 16 // PCM, mono, 16-bit
            if (ct == "data") data = Some((off + 8, sz.toInt))
            off += 8 + sz.toInt + (sz.toInt & 1)
          }
        }
        data match {
          case Some((d, bytes)) if fmtOk && bytes == NSamples * 2 =>
            val blockSum = new Array[Long](Blocks)
            var total = 0L
            var i = 0
            while (i < NSamples) {
              val s = (rle16(p, d + i * 2) << 16) >> 16 // sign-extend
              val a = math.abs(s).toLong
              blockSum(i / BlockLen) += a
              total += a
              i += 1
            }
            var hash = 0L
            var m = 0
            while (m < Blocks) {
              if (blockSum(m) * 64 > total) hash |= 1L << m
              m += 1
            }
            Some(AudioHash(asset.asset_id, asset.doc_id, asset.enc, hash))
          case _ => None
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Batch hash: partition-local, bad rows dropped. */
  def envelopeHash(assets: Dataset[AudioAsset]): Dataset[AudioHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(rows => rows.flatMap(hashPayload))
  }

  /** Near-dup pairs via the shared Hamming-band LSH. */
  def nearDupPairs(hashes: Dataset[AudioHash], maxHamming: Int = 7): DataFrame =
    HammingLsh.nearDupPairs(hashes.toDF, maxHamming)
}
