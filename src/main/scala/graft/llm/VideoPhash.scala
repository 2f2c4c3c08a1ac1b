package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Video-frame perceptual dedup (m8 — VERDICT r12 #7): the composition
  * of m2's frame sampling with m4's aHash, end-to-end on REAL bytes. A
  * re-encoded video (same frames, different frame codec) is invisible
  * to m3's byte-digest frame dedup; sampling its frames and hashing
  * their PIXELS pairs it at Hamming 0 — the same argument that
  * motivated m4, one container level up.
  *
  * Container: a minimal length-prefixed frame stream (`[4-byte BE
  * length][frame bytes]`…, the AVI/IVF idea without the chrome), built
  * executor-side from real PNG (enc 0) / BMP (enc 1) frame images —
  * [[ImagePhash.encodeImage]]'s codecs, so enc 1 is a true re-encode:
  * different frame bytes, identical pixels (both lossless). Frame
  * extraction WALKS the container back (the m5 RIFF posture — parse
  * real bytes, not a formula), samples every [[SampleEvery]]-th frame,
  * and hashes each sampled frame through [[ImagePhash.hashPayload]]'s
  * decode. A torn container (length past the end, truncated prefix)
  * clamps to the frames before the tear — one bad asset never throws.
  *
  * Frame pixels are closed-form ([[ImagePhash.pixel]] keyed by
  * `fid = doc_id·131 + k·7 + 1`), so the DuckDB oracle can recompute
  * every sampled frame's hash from SQL while Spark's number travelled
  * through container + codec bytes. `asset_id = doc_id·16 + enc·8 + k`
  * (enc < 2, k < [[FramesPerVideo]] ≤ 8 — disjoint).
  *
  * 100 TB shape: synth/parse/hash are all partition-local over payload
  * bytes that never shuffle; pairing is the shared [[HammingLsh]] band
  * join — (band, byte) keys + one packed long per side, cartesian-free
  * (plan-asserted in PlanShapeSpec).
  */
object VideoPhash {

  val FramesPerVideo = 4
  val SampleEvery = 2

  /** One encoded video: `vid_id = doc_id*2 + enc`. */
  final case class VideoAsset(vid_id: Long, doc_id: Long, enc: Int,
      payload: Array[Byte])

  /** The frame's pixel-formula key — stated identically in the oracle
    * SQL. Independent of `enc`: a re-encode changes bytes, not pixels. */
  def frameId(docId: Long, k: Int): Long = docId * 131L + k * 7L + 1L

  private def be32(n: Int): Array[Byte] =
    Array(((n >> 24) & 0xFF).toByte, ((n >> 16) & 0xFF).toByte,
      ((n >> 8) & 0xFF).toByte, (n & 0xFF).toByte)

  /** Build the length-prefixed container for (doc, enc): every frame
    * image encoded with the enc's codec (PNG / BMP). */
  private def encodeVideo(docId: Long, enc: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    var k = 0
    while (k < FramesPerVideo) {
      val frame = ImagePhash.encodeImage(frameId(docId, k), enc)
      bos.write(be32(frame.length))
      bos.write(frame)
      k += 1
    }
    bos.toByteArray
  }

  /** Synthesize fixture videos from `documents`: a PNG-framed container
    * for every doc, a BMP-framed RE-ENCODE for even docs (byte-distinct
    * everywhere, pixel-identical frames — the planted dup class). */
  def synthVideos(documents: DataFrame): Dataset[VideoAsset] = {
    import documents.sparkSession.implicits._
    documents.select(col("doc_id").cast("long")).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory streams (m4's posture)
      ids.flatMap { id =>
        val encs = Seq(0) ++ (if (id % 2 == 0) Seq(1) else Nil)
        encs.iterator.map(e => VideoAsset(id * 2 + e, id, e, encodeVideo(id, e)))
      }
    }
  }

  /** Walk a length-prefixed container into (frame_idx, bytes). Torn
    * input clamps: a prefix that doesn't fit or a length running past
    * the end ends the walk at the frames already parsed. */
  private[llm] def walkFrames(payload: Array[Byte]): Seq[(Int, Array[Byte])] = {
    val out = Seq.newBuilder[(Int, Array[Byte])]
    var off = 0
    var k = 0
    var ok = true
    while (ok && off + 4 <= payload.length) {
      val len = ((payload(off) & 0xFF) << 24) | ((payload(off + 1) & 0xFF) << 16) |
        ((payload(off + 2) & 0xFF) << 8) | (payload(off + 3) & 0xFF)
      if (len < 0 || off + 4 + len > payload.length) ok = false
      else {
        out += ((k, java.util.Arrays.copyOfRange(payload, off + 4, off + 4 + len)))
        off += 4 + len
        k += 1
      }
    }
    out.result()
  }

  /** Sampled-frame perceptual hashes: parse each container, keep every
    * [[SampleEvery]]-th frame, decode + aHash via the m4 kernel.
    * Columns (asset_id, hash) — [[HammingLsh]]'s input shape. */
  def sampledFrameHashes(videos: Dataset[VideoAsset]): DataFrame = {
    import videos.sparkSession.implicits._
    videos.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { v =>
        walkFrames(v.payload).iterator
          .filter { case (k, _) => k % SampleEvery == 0 }
          .flatMap { case (k, bytes) =>
            ImagePhash.hashPayload(
              ImagePhash.ImageAsset(v.doc_id * 16 + v.enc * 8 + k,
                v.doc_id, v.enc, bytes))
              .map(h => (h.asset_id, h.hash))
          }
      }
    }.toDF("asset_id", "hash")
  }

  /** The m8 pipeline: synth → walk → sample → decode+hash → band-join
    * pairs within `maxHamming`. */
  def nearDupFramePairs(documents: DataFrame, maxHamming: Int = 7): DataFrame =
    HammingLsh.nearDupPairs(sampledFrameHashes(synthVideos(documents)), maxHamming)
}
