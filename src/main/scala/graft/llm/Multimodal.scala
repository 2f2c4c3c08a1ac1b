package graft.llm

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for a training-data pipeline: media
  * (image/audio/video) travels as an opaque `binary` column with typed
  * metadata; decode / feature-extract run as partition-local batch
  * functions.
  *
  * The actual codec step is STUBBED (no image/audio libs in this
  * container) behind [[MediaCodec]] — deterministic fakes — but the
  * Spark-side plumbing is real and tested: schema, batch iteration via
  * `mapPartitions` (one codec instance per partition, the same shape a
  * JNI/FFI decoder needs), partition sizing, and metadata projection.
  *
  * Scale notes: media bytes dominate I/O — keep them in their own column
  * so column pruning skips them for metadata-only queries; size
  * `spark.sql.files.maxPartitionBytes` so a partition of blobs fits in
  * executor memory; never collect payloads to the driver.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      digest: String,
      width: Int, // stubbed decode output
      height: Int,
      n_frames: Int)

  /** Decode: REAL container-header parsing where the payload carries a
    * recognized public byte layout — PNG's IHDR chunk and RIFF/WAVE's
    * fmt/data chunks, both plain offset arithmetic over documented
    * formats, no codec library needed — with a deterministic stub for
    * everything else (the PIXEL/SAMPLE decode itself stays stubbed: no
    * media libs in this container; a real deployment swaps in an FFI
    * codec behind the same object and everything else in the pipeline
    * is unchanged). MultimodalCodecSpec hand-builds structurally-real
    * containers and pins the parse offsets; malformed or truncated
    * structures fall back to the stub instead of throwing — a poison
    * blob must cost one bad row, never the partition. */
  object MediaCodec {
    def decode(row: MediaRow): MediaFeatures =
      parseContainer(row).getOrElse(stubDecode(row))

    private def digestOf(payload: Array[Byte]): (Array[Byte], String) = {
      val md = MessageDigest.getInstance("MD5").digest(payload)
      (md, md.map("%02x".format(_)).mkString)
    }

    private def stubDecode(row: MediaRow): MediaFeatures = {
      val (md, digest) = digestOf(row.payload)
      // ??? in spirit: fake-but-deterministic dimensions derived from bytes
      val w = 64 + (java.lang.Byte.toUnsignedInt(md(0)) % 64)
      val h = 64 + (java.lang.Byte.toUnsignedInt(md(1)) % 64)
      val frames = if (row.media_type == "video") 1 + (java.lang.Byte.toUnsignedInt(md(2)) % 30) else 1
      MediaFeatures(row.doc_id, row.media_type, row.payload.length, digest, w, h, frames)
    }

    private val PngSig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def be32(p: Array[Byte], off: Int): Long =
      ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
        ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)
    private def le32(p: Array[Byte], off: Int): Long =
      (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
        ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
    private def le16(p: Array[Byte], off: Int): Int =
      (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    private def tag(p: Array[Byte], off: Int): String =
      new String(p, off, 4, "US-ASCII")
    private def be16(p: Array[Byte], off: Int): Int =
      ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)

    /** JPEG marker walk, SOI already verified by the caller: segments
      * are [0xFF][marker][len be16 incl. itself][payload]; standalone
      * markers (TEM, RST0-7) carry no length. Returns (width, height)
      * from the first SOF0 (baseline) or SOF2 (progressive) frame
      * header, the two frame types virtually all real JPEGs use. The
      * same truncation posture as the RIFF walk: a declared length
      * overrunning the buffer, a stray non-0xFF byte where a marker
      * must start, or reaching scan data (SOS) / EOI without a SOF all
      * end the walk with None → stub. */
    private def jpegSof(p: Array[Byte]): Option[(Int, Int)] = {
      var off = 2
      while (off + 4 <= p.length) {
        if ((p(off) & 0xff) != 0xff) return None
        val m = p(off + 1) & 0xff
        if (m == 0xff) { off += 1 } // fill bytes before a marker
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { off += 2 } // standalone
        else if (m == 0xd9 || m == 0xda) return None // EOI / scan data: no SOF seen
        else {
          val len = be16(p, off + 2)
          if (len < 2 || off + 2 + len > p.length) return None
          if (m == 0xc0 || m == 0xc2) { // SOF0 / SOF2: [precision][h be16][w be16]
            if (len < 8) return None
            val h = be16(p, off + 5)
            val w = be16(p, off + 7)
            return if (w > 0 && h > 0) Some((w, h)) else None
          }
          off += 2 + len
        }
      }
      None
    }

    /** Header parse, offsets per the public specs, gated on the row's
      * DECLARED media type: PNG/JPEG only for `image`, RIFF/WAVE only
      * for `audio`. The gate is load-bearing for the poison-blob
      * contract — a WAV payload mislabeled `video` must NOT surface its
      * data_bytes/block_align sample-frame count as a video frame count
      * (downstream [[sampleFrames]] would explode one blob into millions
      * of rows); a mislabeled container takes the stub like any other
      * unrecognized payload, costing exactly one bounded row.
      *
      * PNG: 8-byte signature, then the IHDR chunk (length MUST be 13,
      * type at 12, big-endian width/height at 16/20); the CRC is not
      * verified — this is metadata extraction, not integrity checking.
      * JPEG: SOI marker, then a segment walk ([0xFF][marker][len be16,
      * includes itself]) to the first SOF0/SOF2 frame header (precision
      * at +2, height be16 at +3, width be16 at +5 inside the segment).
      * RIFF/WAVE: 'RIFF' + form size + 'WAVE', then a chunk walk
      * ([type 4][size le32][payload, word-aligned]) to 'fmt ' (channels
      * le16 at +2, sample rate le32 at +4, block align le16 at +12) and
      * 'data' (payload size = audio bytes). Feature mapping for audio:
      * width = sample rate, height = channels, n_frames = data bytes /
      * block align (sample frames). Any structural violation →
      * None → stub. */
    private[llm] def parseContainer(row: MediaRow): Option[MediaFeatures] =
      try {
        val p = row.payload
        if (row.media_type == "image" && p.length >= 33 && p.startsWith(PngSig)) {
          if (be32(p, 8) != 13L || tag(p, 12) != "IHDR") None
          else {
            val w = be32(p, 16)
            val h = be32(p, 20)
            if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
            else {
              val (_, digest) = digestOf(p)
              Some(MediaFeatures(row.doc_id, row.media_type, p.length,
                digest, w.toInt, h.toInt, 1))
            }
          }
        } else if (row.media_type == "image" && p.length >= 4 &&
            (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) {
          jpegSof(p).map { case (w, h) =>
            val (_, digest) = digestOf(p)
            MediaFeatures(row.doc_id, row.media_type, p.length, digest, w, h, 1)
          }
        } else if (row.media_type == "audio" && p.length >= 12 &&
            tag(p, 0) == "RIFF" && tag(p, 8) == "WAVE") {
          var off = 12
          var fmt: Option[(Int, Long, Int)] = None // (channels, rate, blockAlign)
          var dataBytes: Option[Long] = None
          while (off + 8 <= p.length && (fmt.isEmpty || dataBytes.isEmpty)) {
            val ct = tag(p, off)
            val sz = le32(p, off + 4)
            // a declared size overrunning the buffer marks a truncated/
            // corrupt container: stop the walk (also forecloses the
            // negative-step loop a huge unsigned size would cause)
            if (sz > p.length - off - 8) off = p.length
            else {
              if (ct == "fmt " && sz >= 16)
                fmt = Some((le16(p, off + 10), le32(p, off + 12), le16(p, off + 20)))
              if (ct == "data") dataBytes = Some(sz)
              off += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
            }
          }
          for ((ch, rate, ba) <- fmt; db <- dataBytes; if ba > 0) yield {
            val (_, digest) = digestOf(p)
            MediaFeatures(row.doc_id, row.media_type, p.length, digest,
              rate.toInt, ch, (db / ba).toInt)
          }
        } else None
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Batch feature extraction: one codec per partition, streamed rows —
    * the Scala analog of a pandas-batched UDF. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (expensive native handle)
      rows.map(MediaCodec.decode)
    }
  }

  final case class FrameRow(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** STUB resize: a real deployment decodes, resamples to `w`×`h`, and
    * re-encodes; the stub derives a deterministic payload of the
    * post-resize size (w·h/8 bytes) from the source bytes. The pipeline
    * shape is the real one: binary→binary per partition, codec reused
    * across the partition's rows, never a driver round-trip. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    require(w > 0 && h > 0, "resize dims must be positive")
    media.mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // per-partition codec state
      rows.map { r =>
        md.reset()
        val seed = md.digest(r.payload)
        val out = new Array[Byte](math.max(1, w * h / 8))
        var i = 0
        while (i < out.length) { out(i) = seed(i % seed.length); i += 1 }
        r.copy(payload = out)
      }
    }
  }

  /** Frame sampling: one video row → every `everyN`-th frame as its own
    * row. The one-to-many explode happens executor-side via `flatMap`
    * (bounded memory per row: frames stream out, the source payload is
    * never duplicated per frame beyond the emitted slice). Non-video rows
    * pass through as a single frame 0. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int = 1): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    require(everyN >= 1, "everyN must be >= 1")
    media.flatMap { r =>
      val f = MediaCodec.decode(r)
      // the documented contract regardless of what the container parse
      // reports (audio "frames" are sample frames, not sampleable units)
      val n = if (r.media_type == "video") f.n_frames else 1
      val idxs = 0 until n by everyN
      idxs.map { i =>
        // STUB frame extraction: a deterministic slice keyed by index; a
        // real codec seeks and decodes frame i here
        val len = math.max(1, math.min(16, r.payload.length))
        val slice = new Array[Byte](len)
        var j = 0
        while (j < len) { slice(j) = (r.payload(j % r.payload.length) ^ i).toByte; j += 1 }
        FrameRow(r.doc_id, i, slice)
      }
    }
  }

  /** Synthesize a media table from `documents` (text bytes as stand-in
    * payloads) — used by tests and the m-series queries. */
  def mediaFromDocuments(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }
}
