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

  /** STUB decode: deterministic pseudo-metadata from the payload bytes.
    * A real deployment swaps this object for an FFI codec; everything
    * else in the pipeline is unchanged. */
  object MediaCodec {
    def decode(row: MediaRow): MediaFeatures = {
      val md = MessageDigest.getInstance("MD5").digest(row.payload)
      val digest = md.map("%02x".format(_)).mkString
      // ??? in spirit: fake-but-deterministic dimensions derived from bytes
      val w = 64 + (java.lang.Byte.toUnsignedInt(md(0)) % 64)
      val h = 64 + (java.lang.Byte.toUnsignedInt(md(1)) % 64)
      val frames = if (row.media_type == "video") 1 + (java.lang.Byte.toUnsignedInt(md(2)) % 30) else 1
      MediaFeatures(row.doc_id, row.media_type, row.payload.length, digest, w, h, frames)
    }
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
      val idxs = 0 until f.n_frames by everyN
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
