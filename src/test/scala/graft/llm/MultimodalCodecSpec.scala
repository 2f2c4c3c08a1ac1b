package graft.llm

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.llm.Multimodal.{MediaCodec, MediaRow}

/** Container-parse contract for the media codec: hand-built,
  * structurally-real PNG and RIFF/WAVE byte layouts must parse to their
  * declared dimensions/frame counts THROUGH the distributed
  * extractFeatures path (so the mapPartitions plumbing, not just the
  * function, is under test), and every malformed variant must fall back
  * to the deterministic stub — one bad blob costs one stubbed row,
  * never a task failure. These are the exact offsets a real FFI codec
  * swap would inherit.
  */
class MultimodalCodecSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def le32(v: Long): Array[Byte] =
    Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >> 8).toByte)

  /** Minimal structurally-valid PNG: signature + IHDR(13 bytes: width,
    * height, bit depth 8, color type 2, 0, 0, 0) + dummy CRC. */
  private def png(w: Long, h: Long): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.write(be32(13))
    out.write("IHDR".getBytes("US-ASCII"))
    out.write(be32(w)); out.write(be32(h))
    out.write(Array[Byte](8, 2, 0, 0, 0))
    out.write(be32(0)) // CRC not verified by the parser (metadata-only)
    out.toByteArray
  }

  /** Minimal RIFF/WAVE: RIFF header + a JUNK chunk (forces a real chunk
    * walk with word-alignment: odd size 3 pads to 4) + PCM fmt  chunk
    * (channels, rate, block align) + data chunk of `dataBytes`. */
  private def wav(channels: Int, rate: Long, blockAlign: Int,
      dataBytes: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(0)) // size unchecked
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("JUNK".getBytes("US-ASCII")); out.write(le32(3))
    out.write(Array[Byte](1, 2, 3, 0)) // 3 bytes + 1 pad (word alignment)
    out.write("fmt ".getBytes("US-ASCII")); out.write(le32(16))
    out.write(le16(1)) // PCM
    out.write(le16(channels))
    out.write(le32(rate))
    out.write(le32(rate * blockAlign)) // byte rate
    out.write(le16(blockAlign))
    out.write(le16(8 * blockAlign / channels)) // bits per sample
    out.write("data".getBytes("US-ASCII")); out.write(le32(dataBytes))
    out.write(new Array[Byte](dataBytes))
    out.toByteArray
  }

  test("PNG IHDR and RIFF/WAVE parse to declared metadata through extractFeatures") {
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "image", png(640, 360)),
      MediaRow(2L, "audio", wav(channels = 2, rate = 8000, blockAlign = 4,
        dataBytes = 800)),
      MediaRow(3L, "image", "just some text bytes".getBytes("UTF-8")))
    val got = Multimodal.extractFeatures(spark.createDataset(rows))
      .collect().map(f => f.doc_id -> f).toMap

    assert(got(1L).width == 640 && got(1L).height == 360 && got(1L).n_frames == 1)
    assert(got(2L).width == 8000, "audio width = sample rate")
    assert(got(2L).height == 2, "audio height = channels")
    assert(got(2L).n_frames == 200, "800 data bytes / block align 4")
    // non-container payload takes the stub path (its dimension range)
    assert(got(3L).width >= 64 && got(3L).width < 128)
    assert(got(3L).n_bytes == rows(2).payload.length)
  }

  test("malformed containers fall back to the stub, never throw") {
    val pngBytes = png(640, 360)
    val cases = Seq(
      "truncated PNG" -> pngBytes.take(20),
      "PNG with wrong IHDR length" -> {
        val b = pngBytes.clone(); b(11) = 14; b
      },
      "PNG zero width" -> png(0, 360),
      "RIFF without data chunk" -> wav(2, 8000, 4, 800).dropRight(808),
      "RIFF data size overrunning the buffer" -> {
        val b = wav(2, 8000, 4, 8).clone()
        // the data chunk's le32 size field starts 12 bytes from the end
        // (4 size + 8 data); inflate its second byte → declared size
        // 0x7f08 ≫ buffer
        b(b.length - 11) = 0x7f
        b
      },
      "empty payload" -> Array.emptyByteArray)
    for ((name, bytes) <- cases) {
      val f = MediaCodec.decode(MediaRow(9L, "image", bytes))
      assert(f.width >= 64 && f.width < 128, s"$name: expected stub path, got $f")
      assert(f.n_bytes == bytes.length, name)
    }
  }

  test("frame sampling honors the video-only contract with parsed containers") {
    import spark.implicits._
    // an audio container parsing to 200 sample frames must still sample
    // as ONE unit — sample frames are not sampleable video frames
    val rows = Seq(MediaRow(1L, "audio", wav(2, 8000, 4, 800)))
    val frames = Multimodal.sampleFrames(spark.createDataset(rows)).collect()
    assert(frames.length == 1 && frames.head.frame_idx == 0)
  }
}
