package graft.queries

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** m1/m2/m3's frame contract operates in the BYTE domain — slices of the
  * binary payload, digested directly. The SQL oracle can only witness
  * that on ASCII corpora (DuckDB has no BLOB substring/md5, so it
  * char-slices the VARCHAR), so THIS spec is where the bytewise
  * semantics are pinned: multi-byte UTF-8 payloads whose 16-byte frames
  * cut through the middle of codepoints, checked against JVM-computed
  * md5 of the exact byte ranges. A char-domain implementation (frames =
  * 16 CHARS) fails these fixtures immediately.
  */
class FrameSampleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def jvmMd5(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Expected (frame_idx, md5, n_bytes) per the contract: 16-byte
    * frames, keep every 4th, at least one frame even for empty input. */
  private def expectedFrames(text: String): Seq[(Int, String, Int)] = {
    val payload = text.getBytes(StandardCharsets.UTF_8)
    val nFrames = math.max(math.ceil(payload.length / 16.0).toInt, 1)
    (0 until nFrames).filter(_ % 4 == 0).map { i =>
      val slice = payload.slice(i * 16, math.min((i + 1) * 16, payload.length))
      (i, jvmMd5(slice), slice.length)
    }
  }

  private def sparkFrames(texts: Seq[(Long, String)]): Map[Long, Seq[(Int, String, Int)]] = {
    import spark.implicits._
    TextOps.sampledFrames(texts.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getString(2), r.getInt(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
  }

  test("multi-byte payloads: frames are BYTE slices, even mid-codepoint") {
    // 'é' = 2 bytes, '€' = 3 bytes, '𝄞' = 4 bytes (surrogate pair in
    // UTF-16, one codepoint) — lengths chosen so frame boundaries land
    // inside codepoints. A char-sliced implementation produces different
    // digests AND different frame counts.
    val texts = Seq(
      1L -> ("é" * 100),              // 200 bytes / 100 chars
      2L -> ("€" * 70),               // 210 bytes / 70 chars
      3L -> ("𝄞abc" * 40),            // 280 bytes / 200 UTF-16 units
      4L -> "héllo wörld €42 𝄞 end.", // mixed, boundary mid-€
      5L -> "")                       // empty → one empty frame
    val got = sparkFrames(texts)
    for ((id, text) <- texts)
      assert(got(id) == expectedFrames(text), s"doc $id diverged")
  }

  test("ascii payloads: byte and char domains coincide (oracle precondition)") {
    val texts = Seq(10L -> ("the quick brown fox " * 20), 11L -> "short")
    val got = sparkFrames(texts)
    for ((id, text) <- texts) {
      assert(got(id) == expectedFrames(text))
      // and the char-domain digest agrees — the equality duckFrames
      // relies on (and asserts via error()) for the ASCII corpus
      for ((i, m, _) <- got(id)) {
        val charSlice = text.substring(
          math.min(i * 16, text.length),
          math.min(i * 16 + 16, text.length))
        assert(m == jvmMd5(charSlice.getBytes(StandardCharsets.UTF_8)))
      }
    }
  }

  test("empty and sub-frame payloads keep the at-least-one-frame contract") {
    val got = sparkFrames(Seq(20L -> "", 21L -> "abc"))
    assert(got(20L) == Seq((0, jvmMd5(Array.empty[Byte]), 0)))
    assert(got(21L) == Seq((0, jvmMd5("abc".getBytes(StandardCharsets.UTF_8)), 3)))
  }
}
