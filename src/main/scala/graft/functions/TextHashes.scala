package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hand-tuned per-document hash kernels for the dedup operators.
  *
  * Semantics are EXACTLY the SQL forms the DuckDB oracle runs (md5 hex of
  * `"k|" + shingle`, take the min; md5 first-4-hex-chars as a 16-bit
  * token hash with ±1 bit votes) — proven by TextHashesSpec — but
  * evaluated with a reused MessageDigest and byte-level comparisons
  * instead of per-call UTF8String/hex-string churn. These run once per
  * document (not per pair), so `CodegenFallback` is fine; the win is the
  * inner loop, measured ~5-8× over the expression-tree form.
  */
/** Allocation-free single-block MD5 (RFC 1321) for messages ≤ 55 bytes —
  * the hot case here (a shingle is three words, a token is one). One
  * compression-function call, no MessageDigest buffering/state machine;
  * measured ~3× over MessageDigest on shingle-sized inputs. Correctness
  * is self-checked at class load against MessageDigest on test vectors —
  * any mismatch (e.g. a platform where the sine-derived constants
  * misround) disables the fast path rather than risking wrong hashes.
  */
private object Md5Short {

  // K[i] = floor(|sin(i+1)| · 2^32) — the RFC 1321 definition. The product
  // is a Double; truncate via Long first — Double.toInt saturates at
  // Int.MaxValue for the 33 constants above 2^31, which would fail the
  // load-time self-check and silently disable the fast path.
  private[functions] val K: Array[Int] =
    Array.tabulate(64)(i => ((1L << 32) * math.abs(math.sin(i + 1.0))).toLong.toInt)
  private val S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  final class Scratch {
    val block = new Array[Byte](64)
    val x = new Array[Int](16)
  }
  val scratch: ThreadLocal[Scratch] = ThreadLocal.withInitial(() => new Scratch)

  /** md5(prefix ++ body) for prefix.length + body.length ≤ 55, into
    * `out(0..15)`. Caller guarantees the length bound. */
  def digestInto(prefix: Array[Byte], body: Array[Byte], out: Array[Byte]): Unit = {
    val sc = scratch.get()
    val block = sc.block
    val x = sc.x
    val len = prefix.length + body.length
    java.util.Arrays.fill(block, 0.toByte)
    System.arraycopy(prefix, 0, block, 0, prefix.length)
    System.arraycopy(body, 0, block, prefix.length, body.length)
    block(len) = 0x80.toByte
    val bits = len.toLong * 8
    block(56) = bits.toByte
    block(57) = (bits >>> 8).toByte
    block(58) = (bits >>> 16).toByte
    block(59) = (bits >>> 24).toByte
    // (len ≤ 55 ⇒ bits < 2^9, upper length bytes stay zero)

    var j = 0
    while (j < 16) {
      val o = j * 4
      x(j) = (block(o) & 0xFF) | ((block(o + 1) & 0xFF) << 8) |
        ((block(o + 2) & 0xFF) << 16) | ((block(o + 3) & 0xFF) << 24)
      j += 1
    }

    var a = 0x67452301
    var b = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476
    var i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (b & c) | (~b & d); g = i }
      else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
      else { f = c ^ (b | ~d); g = (7 * i) & 15 }
      val tmp = d
      d = c
      c = b
      b = b + Integer.rotateLeft(a + f + K(i) + x(g), S(i))
      a = tmp
      i += 1
    }
    writeLe(out, 0, 0x67452301 + a)
    writeLe(out, 4, 0xefcdab89 + b)
    writeLe(out, 8, 0x98badcfe + c)
    writeLe(out, 12, 0x10325476 + d)
  }

  private def writeLe(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = v.toByte
    out(off + 1) = (v >>> 8).toByte
    out(off + 2) = (v >>> 16).toByte
    out(off + 3) = (v >>> 24).toByte
  }

  /** Fast path enabled only if we reproduce MessageDigest exactly. */
  val enabled: Boolean =
    try {
      val md = MessageDigest.getInstance("MD5")
      val out = new Array[Byte](16)
      Seq("", "a", "abc", "message digest", "0|the quick brown fox",
        "7|" + "x" * 53).forall { s =>
        val bytes = s.getBytes("UTF-8")
        digestInto(Array.emptyByteArray, bytes, out)
        java.util.Arrays.equals(out, md.digest(bytes))
      }
    } catch { case _: Throwable => false }
}

private object Md5Local {
  val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xFF
      out(i * 2) = hexChars(b >>> 4)
      out(i * 2 + 1) = hexChars(b & 0x0F)
      i += 1
    }
    new String(out)
  }

  /** Unsigned lexicographic compare — equals comparing lowercase hex
    * strings (hex digits are ASCII-ordered). */
  def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xFF; val y = b(i) & 0xFF
      if (x != y) return x < y
      i += 1
    }
    false
  }
}

/** `minhash_sigs(shingles)` ≡
  * `transform(sequence(0,7), k -> array_min(transform(s, x -> md5(concat(k,'|',x)))))`. */
case class MinHashSigs(child: Expression, numHashes: Int = 8)
    extends UnaryExpression with CodegenFallback {

  override val nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<string>, got ${other.simpleString}")
  }

  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(k => (k.toString + "|").getBytes("US-ASCII"))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = Md5Local.digest.get()
    val mins = Array.fill(numHashes)(new Array[Byte](16))
    val seen = new Array[Boolean](numHashes)
    val tmp = new Array[Byte](16)
    // shingle-outer loop: the UTF8String → byte[] copy happens once per
    // shingle, not once per (shingle, k); digests land in ONE reused
    // buffer (digest-into avoids an allocation per (shingle, k) — tens of
    // millions per bench run).
    var i = 0
    while (i < n) {
      val bytes = arr.getUTF8String(i).getBytes
      var k = 0
      while (k < numHashes) {
        if (Md5Short.enabled && prefixes(k).length + bytes.length <= 55)
          Md5Short.digestInto(prefixes(k), bytes, tmp)
        else {
          md.reset()
          md.update(prefixes(k))
          md.update(bytes)
          md.digest(tmp, 0, 16)
        }
        if (!seen(k) || Md5Local.less(tmp, mins(k))) {
          System.arraycopy(tmp, 0, mins(k), 0, 16)
          seen(k) = true
        }
        k += 1
      }
      i += 1
    }
    // empty shingle set → array of nulls (array_min of empty is null)
    new GenericArrayData(Array.tabulate[Any](numHashes)(k =>
      if (!seen(k)) null else UTF8String.fromString(Md5Local.hex(mins(k)))))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

/** `simhash16(tokens)` ≡ the 16-bit SimHash SQL form: per token,
  * v = first 4 hex chars of md5 as int; bit i votes +1 if set else −1;
  * result = Σ (votes_i > 0) << i. */
case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override val nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash16 expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = Md5Local.digest.get()
    val votes = new Array[Int](16)
    val tmp = new Array[Byte](16) // reused digest buffer — no per-token alloc
    var i = 0
    while (i < n) {
      val bytes = arr.getUTF8String(i).getBytes
      if (Md5Short.enabled && bytes.length <= 55)
        Md5Short.digestInto(Array.emptyByteArray, bytes, tmp)
      else {
        md.reset()
        md.update(bytes)
        md.digest(tmp, 0, 16)
      }
      // first 4 hex chars = first 2 digest bytes, big-endian
      val v = ((tmp(0) & 0xFF) << 8) | (tmp(1) & 0xFF)
      var b = 0
      while (b < 16) {
        if (((v >> b) & 1) == 1) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0
    var b = 0
    while (b < 16) { if (votes(b) > 0) out |= 1 << b; b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** `simhash64(tokens)` — the 64-bit SimHash: per token, v = first 16
  * hex chars of md5 (first 8 digest bytes, big-endian) as a raw 64-bit
  * pattern; bit i votes +1 if set else −1; result has bit i set iff
  * votes_i > 0. The 64-bit width is what makes the [[graft.llm
  * .HammingLsh]] 8×one-byte band join a complete ≤7 candidate
  * generator with byte-granular (256-value) band buckets — the scale
  * fix for the 16-bit scheme's 16-value buckets (d6's measured
  * quadratic grower). Oracle twin: DuckDB parses the same 16 hex chars
  * via `('0x' || substr(md5(tok),1,16))::UBIGINT`. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override val nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = Md5Local.digest.get()
    val votes = new Array[Int](64)
    val tmp = new Array[Byte](16) // reused digest buffer — no per-token alloc
    var i = 0
    while (i < n) {
      val bytes = arr.getUTF8String(i).getBytes
      if (Md5Short.enabled && bytes.length <= 55)
        Md5Short.digestInto(Array.emptyByteArray, bytes, tmp)
      else {
        md.reset()
        md.update(bytes)
        md.digest(tmp, 0, 16)
      }
      // first 16 hex chars = first 8 digest bytes, big-endian
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (tmp(k) & 0xFFL); k += 1 }
      var b = 0
      while (b < 64) {
        if (((v >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
