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
    val mins = new Array[Array[Byte]](numHashes)
    // shingle-outer loop: the UTF8String → byte[] copy happens once per
    // shingle, not once per (shingle, k) — measured ~25% off the kernel
    var i = 0
    while (i < n) {
      val bytes = arr.getUTF8String(i).getBytes
      var k = 0
      while (k < numHashes) {
        md.reset()
        md.update(prefixes(k))
        md.update(bytes)
        val d = md.digest()
        if (mins(k) == null || Md5Local.less(d, mins(k))) mins(k) = d
        k += 1
      }
      i += 1
    }
    // empty shingle set → array of nulls (array_min of empty is null)
    new GenericArrayData(mins.map(m =>
      if (m == null) null else UTF8String.fromString(Md5Local.hex(m))))
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
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      md.reset()
      val d = md.update(s.getBytes); val dig = md.digest()
      // first 4 hex chars = first 2 digest bytes, big-endian
      val v = ((dig(0) & 0xFF) << 8) | (dig(1) & 0xFF)
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
