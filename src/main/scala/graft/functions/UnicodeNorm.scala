package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — Spark ships no
  * normalizer builtin, and corpus cleaning needs one (the same visible
  * text arrives from the web in composed and decomposed forms, which
  * breaks exact dedup, shingles, and tokenizer merges; the public
  * corpus-cleaning recipes all normalize before hashing).
  *
  * Semantics are the Unicode standard's NFC exactly — `java.text
  * .Normalizer` here, utf8proc's `nfc_normalize` on the DuckDB oracle
  * side; both implement UAX #15, so the t26 gate hash-matches without
  * tolerance. Per-document kernel work, so `CodegenFallback` follows
  * the [[SimHash64]] posture (the win is avoiding per-row UDF
  * boxing/registry, not codegen of the normalizer itself).
  *
  * The `isNormalized` pre-check makes the already-clean common case
  * allocation-free: the quick-check scans without building the output,
  * and web text is overwhelmingly already NFC.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override val nullIntolerant: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  override def prettyName: String = "nfc_normalize"

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
