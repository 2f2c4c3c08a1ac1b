package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Probe a serialized count-min sketch (the binary produced by Spark's
  * `count_min_sketch` aggregate) for a string item's estimated count —
  * the read side of the mergeable heavy-hitters sketch.
  *
  * `count_min_sketch` hashes StringType items as their UTF-8 bytes
  * (`addBinary`), so the probe hashes the same way; estimates are exact
  * upper bounds within the sketch's (ε, δ) contract.
  *
  * The deserialized sketch is memoized per expression instance by
  * CONTENT equality (UnsafeRow.getBinary hands back a fresh copy per
  * row, so a reference check would never hit): re-parsing the sketch
  * costs allocation + header/array decoding per row, while the byte
  * compare is a single branchy scan that exits on the first differing
  * byte. `CodegenFallback` is fine here — the probe side is
  * sketch-sized, never corpus-sized (the corpus pass is the aggregate
  * itself, which is codegen'd by Spark).
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override val nullIntolerant: Boolean = true

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (binary, string), got (${l.simpleString}, ${r.simpleString})")
    }

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    if (cachedBytes == null || !java.util.Arrays.equals(bytes, cachedBytes)) {
      cachedSketch = CountMinSketch.readFrom(bytes)
      cachedBytes = bytes.clone()
    }
    cachedSketch.estimateCount(item.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
