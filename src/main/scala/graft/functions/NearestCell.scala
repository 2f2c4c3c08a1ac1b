package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Nearest-centroid assignment against a CONSTANT codebook — native
  * Catalyst expressions with whole-stage codegen.
  *
  * The composable form (`array_position(d, array_min(d))` over a
  * `transform(codebookLit, c => aggregate(zip_with(c, v, …), …))`) is a
  * higher-order-function tree: HOFs are CodegenFallback, so every row
  * pays interpreted lambda dispatch plus k temporary arrays — measured
  * as the dominant term of the Lloyd trainer (v15) and the IVF cell
  * assignment (v5b/v12b and the p1/p1b serve joins). Same justification
  * as [[CosineSimilarity]]: a tight fused loop, no allocation, exact
  * index-order arithmetic.
  *
  * Bit-compat contract (what the oracle gates pin):
  *  - [[NearestCellL2Q]]: exact int64 squared-L2 over `array<long>`
  *    input; distances accumulate in long exactly like the
  *    `aggregate(zip_with(c, qv, (x,y) => (x-y)*(x-y)), 0L, _+_)` fold.
  *  - [[NearestCellL2]]: double squared-L2 over `array<float>` input,
  *    each element cast to double first, accumulated in INDEX ORDER —
  *    IEEE-identical to the sequential fold it replaces.
  *  - Ties break to the LOWER cell id (strict `<` keeps the first
  *    minimum — `array_position` semantics).
  *  - Returns null for a null input, when any codebook row's length
  *    differs from the input's, or when the input contains a null
  *    element (the HOF form yields a null distance in each case,
  *    poisoning the argmin the same way — and the quantized inputs'
  *    dataType is containsNull=true, so the type system admits it).
  */
abstract class NearestCellBase extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override val nullIntolerant: Boolean = true

  protected def elemType: DataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == elemType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<${elemType.simpleString}>, got ${other.simpleString}")
  }
}

case class NearestCellL2Q(codebook: Seq[Seq[Long]], child: Expression)
    extends NearestCellBase {
  override def prettyName: String = "nearest_cell_l2q"
  override protected def elemType: DataType = LongType

  @transient private lazy val cb: Array[Array[Long]] =
    codebook.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var c = 0
    while (c < cb.length) { if (cb(c).length != n) return null; c += 1 }
    c = 0
    while (c < n) { if (a.isNullAt(c)) return null; c += 1 }
    var best = -1
    var bestD = Long.MaxValue
    c = 0
    while (c < cb.length) {
      val row = cb(c)
      var d = 0L
      var i = 0
      while (i < n) { val df = row(i) - a.getLong(i); d += df * df; i += 1 }
      if (best < 0 || d < bestD) { best = c; bestD = d }
      c += 1
    }
    if (best < 0) null else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("codebook", cb, "long[][]")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val df = ctx.freshName("df"); val row = ctx.freshName("row")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ${cb.length} == 0;
         |for (int $c = 0; $c < ${cb.length}; $c++) {
         |  if ($cbRef[$c].length != $n) { $bad = true; break; }
         |}
         |for (int $c = 0; $c < $n && !$bad; $c++) {
         |  if ($a.isNullAt($c)) { $bad = true; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = 0; long $bestD = Long.MAX_VALUE;
         |  for (int $c = 0; $c < ${cb.length}; $c++) {
         |    final long[] $row = $cbRef[$c];
         |    long $d = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      final long $df = $row[$i] - $a.getLong($i);
         |      $d += $df * $df;
         |    }
         |    if ($d < $bestD) { $best = $c; $bestD = $d; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class NearestCellL2(codebook: Seq[Seq[Double]], child: Expression)
    extends NearestCellBase {
  override def prettyName: String = "nearest_cell_l2"
  override protected def elemType: DataType = FloatType

  @transient private lazy val cb: Array[Array[Double]] =
    codebook.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var c = 0
    while (c < cb.length) { if (cb(c).length != n) return null; c += 1 }
    c = 0
    while (c < n) { if (a.isNullAt(c)) return null; c += 1 }
    var best = -1
    var bestD = Double.NaN
    c = 0
    while (c < cb.length) {
      val row = cb(c)
      var d = 0.0
      var i = 0
      while (i < n) {
        val df = row(i) - a.getFloat(i).toDouble; d += df * df; i += 1
      }
      // array_min ordering: NaN sorts greater than any non-NaN, first
      // minimum wins (array_position)
      if (best < 0 ||
          (!d.isNaN && (bestD.isNaN || d < bestD))) { best = c; bestD = d }
      c += 1
    }
    if (best < 0) null else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("codebook", cb, "double[][]")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val df = ctx.freshName("df"); val row = ctx.freshName("row")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ${cb.length} == 0;
         |for (int $c = 0; $c < ${cb.length}; $c++) {
         |  if ($cbRef[$c].length != $n) { $bad = true; break; }
         |}
         |for (int $c = 0; $c < $n && !$bad; $c++) {
         |  if ($a.isNullAt($c)) { $bad = true; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = -1; double $bestD = Double.NaN;
         |  for (int $c = 0; $c < ${cb.length}; $c++) {
         |    final double[] $row = $cbRef[$c];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      final double $df = $row[$i] - (double) $a.getFloat($i);
         |      $d += $df * $df;
         |    }
         |    if ($best < 0 || (!Double.isNaN($d)
         |        && (Double.isNaN($bestD) || $d < $bestD))) {
         |      $best = $c; $bestD = $d;
         |    }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Minimum squared-L2 distance to the codebook (double form) — the
  * farthest-first init's `array_min(transform(…, l2sq))` fused the same
  * way; used where the VALUE of the nearest distance is needed rather
  * than the argmin. NaN distances (possible only from NaN inputs) follow
  * the same `<` ordering as the argmin twins. */
case class NearestDistL2(codebook: Seq[Seq[Double]], child: Expression)
    extends UnaryExpression {
  override def prettyName: String = "nearest_dist_l2"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override val nullIntolerant: Boolean = true

  @transient private lazy val cb: Array[Array[Double]] =
    codebook.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var c = 0
    while (c < cb.length) { if (cb(c).length != n) return null; c += 1 }
    c = 0
    while (c < n) { if (a.isNullAt(c)) return null; c += 1 }
    var best = -1
    var bestD = Double.NaN
    c = 0
    while (c < cb.length) {
      val row = cb(c)
      var d = 0.0
      var i = 0
      while (i < n) {
        val df = row(i) - a.getFloat(i).toDouble; d += df * df; i += 1
      }
      if (best < 0 ||
          (!d.isNaN && (bestD.isNaN || d < bestD))) { best = c; bestD = d }
      c += 1
    }
    if (best < 0) null else bestD
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbRef = ctx.addReferenceObj("codebook", cb, "double[][]")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val d = ctx.freshName("d")
      val df = ctx.freshName("df"); val row = ctx.freshName("row")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = ${cb.length} == 0;
         |for (int $c = 0; $c < ${cb.length}; $c++) {
         |  if ($cbRef[$c].length != $n) { $bad = true; break; }
         |}
         |for (int $c = 0; $c < $n && !$bad; $c++) {
         |  if ($a.isNullAt($c)) { $bad = true; }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = -1; double $bestD = Double.NaN;
         |  for (int $c = 0; $c < ${cb.length}; $c++) {
         |    final double[] $row = $cbRef[$c];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      final double $df = $row[$i] - (double) $a.getFloat($i);
         |      $d += $df * $df;
         |    }
         |    if ($best < 0 || (!Double.isNaN($d)
         |        && (Double.isNaN($bestD) || $d < $bestD))) {
         |      $best = $c; $bestD = $d;
         |    }
         |  }
         |  ${ev.value} = $bestD;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
