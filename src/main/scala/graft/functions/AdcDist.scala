package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `adc_dist(lut, codes)` — the PQ asymmetric-distance sum
  * Σ_j lut[j][codes[j]] over an m-subspace lookup table
  * (array<array<double>>) and a code word (array<int>), in one fused JVM
  * pass.
  *
  * r19: replaces the interpreted
  * `aggregate(sequence(0, m-1), 0D, (acc, j) -> acc +
  * element_at(element_at(lut, j+1), element_at(codes, j+1) + 1))` — which
  * paid a sequence allocation plus m boxed lambda evaluations per corpus
  * CANDIDATE row (the hot loop of the ADC shortlist scan). Indexing is
  * 0-based here ≡ the HOF's 1-based element_at over the same arrays. Null
  * input or arity mismatch yields null; an out-of-range code (impossible
  * from encodeResiduals, whose codes are array_position-derived
  * 0..ksub-1) also yields null where the ANSI-mode HOF would throw —
  * defensive, never a silent wrong sum.
  */
case class AdcDist(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_dist"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val lutOk = left.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    val codesOk = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (lutOk && codesOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<array<double>>, array<int>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val lutAny = left.eval(input)
    val codesAny = right.eval(input)
    if (lutAny == null || codesAny == null) return null
    val lut = lutAny.asInstanceOf[ArrayData]
    val codes = codesAny.asInstanceOf[ArrayData]
    val m = lut.numElements()
    if (codes.numElements() < m) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (lut.isNullAt(j) || codes.isNullAt(j)) return null
      val sub = lut.getArray(j)
      val c = codes.getInt(j)
      if (c < 0 || c >= sub.numElements() || sub.isNullAt(c)) return null
      acc += sub.getDouble(c)
      j += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AdcDist {
  val identifier: FunctionIdentifier = FunctionIdentifier("adc_dist")
  val info: ExpressionInfo = new ExpressionInfo(classOf[AdcDist].getName, "adc_dist")
  val builder: Seq[Expression] => Expression = {
    case Seq(l, c) => AdcDist(l, c)
    case exprs => throw new IllegalArgumentException(
      s"adc_dist requires exactly 2 arguments, got ${exprs.size}")
  }
}
