package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `grams(t, k, sep)` — the n−k+1 word k-grams of the token array `t`,
  * each the sep-joined window `t[i..i+k-1]`, in one fused JVM pass.
  *
  * r19: replaces the interpreted
  * `transform(sequence(1, size(t)-k+1), i -> concat_ws(sep, slice(t, i, k)))`
  * HOF chain on the shingle/gram hot paths (q_dedup_substring,
  * q_decontaminate(_bloom), q_quality_classifier): higher-order functions
  * sit outside whole-stage codegen and pay one boxed lambda evaluation,
  * one slice ArrayData allocation, and one interpreted concat_ws per
  * window position. This expression makes the same strings with one
  * `UTF8String.concatWs` per window (byte-level copy, no per-element
  * lambda machinery). Element equality: identical by construction —
  * `UTF8String.concatWs` is exactly concat_ws's runtime (nulls skipped).
  * Null input yields null; fewer than k tokens yields the empty array
  * (what `transform(sequence(...))` callers guarded with a size filter).
  */
case class Grams(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "grams"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val tOk = first.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (tOk && second.dataType == IntegerType && second.foldable &&
      third.dataType == StringType && third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable int, foldable string), got " +
        s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")
  }

  private lazy val k: Int = second.eval(null).asInstanceOf[Int]
  private lazy val sep: UTF8String = third.eval(null).asInstanceOf[UTF8String]

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val tAny = first.eval(input)
    if (tAny == null || k <= 0 || sep == null) return null
    val arr = tAny.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val window = new Array[UTF8String](k)
    val out = new Array[Any](m)
    i = 0
    while (i < m) {
      System.arraycopy(toks, i, window, 0, k)
      out(i) = UTF8String.concatWs(sep, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object Grams {
  val identifier: FunctionIdentifier = FunctionIdentifier("grams")
  val info: ExpressionInfo = new ExpressionInfo(classOf[Grams].getName, "grams")
  val builder: Seq[Expression] => Expression = {
    case Seq(t, kk, sep) => Grams(t, kk, sep)
    case exprs => throw new IllegalArgumentException(
      s"grams requires exactly 3 arguments, got ${exprs.size}")
  }
}
