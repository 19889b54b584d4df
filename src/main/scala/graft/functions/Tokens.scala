package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_tokens(text)` — THE whitespace tokenizer
  * (`filter(split(text, ' '), w -> w <> '')`) as one fused byte scan.
  *
  * r19: the HOF formulation paid a regex `Pattern.split` on the
  * single-space pattern (allocating every empty segment between
  * consecutive spaces) plus one interpreted filter-lambda evaluation per
  * segment, per row — and it sits under ~every text/curation/dedup
  * operator via TextTokens.ToksSql. This expression emits each maximal
  * run of non-space bytes directly (0x20 never occurs inside a multi-byte
  * UTF-8 sequence, so byte splitting is exact), which is precisely the
  * split-then-drop-empties token set: split(' ') cuts at EVERY space, the
  * filter drops the empty segments between adjacent cuts, leaving the
  * non-space runs in order. Null in, null out; all-space or empty text
  * yields the empty array.
  */
case class Tokens(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val tAny = child.eval(input)
    if (tAny == null) return null
    val bytes = tAny.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    // count the runs first so the output array is exactly sized
    var count = 0
    var i = 0
    while (i < n) {
      if (bytes(i) != ' ') {
        count += 1
        while (i < n && bytes(i) != ' ') i += 1
      } else i += 1
    }
    val out = new Array[Any](count)
    var k = 0
    i = 0
    while (i < n) {
      if (bytes(i) != ' ') {
        val start = i
        while (i < n && bytes(i) != ' ') i += 1
        out(k) = UTF8String.fromBytes(bytes, start, i - start)
        k += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Tokens {
  val identifier: FunctionIdentifier = FunctionIdentifier("graft_tokens")
  val info: ExpressionInfo = new ExpressionInfo(classOf[Tokens].getName, "graft_tokens")
  val builder: Seq[Expression] => Expression = {
    case Seq(t) => Tokens(t)
    case exprs => throw new IllegalArgumentException(
      s"graft_tokens requires exactly 1 argument, got ${exprs.size}")
  }
}
