package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd rolling-hash document fingerprint:
  * sum_i char(i) * ((i * 131) mod 1000003), all mod 1000000007 (i 1-based).
  *
  * Numerically identical to TextAnalysis's HOF formulation
  * `aggregate(transform(sequence(1, length(text)), ...))` — and to the
  * DuckDB oracle — for the corpus's ASCII text, but evaluated as ONE fused
  * loop over the string inside whole-stage codegen instead of
  * materializing a per-character bigint array through the interpreted
  * higher-order-function path (transform/aggregate have no doGenCode; at
  * sf0.1 the HOF version was the most expensive non-index query in the
  * bench). Character indexing is UTF-16 `charAt`, which equals the HOF's
  * `ascii(substring(text,i,1))` for all BMP text; the synthetic corpus is
  * ASCII [a-z0-9 ].
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      acc += str.charAt(i).toLong * (((i + 1).toLong * 131L) % 1000003L)
      i += 1
    }
    acc % 1000000007L // all terms non-negative, so % == pmod
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val str = ctx.freshName("str")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |java.lang.String $str = $a.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $str.length(); $i++) {
         |  $acc += (long) $str.charAt($i) * (((long) ($i + 1) * 131L) % 1000003L);
         |}
         |${ev.value} = $acc % 1000000007L;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  val identifier: FunctionIdentifier = FunctionIdentifier("rolling_fingerprint")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[RollingFingerprint].getName, "rolling_fingerprint")
  val builder: Seq[Expression] => Expression = {
    case Seq(c) => RollingFingerprint(c)
    case exprs => throw new IllegalArgumentException(
      s"rolling_fingerprint requires exactly 1 argument, got ${exprs.size}")
  }
}
