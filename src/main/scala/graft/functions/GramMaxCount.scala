package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `gram_max_count(t, k)` — the highest multiplicity among the word
  * k-grams of the token array `t` (the Gopher repetition numerator),
  * computed per row in one fused JVM pass: sort the n−k+1 gram start
  * positions by their token sequences, count the longest equal run.
  *
  * r19: replaces the explode → groupBy(doc_id, gram) → max(count) pipeline
  * (which shuffled every gram instance) AND the interpreted
  * aggregate()-over-named_struct HOF attempt, which evaluated one boxed
  * lambda + one struct allocation per gram and measured slower than the
  * shuffle it removed. Gram equality is token-sequence equality — identical
  * to equality of the `concat_ws(' ', …)` gram strings whenever tokens
  * contain no separator character, which the whitespace-splitting
  * tokenizer (TextTokens.ToksSql) guarantees; null tokens (which that
  * tokenizer never produces) compare as empty strings. Null input or
  * fewer than k tokens yields null.
  */
case class GramMaxCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "gram_max_count"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val tOk = left.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (tOk && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable int), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  private lazy val k: Int = right.eval(null).asInstanceOf[Int]

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val tAny = left.eval(input)
    if (tAny == null || k <= 0) return null
    val arr = tAny.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = n - k + 1
    if (m <= 0) return null
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      toks(i) = if (t == null) UTF8String.EMPTY_UTF8 else t
      i += 1
    }
    val idx = new Array[Integer](m)
    i = 0
    while (i < m) { idx(i) = Integer.valueOf(i); i += 1 }
    val cmp = new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        var j = 0
        while (j < k) {
          val c = toks(a + j).compareTo(toks(b + j))
          if (c != 0) return c
          j += 1
        }
        0
      }
    }
    java.util.Arrays.sort(idx, cmp)
    var best = 1L
    var cur = 1L
    i = 1
    while (i < m) {
      if (cmp.compare(idx(i - 1), idx(i)) == 0) {
        cur += 1L
        if (cur > best) best = cur
      } else cur = 1L
      i += 1
    }
    best
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GramMaxCount {
  val identifier: FunctionIdentifier = FunctionIdentifier("gram_max_count")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[GramMaxCount].getName, "gram_max_count")
  val builder: Seq[Expression] => Expression = {
    case Seq(t, kk) => GramMaxCount(t, kk)
    case exprs => throw new IllegalArgumentException(
      s"gram_max_count requires exactly 2 arguments, got ${exprs.size}")
  }
}
