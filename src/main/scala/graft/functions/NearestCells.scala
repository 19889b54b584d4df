package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `nearest_cells(v, centroids, nprobe)` — the indexes of the `nprobe`
  * centroids nearest to `v` (squared euclidean), nearest-first, ties to the
  * lower index. The r19 replacement for the interpreted HOF pipeline
  * `slice(array_sort(zip_with(transform(cs, c -> aggregate(zip_with(v, c,
  * …), …)), sequence(…), …)), 1, nprobe)` that every IVF probe/assign pass
  * paid per row: higher-order functions evaluate one boxed lambda call per
  * element (k·dims per row), while this is one fused JVM loop per row.
  *
  * Bit-identical to the HOF form it replaces: distances accumulate in the
  * same index-ascending order from the same 0.0 seed (identical FP sums),
  * and selection orders by (distance, index) exactly like the
  * struct(d, i) array_sort. `nprobe > k` degrades to all k cells, like
  * slice past the end. The centroid argument is a plan literal in every
  * engine use (decoded once per expression instance, not per row); a
  * non-literal child still evaluates correctly, per row. Any null
  * input/element or a dims mismatch yields null — the HOF form's
  * propagation.
  */
case class NearestCells(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val vOk = first.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val csOk = second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    val nOk = third.dataType == IntegerType
    if (vOk && csOk && nOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<array<double>>, int), " +
        s"got (${first.dataType.sql}, ${second.dataType.sql}, " +
        s"${third.dataType.sql})")
  }

  private def decode(csAny: Any): Array[Array[Double]] = {
    val cs = csAny.asInstanceOf[ArrayData]
    if (cs == null) null
    else Array.tabulate(cs.numElements()) { i =>
      val c = cs.getArray(i)
      if (c == null) null else c.toDoubleArray()
    }
  }

  // Decoded once per expression instance when the centroid child survives
  // as a plan literal (ConstantFolding collapses the typedlit projection
  // into one — the only shape the engine produces); a non-foldable child
  // decodes per row, still without per-element lambda dispatch. lazy val
  // init is synchronized, so concurrent tasks are safe.
  private lazy val centroidsStatic: Array[Array[Double]] =
    if (second.foldable) decode(second.eval(null)) else null
  private lazy val nprobeStatic: java.lang.Integer =
    if (third.foldable) third.eval(null).asInstanceOf[java.lang.Integer] else null

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vAny = first.eval(input)
    val centroids =
      if (second.foldable) centroidsStatic else decode(second.eval(input))
    val nprobeAny: Any =
      if (third.foldable) nprobeStatic else third.eval(input)
    if (vAny == null || centroids == null || nprobeAny == null) return null
    val nprobe = nprobeAny.asInstanceOf[java.lang.Integer].intValue()
    val v = vAny.asInstanceOf[ArrayData].toDoubleArray()
    val k = centroids.length
    val dists = new Array[Double](k)
    var ci = 0
    while (ci < k) {
      val c = centroids(ci)
      if (c == null || c.length != v.length) return null
      var acc = 0.0
      var j = 0
      while (j < c.length) {
        val dxy = v(j) - c(j)
        acc += dxy * dxy
        j += 1
      }
      dists(ci) = acc
      ci += 1
    }
    val take = math.min(math.max(nprobe, 0), k)
    val out = new Array[Int](take)
    // O(k·nprobe) stable selection by (distance, index): k is the centroid
    // count (small by construction), nprobe smaller still.
    val used = new Array[Boolean](k)
    var s = 0
    while (s < take) {
      var best = -1
      var bd = 0.0
      var i = 0
      while (i < k) {
        // java.lang.Double.compare is Spark's own double ordering (NaN
        // greatest, -0.0 < 0.0), so ties and degenerate distances order
        // exactly like the struct(d, i) array_sort this replaces.
        if (!used(i) &&
            (best == -1 || java.lang.Double.compare(dists(i), bd) < 0)) {
          best = i; bd = dists(i)
        }
        i += 1
      }
      used(best) = true
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NearestCells {
  val identifier: FunctionIdentifier = FunctionIdentifier("nearest_cells")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[NearestCells].getName, "nearest_cells")
  val builder: Seq[Expression] => Expression = {
    case Seq(v, cs, n) => NearestCells(v, cs, n)
    case exprs => throw new IllegalArgumentException(
      s"nearest_cells requires exactly 3 arguments, got ${exprs.size}")
  }
}
