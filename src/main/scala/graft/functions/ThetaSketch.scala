package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV ("k minimum values") / theta sketch (SURVEY.md §2.5 family —
  * VERDICT r11 #8): the distinct-value sketch whose SET ALGEBRA includes a
  * FIRST-CLASS intersection estimator. q_agg_hll_intersect documents the
  * HLL caveat this answers: HLL supports only union natively, so overlap
  * goes through inclusion-exclusion and its error compounds to
  * O(err · |A∪B|) — useless when the overlap is small relative to the
  * union. A KMV sketch retains the k smallest hash values of the set; the
  * retained values below the threshold θ (the k-th smallest, as a fraction
  * of hash space) are a UNIFORM SAMPLE of the set, so ANY set expression —
  * intersection, difference — can be evaluated on the samples and scaled
  * by 1/θ (Beyer et al. 2007; the Apache DataSketches theta design).
  *
  * Distinct estimate: exact below k; (k−1)/θ once saturated.
  * Union: the k smallest of the merged value sets (exact sketch algebra).
  * Intersection: θ* = min(θ_A, θ_B); |{v ∈ A∩B : v < θ*}| / θ* — error
  * scales with sqrt(|A∪B|)/sqrt(k) ABSOLUTE, not with the union size
  * linearly, so small overlaps stay resolvable (spec-pinned against the
  * inclusion-exclusion route on an adversarial small-overlap fixture).
  *
  * Scale economics are SketchStore's: the aggregator's buffer (≤ k longs)
  * merges associatively map-side, one k-long row per group crosses the
  * shuffle, and every estimator here is a NATIVE column expression over
  * the stored Array[Long] — set algebra over kilobytes of persisted
  * sketches, zero fact-table scans, whole-stage codegen throughout. */
object Theta {
  /** Default retained-minima count: RSE ≈ 1/sqrt(k−2) ≈ 3.1 %. */
  val DefaultK = 1024

  /** SplitMix64 finalizer over the raw long key — deterministic across
    * JVMs, no RNG at plan time (the MinHashAggregator contract). The
    * result is sign-FLIPPED so ascending signed order == ascending
    * unsigned hash order (sketches store flipped values). */
  def hashLong(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) ^ Long.MinValue
  }

  // a stored (flipped) hash as its position in [0, 1) of hash space —
  // double precision loses the low bits, which is irrelevant at estimate
  // precision (the sketch's own RSE dominates by ten orders of magnitude)
  private def norm(f: Column): Column =
    (f.cast("double") + lit(9.223372036854776e18)) / lit(1.8446744073709552e19)

  /** The sketch's raw threshold: the k-th smallest stored value, or
    * "everything retained" (MaxValue) while the sketch is still exact. */
  private def thresholdRaw(sk: Column, k: Int): Column =
    when(size(sk) < k, lit(Long.MaxValue)).otherwise(element_at(sk, k))

  /** Distinct-count estimate: exact below saturation, (k−1)/θ after. */
  def estimate(sk: Column, k: Int = DefaultK): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) / norm(element_at(sk, k)))

  /** Union of two sketches — the k smallest of the merged distinct value
    * sets (exact sketch algebra, order-insensitive). */
  def unionSketch(a: Column, b: Column, k: Int = DefaultK): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** DIRECT intersection estimate — the theta-sketch estimator the HLL
    * family cannot express: common retained values below the tighter
    * threshold form a uniform sample of A∩B, scaled by 1/θ*. While both
    * sketches are exact the answer is the exact overlap. */
  def intersectEstimate(a: Column, b: Column, k: Int = DefaultK): Column = {
    val thr = least(thresholdRaw(a, k), thresholdRaw(b, k))
    val common = size(filter(array_intersect(a, b), x => x < thr))
    when(thr === lit(Long.MaxValue), common.cast("double"))
      .otherwise(common.cast("double") / norm(thr))
  }
}

/** Typed UDAF building a KMV sketch over a LONG key column (hash string
  * keys to long first — `xxhash64(col)` — the usual sketch-input
  * reduction). Buffer = the ≤ k smallest flipped hashes, sorted ascending,
  * distinct; reduce is a binary search plus an O(k) insert only when the
  * value beats the current maximum — probability k/n at steady state, so
  * the amortized per-row cost is the search. Merge is a bounded sorted
  * merge: associative and commutative, so Catalyst combines partial
  * sketches map-side (the same shuffle shape as [[MinHashAggregator]]). */
class KmvAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 16, s"KMV needs a meaningful k, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    val h = Theta.hashLong(v)
    if (buf.length == k && h >= buf(k - 1)) return buf // can't beat the max
    val idx = java.util.Arrays.binarySearch(buf, h)
    if (idx >= 0) return buf // already retained
    val ins = -idx - 1
    val outLen = math.min(buf.length + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(buf, ins, out, ins + 1, outLen - ins - 1)
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    var last = Long.MinValue
    var first = true
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
        else { val v = b(j); j += 1; v }
      if (first || take != last) { out(n) = take; n = n + 1; last = take; first = false }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/** Typed UDAF MERGING already-built KMV sketches (r13 — the SketchStore
  * rollup shape, [[KmvAggregator]]'s union twin): input rows are stored
  * Array[Long] sketches; the fold is the same bounded sorted merge. The
  * rollup is EXACT sketch algebra: every hash in the merged k-minimum set
  * is also within its own grain's k smallest (a global minimum is a
  * per-grain minimum), so unioning finest-grain stored sketches yields
  * the IDENTICAL sketch — and estimate — as sketching the fact directly
  * (spec-asserted equality, the hll_union_agg story for theta). */
class KmvMergeAggregator(k: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  private val inner = new KmvAggregator(k)
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(buf: Array[Long], sk: Array[Long]): Array[Long] =
    inner.merge(buf, if (sk == null) Array.emptyLongArray else sk)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    inner.merge(a, b)
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
