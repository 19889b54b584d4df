package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mutable buffer: the d×w count matrix (flattened) plus a bounded
  * candidate map (term -> last estimate) for heavy-hitter tracking. */
final case class CmsBuf(var counts: Array[Long], var cand: Map[String, Long])

/** Count-min sketch with a bounded candidate heap — one-pass approximate
  * heavy hitters (top-k most frequent terms) in O(d·w + cap) memory per
  * partition, mergeable across partitions (Cormode & Muthukrishnan 2005).
  *
  * Why not exact groupBy+orderBy? Exact term counting shuffles one row per
  * distinct term; at 100 TB the long tail of distinct terms dominates the
  * shuffle. The sketch's partial state is a FIXED d×w matrix regardless of
  * input size — partials combine map-side like any Aggregator, and the
  * shuffle carries kilobytes per partition.
  *
  * Guarantees (spec-asserted): estimates never undercount (each cell only
  * ever adds), overcount is bounded by ~e/w · N with high probability, and
  * any term above that noise floor survives into the candidate set. The
  * candidate map is trimmed deterministically (estimate desc, term asc) at
  * `cap`, sized so trimming is rare — candidates are re-estimated against
  * the MERGED matrix at finish, so final estimates are partition-order
  * independent.
  *
  * Hashing: d independent rows via an xxhash-style avalanche over
  * (seed=row, term hash) — deterministic across JVMs/executors (no
  * Object.hashCode, no RNG).
  */
final class CountMinHeavyHitters(depth: Int, width: Int, k: Int, cap: Int)
    extends Aggregator[String, CmsBuf, Seq[(String, Long)]] {
  require(depth > 0 && width > 0 && k > 0 && cap >= 4 * k)

  private def cell(row: Int, term: String): Int = {
    var h = scala.util.hashing.MurmurHash3.stringHash(term, 0x9747b28c + row)
    // avalanche so low bits depend on all input bits before the modulo
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13
    row * width + math.floorMod(h, width)
  }

  private def estimate(counts: Array[Long], term: String): Long = {
    var min = Long.MaxValue
    var r = 0
    while (r < depth) { val c = counts(cell(r, term)); if (c < min) min = c; r += 1 }
    min
  }

  private def trim(cand: Map[String, Long]): Map[String, Long] =
    if (cand.size <= cap) cand
    else cand.toSeq.sortBy { case (t, est) => (-est, t) }.take(cap).toMap

  override def zero: CmsBuf = CmsBuf(Array.fill(depth * width)(0L), Map.empty)

  override def reduce(b: CmsBuf, term: String): CmsBuf = {
    var r = 0
    while (r < depth) { b.counts(cell(r, term)) += 1; r += 1 }
    // trim LAZILY at 2×cap (amortized: one sort per cap inserts, not one
    // per row once full); estimates are refreshed at finish anyway
    b.cand = b.cand + (term -> estimate(b.counts, term))
    if (b.cand.size > 2 * cap) b.cand = trim(b.cand)
    b
  }

  override def merge(x: CmsBuf, y: CmsBuf): CmsBuf = {
    var i = 0
    while (i < x.counts.length) { x.counts(i) += y.counts(i); i += 1 }
    // union candidates, re-estimated against the merged matrix
    val union = (x.cand.keySet ++ y.cand.keySet).iterator
      .map(t => t -> estimate(x.counts, t)).toMap
    x.cand = trim(union)
    x
  }

  override def finish(b: CmsBuf): Seq[(String, Long)] =
    b.cand.iterator.map { case (t, _) => t -> estimate(b.counts, t) }
      .toSeq.sortBy { case (t, est) => (-est, t) }.take(k)

  override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}
