package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §5): MinHash signature as an
  * Aggregator[IN, BUF, OUT] — the mergeable-state surface of the engine.
  * The buffer (k running minima) merges associatively/commutatively, so
  * Catalyst can combine partial signatures map-side and across partitions —
  * the property that makes MinHash shuffle one k-long row per doc instead of
  * every shingle at 100 TB.
  *
  * Hashing is a seeded 64-bit FNV-1a variant (self-contained, deterministic
  * across JVMs; no RNG at plan time).
  */
final case class DocShingle(doc_id: Long, sh: String)

class MinHashAggregator(k: Int)
    extends Aggregator[DocShingle, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], row: DocShingle): Array[Long] = {
    var i = 0
    while (i < k) {
      val h = MinHashAggregator.hash64(row.sh, i)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object MinHashAggregator {
  /** Seeded FNV-1a over UTF-8 bytes, finalized with an avalanche mix. */
  def hash64(s: String, seed: Int): Long = {
    var h = 0xcbf29ce484222325L ^ (seed * 0x9e3779b97f4a7c15L)
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L
      i += 1
    }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h
  }
}
