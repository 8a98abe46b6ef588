package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k DISTINCT values as a typed Aggregator — the state
  * of a KMV (k-minimum-values) cardinality sketch.
  *
  * A KMV sketch keeps the k smallest distinct hash values ever seen;
  * the k-th smallest estimates the density of a uniform hash stream, so
  * distinct ≈ (k−1)·H / h_k for hash domain [0, H). Keeping the set
  * bounded INSIDE the aggregator matters at scale: the naive
  * formulation (`distinct` then window-rank per group) shuffles every
  * distinct value — the exact cost a sketch exists to avoid. Here each
  * map task forwards at most k longs per group, and `merge` is an
  * associative bounded set-union, so partial aggregation applies like
  * any algebraic agg (Bar-Yossef et al., "Counting distinct elements in
  * a data stream", 2002).
  *
  * The buffer is a DESCENDING sorted list with at most k distinct
  * entries; duplicates are rejected on insert (a duplicate hash must
  * not occupy a second slot — that would bias h_k downward).
  * Descending, since r16: the overwhelmingly common case on a long
  * stream is "buffer full, x out-ranked", and with the largest kept
  * value at the HEAD that is an O(1) check — the ascending form paid
  * an O(k) buf.last traversal on every input row. finish() reverses,
  * so the emitted sketch is ascending exactly as before.
  */
final class BottomKDistinct(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
  require(k > 0, s"bottom-k needs k > 0, got $k")

  override def zero: List[Long] = Nil

  private def insert(buf: List[Long], x: Long): List[Long] =
    if (buf.lengthCompare(k) >= 0 && buf.head <= x) buf // full and out-ranked
    else {
      val (pre, post) = buf.span(_ > x)
      if (post.headOption.contains(x)) buf // already present
      else {
        val merged = pre ::: x :: post
        if (merged.lengthCompare(k) > 0) merged.tail // drop the largest
        else merged
      }
    }

  override def reduce(buf: List[Long], x: Long): List[Long] = insert(buf, x)

  override def merge(a: List[Long], b: List[Long]): List[Long] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[Long]): Seq[Long] = buf.reverse

  override def bufferEncoder: Encoder[List[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
