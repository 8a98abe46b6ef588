package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (id, score) candidate inside a bounded top-k buffer. */
final case class ScoredId(vec_id: Long, cosine: Double)

/** Bounded top-k by (score DESC, id ASC) as a typed Aggregator — the
  * scale-safe replacement for a global `row_number` window over the
  * whole scored corpus (operators/Similarity.scala). A window plan
  * funnels EVERY scored row through the shuffle into one reducer
  * partition per query; this Aggregator partial-aggregates map-side, so
  * each map task forwards at most k candidates per query and the final
  * merge per query sees k × numPartitions rows, independent of corpus
  * size — the classic distributed top-k partial/merge shape.
  *
  * Determinism: the buffer is kept under the total order
  * (score DESC, id ASC) using java.lang.Double.compare, which is
  * NaN-greatest — the same DESC placement of NaN scores as Spark's and
  * DuckDB's sort, so results stay bit-identical to the window/oracle
  * formulation. `merge` is associative and commutative (bounded
  * merge-insert under a total order), as partial aggregation requires.
  */
final class TopKByScore(k: Int) extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  // strict total order when ids are unique: does `a` rank ahead of `b`.
  // `+ 0.0` collapses -0.0 to 0.0 before comparing: Double.compare alone
  // orders -0.0 < 0.0, but Spark's sort (nanSafeCompareDoubles) and the
  // DuckDB oracle treat them as equal and fall to the vec_id tiebreak —
  // and a -0.0 cosine is reachable (dot of -0.0 over positive norms).
  private def beats(a: ScoredId, b: ScoredId): Boolean = {
    val c = java.lang.Double.compare(a.cosine + 0.0, b.cosine + 0.0)
    c > 0 || (c == 0 && a.vec_id < b.vec_id)
  }

  override def zero: List[ScoredId] = Nil

  // buffer kept WORST-FIRST (r16): the common case on a long stream —
  // buffer full, candidate out-ranked by the kth-best — is then an
  // O(1) head check; the best-first form paid an O(k) buf.last
  // traversal on every input row. finish() reverses to best-first,
  // so the emitted ranking is identical.
  private def insert(buf: List[ScoredId], in: ScoredId): List[ScoredId] =
    if (buf.lengthCompare(k) >= 0 && beats(buf.head, in)) buf // full and out-ranked
    else {
      val (pre, post) = buf.span(e => beats(in, e))
      val merged = pre ::: in :: post
      if (merged.lengthCompare(k) > 0) merged.tail else merged // drop the worst
    }

  override def reduce(buf: List[ScoredId], in: ScoredId): List[ScoredId] = insert(buf, in)

  override def merge(x: List[ScoredId], y: List[ScoredId]): List[ScoredId] =
    y.foldLeft(x)(insert)

  override def finish(buf: List[ScoredId]): Seq[ScoredId] = buf.reverse

  override def bufferEncoder: Encoder[List[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

/** One (id, score) candidate with an exact BIGINT score. */
final case class LongScoredId(vec_id: Long, score: Long)

/** [[TopKByScore]] with an exact Long score — for rankings defined in
  * integer arithmetic (priority sampling's n_chars·2^32 div (h+1)).
  * Casting such scores to Double collapses distinct values above 2^53
  * (n_chars ≳ 2^21 in the priority-sampling case), where the engine's
  * top-k order could diverge from an oracle's exact BIGINT order; the
  * long-keyed buffer keeps the determinism claim unconditional. */
final class TopKByLongScore(k: Int)
    extends Aggregator[LongScoredId, List[LongScoredId], Seq[LongScoredId]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  // strict total order when ids are unique: (score DESC, id ASC), exact
  private def beats(a: LongScoredId, b: LongScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.vec_id < b.vec_id)

  override def zero: List[LongScoredId] = Nil

  // worst-first buffer, O(1) full-reject; finish reverses (see
  // TopKByScore)
  private def insert(buf: List[LongScoredId], in: LongScoredId): List[LongScoredId] =
    if (buf.lengthCompare(k) >= 0 && beats(buf.head, in)) buf // full and out-ranked
    else {
      val (pre, post) = buf.span(e => beats(in, e))
      val merged = pre ::: in :: post
      if (merged.lengthCompare(k) > 0) merged.tail else merged // drop the worst
    }

  override def reduce(buf: List[LongScoredId], in: LongScoredId): List[LongScoredId] =
    insert(buf, in)

  override def merge(x: List[LongScoredId], y: List[LongScoredId]): List[LongScoredId] =
    y.foldLeft(x)(insert)

  override def finish(buf: List[LongScoredId]): Seq[LongScoredId] = buf.reverse

  override def bufferEncoder: Encoder[List[LongScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[LongScoredId]] = ExpressionEncoder()
}

/** One (term, score) candidate with an exact BIGINT score. */
final case class ScoredTerm(term: String, score: Long)

/** [[TopKByLongScore]] keyed by a string — for per-group term rankings
  * (tf-idf top terms, operators/Retrieval.scala) where the
  * deterministic tiebreak is the term itself: (score DESC, term ASC).
  * String comparison is Java's UTF-16 code-unit order, which agrees
  * with Spark's and DuckDB's binary UTF-8 collation on all BMP
  * characters (and exactly on the ASCII corpus the oracle checks). */
final class TopKTermsByLongScore(k: Int)
    extends Aggregator[ScoredTerm, List[ScoredTerm], Seq[ScoredTerm]] {
  require(k > 0, s"top-k needs k > 0, got $k")

  // strict total order when terms are unique per group
  private def beats(a: ScoredTerm, b: ScoredTerm): Boolean =
    a.score > b.score || (a.score == b.score && a.term < b.term)

  override def zero: List[ScoredTerm] = Nil

  // worst-first buffer, O(1) full-reject; finish reverses (see
  // TopKByScore)
  private def insert(buf: List[ScoredTerm], in: ScoredTerm): List[ScoredTerm] =
    if (buf.lengthCompare(k) >= 0 && beats(buf.head, in)) buf // full and out-ranked
    else {
      val (pre, post) = buf.span(e => beats(in, e))
      val merged = pre ::: in :: post
      if (merged.lengthCompare(k) > 0) merged.tail else merged // drop the worst
    }

  override def reduce(buf: List[ScoredTerm], in: ScoredTerm): List[ScoredTerm] =
    insert(buf, in)

  override def merge(x: List[ScoredTerm], y: List[ScoredTerm]): List[ScoredTerm] =
    y.foldLeft(x)(insert)

  override def finish(buf: List[ScoredTerm]): Seq[ScoredTerm] = buf.reverse

  override def bufferEncoder: Encoder[List[ScoredTerm]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredTerm]] = ExpressionEncoder()
}
