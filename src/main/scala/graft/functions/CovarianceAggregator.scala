package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact integer moment sums for one (i, j) covariance cell. */
final case class CovCell(
    dim_i: Int, dim_j: Int, n: Long, sum_i: Long, sum_j: Long, s_ij: Long)

/** Running second-moment buffer: count, per-dim sums, and the upper
  * triangle of the Gram matrix in row-major packed order. */
final case class CovBuf(n: Long, sums: Array[Long], prods: Array[Long])

/** One-pass d×d covariance moments over integer-quantized vectors —
  * the distributed X^T X building block behind PCA/whitening of an
  * embedding table.
  *
  * Scale shape: each map task folds its rows into ONE fixed-size
  * buffer (d sums + d(d+1)/2 products + a count — ~17 KB at d = 64);
  * `merge` is elementwise addition, so the exchange carries one buffer
  * per partition, independent of row count. The naive alternative —
  * exploding every row into d² (i, j, xᵢ·xⱼ) tuples through a groupBy —
  * multiplies scan output by d² before the combiner sees it; here the
  * multiplication happens inside the buffer fold.
  *
  * All arithmetic is exact BIGINT on milli-quantized inputs, so the
  * oracle replays every moment bit-for-bit. Bounds: |x| ≤ m milli units
  * gives |s_ij| ≤ n·m²; at m ≈ 10³ (unit-norm embeddings) the Long
  * headroom reaches n ≈ 10¹² rows — move to per-partition BigDecimal
  * merge if a corpus outgrows that. */
final class CovarianceSums(d: Int)
    extends Aggregator[Array[Long], CovBuf, Seq[CovCell]] {
  require(d > 0, s"covariance needs d > 0, got $d")
  private val packed = d * (d + 1) / 2

  override def zero: CovBuf = CovBuf(0L, new Array[Long](d), new Array[Long](packed))

  override def reduce(buf: CovBuf, x: Array[Long]): CovBuf = {
    require(x.length == d, s"expected dim $d, got ${x.length}")
    var i = 0
    var k = 0
    while (i < d) {
      buf.sums(i) += x(i)
      var j = i
      while (j < d) {
        buf.prods(k) += x(i) * x(j)
        j += 1
        k += 1
      }
      i += 1
    }
    CovBuf(buf.n + 1, buf.sums, buf.prods)
  }

  override def merge(a: CovBuf, b: CovBuf): CovBuf = {
    var i = 0
    while (i < d) { a.sums(i) += b.sums(i); i += 1 }
    var k = 0
    while (k < packed) { a.prods(k) += b.prods(k); k += 1 }
    CovBuf(a.n + b.n, a.sums, a.prods)
  }

  override def finish(buf: CovBuf): Seq[CovCell] = {
    val out = Seq.newBuilder[CovCell]
    var i = 0
    var k = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out += CovCell(i, j, buf.n, buf.sums(i), buf.sums(j), buf.prods(k))
        j += 1
        k += 1
      }
      i += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[CovBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[CovCell]] = ExpressionEncoder()
}
