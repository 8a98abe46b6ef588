package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One 2^16-id block of a sparse bitmap: `chunk` = id >>> 16, `words`
  * = 1024 longs covering ids [chunk·2^16, (chunk+1)·2^16). */
final case class BitmapChunk(chunk: Long, words: Array[Long])

/** EXACT distinct count of non-negative Long ids through ONE ordinary
  * aggregation — the bitmap complement of the HLL/KMV sketches: same
  * single-shuffle shape (per-(group, partition) partials merged
  * associatively), zero error.
  *
  * Why it matters at scale: Spark's exact `count_distinct` plans an
  * Expand + two-phase aggregate whose shuffle carries the raw distinct
  * ids — at 100 TB that is the id population itself on the wire. This
  * buffer ships at most `ceil(domain / 2^16)` 8 KiB chunks per (group ×
  * map partition), dense regions cost 1 bit per id, and only TOUCHED
  * chunks exist (the sparse-list form of a roaring bitmap's array/
  * bitmap containers; run-length containers are the production upgrade
  * for contiguous id ranges).
  *
  * Buffer: chunk-ascending sorted list; reduce mutates the hit word in
  * place, merge is a sorted-list walk OR-ing paired chunks — both
  * associative and commutative, so map-side partials combine in any
  * order. Ids must be ≥ 0 (dictionary-encode first otherwise). */
final class BitmapDistinct extends Aggregator[Long, List[BitmapChunk], Long] {
  private val WordsPerChunk = 1024

  override def zero: List[BitmapChunk] = Nil

  private def fresh(off: Int): Array[Long] = {
    val w = new Array[Long](WordsPerChunk)
    w(off >> 6) = 1L << (off & 63)
    w
  }

  override def reduce(b: List[BitmapChunk], id: Long): List[BitmapChunk] = {
    require(id >= 0, s"bitmap-distinct needs non-negative ids, got $id")
    val c = id >>> 16
    val off = (id & 0xFFFFL).toInt
    def go(l: List[BitmapChunk]): List[BitmapChunk] = l match {
      case Nil => BitmapChunk(c, fresh(off)) :: Nil
      case h :: _ if h.chunk == c =>
        h.words(off >> 6) |= 1L << (off & 63); l
      case h :: t if h.chunk < c => h :: go(t)
      case _ => BitmapChunk(c, fresh(off)) :: l
    }
    go(b)
  }

  override def merge(x: List[BitmapChunk], y: List[BitmapChunk]): List[BitmapChunk] =
    (x, y) match {
      case (Nil, r) => r
      case (l, Nil) => l
      case (hx :: tx, hy :: ty) =>
        if (hx.chunk < hy.chunk) hx :: merge(tx, y)
        else if (hx.chunk > hy.chunk) hy :: merge(x, ty)
        else {
          var i = 0
          while (i < WordsPerChunk) { hx.words(i) |= hy.words(i); i += 1 }
          hx :: merge(tx, ty)
        }
    }

  override def finish(b: List[BitmapChunk]): Long = {
    var n = 0L
    b.foreach { ch =>
      var i = 0
      while (i < WordsPerChunk) { n += java.lang.Long.bitCount(ch.words(i)); i += 1 }
    }
    n
  }

  override def bufferEncoder: Encoder[List[BitmapChunk]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Long] = ExpressionEncoder()
}
