package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed OHLCV aggregator — the UDAF surface of SURVEY.md §2.7 (the
  * reference's `calculate_ohlc` UDF, /root/reference/old/kfk.py:35-50,
  * which buffered a window's rows and took elements[0]/[-1]/max/min).
  *
  * Buffering whole windows does not survive scale; this Aggregator is
  * the incremental, merge-associative reformulation: the buffer carries
  * the (event-time, tiebreak)-stamped first/last prices plus running
  * high/low/volume, so `merge` is order-independent and Spark can
  * partial-aggregate map-side and combine across shuffle partitions in
  * any order — the same contract as the built-in min_by/max_by plan
  * (operators/Ohlcv.scala) but exercised through the typed
  * `Aggregator`/`udaf` path.
  *
  * Input rows: (tsTicks event-time ticks in any fixed unit — only compared,
  * never converted — price, qty, tiebreak) where tiebreak
  * makes (tsTicks, tiebreak) unique per trade (Kafka offset / event id).
  */
final case class TradePoint(tsTicks: Long, price: Double, qty: Long, tiebreak: Long)

final case class OhlcvBuf(
    openTs: Long, openTb: Long, open: Double,
    closeTs: Long, closeTb: Long, close: Double,
    high: Double, low: Double, volume: Long, n: Long)

final case class OhlcvResult(
    open: Double, high: Double, low: Double, close: Double, volume: Long)

class OhlcvAggregator extends Aggregator[TradePoint, OhlcvBuf, OhlcvResult] {

  // init semantics preserved from the reference state POJO
  // (/root/reference/5_ohlc.py:27-34): high=-inf, low=+inf, volume=0.
  override def zero: OhlcvBuf = OhlcvBuf(
    Long.MaxValue, Long.MaxValue, Double.NaN,
    Long.MinValue, Long.MinValue, Double.NaN,
    Double.NegativeInfinity, Double.PositiveInfinity, 0L, 0L)

  private def earlier(ts1: Long, tb1: Long, ts2: Long, tb2: Long): Boolean =
    ts1 < ts2 || (ts1 == ts2 && tb1 < tb2)

  override def reduce(b: OhlcvBuf, t: TradePoint): OhlcvBuf = {
    val (oTs, oTb, o) =
      if (b.n == 0L || earlier(t.tsTicks, t.tiebreak, b.openTs, b.openTb))
        (t.tsTicks, t.tiebreak, t.price) else (b.openTs, b.openTb, b.open)
    val (cTs, cTb, c) =
      if (b.n == 0L || earlier(b.closeTs, b.closeTb, t.tsTicks, t.tiebreak))
        (t.tsTicks, t.tiebreak, t.price) else (b.closeTs, b.closeTb, b.close)
    OhlcvBuf(oTs, oTb, o, cTs, cTb, c,
      math.max(b.high, t.price), math.min(b.low, t.price),
      b.volume + t.qty, b.n + 1L)
  }

  override def merge(x: OhlcvBuf, y: OhlcvBuf): OhlcvBuf = {
    if (x.n == 0L) y
    else if (y.n == 0L) x
    else {
      val (oTs, oTb, o) =
        if (earlier(x.openTs, x.openTb, y.openTs, y.openTb))
          (x.openTs, x.openTb, x.open) else (y.openTs, y.openTb, y.open)
      val (cTs, cTb, c) =
        if (earlier(x.closeTs, x.closeTb, y.closeTs, y.closeTb))
          (y.closeTs, y.closeTb, y.close) else (x.closeTs, x.closeTb, x.close)
      OhlcvBuf(oTs, oTb, o, cTs, cTb, c,
        math.max(x.high, y.high), math.min(x.low, y.low),
        x.volume + y.volume, x.n + y.n)
    }
  }

  override def finish(b: OhlcvBuf): OhlcvResult =
    OhlcvResult(b.open, b.high, b.low, b.close, b.volume)

  override def bufferEncoder: Encoder[OhlcvBuf] = Encoders.product[OhlcvBuf]
  override def outputEncoder: Encoder[OhlcvResult] = Encoders.product[OhlcvResult]
}
