package graft.model

import org.apache.spark.sql.types._

/** Core record types of the engine, mirroring the reference's data model
  * (see SURVEY.md §1; reference schemas at /root/reference/3_ohlc.py:28,
  * /root/reference/old/kfk.py:13-29).
  *
  * Timestamps travel as epoch-millis longs on the wire (the reference's
  * convention) and are converted to Spark TimestampType at the ingest
  * edge, so that event-time windowing and watermarks work natively.
  */

/** 5-field trade event — the main-line stream record
  * (/root/reference/3_ohlc.py:28; generator /root/reference/old/gen.py:15-26).
  * `price` standardized to Double (the SQL variants declare DOUBLE,
  * /root/reference/old/flink.py:30). */
final case class Trade(
    timestamp: Long, // epoch ms, event time
    instrument_id: String,
    product: String, // grouping key
    price: Double,
    qty: Long)

/** Market-data quote — the second stream of the trade↔quote
  * stream-stream join (no reference analogue: its pipelines consume one
  * stream; a market-data engine needs the two-stream shape). */
final case class Quote(
    timestamp: Long, // epoch ms, event time
    product: String,
    bid: Double,
    ask: Double)

/** 13-field rich trade (/root/reference/old/kfk.py:13-29,70-91;
  * generator /root/reference/old/generate.py:19-33). */
final case class RichTrade(
    Timestamp: Long,
    InstrumentId: String,
    Product: String,
    Price: Double,
    Qty: Int,
    Direction: String,
    DirectAskCounterparty: Option[String],
    DirectBidCounterparty: Option[String],
    IsImplied: Boolean,
    IsLegTrade: Boolean,
    IsOtc: Boolean,
    OTCTradeType: Option[String],
    Id: String)

/** Window-framed OHLCV bar — the engine's primary output shape
  * (/root/reference/3_ohlc.py:25, /root/reference/old/flink.py:42-53).
  * open = first price in window by event time, close = last,
  * high/low = max/min, volume = Σqty. */
final case class Bar(
    window_start: java.sql.Timestamp,
    window_end: java.sql.Timestamp,
    product: String,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Long)

/** Mutable-bar state for the stateful streaming aggregator — the Spark
  * analog of the reference's keyed ValueState POJO
  * (/root/reference/7_ohlc.py:26-33 ProductState{high, low, open, close,
  * volume, start_of_window}). Initialization semantics preserved:
  * high=-inf, low=+inf, volume=0, open set once by the first event
  * (/root/reference/5_ohlc.py:27-34).
  *
  * open/close carry their (event-time, tiebreak) stamps so that a
  * late-but-within-watermark event arriving in a LATER micro-batch
  * still lands correctly: without the stamps, arrival order would
  * leak into open/close across batches (the reference, processing one
  * event at a time in arrival order, has the same defect by design —
  * we keep event-time semantics instead, matching OhlcvAggregator). */
final case class BarState(
    windowStart: Long, // epoch ms, grid-aligned
    open: Double,
    openTs: Long,
    openTie: String,
    high: Double,
    low: Double,
    close: Double,
    closeTs: Long,
    closeTie: String,
    volume: Long,
    events: Long)

object BarState {
  def init(windowStart: Long): BarState =
    BarState(windowStart, Double.NaN, Long.MaxValue, "", Double.MinValue,
      Double.MaxValue, Double.NaN, Long.MinValue, "", 0L, 0L)

  private def earlier(ts1: Long, tie1: String, ts2: Long, tie2: String): Boolean =
    ts1 < ts2 || (ts1 == ts2 && tie1 < tie2)

  /** Fold one event into the bar — order-independent: correct whatever
    * order events arrive in, within or across micro-batches. */
  def updated(st: BarState, tsMs: Long, tie: String, price: Double, qty: Long): BarState = {
    val first = st.events == 0L
    val (o, oTs, oTie) =
      if (first || earlier(tsMs, tie, st.openTs, st.openTie)) (price, tsMs, tie)
      else (st.open, st.openTs, st.openTie)
    val (c, cTs, cTie) =
      if (first || !earlier(tsMs, tie, st.closeTs, st.closeTie)) (price, tsMs, tie)
      else (st.close, st.closeTs, st.closeTie)
    BarState(st.windowStart, o, oTs, oTie,
      math.max(st.high, price), math.min(st.low, price),
      c, cTs, cTie, st.volume + qty, st.events + 1L)
  }
}

/** Running-bar emission for update-mode output (one per input event,
  * /root/reference/4_ohlc.py:48-55, /root/reference/7_ohlc.py:87-94). */
final case class RunningBar(
    time: java.sql.Timestamp, // window start
    product: String,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    volume: Long,
    end_of_window: Boolean)

object Schemas {
  /** Wire schema of the 5-field trade JSON (for from_json at the Kafka
    * edge), matching /root/reference/3_ohlc.py:29-30. */
  val trade: StructType = StructType(Seq(
    StructField("timestamp", LongType, nullable = false),
    StructField("instrument_id", StringType, nullable = true),
    StructField("product", StringType, nullable = true),
    StructField("price", DoubleType, nullable = true),
    StructField("qty", LongType, nullable = true)))

  /** Wire schema of the 13-field rich trade, with nullability mirroring
    * /root/reference/old/kfk.py:70-91 (fail_on_missing_field → all
    * fields declared, counterparty/OTC fields nullable). */
  val richTrade: StructType = StructType(Seq(
    StructField("Timestamp", LongType, nullable = false),
    StructField("InstrumentId", StringType, nullable = true),
    StructField("Product", StringType, nullable = true),
    StructField("Price", DoubleType, nullable = true),
    StructField("Qty", IntegerType, nullable = true),
    StructField("Direction", StringType, nullable = true),
    StructField("DirectAskCounterparty", StringType, nullable = true),
    StructField("DirectBidCounterparty", StringType, nullable = true),
    StructField("IsImplied", BooleanType, nullable = true),
    StructField("IsLegTrade", BooleanType, nullable = true),
    StructField("IsOtc", BooleanType, nullable = true),
    StructField("OTCTradeType", StringType, nullable = true),
    StructField("Id", StringType, nullable = true)))

  /** Nested SQL sink shape {window_start, ohlc{open,high,low,close}} —
    * the reference's only nested type (/root/reference/old/kfk.py:163-173). */
  val nestedBar: StructType = StructType(Seq(
    StructField("window_start", LongType, nullable = false),
    StructField("ohlc", StructType(Seq(
      StructField("open", DoubleType), StructField("high", DoubleType),
      StructField("low", DoubleType), StructField("close", DoubleType))))))
}
