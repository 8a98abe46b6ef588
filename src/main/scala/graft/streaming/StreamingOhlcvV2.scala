package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.model.{BarState, RunningBar}
import graft.streaming.StreamingOhlcv.TimedTrade

/** transformWithState (Spark 4 "arbitrary stateful processing v2")
  * implementation of the keyed OHLCV engine — same semantics as
  * `StreamingOhlcv.statefulBars` (A3–A8, grid-aligned windows,
  * watermark-driven final bars), expressed through the new
  * `StatefulProcessor` API. Kept alongside the
  * `flatMapGroupsWithState` engine: v2 brings typed state handles,
  * TTL, and timers decoupled from the input path — but it requires the
  * RocksDB state store provider, so the v1 engine remains the default.
  */
class OhlcvProcessor(widthMs: Long, emitRunning: Boolean)
    extends StatefulProcessor[String, TimedTrade, RunningBar] {

  // One state-store entry per open window — v2's native MapState (the
  // value-state Avro encoder rejects MapType; per-window entries also
  // avoid rewriting the whole map on every event).
  @transient private var bars: MapState[Long, BarState] = _
  // The single armed timer's timestamp (absent = none). registerTimer
  // ADDS timers (unlike v1's replacing setTimeoutTimestamp), so the
  // engine must delete before re-arming — but a list+delete+register
  // round per key per BATCH is three timer-CF writes even when the
  // target never moved; tracking the armed value makes the steady
  // state (same earliest open window) zero timer writes.
  @transient private var armed: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    bars = getHandle.getMapState[Long, BarState](
      "bars", Encoders.scalaLong, Encoders.product[BarState], TTLConfig.NONE)
    armed = getHandle.getValueState[Long](
      "armedTimer", Encoders.scalaLong, TTLConfig.NONE)
  }

  private def toBar(product: String, st: BarState, endOfWindow: Boolean): RunningBar =
    RunningBar(new java.sql.Timestamp(st.windowStart), product,
      st.open, st.high, st.low, st.close, st.volume, endOfWindow)

  /** Emit final bars for every window fully below the watermark, keep
    * the rest, arm a timer at the earliest next close — re-arming ONLY
    * when the target moved (see `armed`).
    *
    * A fired timer is consumed by the engine while `armed` still holds
    * its timestamp; that cannot strand a flush: the recomputed target
    * is ≥ watermark+1 > the fired timestamp, so the `cur != desired`
    * branch always re-arms after a firing (deleteTimer on the consumed
    * timer is a no-op). */
  private def finalize(product: String, watermark: Long): Iterator[RunningBar] = {
    val (closed, open) = bars.iterator().toSeq
      .partition { case (ws, _) => ws + widthMs <= watermark }
    closed.foreach { case (ws, _) => bars.removeKey(ws) }
    val desired =
      if (open.isEmpty) 0L
      else math.max(open.map(_._1).min + widthMs, watermark + 1)
    val cur = if (armed.exists()) armed.get() else 0L
    if (cur != desired) {
      if (cur != 0L) getHandle.deleteTimer(cur)
      else {
        // no tracked timer: sweep strays so a checkpoint written before
        // armed-timer tracking existed (one registered timer, no
        // armedTimer state) self-heals instead of firing twice
        getHandle.listTimers().foreach(t =>
          getHandle.deleteTimer(t.asInstanceOf[Long]))
      }
      if (desired != 0L) { getHandle.registerTimer(desired); armed.update(desired) }
      else armed.clear()
    }
    closed.sortBy(_._1).map { case (_, st) => toBar(product, st, endOfWindow = true) }
      .iterator
  }

  override def handleInputRows(
      product: String,
      rows: Iterator[TimedTrade],
      timerValues: TimerValues): Iterator[RunningBar] = {
    val out = Iterator.newBuilder[RunningBar]
    val sorted = rows.toArray.sortBy(t => (t.timestamp, t.instrument_id))
    // fold the batch per window LOCALLY, then write each touched window
    // ONCE: MapState get/put go through RocksDB + Avro codec per call,
    // so per-event access paid 3 store round trips per trade (the bulk
    // of the v2-vs-v1 throughput gap — v1's GroupState loads once per
    // key-batch). This is the same semantics with O(touched windows)
    // store ops instead of O(events).
    val local = scala.collection.mutable.HashMap.empty[Long, BarState]
    for (t <- sorted) {
      val ws = t.timestamp / widthMs * widthMs
      // getValue returns null on absence — one store read, where
      // containsKey-then-getValue paid two per touched window
      val prev = local.getOrElse(ws, {
        val existing = bars.getValue(ws)
        if (existing == null) BarState.init(ws) else existing
      })
      val st = BarState.updated(prev, t.timestamp, t.instrument_id, t.price, t.qty)
      local(ws) = st
      if (emitRunning) out += toBar(product, st, endOfWindow = false)
    }
    local.foreach { case (ws, st) => bars.updateValue(ws, st) }
    out.result() ++ finalize(product, timerValues.getCurrentWatermarkInMs())
  }

  override def handleExpiredTimer(
      product: String,
      timerValues: TimerValues,
      expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[RunningBar] =
    finalize(product, timerValues.getCurrentWatermarkInMs())
}

object StreamingOhlcvV2 {

  /** transformWithState variant of StreamingOhlcv.statefulBars. The
    * session must run the RocksDB state store provider:
    * spark.sql.streaming.stateStore.providerClass=
    * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider */
  def statefulBars(
      tradesWithTs: DataFrame,
      widthMs: Long,
      emitRunning: Boolean): Dataset[RunningBar] = {
    val spark = tradesWithTs.sparkSession
    import spark.implicits._
    val mode = if (emitRunning) OutputMode.Update() else OutputMode.Append()
    tradesWithTs.as[TimedTrade]
      .groupByKey(_.product)
      .transformWithState(new OhlcvProcessor(widthMs, emitRunning),
        TimeMode.EventTime(), mode)
  }
}
