package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.{BarState, RunningBar, Trade}

/** Streaming OHLCV engines (SURVEY.md §2.4–2.5).
  *
  * Two shapes, mirroring the reference's two generations:
  *
  *  1. `windowedBars` — declarative tumbling-window aggregation
  *     (A1/W2/W3: /root/reference/old/flink.py:42-67 TUMBLE SQL,
  *     /root/reference/3_ohlc.py:62). Append mode: one final bar per
  *     (key, window) once the watermark passes window end. This is the
  *     scale path — partial aggregation collapses each (key, window) to
  *     one state row; state size is key-cardinality × open windows, not
  *     events.
  *
  *  2. `statefulBars` — keyed explicit state via flatMapGroupsWithState
  *     (A3–A8: /root/reference/4_ohlc.py:25-59 continuous running-bar
  *     emit; /root/reference/7_ohlc.py:64-98 grid-aligned windows with
  *     end-of-window final emit; A7 timer flush via EventTimeTimeout,
  *     /root/reference/6_ohlc.py:98-103). Update mode emits the running
  *     bar after every event (the reference's per-event emission,
  *     /root/reference/4_ohlc.py:47-56); append mode emits only final
  *     bars when the watermark passes window end.
  *
  * Watermark slack choices preserved as parameters (W6 0s monotonous /
  * W7 5s / W8 60s — /root/reference/4_ohlc.py:95-99,
  * /root/reference/old/kfk.py:108-112). Flink's allowed_lateness
  * re-firing (W5, /root/reference/3_ohlc.py:63) is realized by
  * [[statefulBarsWithLateness]]: fire at the true watermark, retain the
  * closed window for the lateness horizon, re-emit a corrected bar per
  * allowed late event, drop beyond.
  *
  * State scale: per-key state is a handful of open windows × 6 doubles —
  * at the reference's 2,000 keys that is trivially small; at 10^8 keys it
  * is a few GB spread over the cluster's state stores, still fine because
  * eviction is watermark-driven (no unbounded growth).
  */
object StreamingOhlcv {

  /** Event-time column + watermark on a typed trade stream. */
  def withEventTime(trades: Dataset[Trade], slack: String = "0 seconds"): DataFrame =
    trades
      .withColumn("ts", timestamp_millis(col("timestamp")))
      .withWatermark("ts", slack)

  /** Declarative tumbling-window OHLCV (A1). Works identically on batch
    * and streaming DataFrames; in streaming use append output mode.
    *
    * @param tiebreak column ordering events with EQUAL event time —
    *   open/close are deterministic only if (ts, tiebreak) is unique per
    *   row. The instrument_id default matches the reference's data model
    *   but can collide for a busy instrument in the same millisecond;
    *   feed Kafka lineage (`KafkaIO.parseTradesWithLineage` →
    *   struct(kafka_partition, kafka_offset)) when strict run-to-run
    *   determinism is required.
    *
    * The ordering key stays `struct(ts, tiebreak)` HERE even though
    * batch `Ohlcv.bars` auto-packs integral tiebreaks into the atomic
    * DECIMAL key — the tradeoffs INVERT for an always-on query:
    * (1) switching the min_by/max_by buffer type would fail
    * StateSchemaCompatibility on restart from an existing checkpoint,
    * stranding open-window state; (2) packedOrd's guards (out-of-range
    * timestamp, NULL tiebreak) raise, and in streaming one corrupt
    * record becomes a poison pill — crash, restart from checkpoint,
    * replay the same offset, crash again; (3) the struct key degrades
    * gracefully on a NULL tiebreak — the row still orders by ts —
    * which is the right always-on behavior where a raise is not.
    * Batch re-plans per run and fails loudly at the operator's edge
    * (both guards), so it can afford the HashAggregate win; the
    * streaming struct sort is bounded per micro-batch partial group.
    * PlanShapeSpec pins this choice. */
  def windowedBars(tradesWithTs: DataFrame, width: String,
      tiebreak: Column = col("instrument_id")): DataFrame = {
    val ord = struct(col("ts"), tiebreak)
    tradesWithTs
      .groupBy(window(col("ts"), width).as("w"), col("product"))
      .agg(
        min_by(col("price"), ord).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), ord).as("close"),
        sum(col("qty")).as("volume"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("product"), col("open"), col("high"), col("low"), col("close"),
        col("volume"))
  }

  /** Multi-resolution streaming cascade — the reference's dual 1-min +
    * 5-min bars from one stream (/root/reference/old/flink.py:42-67),
    * but as ONE chained query instead of two independent scans: fine
    * bars aggregate the raw stream, coarse bars aggregate the fine bars
    * (stacked windowed aggregations, event-time carried through
    * `window_time`). The coarse stage's input is already
    * key×fine-window sized — at 100 TB the second stage shuffles
    * bar-counts, not event-counts. Append mode: each resolution emits
    * once its watermark passes. */
  def cascadeBars(tradesWithTs: DataFrame, fine: String, coarse: String,
      tiebreak: Column = col("instrument_id")): DataFrame = {
    // uniqueness contract AND the deliberate struct-not-packed key
    // (checkpoint schema, poison pill, null tolerance): see windowedBars
    val ord = struct(col("ts"), tiebreak)

    val fineBars = tradesWithTs
      .groupBy(window(col("ts"), fine).as("w"), col("product"))
      .agg(
        min_by(col("price"), ord).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), ord).as("close"),
        sum(col("qty")).as("volume"))
    fineBars
      .withColumn("fine_start", col("w.start"))
      .groupBy(window(window_time(col("w")), coarse).as("cw"), col("product"))
      .agg(
        min_by(col("open"), col("fine_start")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("fine_start")).as("close"),
        sum(col("volume")).as("volume"))
      .select(col("cw.start").as("window_start"), col("cw.end").as("window_end"),
        col("product"), col("open"), col("high"), col("low"), col("close"),
        col("volume"))
  }

  /** Trade + derived event-time for the typed stateful path. */
  final case class TimedTrade(
      timestamp: Long, instrument_id: String, product: String,
      price: Double, qty: Long, ts: java.sql.Timestamp)

  /** Per-product state: one BarState per open grid-aligned window
    * (the reference holds exactly one, /root/reference/7_ohlc.py:66 —
    * a map tolerates out-of-order arrival across window boundaries
    * within the watermark, which a replayed log produces). */
  final case class ProductBars(bars: Map[Long, BarState])

  private def toBar(product: String, st: BarState, endOfWindow: Boolean): RunningBar =
    RunningBar(new java.sql.Timestamp(st.windowStart), product,
      st.open, st.high, st.low, st.close, st.volume, endOfWindow)

  /** Keyed stateful OHLCV with grid-aligned N-minute windows
    * (/root/reference/7_ohlc.py:64: window_start = minute // N * N).
    *
    * @param emitRunning update-mode per-event running bars
    *   (/root/reference/4_ohlc.py:47-56); false → append-mode final bars
    *   only (/root/reference/7_ohlc.py:96-98)
    * @param elapsedAlign A5's OTHER alignment — first-event-anchored
    *   elapsed-time windows (/root/reference/6_ohlc.py:71-82) instead
    *   of the grid: see [[processElapsed]]
    */
  def statefulBars(
      tradesWithTs: DataFrame,
      widthMs: Long,
      emitRunning: Boolean,
      elapsedAlign: Boolean = false): Dataset[RunningBar] = {
    // The elapsed path anchors each window at the FIRST event's minute
    // (the reference's replace(second=0)); a sub-minute or off-minute
    // width would let that anchor precede the first event by up to 59s,
    // silently making the first bar span far more than one width.
    if (elapsedAlign) require(widthMs >= 60000L && widthMs % 60000L == 0L,
      s"elapsedAlign windows are minute-anchored (6_ohlc.py replace(second=0)): " +
        s"widthMs=$widthMs must be a positive whole number of minutes")
    val spark = tradesWithTs.sparkSession
    import spark.implicits._
    val mode = if (emitRunning) OutputMode.Update() else OutputMode.Append()

    tradesWithTs.as[TimedTrade]
      .groupByKey(_.product)
      .flatMapGroupsWithState(mode, GroupStateTimeout.EventTimeTimeout)(
        if (elapsedAlign) processElapsed(widthMs, emitRunning)
        else process(widthMs, emitRunning))
  }

  /** The per-key transition function — the Spark analog of the
    * reference's ProcessFunction (/root/reference/7_ohlc.py:45-98), with
    * the never-armed on_timer intent (/root/reference/6_ohlc.py:98-103)
    * realized via event-time timeout. */
  private[streaming] def process(widthMs: Long, emitRunning: Boolean)(
      product: String,
      events: Iterator[TimedTrade],
      state: GroupState[ProductBars]): Iterator[RunningBar] = {

    val watermark = if (state.getCurrentWatermarkMs() > 0) state.getCurrentWatermarkMs() else 0L
    var bars = state.getOption.map(_.bars).getOrElse(Map.empty[Long, BarState])
    val out = Iterator.newBuilder[RunningBar]

    if (!state.hasTimedOut) {
      // BarState.updated is order-independent (event-time-stamped
      // open/close), so correctness never depends on arrival order —
      // sorting only makes the running-bar emission sequence readable.
      val sorted = events.toArray.sortBy(t => (t.timestamp, t.instrument_id))
      for (t <- sorted) {
        val ws = t.timestamp / widthMs * widthMs // grid align, 7_ohlc.py:64
        val st = BarState.updated(bars.getOrElse(ws, BarState.init(ws)),
          t.timestamp, t.instrument_id, t.price, t.qty)
        bars = bars.updated(ws, st)
        if (emitRunning) out += toBar(product, st, endOfWindow = false)
      }
    }

    // Watermark-driven finalization: every window fully below the
    // watermark emits its final bar (end_of_window=true,
    // /root/reference/7_ohlc.py:67-69) and is evicted.
    val (closed, open) = bars.partition { case (ws, _) => ws + widthMs <= watermark }
    closed.toSeq.sortBy(_._1).foreach { case (_, st) =>
      out += toBar(product, st, endOfWindow = true)
    }

    if (open.isEmpty) state.remove()
    else {
      state.update(ProductBars(open))
      // Wake when the earliest open window can close. Timeout timestamps
      // must exceed the current watermark.
      val nextClose = open.keys.min + widthMs
      state.setTimeoutTimestamp(math.max(nextClose, watermark + 1))
    }
    out.result()
  }

  /** A5's elapsed-time alignment — the reference's 6_ohlc.py:71-82
    * semantics, the one window shape its grid twin cannot express: the
    * window anchors at the FIRST event's minute (`replace(second=0)` —
    * NOT the N-minute grid), and rolls over when an event arrives
    * `widthMs` or more after the anchor, emitting the closed bar and
    * re-anchoring at the triggering event's own minute. A trade at
    * 1:30 with N=2 min opens a [1:00, 3:00) window where the grid
    * buckets it into [0:00, 2:00) — and after a quiet gap the next
    * window re-anchors wherever traffic resumes instead of snapping to
    * the grid.
    *
    * The reference transitions in arrival order; this twin processes
    * event-time order within the watermark (the repo-wide
    * batch-equivalence convention), and an out-of-order event OLDER
    * than the open anchor folds into the open window (BarState.updated
    * is event-time-stamped, so open/close stay correct). The
    * quiet-stream close the reference intends via its never-armed
    * on_timer (6_ohlc.py:98-103) fires here through the event-time
    * timeout: the open window finals once the watermark passes
    * anchor + width. State is ONE open window per product — the
    * reference's exact shape — carried in the same [[ProductBars]] map
    * as the grid path so both ride one state encoder. */
  private[streaming] def processElapsed(widthMs: Long, emitRunning: Boolean)(
      product: String,
      events: Iterator[TimedTrade],
      state: GroupState[ProductBars]): Iterator[RunningBar] = {
    val watermark = math.max(state.getCurrentWatermarkMs(), 0L)
    var cur = state.getOption.flatMap(_.bars.values.headOption)
    val out = Iterator.newBuilder[RunningBar]

    if (!state.hasTimedOut) {
      val sorted = events.toArray.sortBy(t => (t.timestamp, t.instrument_id))
      for (t <- sorted) {
        // rollover test: now − start ≥ width (6_ohlc.py:78-80) — emit
        // the closed bar, then re-anchor at this event's minute
        cur.filter(st => t.timestamp - st.windowStart >= widthMs).foreach { st =>
          out += toBar(product, st, endOfWindow = true)
          cur = None
        }
        val st0 = cur.getOrElse(BarState.init(t.timestamp / 60000L * 60000L))
        val st = BarState.updated(st0, t.timestamp, t.instrument_id, t.price, t.qty)
        cur = Some(st)
        if (emitRunning) out += toBar(product, st, endOfWindow = false)
      }
    }

    // watermark-driven close of a quiet open window (the on_timer intent)
    cur.filter(st => st.windowStart + widthMs <= watermark).foreach { st =>
      out += toBar(product, st, endOfWindow = true)
      cur = None
    }

    cur match {
      case None => state.remove()
      case Some(st) =>
        state.update(ProductBars(Map(st.windowStart -> st)))
        state.setTimeoutTimestamp(
          math.max(st.windowStart + widthMs, watermark + 1))
    }
    out.result()
  }

  /** Per-product lateness state: open/retained windows plus the set of
    * windows that already fired their first final bar (Seq, not Set —
    * product encoders cover Seq on every Spark line this builds on). */
  final case class LatenessBars(bars: Map[Long, BarState], fired: Seq[Long])

  /** W5 — Flink allowed-lateness re-fire semantics
    * (/root/reference/3_ohlc.py:63, `allowed_lateness(10*1000)`):
    * a window FIRES its bar when the true watermark passes window end,
    * then its state is RETAINED for `latenessMs` more; each late event
    * landing in that grace window updates the bar and re-emits it
    * immediately (one corrected bar per late element — exactly Flink's
    * event-time trigger on a late firing); events later than the
    * horizon are dropped.
    *
    * Spark filters input rows below the watermark before they reach the
    * state function, so the stream's watermark DELAY must absorb the
    * full grace an acceptable late event can need. Flink accepts any
    * element of a window whose `end + lateness` the watermark has not
    * passed — the element itself may sit a full window-width EARLIER
    * than that horizon (ts = windowStart, horizon = windowStart +
    * width + lateness). Pass `withEventTime(trades,
    * slack + width + lateness)` and hand `widthMs`/`latenessMs` here;
    * then sparkWatermark = trueWatermark − width − lateness, and the
    * function reconstructs Flink's two horizons from it:
    * fire when `windowEnd ≤ sparkWatermark + width + lateness`
    * (= trueWatermark ≥ end), evict when `windowStart ≤ sparkWatermark`
    * (= trueWatermark ≥ end + lateness). Because every live window has
    * `windowStart > sparkWatermark`, no element of a live window can be
    * dropped by Spark's pre-filter — a late event ANYWHERE inside a
    * retained window re-fires, exactly Flink's acceptance test.
    *
    * Output is Update-mode by nature: a re-fire REPLACES the previous
    * bar for its (window, product) — downstream keyed upsert, same as
    * Flink's late firings. State stays bounded: open windows + fired
    * windows inside one lateness horizon, watermark-evicted. */
  def statefulBarsWithLateness(
      tradesWithTs: DataFrame,
      widthMs: Long,
      latenessMs: Long): Dataset[RunningBar] = {
    val spark = tradesWithTs.sparkSession
    import spark.implicits._
    tradesWithTs.as[TimedTrade]
      .groupByKey(_.product)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout)(
        processWithLateness(widthMs, latenessMs))
  }

  private[streaming] def processWithLateness(widthMs: Long, latenessMs: Long)(
      product: String,
      events: Iterator[TimedTrade],
      state: GroupState[LatenessBars]): Iterator[RunningBar] =
    latenessCore(widthMs, latenessMs)(product, events, state)._1.iterator

  /** Shared lateness engine core: returns the (re-)fired bars AND the
    * events discarded as beyond the horizon — the drop list feeds the
    * side-output variant, the plain variant ignores it. */
  private def latenessCore(widthMs: Long, latenessMs: Long)(
      product: String,
      events: Iterator[TimedTrade],
      state: GroupState[LatenessBars]): (Seq[RunningBar], Seq[TimedTrade]) = {

    // sparkWatermark = maxEventTime − (slack + width + lateness). Both
    // Flink horizons shift down by (width + lateness): fire when
    // sparkWM ≥ end − width − lateness = start − lateness, evict when
    // sparkWM ≥ end − width = start. A still-at-zero watermark means
    // "not established yet" — deriving a fire line from it would fire
    // epoch-adjacent windows prematurely, so hold both lines at 0.
    val sparkWm = math.max(state.getCurrentWatermarkMs(), 0L)
    val fireLine = if (sparkWm == 0L) 0L else sparkWm + widthMs + latenessMs
    val prev = state.getOption.getOrElse(LatenessBars(Map.empty, Seq.empty))
    var bars = prev.bars
    var fired = prev.fired.toSet
    val out = Seq.newBuilder[RunningBar]
    val droppedB = Seq.newBuilder[TimedTrade]

    if (!state.hasTimedOut) {
      val sorted = events.toArray.sortBy(t => (t.timestamp, t.instrument_id))
      for (t <- sorted) {
        val ws = t.timestamp / widthMs * widthMs
        // Flink's acceptance test: window alive while trueWatermark <
        // end + lateness ⟺ ws > sparkWm. The pre-filter only drops
        // ts < sparkWm, and every element of a live window has
        // ts ≥ ws > sparkWm — so nothing acceptable is lost upstream.
        if (ws > sparkWm) {
          val st = BarState.updated(bars.getOrElse(ws, BarState.init(ws)),
            t.timestamp, t.instrument_id, t.price, t.qty)
          bars = bars.updated(ws, st)
          // late element into an already-fired window → immediate re-fire
          if (fired(ws)) out += toBar(product, st, endOfWindow = true)
        } else droppedB += t // beyond the horizon: Flink's late-data discard
      }
    }

    // initial firing: window end at/below the TRUE watermark, not fired yet
    bars.keys.filter(ws => ws + widthMs <= fireLine && !fired(ws)).toSeq.sorted
      .foreach { ws =>
        out += toBar(product, bars(ws), endOfWindow = true)
        fired += ws
      }

    // eviction: lateness horizon passed (end + lateness ≤ true watermark)
    val (dead, alive) = bars.partition { case (ws, _) => ws <= sparkWm }
    bars = alive
    fired = fired -- dead.keys

    if (bars.isEmpty) state.remove()
    else {
      state.update(LatenessBars(bars, fired.toSeq.sorted))
      // wake at the earlier of the next unfired close (reached when the
      // spark watermark hits start − lateness) or the next eviction
      // (spark watermark reaching start)
      val wakeAt = bars.keys.map(ws =>
        if (fired(ws)) ws else ws - latenessMs).min
      state.setTimeoutTimestamp(math.max(wakeAt, sparkWm + 1))
    }
    (out.result(), droppedB.result())
  }

  /** Routed row of [[statefulBarsWithSideOutput]]: `side = "bar"`
    * carries a (re-)fired bar, `side = "late"` carries an event
    * discarded as beyond the lateness horizon. */
  final case class RoutedOutput(
      side: String,
      bar: Option[RunningBar],
      dropped: Option[TimedTrade])

  /** The lateness engine with Flink's `sideOutputLateData`: identical
    * bar semantics to [[statefulBarsWithLateness]], but events beyond
    * the `end + lateness` horizon are EMITTED on a tagged side channel
    * instead of silently discarded — downstream splits with two
    * filters on `side` (the idiomatic Spark shape for Flink's
    * OutputTag: one stateful operator, a tagged union row, cheap
    * post-filters). Late-data accounting is a first-class production
    * concern: the side channel is what feeds drop-rate monitoring and
    * dead-letter reprocessing.
    *
    * Boundary vs Flink: the side channel observes every drop that
    * reaches the state function — anything inside the absorbed
    * watermark delay (slack + width + lateness). An event older than
    * the whole delay is removed by Spark's pre-stateful filter
    * upstream and cannot be observed here; Flink, whose operators see
    * all elements, side-outputs those too. Widen the absorbed slack if
    * the monitoring window must extend further back. */
  def statefulBarsWithSideOutput(
      tradesWithTs: DataFrame,
      widthMs: Long,
      latenessMs: Long): Dataset[RoutedOutput] = {
    val spark = tradesWithTs.sparkSession
    import spark.implicits._
    tradesWithTs.as[TimedTrade]
      .groupByKey(_.product)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout) {
        (product: String, events: Iterator[TimedTrade], state: GroupState[LatenessBars]) =>
          val (barsOut, drops) = latenessCore(widthMs, latenessMs)(product, events, state)
          (barsOut.map(b => RoutedOutput("bar", Some(b), None)) ++
            drops.map(t => RoutedOutput("late", None, Some(t)))).iterator
      }
  }

  /** Continuous "top movers": once the watermark closes a window, rank
    * its products by traded volume and keep the top k. The append-mode
    * windowed agg does the heavy lifting distributed (map-side partial
    * sums, one shuffle); each micro-batch then carries ONLY the freshly
    * closed (window, product) rows, so the per-batch rank is over a
    * bounded, already-aggregated frame — never the event stream. */
  def topMoversPerWindow(tradesWithTs: DataFrame, width: String, k: Int)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.expressions.{Window => W}
    val vol = tradesWithTs
      .groupBy(window(col("ts"), width).as("w"), col("product"))
      .agg(sum(col("qty")).as("volume"))
      .select(col("w.start").as("window_start"), col("product"), col("volume"))
    vol.writeStream.outputMode("append").foreachBatch { (batch: DataFrame, _: Long) =>
      val rankW = W.partitionBy(col("window_start"))
        .orderBy(col("volume").desc, col("product"))
      sink(batch.withColumn("rnk", row_number().over(rankW)).filter(col("rnk") <= k))
    }.start()
  }
}
