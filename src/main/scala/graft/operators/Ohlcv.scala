package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Batch OHLCV candlestick aggregation — the heart of the reference
  * (SURVEY.md §2.5; semantics from /root/reference/old/flink.py:42-67 and
  * /root/reference/7_ohlc.py:64-78): per key and tumbling event-time
  * window, open = first price by event time, close = last, high = max,
  * low = min, volume = Σqty.
  *
  * Spark-first design: one `groupBy(window(ts, w), keys)` with
  * `min_by`/`max_by` aggregates ordered by a packed atomic
  * (ts, tiebreak) key ([[Ohlcv.packedOrd]]) so the plan is a
  * HashAggregate pair, not SortAggregate. This is a single
  * hash-partition shuffle on (window, keys) with map-side partial
  * aggregation — at 100 TB the partial agg collapses each (key, window)
  * to one row per map task before the exchange, so shuffle volume is
  * bounded by key-cardinality × windows, not by input rows. No buffering of window contents (the
  * reference's ProcessAllWindowFunction collected whole windows in memory,
  * /root/reference/3_ohlc.py:13-25 — that shape does not survive scale).
  *
  * Arrival-order open/close (the reference's elements[0]/elements[-1],
  * /root/reference/3_ohlc.py:19-20) is replaced by deterministic
  * event-time order with an explicit unique tiebreak column — batch Spark
  * has no row order, and neither does a replayed Kafka log (SURVEY.md
  * §7.4).
  */
object Ohlcv {

  /** Largest |unix_micros| the packed ordering key can hold:
    * (10^38 − 1 − 2^64) / 2^64 ≈ 5.4×10^18 µs ≈ ±171 millennia from
    * the epoch. Beyond it the DECIMAL(38,0) product would overflow, and
    * Spark's non-ANSI decimal overflow is a SILENT NULL (min_by ignores
    * null ordering keys → wrong open/close) — so the key raises
    * instead. Unreachable for any real timestamp. */
  private[operators] val MaxPackMicros = 5400000000000000000L

  /** Packed total-order key equal to `struct(ts, tiebreak)` ordering
    * for any NON-NULL integral tiebreak:
    * `unix_micros(ts) × 2^64 + (tiebreak − Long.MinValue)`, exact in
    * DECIMAL(38,0) (micros needs ≤63 bits, the shifted tiebreak exactly
    * 64, and DECIMAL(38,0) holds ~126). Why it exists: `min_by`/`max_by`
    * keyed by a struct carry an IMMUTABLE buffer field, which demotes
    * the whole aggregate to SortAggregate — a sort per partial group on
    * every map task, the one plan property of the flagship OHLCV family
    * that would not survive 100× key cardinality. One atomic DECIMAL
    * keeps every buffer slot mutable and the plan stays HashAggregate.
    * [[packedOrdSql]] is the same key as SQL text — edit both. */
  private[operators] def packedOrd(ts: Column, tiebreak: Column): Column = {
    val micros = unix_micros(ts)
    // two-sided compare, NOT abs(): non-ANSI abs(Long.MinValue) wraps
    // negative and would slip past the guard into the exact silent-NULL
    // overflow it exists to prevent
    val guarded = when(micros > MaxPackMicros || micros < -MaxPackMicros,
        expr("CAST(raise_error('Ohlcv: timestamp beyond DECIMAL(38,0) pack range') AS BIGINT)"))
      .otherwise(micros)
    // a NULL tiebreak would null the whole key and min_by/max_by would
    // then SILENTLY drop the row from open/close — where the struct
    // fallback still orders it by ts. Contract violations must be loud,
    // not a quiet row drop: raise instead (the struct key in
    // StreamingOhlcv.windowedBars deliberately keeps the tolerant
    // behavior — a raise is a checkpoint-replay poison pill there)
    val tb = when(tiebreak.isNull,
        expr("CAST(raise_error('Ohlcv: NULL tiebreak — the packed ordering key requires a non-null tiebreak per row') AS BIGINT)"))
      .otherwise(tiebreak)
    guarded.cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
      lit(new java.math.BigDecimal("18446744073709551616")) +
      (tb.cast(org.apache.spark.sql.types.DecimalType(38, 0)) +
        lit(new java.math.BigDecimal("9223372036854775808")))
  }

  /** [[packedOrd]] as SQL text over plain column names — the Q1–Q5
    * pure-SQL surface needs the same HashAggregate plan. Edit in
    * lockstep with [[packedOrd]] (the `ohlcv_1m_sql` and `ohlcv_1m`
    * rows share one oracle, so a desync hash-fails the driver gate). */
  private[operators] def packedOrdSql(tsCol: String, idCol: String): String =
    s"""(CASE WHEN unix_micros($tsCol) > ${MaxPackMicros}L
       |      OR unix_micros($tsCol) < -${MaxPackMicros}L
       |    THEN CAST(raise_error('Ohlcv: timestamp beyond DECIMAL(38,0) pack range') AS DECIMAL(38,0))
       |    ELSE CAST(unix_micros($tsCol) AS DECIMAL(38,0)) END * 18446744073709551616
       |  + (CASE WHEN $idCol IS NULL
       |      THEN CAST(raise_error('Ohlcv: NULL tiebreak — the packed ordering key requires a non-null tiebreak per row') AS DECIMAL(38,0))
       |      ELSE CAST($idCol AS DECIMAL(38,0)) END + 9223372036854775808))""".stripMargin

  /** Tiebreak types the packed key can encode losslessly. */
  private val PackableTiebreaks: Set[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types._
    Set(LongType, IntegerType, ShortType, ByteType)
  }

  /** The BATCH ordering-key selection: the packed atomic key for
    * (TIMESTAMP ts, integral tiebreak) — HashAggregate — and the
    * order-equivalent `struct(ts, tiebreak)` fallback for anything
    * else (string ids, composite lineage structs) — SortAggregate,
    * bounded per partial group. Deliberately NOT used by the streaming
    * windowed aggregates, whose checkpoint-schema / poison-pill /
    * null-tolerance tradeoffs invert — see
    * `StreamingOhlcv.windowedBars`. */
  private[graft] def ordFor(df: DataFrame, ts: Column, tiebreak: Column): Column = {
    val Seq(tsType, tbType) =
      df.select(ts, tiebreak).schema.map(_.dataType).toSeq
    if (tsType == org.apache.spark.sql.types.TimestampType &&
        PackableTiebreaks(tbType)) packedOrd(ts, tiebreak)
    else struct(ts.as("ts"), tiebreak.as("tb"))
  }

  /** Generic tumbling-window OHLCV over arbitrary columns.
    *
    * Ordering-key selection: with a TIMESTAMP `ts` and an integral
    * `tiebreak`, open/close order by the [[packedOrd]] atomic key and
    * the aggregate plans as HashAggregate; any other tiebreak type
    * (string ids, composite structs) falls back to the
    * `struct(ts, tiebreak)` key, which is order-equivalent but plans as
    * SortAggregate (immutable struct buffer — documented bounded
    * per-partial-group sort). Both keys need `tiebreak` unique and
    * non-null per row for deterministic open/close.
    *
    * @param ts       event-time timestamp column
    * @param price    price column
    * @param qty      quantity column (summed into volume)
    * @param keys     grouping keys (reference: product, instrument_id)
    * @param width    window width, e.g. "1 minute", "5 minutes"
    * @param tiebreak unique-per-row column ordering events with equal ts
    */
  def bars(
      trades: DataFrame,
      ts: Column,
      price: Column,
      qty: Column,
      keys: Seq[(String, Column)],
      width: String,
      tiebreak: Column): DataFrame = {
    val ord = ordFor(trades, ts, tiebreak)
    trades
      .groupBy((window(ts, width).as("w") +: keys.map { case (n, c) => c.as(n) }): _*)
      .agg(
        min_by(price, ord).as("open"),
        max(price).as("high"),
        min(price).as("low"),
        max_by(price, ord).as("close"),
        sum(qty).as("volume"))
      .select((Seq(col("w.start").as("window_start"), col("w.end").as("window_end")) ++
        keys.map { case (n, _) => col(n) } ++
        Seq(col("open"), col("high"), col("low"), col("close"), col("volume"))): _*)
  }

  /** Millis of a "N unit" window-width string (seconds/minutes/hours). */
  private[operators] def widthMillis(w: String): Long = {
    val parts = w.trim.split("\\s+")
    require(parts.length == 2, s"expected 'N unit', got '$w'")
    val n = parts(0).toLong
    parts(1).toLowerCase match {
      case "second" | "seconds" => n * 1000L
      case "minute" | "minutes" => n * 60000L
      case "hour" | "hours" => n * 3600000L
      case u => throw new IllegalArgumentException(s"unsupported window unit '$u'")
    }
  }

  /** Roll fine bars up into coarser bars without revisiting the raw
    * events — the dual-resolution invariant of
    * /root/reference/old/flink.py:42-67 (1-min and 5-min bars from one
    * stream). open/close of the coarse bar are the open of the earliest /
    * close of the latest fine bar; volume adds. At scale this is the
    * cheap path to multi-resolution candles: the rollup input is already
    * key×window sized, so the second shuffle is tiny.
    *
    * The coarse width must be a multiple of the fine width — otherwise a
    * fine bar straddles two coarse windows and its whole volume would
    * silently land in one of them; enforced, not assumed. */
  def rollup(bars: DataFrame, keys: Seq[String], fineWidth: String, width: String): DataFrame = {
    require(widthMillis(width) % widthMillis(fineWidth) == 0,
      s"rollup width '$width' must be a multiple of the fine bar width '$fineWidth'")
    val ord = col("window_start")
    bars
      .groupBy((window(col("window_start"), width).as("w") +: keys.map(col)): _*)
      .agg(
        min_by(col("open"), ord).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), ord).as("close"),
        sum(col("volume")).as("volume"))
      .select((Seq(col("w.start").as("window_start"), col("w.end").as("window_end")) ++
        keys.map(col) ++
        Seq(col("open"), col("high"), col("low"), col("close"), col("volume"))): _*)
  }

  // ---------------------------------------------------------------------
  // Concrete queries over the driver's `events` table (FIXTURES.md §5
  // mapping: ts→timestamp, event_type→product, value→price, unit qty;
  // event_id is the deterministic tiebreak).

  /** Unsorted bars — composition building block. Mid-plan ordering is
    * wasted work (any downstream groupBy destroys it with another
    * exchange); presentation `orderBy` belongs on the FINAL result only. */
  private def eventBarsUnsorted(spark: SparkSession, dir: String, width: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    bars(ev, col("ts"), col("value"), lit(1L), Seq("event_type" -> col("event_type")),
      width, col("event_id"))
  }

  private def eventBars(spark: SparkSession, dir: String, width: String): DataFrame =
    eventBarsUnsorted(spark, dir, width)

  /** 1-minute bars keyed by event_type — the flagship slice
    * (reference main line, /root/reference/5_ohlc.py:72). */
  def bars1m(spark: SparkSession, dir: String): DataFrame = eventBars(spark, dir, "1 minute")

  /** 1-minute VWAP (volume-weighted average price) next to the bar —
    * the column every trading system adds right after OHLCV. Exact
    * integer arithmetic end to end: price in cents, a deterministic
    * synthetic quantity (event_id % 10 + 1 — the events fixture carries
    * no real size), and the weighted mean as milli-cents by BIGINT
    * division, so the result replays exactly (a double division's last
    * bit would depend on nothing but luck). Plan shape: same single
    * map-side-combined exchange as the plain bars. */
  def bars1mVwap(spark: SparkSession, dir: String): DataFrame = {
    val cents = expr("CAST(round(value * 100, 0) AS BIGINT)")
    val qty = col("event_id") % 10 + 1
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(sum(cents * qty).as("pv"), sum(qty).as("volume"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("volume"), expr("(pv * 10) div volume").as("vwap_millicents"))
  }

  /** Gap-filled 1-minute bars: every minute of the span gets a bar per
    * key — minutes with no trades carry the previous close as
    * open=high=low=close with volume 0 and a `gap_filled` marker. The
    * reference (like Spark's `window()`) emits only non-empty windows;
    * charting and TA consumers need the dense series, and forward-fill
    * is the standard construction.
    *
    * Shape: the dense grid is |span minutes| × |keys| rows built from
    * one `sequence` explode (never from the events), the carry is a
    * running `last(close) ignore nulls` window over per-KEY partitions
    * of that grid — bounded by the time span, local sorts, the same
    * legality class as gapsIslands. Leading minutes before a key's
    * first bar have nothing to carry and are dropped (standard
    * convention). */
  def bars1mGapFill(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the bars aggregate feeds the span, the key list, and the join —
    // checkpoint once instead of re-aggregating events three times
    val b = eventBarsUnsorted(spark, dir, "1 minute")
      .drop("window_end").localCheckpoint()
    val span = b.agg(min("window_start").as("lo"), max("window_start").as("hi"))
    val grid = span
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 minute")))
        .as("window_start"))
      .crossJoin(b.select("event_type").distinct())
    val carry = Window.partitionBy("event_type").orderBy("window_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(b, Seq("window_start", "event_type"), "left")
      .withColumn("prev_close", last("close", ignoreNulls = true).over(carry))
      .filter(col("prev_close").isNotNull)
      .select(col("window_start"), col("event_type"),
        coalesce(col("open"), col("prev_close")).as("open"),
        coalesce(col("high"), col("prev_close")).as("high"),
        coalesce(col("low"), col("prev_close")).as("low"),
        coalesce(col("close"), col("prev_close")).as("close"),
        coalesce(col("volume"), lit(0L)).as("volume"),
        col("open").isNull.as("gap_filled"))
  }

  /** Rolling technical indicators over the 1-minute bars: 5-bar simple
    * moving average and population stddev of the close (the Bollinger
    * inputs). Moments are EXACT integer cents (rolling sum and
    * sum-of-squares are long adds over a 5-row frame), divided once at
    * the end — sma as milli-cents by BIGINT division, stddev as one
    * double sqrt of an exact integer ratio, so both replay
    * bit-for-bit. The window runs over per-KEY bar series (span-
    * bounded local sorts, the gapsIslands legality class) — and over
    * BARS, which are already aggregated: |keys| × |minutes| rows,
    * never the raw events. */
  def bars1mIndicators(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("window_start")
      .rowsBetween(-4, 0)
    eventBarsUnsorted(spark, dir, "1 minute")
      .select(col("window_start"), col("event_type"),
        round(col("close") * 100, 0).cast("long").as("cents"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum("cents").over(w))
      .withColumn("s2", sum(col("cents") * col("cents")).over(w))
      .select(col("window_start"), col("event_type"), col("n"),
        expr("(s1 * 10) div n").as("sma_millicents"),
        sqrt((col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))) / 10000.0)
          .as("stddev"))
  }

  /** Anomaly thresholds: close-to-close move beyond 5% (50‰) or volume
    * beyond 3× the trailing-5-bar average. */
  val JumpMilli = 50L
  val SpikeMilli = 3000L

  /** Bar-level anomaly flags — the monitoring pass a market-data (or
    * any metered-event) pipeline runs over its OWN aggregates: per-key
    * close-to-close jump in exact milli-ratios and current volume vs
    * the trailing 5-bar average (frame excludes the current bar, so a
    * spike can't dilute its own baseline — same self-pollution rule as
    * qa_mad_outliers). First bar per key has no baseline and is
    * dropped, not null-flagged. Windows run over BARS
    * (|keys| × |minutes| rows), never raw events — the indicators
    * query's scale shape. */
  def bars1mAnomalies(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ordW = Window.partitionBy("event_type").orderBy("window_start")
    val prevW = ordW.rowsBetween(-5, -1)
    eventBarsUnsorted(spark, dir, "1 minute")
      .select(col("window_start"), col("event_type"),
        round(col("close") * 100, 0).cast("long").as("cents"), col("volume"))
      .withColumn("prev_cents", lag("cents", 1).over(ordW))
      .withColumn("nprev", count(lit(1)).over(prevW))
      .withColumn("vsum", sum("volume").over(prevW))
      // prev_cents = 0 would divide by zero — Spark `div` yields NULL
      // (silently unflagged) while DuckDB `//` errors, a cross-engine
      // divergence. A zero-priced bar has no meaningful baseline; drop
      // it with the first-bar rule (mirrored in the oracle WHERE).
      .filter(col("prev_cents").isNotNull && col("prev_cents") =!= 0)
      .select(col("window_start"), col("event_type"), col("cents"),
        col("volume"),
        expr("abs(cents - prev_cents) * 1000 div prev_cents").as("jump_milli"),
        expr("(volume * nprev * 1000) div vsum").as("vol_ratio_milli"))
      .withColumn("price_jump", col("jump_milli") > lit(JumpMilli))
      .withColumn("volume_spike", col("vol_ratio_milli") > lit(SpikeMilli))
  }

  /** 5-minute bars (the reference's second resolution,
    * /root/reference/old/flink.py:56-67). */
  def bars5m(spark: SparkSession, dir: String): DataFrame = eventBars(spark, dir, "5 minutes")

  /** 1-hour bars keyed by (event_type, user_id) — the reference's
    * (product, instrument_id) dual key (/root/reference/old/flink.py:52). */
  def bars1hByUser(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    bars(ev, col("ts"), col("value"), lit(1L),
      Seq("event_type" -> col("event_type"), "user_id" -> col("user_id")),
      "1 hour", col("event_id"))
  }

  /** HOPPING bars: 2-minute windows advancing every 1 minute — the
    * overlapping-window mode the tumbling family lacks (smoother
    * indicator inputs; Flink's SlidingEventTimeWindows twin). Spark's
    * `window(ts, width, slide)` expands each event into width/slide
    * window memberships inside the scan projection — the SAME single
    * map-side-combined exchange as tumbling bars, just with 2× the
    * pre-aggregation rows, never a self-join or re-scan per offset. */
  def bars2m1mHopping(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val ord = packedOrd(col("ts"), col("event_id")) // HashAggregate, as in bars()
    ev.groupBy(window(col("ts"), "2 minutes", "1 minute").as("w"), col("event_type"))
      .agg(
        min_by(col("value"), ord).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ord).as("close"),
        count(lit(1)).as("volume"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("open"), col("high"), col("low"), col("close"),
        col("volume"))
  }

  /** 5-minute bars computed by rolling up 1-minute bars — bar-of-bars
    * consistency (/root/reference/old/flink.py:42-67 dual resolution). */
  def bars5mFrom1m(spark: SparkSession, dir: String): DataFrame = {
    val oneMin = eventBarsUnsorted(spark, dir, "1 minute")
    rollup(oneMin, Seq("event_type"), "1 minute", "5 minutes")
  }

  /** The STREAMING cascade operator (StreamingOhlcv.cascadeBars —
    * stacked windowed aggregations, coarse stage fed by `window_time`
    * of the fine stage) replayed over the batch events frame and
    * hash-matched against the direct 5-minute oracle. This gates the
    * reference's dual-resolution invariant
    * (/root/reference/old/flink.py:42-67: five 1-min bars fold into
    * one 5-min bar) at the driver gate by running the EXACT operator
    * the stream runs — not the batch `rollup` twin, which
    * `ohlcv_5m_rollup` already gates. A batch plan over the same
    * stacked-window expressions is semantically the streaming query
    * minus watermarking, so DuckDB parity here proves the fold algebra
    * the StreamingSpec can only property-check. */
  def bars5mCascade(spark: SparkSession, dir: String): DataFrame = {
    val trades = Tables.events(spark, dir)
      .select(col("ts"), col("event_type").as("product"),
        col("value").as("price"), lit(1L).as("qty"), col("event_id"))
    graft.streaming.StreamingOhlcv
      .cascadeBars(trades, "1 minute", "5 minutes", tiebreak = col("event_id"))
      .withColumnRenamed("product", "event_type")
  }

  /** Formatted string bars — the reference's JSON/strftime output edge
    * (/root/reference/3_ohlc.py:69-77): epoch → "yyyy-MM-dd HH:mm:ss". */
  def barsFormatted(spark: SparkSession, dir: String): DataFrame =
    bars1m(spark, dir)
      .select(
        date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("time"),
        col("event_type"), col("open"), col("high"), col("low"), col("close"),
        col("volume"))

  /** 1-minute bars through the typed Aggregator/udaf path
    * (graft.functions.OhlcvAggregator — the §2.7 UDAF surface). Result
    * is identical to bars1m; the plan differs: ObjectHashAggregate over
    * the typed buffer instead of codegen'd min_by/max_by. */
  def bars1mTyped(spark: SparkSession, dir: String): DataFrame = {
    val ohlcv = udaf(new graft.functions.OhlcvAggregator())
    spark.udf.register("ohlcv_agg", ohlcv) // SQL surface (Q6)
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(ohlcv(unix_micros(col("ts")), col("value"), lit(1L), col("event_id")).as("bar"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("bar.open").as("open"), col("bar.high").as("high"),
        col("bar.low").as("low"), col("bar.close").as("close"),
        col("bar.volume").as("volume"))
  }

  /** The ORIGINAL packed-tiebreak fast path, kept as a registered
    * result-identical twin now that [[bars]] packs by default: the key
    * here is the narrower DECIMAL(38,0) = unix_micros × 2^20 + id —
    * full microsecond precision (a BIGINT pack would have to truncate
    * to millis and could then order same-millisecond events by id
    * instead of sub-ms time), but the tiebreak must fit 20 bits —
    * enforced with raise_error, because a silent overflow would corrupt
    * ordering. [[packedOrd]] (the default) lifts that constraint by
    * shifting the full 64-bit tiebreak above 2^64. */
  def bars1mPacked(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val ord = expr(
      """CASE WHEN event_id >= 1048576 OR event_id < 0
        |  THEN CAST(raise_error('bars1mPacked: event_id exceeds 20-bit pack') AS DECIMAL(38,0))
        |  ELSE CAST(unix_micros(ts) AS DECIMAL(38,0)) * 1048576 + event_id END""".stripMargin)
    ev.groupBy(window(col("ts"), "1 minute").as("w"), col("event_type"))
      .agg(
        min_by(col("value"), ord).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), ord).as("close"),
        count(lit(1)).as("volume"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("open"), col("high"), col("low"), col("close"),
        col("volume"))
  }

  /** The same 1-minute bars through the pure SQL surface (Q1–Q5: the
    * reference's TUMBLE SQL pipeline, /root/reference/old/flink.py:42-53,
    * /root/reference/old/kfk.py:123-132): temp view + spark.sql text.
    * Catalyst plans this identically to the DataFrame version. */
  def bars1mSql(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      s"""SELECT window.start AS window_start, window.end AS window_end,
        |  event_type,
        |  min_by(value, pord) AS open,
        |  max(value) AS high,
        |  min(value) AS low,
        |  max_by(value, pord) AS close,
        |  count(*) AS volume
        |FROM (SELECT *, ${packedOrdSql("ts", "event_id")} AS pord FROM events)
        |GROUP BY window(ts, '1 minute'), event_type""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ohlcv_1m_sql" -> ((s, d) => bars1mSql(s, d)),
    "ohlcv_1m_packed" -> ((s, d) => bars1mPacked(s, d)),
    "ohlcv_1m_typed" -> ((s, d) => bars1mTyped(s, d)),
    "ohlcv_1m" -> ((s, d) => bars1m(s, d)),
    "ohlcv_1m_gapfill" -> ((s, d) => bars1mGapFill(s, d)),
    "ohlcv_1m_indicators" -> ((s, d) => bars1mIndicators(s, d)),
    "ohlcv_1m_anomalies" -> ((s, d) => bars1mAnomalies(s, d)),
    "ohlcv_1m_vwap" -> ((s, d) => bars1mVwap(s, d)),
    "ohlcv_5m" -> ((s, d) => bars5m(s, d)),
    "ohlcv_2m1m_hopping" -> ((s, d) => bars2m1mHopping(s, d)),
    "ohlcv_1h_by_user" -> ((s, d) => bars1hByUser(s, d)),
    "ohlcv_5m_rollup" -> ((s, d) => bars5mFrom1m(s, d)),
    "ohlcv_5m_from_1m" -> ((s, d) => bars5mCascade(s, d)),
    "ohlcv_formatted" -> ((s, d) => barsFormatted(s, d)))

  // ONE oracle string per distinct result shape — four query paths
  // (DataFrame, SQL text, typed udaf, packed fast path) are documented
  // result-identical, so they must share the oracle literally: a future
  // edit to one copy cannot silently desynchronize the others.
  private val oneMinuteOracle: String =
    """SELECT date_trunc('minute', ts) AS window_start,
        |       date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,
        |       event_type,
        |       arg_min(value, ts) AS open, max(value) AS high,
        |       min(value) AS low, arg_max(value, ts) AS close,
        |       count(*)::BIGINT AS volume
        |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin

  // DuckDB to_timestamp returns TIMESTAMP WITH TIME ZONE; Spark windows
  // are plain TIMESTAMP — cast, or the driver's schema/hash compare fails.
  private val fiveMinuteOracle: String =
    """SELECT to_timestamp((epoch_us(ts) // 300000000) * 300)::TIMESTAMP AS window_start,
        |       to_timestamp((epoch_us(ts) // 300000000) * 300 + 300)::TIMESTAMP AS window_end,
        |       event_type,
        |       arg_min(value, ts) AS open, max(value) AS high,
        |       min(value) AS low, arg_max(value, ts) AS close,
        |       count(*)::BIGINT AS volume
        |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin

  /** DuckDB oracle equivalents. date_trunc-based buckets equal Spark's
    * grid-aligned tumbling windows for minute/hour widths; the 5-minute
    * grid uses epoch arithmetic. (ts, event_type) pairs are unique in the
    * testdata, so arg_min/arg_max on ts alone is deterministic. */
  val oracle: Map[String, String] = Map(
    "ohlcv_1m_anomalies" ->
      s"""WITH b AS (SELECT date_trunc('minute', ts) AS window_start, event_type,
         |    CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT) AS cents,
         |    count(*)::BIGINT AS volume
         |  FROM events GROUP BY 1, 2),
         |r AS (SELECT window_start, event_type, cents, volume,
         |    lag(cents) OVER w1 AS prev_cents,
         |    count(*) OVER wp::BIGINT AS nprev,
         |    sum(volume) OVER wp::BIGINT AS vsum
         |  FROM b
         |  WINDOW w1 AS (PARTITION BY event_type ORDER BY window_start),
         |    wp AS (PARTITION BY event_type ORDER BY window_start
         |      ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING))
         |SELECT window_start, event_type, cents, volume,
         |  abs(cents - prev_cents) * 1000 // prev_cents AS jump_milli,
         |  (volume * nprev * 1000) // vsum AS vol_ratio_milli,
         |  abs(cents - prev_cents) * 1000 // prev_cents > $JumpMilli AS price_jump,
         |  (volume * nprev * 1000) // vsum > $SpikeMilli AS volume_spike
         |FROM r WHERE prev_cents IS NOT NULL AND prev_cents <> 0
         |ORDER BY window_start, event_type""".stripMargin,
    "ohlcv_1m_indicators" ->
      """WITH b AS (SELECT date_trunc('minute', ts) AS window_start, event_type,
        |    CAST(round(arg_max(value, ts) * 100, 0) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT window_start, event_type,
        |    count(*) OVER w::BIGINT AS n,
        |    sum(cents) OVER w::BIGINT AS s1,
        |    sum(cents * cents) OVER w::BIGINT AS s2
        |  FROM b
        |  WINDOW w AS (PARTITION BY event_type ORDER BY window_start
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        |SELECT window_start, event_type, n,
        |  (s1 * 10) // n AS sma_millicents,
        |  sqrt((s2 / n - (s1 / n) * (s1 / n)) / 10000.0) AS stddev
        |FROM r ORDER BY window_start, event_type""".stripMargin,
    "ohlcv_1m_gapfill" ->
      """WITH b AS (SELECT date_trunc('minute', ts) AS window_start, event_type,
        |    arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
        |    arg_max(value, ts) AS close, count(*)::BIGINT AS volume
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT min(window_start) AS lo, max(window_start) AS hi FROM b),
        |grid AS (SELECT g.ws AS window_start, t.event_type
        |  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS ws
        |        FROM span) g
        |  CROSS JOIN (SELECT DISTINCT event_type FROM b) t),
        |f AS (SELECT g.window_start, g.event_type,
        |    b.open, b.high, b.low, b.close, b.volume,
        |    last_value(b.close IGNORE NULLS) OVER (
        |      PARTITION BY g.event_type ORDER BY g.window_start
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_close
        |  FROM grid g LEFT JOIN b USING (window_start, event_type))
        |SELECT window_start, event_type,
        |  coalesce(open, prev_close) AS open,
        |  coalesce(high, prev_close) AS high,
        |  coalesce(low, prev_close) AS low,
        |  coalesce(close, prev_close) AS close,
        |  coalesce(volume, 0)::BIGINT AS volume,
        |  (open IS NULL) AS gap_filled
        |FROM f WHERE prev_close IS NOT NULL
        |ORDER BY window_start, event_type""".stripMargin,
    "ohlcv_1m_vwap" ->
      """SELECT date_trunc('minute', ts) AS window_start, event_type,
        |  sum(event_id % 10 + 1)::BIGINT AS volume,
        |  ((sum(CAST(round(value * 100, 0) AS BIGINT) * (event_id % 10 + 1))::BIGINT * 10)
        |    // sum(event_id % 10 + 1)::BIGINT)::BIGINT AS vwap_millicents
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ohlcv_1m_sql" ->
      oneMinuteOracle,
    "ohlcv_1m_packed" ->
      oneMinuteOracle,
    "ohlcv_1m_typed" ->
      oneMinuteOracle,
    "ohlcv_1m" ->
      oneMinuteOracle,
    "ohlcv_5m" ->
      fiveMinuteOracle,
    // hopping windows: each event belongs to exactly width/slide = 2
    // minute-aligned windows (start = floor-minute − k), replayed by
    // an explicit 2-row unnest per event
    "ohlcv_2m1m_hopping" ->
      """WITH s AS (SELECT e.*,
        |    ((epoch_us(ts) // 60000000) - k.k) * 60 AS ws_s
        |  FROM events e, UNNEST(range(0, 2)) AS k(k))
        |SELECT to_timestamp(ws_s)::TIMESTAMP AS window_start,
        |       to_timestamp(ws_s + 120)::TIMESTAMP AS window_end,
        |       event_type,
        |       arg_min(value, ts) AS open, max(value) AS high,
        |       min(value) AS low, arg_max(value, ts) AS close,
        |       count(*)::BIGINT AS volume
        |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin,
    "ohlcv_1h_by_user" ->
      """SELECT date_trunc('hour', ts) AS window_start,
        |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
        |       event_type, user_id,
        |       arg_min(value, ts) AS open, max(value) AS high,
        |       min(value) AS low, arg_max(value, ts) AS close,
        |       count(*)::BIGINT AS volume
        |FROM events GROUP BY 1, 2, 3, 4 ORDER BY 1, 3, 4""".stripMargin,
    "ohlcv_5m_rollup" ->
      fiveMinuteOracle,
    "ohlcv_5m_from_1m" ->
      fiveMinuteOracle,
    "ohlcv_formatted" ->
      """SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M:%S') AS time,
        |       event_type,
        |       arg_min(value, ts) AS open, max(value) AS high,
        |       min(value) AS low, arg_max(value, ts) AS close,
        |       count(*)::BIGINT AS volume
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
