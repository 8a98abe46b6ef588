package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import graft.model.Trade
import graft.operators._
import graft.streaming.{KafkaIO, StreamingOhlcv, StreamingOhlcvV2}

/** The library facade — everything a user of the reference engine
  * (pnikhil610/kafka-flink) needs to run their workloads on Spark, in
  * one import:
  *
  * {{{
  * import graft.Graft
  *
  * // batch candles over any trade-shaped DataFrame
  * val bars = Graft.ohlcv(trades, $"ts", $"price", $"qty",
  *   keys = Seq("product" -> $"product"), width = "1 minute", tiebreak = $"id")
  *
  * // streaming: Kafka JSON in → stateful bars → dual sink
  * val stream = Graft.kafkaTrades(spark, "broker:9092", "trades")
  * val bars   = Graft.streamingBars(stream, slack = "5 seconds", widthMs = 60000L)
  *
  * // training-data pipeline
  * Graft.registerFunctions(spark) // cosine_sim, poly_hash, simhash31 in SQL
  * }}}
  *
  * Each method is a thin alias for the implementing operator object —
  * see those for semantics, oracle SQL, and scale notes.
  */
object Graft {

  // ---------------------------------------------------------------- batch
  /** Tumbling-window OHLCV candles (operators.Ohlcv.bars). */
  def ohlcv(trades: DataFrame, ts: Column, price: Column, qty: Column,
      keys: Seq[(String, Column)], width: String, tiebreak: Column): DataFrame =
    Ohlcv.bars(trades, ts, price, qty, keys, width, tiebreak)

  /** Roll fine bars into coarser bars without rescanning raw events
    * (coarse width must be a multiple of the fine width). */
  def ohlcvRollup(bars: DataFrame, keys: Seq[String], fineWidth: String,
      width: String): DataFrame =
    Ohlcv.rollup(bars, keys, fineWidth, width)

  // ------------------------------------------------------------ streaming
  /** Kafka JSON trade stream with the reference wire schema. */
  def kafkaTrades(spark: SparkSession, bootstrap: String, topic: String,
      startingOffsets: String = "earliest"): Dataset[Trade] =
    KafkaIO.tradeStream(spark, bootstrap, topic, startingOffsets)

  /** Event-time + watermark, then keyed stateful bars (update or append). */
  def streamingBars(trades: Dataset[Trade], slack: String, widthMs: Long,
      emitRunning: Boolean = true): Dataset[graft.model.RunningBar] =
    StreamingOhlcv.statefulBars(
      StreamingOhlcv.withEventTime(trades, slack), widthMs, emitRunning)

  /** Same engine on the Spark-4 transformWithState API (RocksDB store). */
  def streamingBarsV2(trades: Dataset[Trade], slack: String, widthMs: Long,
      emitRunning: Boolean = true): Dataset[graft.model.RunningBar] =
    StreamingOhlcvV2.statefulBars(
      StreamingOhlcv.withEventTime(trades, slack), widthMs, emitRunning)

  /** Flink-style allowed-lateness bars (W5): fire at the true watermark
    * (maxEventTime − slackMs), retain each fired window for latenessMs,
    * re-emit a corrected bar per allowed late event, drop beyond. The
    * watermark delay must absorb the full grace a late event can need
    * (slack + width + lateness — see statefulBarsWithLateness); this
    * facade computes that delay so callers cannot get the arithmetic
    * wrong. Update-mode output: re-fires REPLACE the previous bar. */
  def streamingBarsWithLateness(trades: Dataset[Trade], slackMs: Long,
      widthMs: Long, latenessMs: Long): Dataset[graft.model.RunningBar] =
    StreamingOhlcv.statefulBarsWithLateness(
      StreamingOhlcv.withEventTime(trades,
        s"${slackMs + widthMs + latenessMs} milliseconds"),
      widthMs, latenessMs)

  /** Declarative windowed bars — works on batch AND streaming frames. */
  def windowedBars(tradesWithTs: DataFrame, width: String): DataFrame =
    StreamingOhlcv.windowedBars(tradesWithTs, width)

  /** Chained 1m→5m (fine→coarse) streaming cascade. */
  def cascadeBars(tradesWithTs: DataFrame, fine: String, coarse: String): DataFrame =
    StreamingOhlcv.cascadeBars(tradesWithTs, fine, coarse)

  /** Stream-stream interval join: each trade × its product's quotes in
    * the lookback horizon (streaming.StreamJoins). */
  def tradeQuoteJoin(tradesWithTs: DataFrame, quotesWithTs: DataFrame,
      lookbackSeconds: Int): DataFrame =
    graft.streaming.StreamJoins.tradesWithRecentQuotes(
      tradesWithTs, quotesWithTs, lookbackSeconds)

  /** At-least-once redelivery repair: drop duplicate keys while the
    * watermark horizon still covers them. */
  def streamingDedup(withTs: DataFrame, keys: Seq[String]): DataFrame =
    graft.streaming.StreamJoins.dedupWithinWatermark(withTs, keys)

  // --------------------------------------------------------- batch joins
  /** Backward as-of join: latest right row at-or-before each left row
    * per key (operators.AsOfJoin — one shuffle, one window pass). */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      rTsName: String): DataFrame =
    AsOfJoin.asOfLast(left, right, key, ts, rTsName)

  /** Native whole-operator as-of join (plans.AsOfJoinPlan →
    * AsOfJoinExec): a dedicated streaming sort-merge — prefer at scale. */
  def asOfNative(left: DataFrame, right: DataFrame, key: String, ts: String,
      rTsName: String): DataFrame =
    AsOfJoin.asOfNative(left, right, key, ts, rTsName)

  // -------------------------------------------------- training-data suite
  /** Exact + approximate dedup entry points (operators.Dedup). */
  val dedup: Dedup.type = Dedup
  /** Cosine top-k / ANN search (operators.Similarity). */
  val similarity: Similarity.type = Similarity
  /** Token stats, quality, language-ID, fingerprints (operators.TextAnalysis). */
  val text: TextAnalysis.type = TextAnalysis
  /** Binary media plumbing (operators.Multimodal). */
  val multimodal: Multimodal.type = Multimodal
  /** Skew-safe join/agg helpers (operators.Skew). */
  val skew: Skew.type = Skew
  /** Corpus curation: repetition filters, PII scrub, deterministic
    * sampling, mixing weights (operators.Curation). */
  val curation: Curation.type = Curation
  /** One-scan column profiling (operators.Profiling). */
  val profiling: Profiling.type = Profiling
  /** Mergeable sketches: HLL distinct, Count-Min, histogram quantiles,
    * bloom membership (operators.Sketches). */
  val sketches: Sketches.type = Sketches
  /** Temporal/CDC: last-writer-wins apply, SCD2 build + point-in-time
    * lookup (operators.Temporal). */
  val temporal: Temporal.type = Temporal
  /** Funnel conversion + cohort retention (operators.Behavior). */
  val behavior: Behavior.type = Behavior
  /** Warehouse maintenance: MERGE-style upsert, gaps-and-islands,
    * incremental view maintenance (operators.Warehouse). */
  val warehouse: Warehouse.type = Warehouse
  /** Iterative graph analytics: PageRank, triangle counting
    * (operators.Graph). */
  val graph: Graph.type = Graph
  /** Interval joins without cartesian plans: point-in-interval and
    * interval-overlap via grid buckets (operators.Intervals). */
  val intervals: Intervals.type = Intervals

  /** Per-group approximate distinct count — the scale-safe
    * count_distinct swap, DuckDB-replayable (operators.Sketches). */
  def approxDistinct(df: DataFrame, keys: Seq[String], value: Column): DataFrame =
    Sketches.hllEstimateBy(df, keys, value)

  /** Whole-history streaming distinct per key: 256 bytes of state per
    * key forever, estimates bit-identical to [[approxDistinct]]. */
  def streamingDistinct(kv: Dataset[graft.streaming.KeyedValue])
      : Dataset[graft.streaming.DistinctEstimate] =
    graft.streaming.StreamingSketch.distinctByKey(kv)

  /** Windowed streaming distinct: watermark-evicted per-window sketch
    * state, append-mode emission on window close. */
  def streamingWindowedDistinct(tv: Dataset[graft.streaming.TimedValue],
      windowDur: String, watermarkDelay: String): DataFrame =
    graft.streaming.StreamingSketch.windowedDistinct(tv, windowDur, watermarkDelay)

  /** Streaming KMV per key: k longs of state forever, estimates
    * bit-identical to the batch sketch; final sketches support set
    * algebra (union/Jaccard) downstream. */
  def streamingKmv(kv: Dataset[graft.streaming.KeyedValue])
      : Dataset[graft.streaming.KmvEstimate] =
    graft.streaming.StreamingSketch.kmvByKey(kv)

  /** Windowed drift monitor: each closed window's value histogram vs a
    * batch-built baseline, L1 in milli — the streaming twin of
    * `profiling.driftOn`. */
  def streamingDrift(tv: Dataset[graft.streaming.TimedValue], windowDur: String,
      watermarkDelay: String, lo: Long, bw: Long,
      baselineMilli: Map[Long, Long]): DataFrame =
    graft.streaming.StreamingSketch.windowedDrift(
      tv, windowDur, watermarkDelay, lo, bw, baselineMilli)

  /** Integer-BM25 full-text top-k over any (doc_id, text) frame. */
  def bm25(docs: DataFrame, queryTerms: Seq[(String, String)], k: Int): DataFrame =
    Retrieval.bm25On(docs, queryTerms, k)

  /** Register the native expressions (cosine_sim, poly_hash, simhash31)
    * for spark.sql; session-build-time alternative:
    * spark.sql.extensions=graft.functions.GraftExtensions. Both paths
    * share VectorFunctions.builders, so they cannot diverge. */
  def registerFunctions(spark: SparkSession): Unit =
    graft.functions.VectorFunctions.register(spark)
}
