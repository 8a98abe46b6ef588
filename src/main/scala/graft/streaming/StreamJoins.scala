package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Quote

/** Stream-stream operators beyond the reference's single-stream surface:
  * the trade↔quote interval join and at-least-once dedup.
  *
  * Scale notes:
  *  - The interval join is Spark's native watermarked stream-stream
  *    join: both sides shuffle once on the equality key (product), and
  *    the time-range predicate bounds each side's state retention —
  *    quote state is evicted `lookback` past the watermark, so state is
  *    O(keys × lookback × rate), never unbounded.
  *  - `dedupWithinWatermark` keeps one state row per key seen inside
  *    the watermark horizon — the standard exactly-once repair for an
  *    at-least-once Kafka source (redelivered messages carry the same
  *    key and are dropped while the horizon covers them).
  */
object StreamJoins {

  /** Event-time column + watermark on a typed quote stream, quote
    * columns prefixed so a join with trades stays collision-free. */
  def quotesWithEventTime(quotes: Dataset[Quote], slack: String = "0 seconds"): DataFrame =
    quotes
      .select(timestamp_millis(col("timestamp")).as("q_ts"),
        col("product").as("q_product"), col("bid"), col("ask"))
      .withWatermark("q_ts", slack)

  /** Inner interval join: every quote of the trade's product in
    * (trade.ts - lookback, trade.ts]. The streaming relaxation of the
    * batch as-of join (operators/AsOfJoin.scala): an unbounded "latest
    * quote ever" carry is not expressible with bounded state, so the
    * engine bounds it to a lookback horizon — downstream picks the max
    * q_ts per trade if only the latest is wanted. */
  def tradesWithRecentQuotes(
      tradesWithTs: DataFrame, // StreamingOhlcv.withEventTime output
      quotesWithTs: DataFrame, // quotesWithEventTime output
      lookbackSeconds: Int): DataFrame =
    tradesWithTs.join(quotesWithTs,
      col("product") === col("q_product") &&
        col("q_ts") > col("ts") - expr(s"INTERVAL $lookbackSeconds SECONDS") &&
        col("q_ts") <= col("ts"))
      .drop("q_product")

  /** Left-outer flavor of [[tradesWithRecentQuotes]]: a trade with NO
    * quote in its lookback window still emits — once the quote-side
    * watermark passes the window's end and the match can be ruled out —
    * with null quote columns. This is the streaming outer join's core
    * mechanic: the unmatched result is a WATERMARK decision, not a
    * per-batch one (emitting eagerly would retract when a late quote
    * arrived). State bounds are identical to the inner form. */
  def tradesWithQuotesOuter(
      tradesWithTs: DataFrame,
      quotesWithTs: DataFrame,
      lookbackSeconds: Int): DataFrame =
    tradesWithTs.join(quotesWithTs,
      col("product") === col("q_product") &&
        col("q_ts") > col("ts") - expr(s"INTERVAL $lookbackSeconds SECONDS") &&
        col("q_ts") <= col("ts"),
      "left_outer")
      .drop("q_product")

  /** Drop redelivered duplicates by `keys` while they can still recur
    * (within the watermark horizon). */
  def dedupWithinWatermark(withTs: DataFrame, keys: Seq[String]): DataFrame =
    withTs.dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-static enrichment: every stream row decorated with its
    * dimension attributes (instrument metadata, product reference
    * data). The static side is explicitly broadcast — zero streaming
    * state, zero shuffle of the stream, and the dim is re-resolvable
    * per micro-batch (a dim TABLE picks up slowly-changing updates
    * between batches). Left join: a stream row with no dim entry flows
    * through with nulls rather than silently dropping. */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}
