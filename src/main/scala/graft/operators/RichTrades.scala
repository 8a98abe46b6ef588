package graft.operators

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.model.Schemas
import graft.sources.JsonSource

/** The reference's rich 13-field trade pipeline, end to end
  * (/root/reference/old/kfk.py:60-183): a declared-schema JSON source
  * with nullable counterparty/OTC fields → parse → tumbling-window
  * OHLC → the nested ROW sink shape {window_start, ohlc{o,h,l,c}} —
  * the reference's only nested output type (old/kfk.py:163-173).
  *
  * The wire records are synthesized deterministically from the driver's
  * `events` table (FIXTURES.md — no Kafka broker in this container), so
  * the DuckDB oracle can replay the same arithmetic straight from the
  * parquet: the JSON encode→parse round trip is value-identity, which is
  * exactly what it must be for the oracle to hold.
  *
  * Scale shape: the JSON build and parse are both scan projections
  * (`to_json`/`from_json` are codegen'd expressions — zero shuffle,
  * zero inference pass; schema inference at 100 TB would be a second
  * full scan, SURVEY.md §2.1 S4); the OHLC aggregation is the same
  * partial-agg + single-shuffle plan as operators/Ohlcv.bars.
  *
  * Timestamps ride the wire as epoch-MICROS longs (the reference used
  * millis, old/kfk.py:109-111; the testdata carries sub-ms event times,
  * and truncating would merge distinct events — precision is kept, the
  * BIGINT-ticks wire convention is preserved).
  */
object RichTrades {

  /** Deterministic 13-field wire records from the events table: one
    * JSON string per event, nullable fields ABSENT (not null) when
    * unset — `to_json` drops null fields, so the parse side genuinely
    * exercises missing-field semantics (fail_on_missing_field,
    * old/kfk.py:91).
    *
    * Memoized per (session, dir) like Retrieval's text index: the JSON
    * encode is a full-events-table scan that every rich-trade query
    * repeats verbatim (it's the shared wire format, not per-query
    * work), so it materializes once — the build-the-feed-once shape of
    * a production topic. Content is deterministic per event row, so
    * memo hits and rebuilds agree exactly. */
  def wire(spark: SparkSession, dir: String): DataFrame =
    wireMemo(spark, dir)(wireFrame(spark, dir).localCheckpoint())

  private val wireMemo = new DirMemo

  private def wireFrame(spark: SparkSession, dir: String): DataFrame =
    // repartition the raw events before the JSON encode: the testdata
    // is single-row-group parquet, so without it the to_json pass (and
    // every downstream from_json over the checkpointed wire) runs as
    // ONE task. A production topic is partitioned; this is its batch
    // mirror. Build-time-only exchange of the narrow source columns.
    Tables.events(spark, dir).repartition(col("event_id")).select(
      to_json(struct(
        unix_micros(col("ts")).as("Timestamp"),
        concat(lit("I"), col("user_id")).as("InstrumentId"),
        col("event_type").as("Product"),
        col("value").as("Price"),
        (col("event_id") % 7 + 1).cast("int").as("Qty"),
        when(col("event_id") % 2 === 0, "BUY").otherwise("SELL").as("Direction"),
        when(col("event_id") % 3 === 0, concat(lit("CP"), col("user_id") % 10))
          .as("DirectAskCounterparty"),
        when(col("event_id") % 7 === 0, concat(lit("CP"), (col("user_id") + 1) % 10))
          .as("DirectBidCounterparty"),
        (col("event_id") % 11 === 0).as("IsImplied"),
        (col("event_id") % 13 === 0).as("IsLegTrade"),
        (col("event_id") % 5 === 0).as("IsOtc"),
        when(col("event_id") % 5 === 0, lit("BLOCK")).as("OTCTradeType"),
        col("event_id").cast("string").as("Id"))).as("data"))

  /** Wire → typed columns through the declared rich schema, strict mode
    * (the reference's fail_on_missing_field(True)): a record missing the
    * non-nullable Timestamp is dropped; absent counterparty/OTC fields
    * parse to null and flow through. */
  def parsed(spark: SparkSession, dir: String): DataFrame =
    JsonSource.parseJson(wire(spark, dir), "data", Schemas.richTrade,
      failOnMissing = true)
      .withColumn("ts", timestamp_micros(col("Timestamp")))

  /** Per-product 1-minute OHLCV over the parsed rich trades, plus
    * non-null counts of the two nullable field families — the columns
    * that prove absent-field semantics survived the JSON round trip
    * (a parse that faked nulls as defaults would shift n_ask_cp/n_otc,
    * not just drop columns). Timestamps are globally unique in the
    * testdata, so Timestamp alone is a deterministic open/close order. */
  def ohlcv1m(spark: SparkSession, dir: String): DataFrame =
    parsed(spark, dir)
      .groupBy(window(col("ts"), "1 minute").as("w"), col("Product").as("product"))
      .agg(
        min_by(col("Price"), col("Timestamp")).as("open"),
        max(col("Price")).as("high"),
        min(col("Price")).as("low"),
        max_by(col("Price"), col("Timestamp")).as("close"),
        sum(col("Qty")).cast("long").as("volume"),
        count(col("DirectAskCounterparty")).as("n_ask_cp"),
        count(col("OTCTradeType")).as("n_otc"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("product"), col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("n_ask_cp"), col("n_otc"))

  /** The nested sink shape (old/kfk.py:123-132,163-173): GLOBAL 1-minute
    * OHLC (the reference groups by TUMBLE only — no product key) emitted
    * as {window_start: epoch-ms BIGINT, ohlc: ROW(open,high,low,close)},
    * matching graft.model.Schemas.nestedBar. */
  def nestedBars1m(spark: SparkSession, dir: String): DataFrame =
    parsed(spark, dir)
      .groupBy(window(col("ts"), "1 minute").as("w"))
      .agg(
        min_by(col("Price"), col("Timestamp")).as("open"),
        max(col("Price")).as("high"),
        min(col("Price")).as("low"),
        max_by(col("Price"), col("Timestamp")).as("close"))
      .select(unix_millis(col("w.start")).as("window_start"),
        struct(col("open"), col("high"), col("low"), col("close")).as("ohlc"))

  /** Driver-comparable twin of [[nestedBars1m]]: the nested ROW rendered
    * as its JSON wire form (`to_json` — the exact bytes the Kafka sink
    * K4 would emit). The driver's comparator cannot hash a struct column
    * (round 2: pandas `TypeError: unhashable 'dict'`), but the JSON
    * STRING hashes fine, and key order is fixed by the struct field
    * order on the Spark side / the literal order in the oracle —
    * identical by construction. The nested schema itself stays asserted
    * by RichTradesSpec against graft.model.Schemas.nestedBar.
    *
    * Formatting contract: Spark (Jackson) and DuckDB agree on double
    * JSON text only for plain decimals — Spark goes scientific at
    * |x| >= 1e7 or < 1e-3 where DuckDB does not. Trade prices (2-decimal,
    * bounded) live comfortably inside the shared zone; RichTradesSpec
    * asserts the domain so a testdata change fails loudly in CI instead
    * of as a mysterious oracle hash divergence. */
  def nestedBars1mJson(spark: SparkSession, dir: String): DataFrame =
    nestedBars1m(spark, dir)
      .select(col("window_start"),
        // explicit ignoreNullFields=false: DuckDB's to_json keeps null
        // fields, so Spark must too (unreachable for non-empty groups,
        // but parity should not hinge on that)
        to_json(col("ohlc"), Map("ignoreNullFields" -> "false").asJava)
          .as("ohlc_json"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rich_trade_ohlcv" -> ((s, d) => ohlcv1m(s, d)),
    "rich_trade_nested" -> ((s, d) => nestedBars1mJson(s, d)))

  /** Oracles replay the SAME derivations straight from the events
    * parquet — legal because JSON encode→parse is value-identity and
    * strict mode drops nothing (every event carries Timestamp). */
  val oracle: Map[String, String] = Map(
    "rich_trade_ohlcv" ->
      """SELECT date_trunc('minute', ts) AS window_start,
        |       date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,
        |       event_type AS product,
        |       arg_min(value, ts) AS open, max(value) AS high,
        |       min(value) AS low, arg_max(value, ts) AS close,
        |       sum(event_id % 7 + 1)::BIGINT AS volume,
        |       count(CASE WHEN event_id % 3 = 0 THEN 1 END)::BIGINT AS n_ask_cp,
        |       count(CASE WHEN event_id % 5 = 0 THEN 1 END)::BIGINT AS n_otc
        |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin,
    "rich_trade_nested" ->
      """SELECT epoch_ms(date_trunc('minute', ts))::BIGINT AS window_start,
        |       to_json({'open': arg_min(value, ts), 'high': max(value),
        |                'low': min(value), 'close': arg_max(value, ts)})::VARCHAR AS ohlc_json
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
}
