package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.{Quote, Trade}
import graft.streaming.{StreamJoins, StreamingOhlcv}

/** Stream-stream interval join and watermark dedup semantics over
  * MemoryStream replays. */
class StreamJoinsSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val T0 = 1723459200000L // minute-aligned

  private def trade(offMs: Long, product: String, price: Double, qty: Long) =
    Trade(T0 + offMs, s"I${offMs % 7}", product, price, qty)
  private def quote(offMs: Long, product: String, bid: Double) =
    Quote(T0 + offMs, product, bid, bid + 1.0)

  test("interval join pairs each trade with its product's quotes in the lookback") {
    val trades = MemoryStream[Trade]
    val quotes = MemoryStream[Quote]
    val joined = StreamJoins.tradesWithRecentQuotes(
      StreamingOhlcv.withEventTime(trades.toDS(), "5 seconds"),
      StreamJoins.quotesWithEventTime(quotes.toDS(), "5 seconds"),
      lookbackSeconds = 10)
    val q = joined.writeStream.format("memory").queryName("ij")
      .outputMode("append").start()
    try {
      quotes.addData(quote(5000, "A", 1.0), quote(9000, "A", 2.0),
        quote(15000, "A", 3.0), quote(25000, "A", 4.0), quote(9000, "B", 9.0))
      trades.addData(trade(10000, "A", 100.0, 1), trade(20000, "A", 200.0, 2))
      q.processAllAvailable()
      val got = spark.table("ij")
        .select(col("timestamp") - T0, col("bid")).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      // trade@10s ← quotes (0s, 10s]: 5s and 9s of product A only;
      // trade@20s ← quotes (10s, 20s]: 15s
      assert(got == Set((10000L, 1.0), (10000L, 2.0), (20000L, 3.0)))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched trades with nulls after the watermark rules a match out") {
    val trades = MemoryStream[Trade]
    val quotes = MemoryStream[Quote]
    val joined = StreamJoins.tradesWithQuotesOuter(
      StreamingOhlcv.withEventTime(trades.toDS(), "5 seconds"),
      StreamJoins.quotesWithEventTime(quotes.toDS(), "5 seconds"),
      lookbackSeconds = 10)
    val q = joined.writeStream.format("memory").queryName("oj")
      .outputMode("append").start()
    try {
      quotes.addData(quote(9000, "A", 2.0))
      // B has NO quotes at all; A@10s matches quote@9s
      trades.addData(trade(10000, "A", 100.0, 1), trade(10000, "B", 50.0, 1))
      q.processAllAvailable()
      // push both watermarks far past the lookback horizon so the
      // engine can prove B@10s has no match
      trades.addData(trade(600000, "A", 1.0, 1))
      quotes.addData(quote(600000, "A", 1.0))
      q.processAllAvailable()
      val got = spark.table("oj")
        .filter(col("timestamp") === T0 + 10000)
        .select(col("product"), col("bid")).collect()
        .map(r => (r.getString(0), Option(r.get(1)))).toSet
      assert(got == Set(("A", Some(2.0)), ("B", None)))
    } finally q.stop()
  }

  test("composed pipeline: dedup -> quote join -> windowed agg, one query, three stateful ops") {
    val trades = MemoryStream[Trade]
    val quotes = MemoryStream[Quote]
    val deduped = StreamJoins.dedupWithinWatermark(
      StreamingOhlcv.withEventTime(trades.toDS(), "5 seconds"),
      Seq("product", "instrument_id", "timestamp"))
    val joined = StreamJoins.tradesWithRecentQuotes(deduped,
      StreamJoins.quotesWithEventTime(quotes.toDS(), "5 seconds"),
      lookbackSeconds = 60)
    val bars = joined
      .groupBy(window(col("ts"), "1 minute").as("w"), col("product"))
      .agg(count(lit(1)).as("n_quoted"),
        max(col("ask") - col("bid")).as("max_spread"))
    val q = bars.writeStream.format("memory").queryName("composed")
      .outputMode("append").start()
    try {
      val t = trade(10000, "A", 100.0, 1)
      quotes.addData(quote(5000, "A", 10.0), quote(8000, "A", 20.0))
      trades.addData(t, t, trade(20000, "A", 101.0, 2)) // t redelivered
      q.processAllAvailable()
      // push both watermarks far past the first window
      trades.addData(trade(600000, "A", 1.0, 1))
      quotes.addData(quote(600000, "A", 1.0))
      q.processAllAvailable()
      val rows = spark.table("composed")
        .filter(col("product") === "A" && col("w.start") === new java.sql.Timestamp(T0))
        .collect()
      assert(rows.length == 1)
      // 2 distinct trades × 2 in-lookback quotes = 4 joined rows (the
      // redelivered trade contributes nothing: dedup ran FIRST)
      assert(rows(0).getAs[Long]("n_quoted") == 4L)
      assert(rows(0).getAs[Double]("max_spread") == 1.0)
    } finally q.stop()
  }

  test("dedupWithinWatermark drops redelivered trades, keeps distinct ones") {
    val input = MemoryStream[Trade]
    val deduped = StreamJoins.dedupWithinWatermark(
      StreamingOhlcv.withEventTime(input.toDS(), "10 seconds"),
      Seq("product", "instrument_id", "timestamp"))
    val q = deduped.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try {
      val t = trade(1000, "P1", 10.0, 1)
      input.addData(t, t, t.copy(price = 10.0), trade(2000, "P1", 20.0, 2))
      q.processAllAvailable()
      input.addData(t) // redelivery in a later batch, still in horizon
      q.processAllAvailable()
      val rows = spark.table("dd").collect()
      assert(rows.length == 2, s"want the 2 distinct trades, got ${rows.length}")
    } finally q.stop()
  }

  test("enrichWithStatic decorates the stream via broadcast, nulls for missing dims") {
    val input = MemoryStream[Trade]
    val dim = Seq(("P1", "Energy", 2), ("P2", "Metals", 5))
      .toDF("product", "sector", "tick_size")
    val enriched = StreamJoins.enrichWithStatic(
      input.toDF(), dim, key = "product")
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData(trade(0, "P1", 10.0, 1), trade(1, "P3", 30.0, 3))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => r.getAs[String]("product") ->
          ((Option(r.getAs[String]("sector")), Option(r.get(r.fieldIndex("tick_size")))))).toMap
      assert(rows("P1") == ((Some("Energy"), Some(2))))
      assert(rows("P3") == ((None, None))) // no dim row → nulls, not dropped
    } finally q.stop()
  }
}
