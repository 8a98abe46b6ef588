package graft

import org.apache.spark.sql.functions._
import graft.operators.Ohlcv
import graft.model.Trade

class OhlcvSpec extends SparkSpec {
  import spark.implicits._

  private def tradeBars(trades: Seq[Trade], width: String = "1 minute") = {
    val df = trades.toDF()
      .withColumn("ts", timestamp_millis(col("timestamp")))
    Ohlcv.bars(df, col("ts"), col("price"), col("qty"),
      Seq("product" -> col("product")), width, col("instrument_id"))
  }

  test("single-trade window: open=high=low=close, volume=qty") {
    val bars = tradeBars(Seq(Trade(60_000L, "i1", "P1", 42.0, 7))).collect()
    assert(bars.length == 1)
    val b = bars.head
    assert(b.getAs[Double]("open") == 42.0)
    assert(b.getAs[Double]("high") == 42.0)
    assert(b.getAs[Double]("low") == 42.0)
    assert(b.getAs[Double]("close") == 42.0)
    assert(b.getAs[Long]("volume") == 7L)
  }

  test("open/close by event time, high/low/volume aggregate") {
    val bars = tradeBars(Seq(
      Trade(60_000L, "a", "P1", 10.0, 1),
      Trade(61_000L, "b", "P1", 99.0, 2),
      Trade(62_000L, "c", "P1", 5.0, 3),
      Trade(63_000L, "d", "P1", 50.0, 4))).collect()
    assert(bars.length == 1)
    val b = bars.head
    assert(b.getAs[Double]("open") == 10.0)
    assert(b.getAs[Double]("high") == 99.0)
    assert(b.getAs[Double]("low") == 5.0)
    assert(b.getAs[Double]("close") == 50.0)
    assert(b.getAs[Long]("volume") == 10L)
  }

  test("equal timestamps break ties by the tiebreak column") {
    val bars = tradeBars(Seq(
      Trade(60_000L, "z", "P1", 1.0, 1), // same ts, higher tiebreak
      Trade(60_000L, "a", "P1", 2.0, 1))).collect()
    val b = bars.head
    assert(b.getAs[Double]("open") == 2.0) // "a" < "z"
    assert(b.getAs[Double]("close") == 1.0)
  }

  test("packed key: negative tiebreaks and pre-epoch timestamps order like struct") {
    // the packed DECIMAL key is the default for integral tiebreaks —
    // drill the two places its arithmetic could diverge from
    // struct(ts, tb): signed tiebreaks (shifted by 2^63) and negative
    // unix_micros (pre-epoch windows)
    val df = Seq(
      (-60_000L, 3L, 2.0),  // same ts as below, higher tiebreak
      (-60_000L, -5L, 7.0), // -5 orders before 3 (signed, not unsigned)
      (-59_000L, 0L, 4.0)
    ).toDF("millis", "tb", "price")
      .withColumn("ts", timestamp_millis(col("millis")))
    val bars = Ohlcv.bars(df, col("ts"), col("price"), lit(1L),
      Seq.empty, "1 minute", col("tb")).collect()
    assert(bars.length == 1)
    assert(bars.head.getAs[Double]("open") == 7.0)
    assert(bars.head.getAs[Double]("close") == 4.0)
  }

  test("packed key: same-timestamp ties order by ids far beyond 20 bits") {
    // the r11 packed fast path capped ids at 2^20; the default pack
    // shifts the full 64-bit tiebreak and must not
    val df = Seq(
      (60_000L, 5_000_000_000L, 1.0),
      (60_000L, 2L, 2.0)
    ).toDF("millis", "tb", "price")
      .withColumn("ts", timestamp_millis(col("millis")))
    val b = Ohlcv.bars(df, col("ts"), col("price"), lit(1L),
      Seq.empty, "1 minute", col("tb")).collect().head
    assert(b.getAs[Double]("open") == 2.0)
    assert(b.getAs[Double]("close") == 1.0)
  }

  test("packed key raises on a timestamp beyond the DECIMAL(38,0) range") {
    // beyond ±171 millennia the product would overflow, and non-ANSI
    // decimal overflow is a silent NULL ordering key — must die loudly
    val df = Seq((6_000_000_000_000_000_000L, 1L, 1.0))
      .toDF("micros", "tb", "price")
      .withColumn("ts", timestamp_micros(col("micros")))
    val bars = Ohlcv.bars(df, col("ts"), col("price"), lit(1L),
      Seq.empty, "1 minute", col("tb"))
    val e = intercept[Exception] { bars.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("beyond DECIMAL(38,0) pack range")), e)
  }

  test("packed key raises on a NULL tiebreak instead of dropping the row") {
    // a NULL tiebreak nulls the packed key and min_by/max_by would then
    // silently skip the row from open/close — contract violations must
    // be loud, not a quiet row drop (the struct fallback and the
    // streaming engine keep the tolerant order-by-ts behavior)
    val df = Seq(
      (60_000L, Some(1L), 1.0),
      (60_000L, None: Option[Long], 2.0)
    ).toDF("millis", "tb", "price")
      .withColumn("ts", timestamp_millis(col("millis")))
    val bars = Ohlcv.bars(df, col("ts"), col("price"), lit(1L),
      Seq.empty, "1 minute", col("tb"))
    val e = intercept[Exception] { bars.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("NULL tiebreak")), e)
  }

  test("grid alignment: trades land in epoch-aligned tumbling windows") {
    val bars = tradeBars(Seq(
      Trade(59_999L, "a", "P1", 1.0, 1),
      Trade(60_000L, "b", "P1", 2.0, 1)))
      .orderBy("window_start").collect()
    assert(bars.length == 2)
    assert(bars(0).getAs[java.sql.Timestamp]("window_start").getTime == 0L)
    assert(bars(1).getAs[java.sql.Timestamp]("window_start").getTime == 60_000L)
  }

  test("keys partition bars") {
    val bars = tradeBars(Seq(
      Trade(60_000L, "a", "P1", 1.0, 1),
      Trade(61_000L, "b", "P2", 9.0, 2))).collect()
    assert(bars.length == 2)
    assert(bars.map(_.getAs[String]("product")).toSet == Set("P1", "P2"))
  }

  test("bar-of-bars: 5m rollup of 1m bars equals direct 5m bars") {
    val trades = (0 until 600).map { i =>
      Trade(i * 997L, s"i$i", s"P${i % 3}", (i * 7919 % 100).toDouble, i % 10 + 1)
    }
    val direct = tradeBars(trades, "5 minutes")
    val fine = tradeBars(trades, "1 minute")
    val rolled = Ohlcv.rollup(fine, Seq("product"), "1 minute", "5 minutes")
    assert(direct.exceptAll(rolled).isEmpty && rolled.exceptAll(direct).isEmpty)
  }

  test("bar-of-bars: the streaming cascade operator on a batch frame equals direct 5m bars") {
    // the EXACT stacked-window operator the stream runs (window_time
    // feed, min_by/max_by over fine_start) — same algebra the
    // ohlcv_5m_from_1m driver gate hash-matches against DuckDB
    val trades = (0 until 600).map { i =>
      Trade(i * 997L, s"i$i", s"P${i % 3}", (i * 7919 % 100).toDouble, i % 10 + 1)
    }
    val df = trades.toDF().withColumn("ts", timestamp_millis(col("timestamp")))
    val direct = tradeBars(trades, "5 minutes")
    val cascaded = graft.streaming.StreamingOhlcv
      .cascadeBars(df, "1 minute", "5 minutes", tiebreak = col("instrument_id"))
    assert(direct.exceptAll(cascaded).isEmpty && cascaded.exceptAll(direct).isEmpty)
  }

  test("gap-fill emits a dense per-key minute series carrying the previous close") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Ohlcv.bars1mGapFill(spark, sf0001).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("window_start").getTime)
      // dense: consecutive minutes, no holes from the first bar onward
      val times = sorted.map(_.getAs[java.sql.Timestamp]("window_start").getTime)
      times.zip(times.tail).foreach { case (a, b) =>
        assert(b - a == 60000L, s"$t hole between $a and $b") }
      // a filled gap is flat at the previous close with zero volume
      sorted.zip(sorted.tail).foreach { case (prev, cur) =>
        if (cur.getAs[Boolean]("gap_filled")) {
          val pc = prev.getAs[Double]("close")
          assert(cur.getAs[Double]("open") == pc &&
            cur.getAs[Double]("high") == pc &&
            cur.getAs[Double]("low") == pc &&
            cur.getAs[Double]("close") == pc)
          assert(cur.getAs[Long]("volume") == 0L)
        } else assert(cur.getAs[Long]("volume") > 0L)
      }
    }
    // real bars agree with the plain 1m bars
    val plain = graft.operators.Ohlcv.bars1m(spark, sf0001).collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start"),
        r.getAs[String]("event_type")) ->
        (r.getAs[Double]("open"), r.getAs[Double]("close"),
          r.getAs[Long]("volume"))).toMap
    rows.filter(!_.getAs[Boolean]("gap_filled")).foreach { r =>
      val k = (r.getAs[java.sql.Timestamp]("window_start"), r.getAs[String]("event_type"))
      assert(plain(k) == ((r.getAs[Double]("open"), r.getAs[Double]("close"),
        r.getAs[Long]("volume"))))
    }
  }

  test("rolling indicators: expanding head, 5-bar steady state, driver-recomputed moments") {
    import org.apache.spark.sql.functions._
    val bars = graft.operators.Ohlcv.bars1m(spark, sf0001).collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.sortBy(_.getAs[java.sql.Timestamp]("window_start").getTime)
        .map(r => math.round(r.getAs[Double]("close") * 100))).toMap
    val got = graft.operators.Ohlcv.bars1mIndicators(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("window_start").getTime)
      sorted.zipWithIndex.foreach { case (r, i) =>
        val frame = bars(t).slice(math.max(0, i - 4), i + 1)
        assert(r.getAs[Long]("n") == frame.length)
        assert(r.getAs[Long]("sma_millicents") == frame.sum * 10 / frame.length)
        val n = frame.length.toDouble
        val expSd = math.sqrt((frame.map(c => c.toDouble * c).sum / n -
          (frame.sum / n) * (frame.sum / n)) / 10000.0)
        assert(math.abs(r.getAs[Double]("stddev") - expSd) < 1e-9)
      }
    }
  }

  test("bar anomalies: driver-recomputed jumps/ratios, baseline excludes the current bar") {
    import org.apache.spark.sql.functions._
    val bars = graft.operators.Ohlcv.bars1m(spark, sf0001).collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.sortBy(_.getAs[java.sql.Timestamp]("window_start").getTime)
        .map(r => (math.round(r.getAs[Double]("close") * 100),
          r.getAs[Long]("volume")))).toMap
    val got = graft.operators.Ohlcv.bars1mAnomalies(spark, sf0001).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val series = bars(t)
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("window_start").getTime)
      // first bar per key is dropped: one fewer output row than bars
      assert(sorted.length == series.length - 1)
      sorted.zipWithIndex.foreach { case (r, j) =>
        val i = j + 1 // output row j is bar i of the series
        val (c, v) = series(i)
        val prev = series(i - 1)._1
        assert(r.getAs[Long]("jump_milli") == math.abs(c - prev) * 1000 / prev)
        // trailing frame is bars i-5..i-1 — the current bar must NOT
        // dilute its own baseline
        val frame = series.slice(math.max(0, i - 5), i).map(_._2)
        assert(r.getAs[Long]("vol_ratio_milli") ==
          v * frame.length * 1000 / frame.sum)
      }
    }
  }

  test("flagship entry returns bars on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    val cols = df.columns.toSet
    assert(Set("window_start", "open", "high", "low", "close", "volume").subsetOf(cols))
  }

  test("all declared queries run and return rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      assert(n > 0, s"query $name returned no rows")
    }
  }

  test("every oracleSql key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("no suite silently shadows another's query or oracle key") {
    // SparkEntry merges suite maps with ++ — a duplicated key would
    // overwrite an operator and shrink coverage without any failure
    import graft.operators._
    val suites: Seq[(String, Set[String], Set[String])] = Seq(
      ("Ohlcv", Ohlcv.queries.keySet, Ohlcv.oracle.keySet),
      ("Relational", Relational.queries.keySet, Relational.oracle.keySet),
      ("TextAnalysis", TextAnalysis.queries.keySet, TextAnalysis.oracle.keySet),
      ("Dedup", Dedup.queries.keySet, Dedup.oracle.keySet),
      ("Similarity", Similarity.queries.keySet, Similarity.oracle.keySet),
      ("Multimodal", Multimodal.queries.keySet, Multimodal.oracle.keySet),
      ("Windows", Windows.queries.keySet, Windows.oracle.keySet),
      ("Pipeline", Pipeline.queries.keySet, Pipeline.oracle.keySet),
      ("RichTrades", RichTrades.queries.keySet, RichTrades.oracle.keySet),
      ("Skew", Skew.queries.keySet, Skew.oracle.keySet),
      ("Curation", Curation.queries.keySet, Curation.oracle.keySet),
      ("AsOfJoin", AsOfJoin.queries.keySet, AsOfJoin.oracle.keySet),
      ("Profiling", Profiling.queries.keySet, Profiling.oracle.keySet),
      ("Sketches", Sketches.queries.keySet, Sketches.oracle.keySet),
      ("Retrieval", Retrieval.queries.keySet, Retrieval.oracle.keySet),
      ("Graph", Graph.queries.keySet, Graph.oracle.keySet),
      ("Behavior", Behavior.queries.keySet, Behavior.oracle.keySet),
      ("Warehouse", Warehouse.queries.keySet, Warehouse.oracle.keySet),
      ("Temporal", Temporal.queries.keySet, Temporal.oracle.keySet),
      ("Intervals", Intervals.queries.keySet, Intervals.oracle.keySet),
      ("Layout", Layout.queries.keySet, Layout.oracle.keySet),
      ("SourceHealth", SourceHealth.queries.keySet, SourceHealth.oracle.keySet),
      ("Html", Html.queries.keySet, Html.oracle.keySet),
      ("GenTrades", graft.sources.GenTradesSource.queries.keySet,
        graft.sources.GenTradesSource.oracle.keySet),
      ("GenKV", graft.sources.GenKVSource.queries.keySet,
        graft.sources.GenKVSource.oracle.keySet),
      ("Warc", graft.sources.WarcIO.queries.keySet,
        graft.sources.WarcIO.oracle.keySet))
    val qSum = suites.map(_._2.size).sum
    val oSum = suites.map(_._3.size).sum
    assert(SparkEntry.queries.size == qSum,
      s"query-key collision: merged ${SparkEntry.queries.size}, suites sum $qSum")
    assert(SparkEntry.oracleSql.size == oSum,
      s"oracle-key collision: merged ${SparkEntry.oracleSql.size}, suites sum $oSum")
    // and the SparkEntry merge actually includes every suite
    suites.foreach { case (n, qs, _) =>
      assert(qs.subsetOf(SparkEntry.queries.keySet), s"suite $n not merged")
    }
  }
}
