package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage cost breakdown of the composed streaming pipeline
  * (dedup → stream-stream interval join → windowed agg) — the
  * diagnostic behind the bench's `streaming_composed_events_per_sec`
  * figure: each configuration adds ONE operator to the previous, so
  * the rate deltas attribute the end-to-end cost operator by operator,
  * and the state-operator metrics from StreamingQueryProgress report
  * each store's row/memory footprint in the same run.
  *
  * Usage: runMain graft.StreamBreakdown [nTrades]
  */
object StreamBreakdown {

  private val ckptN = new java.util.concurrent.atomic.AtomicInteger(0)

  private def genTrades(n: Int): Seq[graft.model.Trade] = {
    import graft.model.Trade
    val rnd = new scala.util.Random(42)
    val base = 1723459200000L
    (0 until n).map { _ =>
      Trade(base + rnd.nextInt(600000).toLong, s"I${rnd.nextInt(100)}",
        s"Product_${rnd.nextInt(1999) + 1}",
        (rnd.nextInt(1000) + 1).toDouble, (rnd.nextInt(100) + 1).toLong)
    }
  }

  private def genQuotes(n: Int): Seq[graft.model.Quote] = {
    import graft.model.Quote
    val rnd = new scala.util.Random(43)
    val base = 1723459200000L
    (0 until n).map { _ =>
      val bid = (rnd.nextInt(1000) + 1).toDouble
      Quote(base + rnd.nextInt(600000).toLong,
        s"Product_${rnd.nextInt(1999) + 1}", bid, bid + 1.0)
    }
  }

  def main(args: Array[String]): Unit = {
    val nTrades = args.headOption.map(_.toInt).getOrElse(100000)
    val nQuotes = nTrades / 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // experiment knob: comma-separated k=v conf pairs, e.g.
    // SPARK_GRAFT_BREAKDOWN_CONFS=spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider
    sys.env.get("SPARK_GRAFT_BREAKDOWN_CONFS").foreach(_.split(',').foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      println(s"CONF $k=$v")
    })
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{StreamJoins, StreamingOhlcv}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    /** stage builders over (tradesWithTs, quotesWithTs) */
    def dedup(t: DataFrame): DataFrame =
      StreamJoins.dedupWithinWatermark(t,
        Seq("product", "instrument_id", "timestamp"))
    def join(t: DataFrame, q: DataFrame): DataFrame =
      StreamJoins.tradesWithRecentQuotes(t, q, lookbackSeconds = 10)
    def agg(j: DataFrame): DataFrame = j
      .groupBy(window(col("ts"), "1 minute").as("w"), col("product"))
      .agg(count(lit(1)).as("n_quoted"), max(col("ask") - col("bid")).as("max_spread"))

    val stages: Seq[(String, (DataFrame, DataFrame) => DataFrame, Boolean)] = Seq(
      ("passthrough (0 stateful)", (t, _) => t, false),
      ("dedup (1 stateful)", (t, _) => dedup(t), false),
      ("dedup+join (2 stateful)", (t, q) => join(dedup(t), q), true),
      ("join only (1 stateful)", (t, q) => join(t, q), true),
      ("dedup+join+agg (3 stateful)", (t, q) => agg(join(dedup(t), q)), true),
      ("agg only (1 stateful)", (t, _) => agg(t.withColumn("bid", col("price"))
        .withColumn("ask", col("price") + 1.0)), false))

    def run(name: String, build: (DataFrame, DataFrame) => DataFrame,
        usesQuotes: Boolean, n: Int, report: Boolean): Long = {
      val trades = MemoryStream[graft.model.Trade]
      val quotes = MemoryStream[graft.model.Quote]
      trades.addData(genTrades(n): _*)
      val nq = if (usesQuotes) n / 4 else 0
      if (usesQuotes) quotes.addData(genQuotes(nq): _*)
      val df = build(
        StreamingOhlcv.withEventTime(trades.toDS(), "5 seconds"),
        StreamJoins.quotesWithEventTime(quotes.toDS(), "5 seconds"))
      // same pinned-fast-storage discipline as Bench.StreamCkptRoot: a
      // per-stage attribution run must not let disk-backed temp
      // checkpoint dirs impersonate stage cost (the r13 collapse class)
      val ckpt = s"${Bench.StreamCkptRoot}/bd${ckptN.incrementAndGet()}"
      val q = df.writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", ckpt).start()
      try {
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val secs = (System.nanoTime() - t0) / 1e9
        val rate = ((n + nq) / secs).toLong
        if (report) {
          val progs = q.recentProgress
          val addBatchMs = progs.map(p =>
            Option(p.durationMs.get("addBatch")).map(_.longValue).getOrElse(0L)).sum
          println(f"STAGE $name%-28s rate=$rate%7d ev/s  wall=$secs%6.2f s  addBatch=${addBatchMs}ms  batches=${progs.length}")
          for (p <- progs; so <- p.stateOperators)
            println(f"    op=${so.operatorName}%-34s rowsTotal=${so.numRowsTotal}%8d updated=${so.numRowsUpdated}%8d mem=${so.memoryUsedBytes / 1024}%8d KiB commit=${so.commitTimeMs}%6d ms")
        }
        rate
      } finally {
        q.stop()
        Bench.deleteRecursively(ckpt)
      }
    }

    // SPARK_GRAFT_BREAKDOWN_STAGES: comma-separated stage-name prefixes
    // to run (default: all) — an experiment iterating one conf knob
    // over the composed chain should not pay the full six-stage sweep
    val only = sys.env.get("SPARK_GRAFT_BREAKDOWN_STAGES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // a filter that selects nothing is a typo'd experiment, not a run —
    // fail loudly rather than print nothing and exit 0
    only.foreach { prefixes =>
      val names = stages.map(_._1)
      val unmatched = prefixes.filterNot(p => names.exists(_.startsWith(p)))
      require(prefixes.nonEmpty,
        s"SPARK_GRAFT_BREAKDOWN_STAGES is set but contains no prefixes; " +
          s"stages: ${names.mkString(", ")}")
      require(unmatched.isEmpty,
        s"SPARK_GRAFT_BREAKDOWN_STAGES prefixes matching no stage: " +
          s"${unmatched.mkString(", ")}; stages: ${names.mkString(", ")}")
    }
    for ((name, build, uq) <- stages
         if only.forall(_.exists(name.startsWith))) {
      run(name, build, uq, 30000, report = false) // warmup, discarded
      val best = (1 to 3).map(i =>
        run(name, build, uq, nTrades, report = i == 3)).max
      println(f"BEST  $name%-28s $best%7d ev/s")
    }
    spark.stop()
  }
}
