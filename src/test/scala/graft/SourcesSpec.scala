package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.model.Schemas
import graft.sources.{Formats, JsonSource}
import graft.streaming.StreamingOhlcv

class SourcesSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def writeLines(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-json")
    Files.writeString(dir.resolve("part-0.json"), lines.mkString("\n"))
    dir.toString
  }

  test("declared-schema json read, permissive mode captures corrupt records") {
    val path = writeLines(Seq(
      """{"timestamp":1723459200000,"instrument_id":"I1","product":"P1","price":5.0,"qty":1}""",
      """{"timestamp":1723459201000,"instrument_id":"I2","product":"P2","price":6.5,"qty":2}""",
      """{"broken json"""))
    val df = JsonSource.jsonLines(spark, path, Schemas.trade, failOnMissing = false)
      .cache() // Spark disallows querying only _corrupt_record off a raw scan
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("product").isNotNull).count() == 2)
  }

  test("failOnMissing=FAILFAST aborts on malformed input (old/kfk.py:91 semantics)") {
    val path = writeLines(Seq(
      """{"timestamp":1,"instrument_id":"I","product":"P","price":1.0,"qty":1}""",
      """{"broken"""))
    val strict = JsonSource.jsonLines(spark, path, Schemas.trade, failOnMissing = true)
    intercept[Exception] { strict.collect() }
  }

  test("parseJson strict drops records with missing declared fields") {
    val df = Seq(
      """{"timestamp":1,"instrument_id":"I","product":"P","price":1.0,"qty":1}""",
      """{"instrument_id":"I2","product":"P2"}""").toDF("value")
    assert(JsonSource.parseJson(df, "value", Schemas.trade, failOnMissing = true).count() == 1)
    assert(JsonSource.parseJson(df, "value", Schemas.trade, failOnMissing = false).count() == 2)
  }

  test("format round-trips: CSV and ORC preserve the documents table; curated parquet partitions prune") {
    import graft.sources.Formats
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text", "lang", "source")
    val base = Files.createTempDirectory("graft-fmt").toString

    Formats.writeCsv(docs, s"$base/csv")
    val backCsv = Formats.csv(spark, s"$base/csv", docs.schema, failOnMalformed = true)
    assert(backCsv.count() == docs.count())
    assert(backCsv.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)

    Formats.writeOrc(docs, s"$base/orc")
    val backOrc = Formats.orc(spark, s"$base/orc", docs.schema)
    assert(backOrc.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)

    // embedded newlines in text must survive the CSV round-trip
    import spark.implicits._
    val tricky = Seq((1L, "line one\nline two", "en", "s")).toDF("doc_id", "text", "lang", "source")
    Formats.writeCsv(tricky, s"$base/csv_nl")
    val backNl = Formats.csv(spark, s"$base/csv_nl", tricky.schema, failOnMalformed = true)
    assert(backNl.collect().head.getString(1) == "line one\nline two")

    Formats.writeCuratedParquet(docs, s"$base/curated", "lang")
    val pruned = spark.read.parquet(s"$base/curated").filter(col("lang") === "en")
    // partition pruning visible in the plan: the lang filter becomes a
    // PartitionFilter, not a data filter
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"))
    assert(pruned.count() == docs.filter(col("lang") === "en").count())
  }

  test("storage-partitioned join: co-bucketed DSv2 scans join with zero shuffle") {
    val conf = Map(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      // the partition key (bucket) is a strict subset of the join keys
      // (bucket, key) — subset satisfaction must be allowed or
      // EnsureRequirements inserts the exchange anyway
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a non-broadcast join
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def side(salt: Int) = spark.read.format("graft-kv")
        .option("keys", 1000).option("buckets", 8).option("salt", salt).load()
      val a = side(1); val b = side(2)
      val j = a.join(b, Seq("bucket", "key"))
        .select(col("key"), a("value").as("va"), b("value").as("vb"))
      val rows = j.collect()
      assert(rows.length == 1000)
      rows.foreach { r =>
        val k = r.getLong(0)
        assert(r.getLong(1) == graft.sources.GenKVSource.valueOf(k, 1))
        assert(r.getLong(2) == graft.sources.GenKVSource.valueOf(k, 2))
      }
      // the whole point: equal-valued partitions pair up group-wise —
      // no shuffle exchange anywhere in the executed plan
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join must not shuffle:\n$plan")
      // and the reported partitioning also carries THROUGH the join
      // into a bucket-grained aggregate (the documented
      // scan→join→agg chain) — still zero exchanges
      val agg = a.join(b, Seq("bucket", "key"))
        .groupBy("bucket").agg(sum(a("value")).as("s"))
      agg.collect()
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"the post-join aggregate must reuse the key-grouped partitioning:\n$aggPlan")
      // negative control: with SPJ off the same join must shuffle
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val shuffled = side(1).join(side(2), Seq("bucket", "key"))
      shuffled.collect()
      assert(shuffled.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter: a selective dim filter row-prunes the fact scan side") {
    // the row-level sibling of DPP: InjectRuntimeFilter builds a bloom
    // filter from the filtered dim keys and applies might_contain on
    // the fact side BEFORE its shuffle — at 100 TB this is the
    // difference between shuffling the whole fact table and shuffling
    // the ~matching fraction. Thresholds floored because the test data
    // is far below the 10 MB/10 GB production defaults.
    val conf = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // creation side must be SMALLER than its threshold (it caps the
      // bloom build cost); application side must be LARGER than its
      // scan threshold (it guards the benefit) — so raise one, floor
      // the other for the small fixture
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = Tables.lineitem(spark, sf001)
      val dim = Tables.orders(spark, sf001).filter(col("o_orderpriority") === "1-URGENT")
      val j = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected runtime bloom filter on the fact side:\n$optimized")
      assert(j.collect().length == 1)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // the 100 TB pattern: fact partitioned on a key, the selective
    // predicate lives on a DIMENSION attribute — static pruning can't
    // help, DPP turns the broadcast dim into a runtime partition filter
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text", "lang", "source")
    val base = Files.createTempDirectory("graft-dpp").toString
    Formats.writeCuratedParquet(docs, base, "lang")
    val fact = spark.read.parquet(base)
    val langs = docs.select("lang").distinct().orderBy("lang")
      .collect().map(_.getString(0))
    val kept = langs.head
    // the dim must be file-backed: a literal LocalRelation constant-folds
    // its Filter away and the DPP rule no longer sees a selective predicate
    langs.map(l => (l, if (l == kept) "keep" else "drop")).toSeq
      .toDF("lang", "verdict").write.mode("overwrite").parquet(s"$base-dim")
    val dim = spark.read.parquet(s"$base-dim")
    val q = fact.join(dim.filter($"verdict" === "keep"), "lang")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter on the fact scan:\n$plan")
    assert(q.count() == docs.filter($"lang" === kept).count())
  }

  test("compactParquet collapses a many-file table without losing rows") {
    val scattered = Files.createTempDirectory("graft-scatter").toString
    val compacted = Files.createTempDirectory("graft-compact").toString
    val docs = Tables.documents(spark, sf001)
    docs.repartition(40).write.mode("overwrite").parquet(scattered)

    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(scattered) == 40)

    Formats.compactParquet(spark, scattered, compacted, targetMB = 256)
    assert(parquetFiles(compacted) == 1, "sf0.01 docs fit one 256 MB file")
    assert(spark.read.parquet(compacted).count() == docs.count())
  }

  test("writeRangeClustered yields disjoint per-file ranges (file-skipping layout)") {
    val out = Files.createTempDirectory("graft-range").toString
    val docs = Tables.documents(spark, sf001)
    Formats.writeRangeClustered(docs, out, "doc_id", numFiles = 4)
    val files = new java.io.File(out).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length == 4)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("doc_id")), max(col("doc_id"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // disjoint, ordered ranges: a doc_id predicate can skip whole files
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi < lo) }
    assert(spark.read.parquet(out).count() == docs.count())
  }

  test("streaming 1m->5m cascade equals direct 5m bars") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.model.Trade
    val T0 = 1723459200000L // 5-minute aligned
    val input = MemoryStream[Trade]
    val trades = Seq(
      Trade(T0, "I1", "P1", 10.0, 1),
      Trade(T0 + 70000, "I2", "P1", 30.0, 2), // minute 1
      Trade(T0 + 140000, "I3", "P1", 5.0, 3), // minute 2
      Trade(T0 + 299000, "I4", "P1", 20.0, 4), // minute 4 (same 5m window)
      Trade(T0 + 301000, "I5", "P1", 99.0, 5), // next 5m window
      Trade(T0 + 900000, "I6", "P1", 1.0, 1)) // far future: advances watermark
    input.addData(trades: _*)
    val cascade = StreamingOhlcv.cascadeBars(
      StreamingOhlcv.withEventTime(input.toDS(), "0 seconds"), "1 minute", "5 minutes")
    val q = cascade.writeStream.format("memory").queryName("casc")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      input.addData(Trade(T0 + 1800000, "I7", "P1", 1.0, 1)) // close all windows
      q.processAllAvailable()
      val rows = spark.table("casc").orderBy("window_start").collect()
      assert(rows.length >= 2)
      val first = rows(0)
      assert(first.getAs[Double]("open") == 10.0)
      assert(first.getAs[Double]("high") == 30.0)
      assert(first.getAs[Double]("low") == 5.0)
      assert(first.getAs[Double]("close") == 20.0)
      assert(first.getAs[Long]("volume") == 10L)
      val second = rows(1)
      assert(second.getAs[Double]("open") == 99.0)
      assert(second.getAs[Long]("volume") == 5L)
    } finally q.stop()
  }

  // ------------------------------------------- DSv2 graft-trades source

  test("graft-trades: deterministic rows match the LCG contract") {
    val r = spark.read.format("graft-trades").option("rows", 10).load()
      .orderBy("seq").collect()
    assert(r.length == 10)
    def h(i: Long, s: Long) = ((i + s) * 1103515245L + 12345L) % 2147483648L
    r.foreach { row =>
      val i = row.getAs[Long]("seq")
      assert(row.getAs[Long]("timestamp") == 1723459200000L + i * 500L)
      assert(row.getAs[String]("product") == "Product_" + (h(i, 3) % 1999L + 1L))
      assert(row.getAs[Double]("price") == (h(i, 1) % 1000L + 1L).toDouble)
      assert(row.getAs[Long]("qty") == h(i, 2) % 100L + 1L)
    }
  }

  test("graft-trades: column pruning reaches the connector's ReadSchema") {
    val df = spark.read.format("graft-trades").option("rows", 100).load()
      .select("product", "qty")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("product"), scan)
    assert(!scan.contains("instrument_id"), s"instrument_id not pruned:\n$scan")
  }

  test("graft-trades: seq-range pushdown narrows the planned partitions") {
    val one = spark.read.format("graft-trades")
      .option("rows", 200000L).option("partitions", 32).load()
      .where(col("seq") === 12345L)
    // EqualTo narrows the planned range to ONE row → one InputPartition
    assert(one.rdd.getNumPartitions == 1)
    assert(one.count() == 1)
    val band = spark.read.format("graft-trades")
      .option("rows", 200000L).option("partitions", 32).load()
      .where(col("seq") >= 199990L)
    assert(band.count() == 10)
    assert(band.rdd.getNumPartitions == 10) // min(32, 10 rows) splits
  }

  test("graft-trades: count/min/max push into the connector, no Aggregate in the plan") {
    val stats = graft.sources.GenTradesSource.feedStats(spark, sf0001)
    val row = stats.head()
    // answered from range arithmetic on the narrowed [50000, 150000)
    assert(row.getLong(0) == 100000L)
    assert(row.getLong(1) == 50000L && row.getLong(2) == 149999L)
    // complete pushdown: the plan carries the stats scan, no aggregate
    val plan = stats.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), s"no pushed aggregates:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"aggregate not fully pushed:\n$plan")
    // a non-pushable aggregate still works through the row path
    val sumQty = spark.read.format("graft-trades").option("rows", 1000L).load()
      .agg(sum("qty")).head().getLong(0)
    assert(sumQty > 0)
    // empty narrowed range: count 0, min/max null — SQL agg semantics
    val empty = spark.read.format("graft-trades").option("rows", 100L).load()
      .where(col("seq") >= 500L)
      .agg(count(lit(1)), min("seq"), max("seq")).head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(1) && empty.isNullAt(2))
  }

  test("graft-trades: reported statistics drive an automatic broadcast after narrowing") {
    // the connector reports exact numRows/sizeInBytes for its narrowed
    // range, so Catalyst's own size-based join planning kicks in: a
    // tiny pushed range broadcasts WITHOUT a hint; the full feed (too
    // big under a lowered threshold) must not
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64KB")
    try {
      val fact = Tables.lineitem(spark, sf001)
        .select(col("l_linenumber").cast("long").as("seq"), col("l_quantity"))
      def feed(rows: Long) = spark.read.format("graft-trades")
        .option("rows", rows).load().select("seq", "price")
      // narrowed: 100 rows × 40B = 4KB reported → broadcast
      val small = fact.join(feed(200000L).where(col("seq") < 100L), "seq")
      val planSmall = small.queryExecution.executedPlan.toString
      assert(planSmall.contains("BroadcastHashJoin"),
        s"narrowed feed did not broadcast:\n$planSmall")
      // full: 200k × 40B = 8MB reported → over the 64KB threshold
      val big = fact.join(feed(200000L), "seq")
      val planBig = big.queryExecution.executedPlan.toString
      assert(!planBig.contains("BroadcastHashJoin"),
        s"8MB-reported feed must not broadcast under 64KB threshold:\n$planBig")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("graft-trades: a join's build side runtime-filters the connector scan") {
    // V2 runtime filtering: the dim side's seq values reach the scan at
    // execution time and narrow the generated range — the DSv2 dynamic
    // pruning handshake (SupportsRuntimeFiltering)
    import spark.implicits._
    // the DPP injection heuristic wants a SELECTIVE predicate on the
    // build side, and the dim must be file-backed — a LocalRelation
    // constant-folds its filter away before the rule looks
    val base = Files.createTempDirectory("graft-rtf").toString
    (500L until 570L).map(s => (s, s"d${s % 7}")).toDF("seq", "tag")
      .write.mode("overwrite").parquet(base)
    val dim = spark.read.parquet(base).where(col("tag") === "d3")
    val feed = spark.read.format("graft-trades")
      .option("rows", 1000000L).option("partitions", 32).load()
    val joined = feed.join(broadcast(dim), "seq")
    val rows = joined.select("seq", "tag", "qty").collect()
    // tag d3 ⇒ seq % 7 == 3 within [500, 570): exactly 10 matches
    val expected = (500L until 570L).filter(_ % 7 == 3)
    assert(rows.map(_.getLong(0)).sorted.toSeq == expected)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters: [dynamicpruning"),
      s"no runtime filter reached the scan:\n$plan")
  }

  test("graft-trades: limit, offset, and asc top-N push into the scan; desc stays in Spark") {
    def feed = spark.read.format("graft-trades")
      .option("rows", 1000000L).option("partitions", 32).load()
    // limit: the scan generates exactly 5 rows (one planned partition)
    val lim = feed.limit(5)
    // 32 planned partitions collapse to ≤ 5 single-row ranges: the
    // limit reached the planner, not a post-scan row drop
    assert(lim.rdd.getNumPartitions <= 5)
    assert(lim.collect().map(_.getLong(0)).toSeq == (0L until 5L))
    // offset composes: skip 10, take 5 → [10, 15)
    val page = feed.offset(10).limit(5)
    assert(page.collect().map(_.getLong(0)).toSeq == (10L until 15L))
    // asc top-N = first N, fully pushed: no Sort in the plan
    val topAsc = feed.orderBy(col("seq")).limit(3)
    assert(topAsc.collect().map(_.getLong(0)).toSeq == (0L until 3L))
    val planAsc = topAsc.queryExecution.executedPlan.toString
    assert(!planAsc.contains("TakeOrderedAndProject") && !planAsc.contains("Sort "),
      s"asc top-N not fully pushed:\n$planAsc")
    // desc top-N is NOT claimed: Spark sorts, results still correct
    val topDesc = feed.orderBy(col("seq").desc).limit(3)
    assert(topDesc.collect().map(_.getLong(0)).toSeq ==
      Seq(999999L, 999998L, 999997L))
  }

  test("graft-trades streams in rowsPerBatch micro-batches, rows identical to batch read") {
    val q = spark.readStream.format("graft-trades")
      .option("rows", 1000).option("rowsPerBatch", 400).load()
      .writeStream.format("memory").queryName("gen_trades_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("gen_trades_stream")
        .orderBy("seq").collect().map(_.toString)
      val batch = spark.read.format("graft-trades").option("rows", 1000).load()
        .orderBy("seq").collect().map(_.toString)
      assert(streamed.length == 1000)
      assert(streamed.toSeq == batch.toSeq)
      // admission control paced the feed: ceil(1000/400) = 3 batches
      assert(q.recentProgress.count(_.numInputRows > 0) == 3,
        q.recentProgress.map(_.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("gen_trades table-valued function matches the reader path") {
    org.apache.spark.sql.graft.ColumnBridge.registerTableFunction(
      spark, "gen_trades", graft.sources.GenTradesSource.tableFunctionBuilder)
    val tvf = spark.sql(
      "SELECT count(*) AS n, sum(qty) AS q FROM gen_trades(1000)").head()
    val rdr = spark.read.format("graft-trades").option("rows", 1000).load()
      .agg(count(lit(1)), sum(col("qty"))).head()
    assert(tvf.getLong(0) == rdr.getLong(0) && tvf.getLong(1) == rdr.getLong(1))
    // pruning/pushdown flow through the TVF relation too
    assert(spark.sql("SELECT product FROM gen_trades(1000) WHERE seq = 7")
      .count() == 1)
  }

  test("graft-trades honors engine read limits and boundary predicates") {
    // Trigger.AvailableNow hands ReadAllAvailable — the whole feed must
    // land regardless of rowsPerBatch (capping would silently truncate)
    val q = spark.readStream.format("graft-trades")
      .option("rows", 1000).option("rowsPerBatch", 400).load()
      .writeStream.format("memory").queryName("gen_trades_all")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000L)
      assert(spark.table("gen_trades_all").count() == 1000)
    } finally q.stop()
    // pushed boundary predicates must saturate, not overflow: accepted
    // filters are never re-checked by Spark, so wrap-around = wrong rows
    val base = spark.read.format("graft-trades").option("rows", 100).load()
    assert(base.where(col("seq") > Long.MaxValue).count() == 0)
    assert(base.where(col("seq") <= Long.MaxValue).count() == 100)
    assert(base.where(col("seq") >= Long.MaxValue).count() == 0)
  }

  test("graft-trades stream recovers from a checkpoint without loss or duplication") {
    val dir = Files.createTempDirectory("graft-trades-ckpt")
    val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    // incarnation 1 sees a 500-row feed and drains it; incarnation 2
    // reuses the checkpoint against the grown 2000-row feed — a
    // deterministic restart-mid-sequence (no stop-vs-stream race) that
    // must resume from the offset log, not from offset zero
    def run(rows: Int): Unit = {
      val q = spark.readStream.format("graft-trades")
        .option("rows", rows).option("rowsPerBatch", 500).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run(rows = 500)
    assert(spark.read.parquet(out).count() == 500) // genuinely mid-sequence
    run(rows = 2000) // recovery resumes from the offset log
    val seqs = spark.read.parquet(out).select("seq")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(seqs == (0L until 2000L), // every row exactly once
      s"got ${seqs.length} rows, dups=${seqs.length - seqs.distinct.length}")
  }

  test("idempotentTableSink makes foreachBatch replays exactly-once") {
    import graft.streaming.Sinks
    val dir = Files.createTempDirectory("graft-idem")
    val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    val sink = Sinks.idempotentTableSink(out)
    // unit-level replay: same batchId written twice (the crash-replay
    // path) must overwrite its own partition, not append duplicates
    val unitSink = Sinks.idempotentTableSink(s"$dir/unit")
    val b0 = spark.range(5).toDF("seq")
    unitSink(b0, 0L); unitSink(b0, 0L)
    assert(spark.read.parquet(s"$dir/unit").count() == 5)
    // end-to-end: drain a 500-row feed, then restart the checkpoint
    // against the grown 2000-row feed — deterministic mid-sequence
    // resume through the same sink (no stop-vs-stream race)
    def run(rows: Int): Unit = {
      val q = spark.readStream.format("graft-trades")
        .option("rows", rows).option("rowsPerBatch", 500).load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    run(rows = 500)
    assert(spark.read.parquet(out).count() == 500) // genuinely mid-sequence
    run(rows = 2000)
    val seqs = spark.read.parquet(out)
      .select("seq").collect().map(_.getLong(0)).sorted.toSeq
    assert(seqs == (0L until 2000L),
      s"rows=${seqs.length} dups=${seqs.length - seqs.distinct.length}")
  }

  test("graft-trades streaming feed drives the stateful OHLCV engine") {
    import graft.model.Trade
    val feed = spark.readStream.format("graft-trades")
      .option("rows", 5000).option("rowsPerBatch", 2000).load()
      .select("timestamp", "instrument_id", "product", "price", "qty")
      .as[Trade]
    val bars = StreamingOhlcv.statefulBars(
      StreamingOhlcv.withEventTime(feed, "5 seconds"),
      widthMs = 60000L, emitRunning = false)
    val q = bars.writeStream.format("memory").queryName("gen_trades_bars")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("gen_trades_bars").collect()
      assert(streamed.nonEmpty)
      // every closed streamed bar must equal the batch computation over
      // the SAME connector feed (append mode can't emit the last open
      // windows, so streamed ⊆ batch)
      val batch = graft.operators.Ohlcv.bars(
        spark.read.format("graft-trades").option("rows", 5000).load()
          .withColumn("ts", timestamp_millis(col("timestamp"))),
        col("ts"), col("price"), col("qty"),
        Seq("product" -> col("product")), "1 minute", col("timestamp"))
        .collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start"),
          r.getAs[String]("product")) -> r).toMap
      streamed.foreach { s =>
        val key = (s.getAs[java.sql.Timestamp]("time"),
          s.getAs[String]("product"))
        val b = batch.getOrElse(key, fail(s"no batch bar for $key"))
        assert(s.getAs[Double]("open") == b.getAs[Double]("open"))
        assert(s.getAs[Double]("close") == b.getAs[Double]("close"))
        assert(s.getAs[Double]("high") == b.getAs[Double]("high"))
        assert(s.getAs[Double]("low") == b.getAs[Double]("low"))
        assert(s.getAs[Long]("volume") == b.getAs[Long]("volume"))
      }
    } finally q.stop()
  }
}
