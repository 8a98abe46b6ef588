package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.Trade
import graft.streaming.{KafkaIO, StreamingOhlcv}

/** Streaming semantics (SURVEY.md §5.3): MemoryStream replays of the
  * reference's mock distribution (/root/reference/old/beam2.py:7-16),
  * asserting update-mode running bars (A3), append-mode final bars (A6),
  * and watermark-driven finalization. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val T0 = 1723459200000L // 2024-08-12 10:40:00 UTC, minute-aligned

  private def trade(offMs: Long, product: String, price: Double, qty: Long) =
    Trade(T0 + offMs, s"I${offMs % 7}", product, price, qty)

  test("kafka wire round-trip: toJsonValue → parseTrades") {
    val trades = Seq(
      trade(0, "P1", 512.0, 31),
      trade(1000, "P2", 7.0, 2))
    val wire = KafkaIO.toJsonValue(trades.toDF())
    val back = KafkaIO.parseTrades(wire).collect().sortBy(_.product)
    assert(back.toSeq == trades)
  }

  test("parseTrades drops records failing the declared schema") {
    val wire = Seq(
      """{"timestamp":1723459200000,"instrument_id":"I1","product":"P1","price":5.0,"qty":1}""",
      """not json at all""",
      """{"no_timestamp":true}""").toDF("value")
    assert(KafkaIO.parseTrades(wire).count() == 1)
  }

  test("W5 allowed lateness: late event within horizon re-fires corrected bar, beyond is dropped") {
    val input = MemoryStream[Trade]
    // width 60 s, lateness 10 s, slack 0 → stream watermark delay must
    // absorb the FULL grace width + lateness = 70 s (a late event can sit
    // a whole window-width below the still-open horizon)
    val bars = StreamingOhlcv.statefulBarsWithLateness(
      StreamingOhlcv.withEventTime(input.toDS(), "70 seconds"),
      widthMs = 60000L, latenessMs = 10000L)
    val q = bars.writeStream.format("memory").queryName("w5").outputMode("update").start()
    try {
      def minute0 = spark.table("w5")
        .filter(col("time") === new java.sql.Timestamp(T0)).collect()

      input.addData(trade(0, "P1", 10.0, 1), trade(30000, "P1", 20.0, 2))
      q.processAllAvailable()
      assert(minute0.isEmpty) // watermark still inside minute 0

      // event time 65 s → spark watermark −5 s → TRUE watermark 65 s:
      // minute 0 fires its first final bar but stays retained
      input.addData(trade(65000, "P1", 99.0, 5))
      q.processAllAvailable()
      assert(minute0.length == 1)
      assert(minute0.head.getAs[Long]("volume") == 3L)
      assert(minute0.head.getAs[Double]("close") == 20.0)
      assert(minute0.head.getAs[Boolean]("end_of_window"))

      // LATE event at 56 s: below the true watermark (65 s) but inside
      // minute 0's lateness horizon (end 60 s + 10 s) → immediate
      // corrected re-fire
      input.addData(trade(56000, "P1", 5.0, 7))
      q.processAllAvailable()
      val refired = minute0.sortBy(_.getAs[Long]("volume"))
      assert(refired.length == 2)
      assert(refired(1).getAs[Long]("volume") == 10L)
      assert(refired(1).getAs[Double]("low") == 5.0)
      assert(refired(1).getAs[Double]("close") == 5.0) // 56 s is latest event time

      // MID-WINDOW late event at 40 s — a full window-width below the
      // true watermark yet still inside the horizon (65 < 70). Flink
      // accepts it; the absorbed width+lateness delay keeps Spark's
      // pre-filter (−5 s here) from eating it before the state function
      input.addData(trade(40000, "P1", 3.0, 20))
      q.processAllAvailable()
      val midFired = minute0.sortBy(_.getAs[Long]("volume"))
      assert(midFired.length == 3)
      assert(midFired(2).getAs[Long]("volume") == 30L)
      assert(midFired(2).getAs[Double]("low") == 3.0)
      assert(midFired(2).getAs[Double]("close") == 5.0) // 56 s still latest

      // advance far past the horizon, then send an event for minute 0:
      // it is beyond end+lateness → dropped, no further re-fire
      input.addData(trade(140000, "P1", 42.0, 1))
      q.processAllAvailable()
      input.addData(trade(59000, "P1", 1.0, 9))
      q.processAllAvailable()
      assert(minute0.length == 3) // unchanged
      assert(spark.table("w5").filter(col("low") === 1.0).isEmpty)
    } finally q.stop()
  }

  test("W5 side output: beyond-horizon events surface on the late channel, bars unchanged") {
    import org.apache.spark.sql.Row
    val input = MemoryStream[Trade]
    val routed = StreamingOhlcv.statefulBarsWithSideOutput(
      StreamingOhlcv.withEventTime(input.toDS(), "70 seconds"),
      widthMs = 60000L, latenessMs = 10000L)
    val q = routed.writeStream.format("memory").queryName("w5side")
      .outputMode("update").start()
    try {
      def rows = spark.table("w5side").collect()
      def lateRows = rows.filter(_.getAs[String]("side") == "late")
      input.addData(trade(0, "P1", 10.0, 1), trade(30000, "P1", 20.0, 2))
      q.processAllAvailable()
      input.addData(trade(65000, "P1", 99.0, 5))
      q.processAllAvailable()
      // same bar semantics as the plain lateness engine: minute 0 fires
      val bars0 = rows.filter(r => r.getAs[String]("side") == "bar")
        .flatMap(r => Option(r.getAs[Row]("bar")))
        .filter(_.getAs[java.sql.Timestamp]("time").getTime == T0)
      assert(bars0.length == 1 && bars0.head.getAs[Long]("volume") == 3L)
      assert(lateRows.isEmpty)
      // advance the true watermark to 140 s: minute-1's horizon
      // (end 120 s + 10 s) is passed
      input.addData(trade(140000, "P1", 42.0, 1))
      q.processAllAvailable()
      // ts 75 s clears Spark's pre-filter (spark wm 70 s) but its
      // window [60,120) is beyond the horizon → routed to "late"
      input.addData(trade(75000, "P1", 1.0, 9))
      q.processAllAvailable()
      assert(lateRows.length == 1)
      val d = lateRows.head.getAs[Row]("dropped")
      assert(d.getAs[Long]("timestamp") == T0 + 75000)
      assert(d.getAs[Long]("qty") == 9L)
      // the dropped event never contaminates any bar
      assert(!rows.exists(r => r.getAs[String]("side") == "bar" &&
        Option(r.getAs[Row]("bar")).exists(_.getAs[Double]("low") == 1.0)))
    } finally q.stop()
  }

  test("Graft.streamingBarsWithLateness absorbs the grace delay for the caller") {
    // the facade owns the slack+width+lateness arithmetic: a mid-window
    // late event (the case a wrong delay silently drops) must re-fire
    val input = MemoryStream[Trade]
    val q = graft.Graft.streamingBarsWithLateness(input.toDS(),
        slackMs = 0L, widthMs = 60000L, latenessMs = 10000L)
      .writeStream.format("memory").queryName("w5f").outputMode("update").start()
    try {
      input.addData(trade(0, "P1", 10.0, 1), trade(30000, "P1", 20.0, 2))
      q.processAllAvailable()
      input.addData(trade(65000, "P1", 99.0, 5)) // true watermark 65 s: fire
      q.processAllAvailable()
      input.addData(trade(40000, "P1", 3.0, 20)) // mid-window late: re-fire
      q.processAllAvailable()
      val m0 = spark.table("w5f")
        .filter(col("time") === new java.sql.Timestamp(T0))
        .collect().sortBy(_.getAs[Long]("volume"))
      assert(m0.map(_.getAs[Long]("volume")).toSeq == Seq(3L, 23L))
      assert(m0(1).getAs[Double]("low") == 3.0)
    } finally q.stop()
  }

  test("windowedBars matches batch OHLCV semantics on a bounded stream") {
    val input = MemoryStream[Trade]
    input.addData(
      trade(0, "P1", 10.0, 1), trade(5000, "P1", 30.0, 2),
      trade(10000, "P1", 5.0, 3), trade(59000, "P1", 20.0, 4),
      trade(61000, "P1", 99.0, 5)) // second window
    val bars = StreamingOhlcv.windowedBars(
      StreamingOhlcv.withEventTime(input.toDS(), "0 seconds"), "1 minute")
    val q = bars.writeStream.format("memory").queryName("wb").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("wb").orderBy("window_start").collect()
      assert(rows.length == 2)
      val first = rows(0)
      assert(first.getAs[Double]("open") == 10.0)
      assert(first.getAs[Double]("high") == 30.0)
      assert(first.getAs[Double]("low") == 5.0)
      assert(first.getAs[Double]("close") == 20.0)
      assert(first.getAs[Long]("volume") == 10L)
      assert(rows(1).getAs[Double]("open") == 99.0)
    } finally q.stop()
  }

  test("statefulBars update mode emits a running bar per event") {
    val input = MemoryStream[Trade]
    val bars = StreamingOhlcv.statefulBars(
      StreamingOhlcv.withEventTime(input.toDS(), "0 seconds"),
      widthMs = 60000L, emitRunning = true)
    val q = bars.writeStream.format("memory").queryName("run").outputMode("update").start()
    try {
      input.addData(trade(0, "P1", 10.0, 1), trade(1000, "P1", 30.0, 2),
        trade(2000, "P1", 5.0, 3))
      q.processAllAvailable()
      val rows = spark.table("run").filter(!col("end_of_window"))
        .orderBy("volume").collect()
      // one running bar per event, cumulative (4_ohlc.py:47-56)
      assert(rows.length == 3)
      assert(rows.map(_.getAs[Long]("volume")).toSeq == Seq(1L, 3L, 6L))
      assert(rows.last.getAs[Double]("open") == 10.0)
      assert(rows.last.getAs[Double]("high") == 30.0)
      assert(rows.last.getAs[Double]("low") == 5.0)
      assert(rows.last.getAs[Double]("close") == 5.0)
    } finally q.stop()
  }

  test("statefulBars append mode emits final bars when watermark passes window end") {
    val input = MemoryStream[Trade]
    val bars = StreamingOhlcv.statefulBars(
      StreamingOhlcv.withEventTime(input.toDS(), "0 seconds"),
      widthMs = 60000L, emitRunning = false)
    val q = bars.writeStream.format("memory").queryName("fin").outputMode("append").start()
    try {
      input.addData(
        trade(0, "P1", 10.0, 1), trade(30000, "P1", 40.0, 2),
        trade(0, "P2", 7.0, 5))
      q.processAllAvailable()
      // watermark still at 30s — nothing final yet
      assert(spark.table("fin").isEmpty)

      // an event in the next window advances the watermark past minute 1
      input.addData(trade(61000, "P1", 99.0, 1))
      q.processAllAvailable()
      input.addData(trade(121000, "P1", 1.0, 1)) // advance past minute 2
      q.processAllAvailable()

      val rows = spark.table("fin").orderBy("product").collect()
      assert(rows.length >= 2)
      val p1 = rows.filter(_.getAs[String]("product") == "P1")
        .minBy(_.getAs[java.sql.Timestamp]("time").getTime)
      assert(p1.getAs[Double]("open") == 10.0 && p1.getAs[Double]("close") == 40.0)
      assert(p1.getAs[Long]("volume") == 3L)
      assert(p1.getAs[Boolean]("end_of_window"))
      val p2 = rows.filter(_.getAs[String]("product") == "P2").head
      assert(p2.getAs[Double]("open") == 7.0 && p2.getAs[Long]("volume") == 5L)
    } finally q.stop()
  }

  test("A5 elapsed-time alignment anchors at the first event's minute, not the grid") {
    // the same replay through both alignments (6_ohlc.py:71-82 vs
    // 7_ohlc.py:64): a trade at 1:30 with N=2min opens a [1:00,3:00)
    // elapsed window that ABSORBS the 2:30 trade, where the grid
    // splits them across [0:00,2:00) and [2:00,4:00)
    val width = 120000L
    def run(elapsed: Boolean, name: String): Seq[(Long, Long)] = {
      val in = MemoryStream[Trade]
      val bars = StreamingOhlcv.statefulBars(
        StreamingOhlcv.withEventTime(in.toDS(), "0 seconds"),
        widthMs = width, emitRunning = false, elapsedAlign = elapsed)
      val q = bars.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        in.addData(trade(90000, "PA", 10.0, 1), trade(150000, "PA", 20.0, 2))
        q.processAllAvailable()
        in.addData(trade(400000, "PA", 30.0, 4)); q.processAllAvailable()
        in.addData(trade(600000, "PA", 40.0, 8)); q.processAllAvailable()
      } finally q.stop()
      spark.table(name).orderBy("time").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("time").getTime - T0,
          r.getAs[Long]("volume"))).toSeq
    }
    val grid = run(elapsed = false, "alg_grid")
    val elapsedBars = run(elapsed = true, "alg_elapsed")
    // grid: 1:30 → [0:00,2:00), 2:30 → [2:00,4:00) — separate bars
    assert(grid.take(2) == Seq((0L, 1L), (120000L, 2L)), s"grid: $grid")
    // elapsed: ONE [1:00,3:00) bar holds both trades; the 6:40 arrival
    // rolled the 6:00-anchored window (vol 4); nothing grid-snapped
    assert(elapsedBars.head == (60000L, 3L), s"elapsed: $elapsedBars")
    assert(elapsedBars.contains((360000L, 4L)), s"elapsed: $elapsedBars")
    assert(!elapsedBars.exists(b => b._1 == 0L || b._1 == 120000L),
      s"elapsed bars must not snap to the grid: $elapsedBars")
  }

  test("elapsedAlign rejects sub-minute and off-minute widths") {
    // the elapsed anchor truncates to the MINUTE (the reference's
    // replace(second=0)); a 30s width would let the anchor precede the
    // first event by up to 59s — the API must refuse, not mis-window
    val in = MemoryStream[Trade]
    val ts = StreamingOhlcv.withEventTime(in.toDS(), "0 seconds")
    for (w <- Seq(30000L, 90000L, 0L)) {
      val e = intercept[IllegalArgumentException] {
        StreamingOhlcv.statefulBars(ts, widthMs = w,
          emitRunning = false, elapsedAlign = true)
      }
      assert(e.getMessage.contains("whole number of minutes"), s"w=$w: $e")
    }
    // the same widths are legal for the grid path (its anchor is the
    // width-aligned grid itself, no minute truncation)
    StreamingOhlcv.statefulBars(ts, widthMs = 30000L, emitRunning = false)
  }

  test("statefulBars recovers keyed state and watermark across a restart") {
    // production restart drill: stop after half a window, restart from
    // the checkpoint, and the final bar must combine events from BOTH
    // runs — proof the GroupState, timers, and watermark all persist
    // memory sinks cannot resume from a checkpoint — use the file sink
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-ckpt-out").toString
    val input = MemoryStream[Trade]
    def start() = StreamingOhlcv.statefulBars(
        StreamingOhlcv.withEventTime(input.toDS(), "0 seconds"),
        widthMs = 60000L, emitRunning = false)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val q1 = start()
    try {
      input.addData(trade(0, "P1", 10.0, 1), trade(30000, "P1", 20.0, 2))
      q1.processAllAvailable()
      assert(spark.read.parquet(out).isEmpty) // window still open
    } finally q1.stop()

    val q2 = start()
    try {
      input.addData(trade(59000, "P1", 5.0, 3), trade(130000, "P1", 99.0, 4))
      q2.processAllAvailable()
      val fin = spark.read.parquet(out)
        .filter(col("end_of_window")).orderBy("time").collect()
      assert(fin.length == 1, s"want the one closed window, got ${fin.length}")
      assert(fin(0).getAs[Double]("open") == 10.0)  // run-1 event
      assert(fin(0).getAs[Double]("high") == 20.0)  // run-1 event
      assert(fin(0).getAs[Double]("close") == 5.0)  // run-2 event
      assert(fin(0).getAs[Long]("volume") == 6L)    // 1+2 (run 1) + 3 (run 2)
    } finally q2.stop()
  }

  test("W5 lateness engine re-fires correctly after a checkpoint restart") {
    // the re-fire path depends on TWO pieces of recovered state: the
    // retained closed-window bars AND the fired-window set — a restart
    // losing either would double-fire or mis-aggregate the late event
    val ckpt = java.nio.file.Files.createTempDirectory("graft-w5-ckpt").toString
    val input = MemoryStream[Trade]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double, Long)]
    def start() = StreamingOhlcv.statefulBarsWithLateness(
        StreamingOhlcv.withEventTime(input.toDS(), "70 seconds"), // width + lateness
        widthMs = 60000L, latenessMs = 10000L)
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[graft.model.RunningBar], _: Long) =>
          got.synchronized {
            got ++= batch.collect().map(b =>
              (b.time.getTime, b.low, b.close, b.volume))
          }
          ()
      }
      .option("checkpointLocation", ckpt).outputMode("update").start()

    val q1 = start()
    try {
      input.addData(trade(0, "P1", 10.0, 1), trade(30000, "P1", 20.0, 2))
      q1.processAllAvailable()
      input.addData(trade(65000, "P1", 99.0, 5)) // true watermark 65 s: fire
      q1.processAllAvailable()
      assert(got.synchronized(got.count(_._1 == T0)) == 1)
    } finally q1.stop()

    val q2 = start()
    try {
      input.addData(trade(56000, "P1", 5.0, 7)) // late, inside the horizon
      q2.processAllAvailable()
      val m0 = got.synchronized(got.filter(_._1 == T0).sortBy(_._4))
      assert(m0.map(_._4) == Seq(3L, 10L), s"volumes: ${m0.map(_._4)}")
      assert(m0(1)._2 == 5.0) // low updated by the recovered late merge
      assert(m0(1)._3 == 5.0) // close is the latest event time (56 s)
    } finally q2.stop()
  }

  test("topMoversPerWindow ranks closed windows by volume, bounded to k") {
    val input = MemoryStream[Trade]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Int)]
    val q = StreamingOhlcv.topMoversPerWindow(
      StreamingOhlcv.withEventTime(input.toDS(), "0 seconds"), "1 minute", k = 2) {
      batch =>
        got.synchronized {
          got ++= batch.collect().map(r => (
            r.getAs[java.sql.Timestamp]("window_start").getTime - T0,
            r.getAs[String]("product"), r.getAs[Long]("volume"),
            r.getAs[Int]("rnk")))
        }
    }
    try {
      input.addData(
        trade(0, "A", 1.0, 10), trade(1000, "A", 1.0, 15), // A: 25
        trade(2000, "B", 1.0, 30),                         // B: 30
        trade(3000, "C", 1.0, 5), trade(4000, "D", 1.0, 1))
      q.processAllAvailable()
      input.addData(trade(120000, "A", 1.0, 1)) // close minute 0
      q.processAllAvailable()
      val w0 = got.synchronized(got.filter(_._1 == 0L).sortBy(_._4))
      assert(w0.map(t => (t._2, t._3, t._4)).toSeq == Seq(("B", 30L, 1), ("A", 25L, 2)))
    } finally q.stop()
  }

  test("session windows merge and close on a stream (Windows.userSessions shape)") {
    val input = MemoryStream[Trade]
    val sess = StreamingOhlcv.withEventTime(input.toDS(), "0 seconds")
      .groupBy(session_window(col("ts"), "30 seconds").as("w"), col("product"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("s"), col("w.end").as("e"), col("product"), col("n"))
    val q = sess.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // 0/10/20s chain into ONE session ending 20+30=50s; 120s starts another
      input.addData(trade(0, "P1", 1.0, 1), trade(10000, "P1", 1.0, 1),
        trade(20000, "P1", 1.0, 1), trade(120000, "P1", 1.0, 1))
      q.processAllAvailable()
      input.addData(trade(300000, "P1", 1.0, 1)) // watermark past both
      q.processAllAvailable()
      val rows = spark.table("sess").orderBy("s").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n") == 3)
      assert(rows(0).getAs[java.sql.Timestamp]("e").getTime -
        rows(0).getAs[java.sql.Timestamp]("s").getTime == 50000L)
      assert(rows(1).getAs[Long]("n") == 1)
    } finally q.stop()
  }

  test("dualSink fans one stateful stream out to running and final targets") {
    import graft.streaming.Sinks
    import graft.model.RunningBar
    val running = scala.collection.mutable.ArrayBuffer.empty[Long]
    val finals = scala.collection.mutable.ArrayBuffer.empty[Long]
    val input = MemoryStream[Trade]
    val bars = StreamingOhlcv.statefulBars(
      StreamingOhlcv.withEventTime(input.toDS(), "0 seconds"),
      widthMs = 60000L, emitRunning = true)
    val q = Sinks.dualSink(bars,
        runningSink = df => running.synchronized {
          running ++= df.select("volume").collect().map(_.getLong(0)) },
        finalSink = df => finals.synchronized {
          finals ++= df.select("volume").collect().map(_.getLong(0)) })
      .outputMode("update").start()
    try {
      input.addData(trade(0, "P1", 10.0, 1), trade(30000, "P1", 40.0, 2))
      q.processAllAvailable()
      input.addData(trade(120000, "P1", 99.0, 4)) // closes minute 0
      q.processAllAvailable()
      assert(running.sorted.toSeq == Seq(1L, 3L, 4L)) // one per event
      assert(finals.toSeq == Seq(3L)) // the closed minute-0 bar
    } finally q.stop()
  }

  test("late events beyond the watermark slack are dropped (W6) but kept within it (W7)") {
    // W6: 0s slack — an event whose window is already below the watermark
    // never reaches a final bar. W7: 5s slack keeps it alive.
    def finalVolumes(slack: String): Map[Long, Long] = {
      val input = MemoryStream[Trade]
      val name = s"late_${slack.replace(' ', '_')}"
      val bars = StreamingOhlcv.windowedBars(
        StreamingOhlcv.withEventTime(input.toDS(), slack), "1 minute")
      val q = bars.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData(trade(0, "P1", 10.0, 1), trade(59000, "P1", 20.0, 2))
        q.processAllAvailable()
        input.addData(trade(62000, "P1", 30.0, 4)) // watermark → 62s (minus slack)
        q.processAllAvailable()
        input.addData(trade(58000, "P1", 40.0, 8)) // late by 4s vs max event time
        q.processAllAvailable()
        input.addData(trade(300000, "P1", 1.0, 16)) // close everything
        q.processAllAvailable()
        val rows = spark.table(name).collect()
          .map(r => r.getAs[java.sql.Timestamp]("window_start").getTime -> r.getAs[Long]("volume"))
        // append mode must emit each window exactly once — a duplicate
        // re-emission regression must FAIL, not vanish into toMap
        assert(rows.map(_._1).distinct.length == rows.length,
          s"duplicate window emission: ${rows.toSeq}")
        rows.toMap
      } finally q.stop()
    }
    assert(finalVolumes("0 seconds")(T0) == 3L) // late event dropped
    assert(finalVolumes("5 seconds")(T0) == 11L) // late event within slack kept
  }

  test("windowedBars update mode re-emits a corrected bar for an in-watermark late event (W5)") {
    // the declarative path's allowed-lateness approximation (SURVEY §7.4):
    // update mode must re-fire the bar when a late-but-within-watermark
    // event lands in a LATER micro-batch — including correcting the open
    val input = MemoryStream[Trade]
    val bars = StreamingOhlcv.windowedBars(
      StreamingOhlcv.withEventTime(input.toDS(), "2 minutes"), "1 minute")
    val q = bars.writeStream.format("memory").queryName("refire")
      .outputMode("update").start()
    try {
      input.addData(trade(30000, "P1", 10.0, 1), trade(50000, "P1", 20.0, 2))
      q.processAllAvailable()
      val firstFire = spark.table("refire").collect()
        .map(r => (r.getAs[Double]("open"), r.getAs[Long]("volume")))
      assert(firstFire.toSeq == Seq((10.0, 3L)))
      // late straggler, EARLIER event time than anything seen: within the
      // 2-minute slack, so the minute-0 bar must re-fire with the true open
      input.addData(trade(10000, "P1", 5.0, 4))
      q.processAllAvailable()
      val fires = spark.table("refire").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").getTime,
          r.getAs[Double]("open"), r.getAs[Double]("close"), r.getAs[Long]("volume")))
      assert(fires.length == 2, s"expected a re-fire row, got ${fires.toSeq}")
      assert(fires.contains((T0, 5.0, 20.0, 7L)),
        s"re-fired bar must carry the corrected open/volume: ${fires.toSeq}")
    } finally q.stop()
  }

  test("statefulBars absorbs out-of-order events across window boundaries within the watermark") {
    val input = MemoryStream[Trade]
    val bars = StreamingOhlcv.statefulBars(
      StreamingOhlcv.withEventTime(input.toDS(), "2 minutes"), // generous slack
      widthMs = 60000L, emitRunning = false)
    val q = bars.writeStream.format("memory").queryName("ooo").outputMode("append").start()
    try {
      // batch 1: one event in each of minutes 0 and 1
      input.addData(trade(70000, "P1", 50.0, 1), trade(50000, "P1", 5.0, 2))
      q.processAllAvailable()
      // batch 2: stragglers for BOTH minutes with EARLIER event times —
      // a later micro-batch must be able to supply the true open
      input.addData(trade(65000, "P1", 60.0, 4), trade(10000, "P1", 9.0, 8))
      q.processAllAvailable()
      // close both windows
      input.addData(trade(600000, "P1", 1.0, 16))
      q.processAllAvailable()
      input.addData(trade(900000, "P1", 1.0, 32))
      q.processAllAvailable()
      val rows = spark.table("ooo")
        .orderBy("time").collect()
      assert(rows.length >= 2)
      val m0 = rows(0)
      assert(m0.getAs[java.sql.Timestamp]("time").getTime == T0)
      // event-time order, not arrival order: the batch-2 straggler at
      // ts=10s is the open; close is the batch-1 event at ts=50s
      assert(m0.getAs[Double]("open") == 9.0 && m0.getAs[Double]("close") == 5.0)
      assert(m0.getAs[Long]("volume") == 10L)
      val m1 = rows(1)
      assert(m1.getAs[Double]("open") == 60.0 && m1.getAs[Double]("close") == 50.0)
      assert(m1.getAs[Long]("volume") == 5L)
    } finally q.stop()
  }

  test("property: streaming windowedBars equals batch Ohlcv.bars on random trades") {
    val rnd = new scala.util.Random(7)
    val trades = (0 until 500).map { i =>
      Trade(T0 + rnd.nextInt(600000).toLong, s"I$i", s"P${rnd.nextInt(5)}",
        (rnd.nextInt(1000) + 1).toDouble, (rnd.nextInt(100) + 1).toLong)
    }
    // batch, through the operators.Ohlcv plan
    val batchDf = operators.Ohlcv.bars(
      StreamingOhlcv.withEventTime(trades.toDS(), "0 seconds"),
      col("ts"), col("price"), col("qty"), Seq("product" -> col("product")),
      "1 minute", col("instrument_id"))
    // streaming, complete mode over one replay
    val input = MemoryStream[Trade]
    input.addData(trades: _*)
    val q = StreamingOhlcv.windowedBars(
        StreamingOhlcv.withEventTime(input.toDS(), "0 seconds"), "1 minute")
      .writeStream.format("memory").queryName("prop").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val cols = Seq("window_start", "product", "open", "high", "low", "close", "volume")
      val b = batchDf.select(cols.map(col): _*).collect().map(_.toSeq).toSet
      val s = spark.table("prop").select(cols.map(col): _*).collect().map(_.toSeq).toSet
      assert(b == s)
    } finally q.stop()
  }

  test("statefulBars sustains the reference generator rate profile") {
    // 2,000 msg across ~2,000 keys in one micro-batch (old/gen.py profile)
    val rnd = new scala.util.Random(42)
    val msgs = (0 until 2000).map { i =>
      trade(rnd.nextInt(120000).toLong, s"Product_${rnd.nextInt(1999) + 1}",
        (rnd.nextInt(1000) + 1).toDouble, (rnd.nextInt(100) + 1).toLong)
    }
    val input = MemoryStream[Trade]
    input.addData(msgs: _*)
    val bars = StreamingOhlcv.statefulBars(
      StreamingOhlcv.withEventTime(input.toDS(), "5 seconds"),
      widthMs = 60000L, emitRunning = true)
    val q = bars.writeStream.format("memory").queryName("gen").outputMode("update").start()
    try {
      q.processAllAvailable()
      val running = spark.table("gen").filter(!col("end_of_window"))
      assert(running.count() == 2000L) // one running bar per event
      // volume conservation per product
      val sumVol = spark.table("gen").filter(!col("end_of_window"))
        .groupBy("product", "time").agg(max("volume").as("v"))
        .agg(sum("v")).as[Long].head()
      assert(sumVol == msgs.map(_.qty).sum)
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog, self-terminates, and matches the batch answer") {
    // the production backfill pattern: the SAME streaming query code
    // pointed at a backlog runs to completion and stops — no trigger
    // loop to babysit, results identical to a batch run over the data
    import org.apache.spark.sql.streaming.Trigger
    val input = MemoryStream[Trade]
    val msgs = (0 until 500).map(i =>
      trade(i * 250L, s"P${i % 7}", (i % 50 + 1).toDouble, (i % 9 + 1).toLong))
    input.addData(msgs: _*)
    val q = StreamingOhlcv.windowedBars(
        StreamingOhlcv.withEventTime(input.toDS(), "0 seconds"), "1 minute")
      .writeStream.format("memory").queryName("avail_now")
      .outputMode("complete").trigger(Trigger.AvailableNow())
      .start()
    try {
      // self-termination is the point: no processAllAvailable, no stop
      assert(q.awaitTermination(60000), "AvailableNow query did not finish")
      val streamed = spark.table("avail_now")
        .select("window_start", "product", "open", "high", "low", "close", "volume")
        .collect().map(_.toSeq).toSet
      import spark.implicits._
      val batch = StreamingOhlcv.windowedBars(
          StreamingOhlcv.withEventTime(msgs.toDS(), "0 seconds"), "1 minute")
        .select("window_start", "product", "open", "high", "low", "close", "volume")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming session windows merge across micro-batches and close on watermark") {
    // batch session semantics live in Windows.userSessions; this drill
    // pins the STREAMING form: a gap-keyed session must merge rows
    // arriving in different micro-batches, then emit once closed
    val input = MemoryStream[Trade]
    val sessions = StreamingOhlcv.withEventTime(input.toDS(), "5 seconds")
      .groupBy(session_window(col("ts"), "30 seconds").as("w"), col("product"))
      .agg(count(lit(1)).as("n_trades"), sum(col("qty")).as("volume"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("product"), col("n_trades"), col("volume"))
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // batch 1: two events 10s apart (same session: gap < 30s)
      input.addData(trade(0, "S1", 10.0, 1), trade(10000, "S1", 11.0, 2))
      q.processAllAvailable()
      // batch 2: extends the SAME session (25s after the last event),
      // plus a far-future event to push the watermark past session end
      input.addData(trade(35000, "S1", 12.0, 3))
      q.processAllAvailable()
      input.addData(trade(200000, "S1", 13.0, 4))
      q.processAllAvailable()
      val rows = spark.table("sess").orderBy("session_start").collect()
      assert(rows.length == 1, s"expected one closed session, got ${rows.toSeq}")
      // one merged session covering all three batches' events:
      // [T0, T0+35s+30s gap), 3 trades, volume 6
      assert(rows(0).getAs[Long]("n_trades") == 3)
      assert(rows(0).getAs[Long]("volume") == 6)
      val span = rows(0).getTimestamp(1).getTime - rows(0).getTimestamp(0).getTime
      assert(span == 35000 + 30000, s"session span was $span")
    } finally q.stop()
  }
}
