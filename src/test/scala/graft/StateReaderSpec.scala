package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.Trade
import graft.streaming.StreamingOhlcv

/** Operational state introspection via Spark's state data source
  * (`spark.read.format("statestore")`): the running OHLCV engine's
  * keyed state read straight out of a checkpoint — what an operator
  * uses in production to audit state growth, debug a stuck key, or
  * validate a migration, without touching the running query. The spec
  * pins the state LAYOUT (per-product GroupState with a per-window
  * bars map + timeout) so an engine refactor that silently changes the
  * checkpoint schema — breaking checkpoint compatibility for deployed
  * pipelines — fails here first. */
class StateReaderSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val T0 = 1723459200000L // minute-aligned

  test("statestore reader exposes per-product bar state and timers from a checkpoint") {
    val dir = java.nio.file.Files.createTempDirectory("graft-state").toString
    val input = MemoryStream[Trade]
    input.addData(
      Trade(T0, "I1", "A", 10.0, 1L),
      Trade(T0 + 1000, "I2", "A", 30.0, 2L),
      Trade(T0 + 2000, "I3", "B", 20.0, 5L))
    val q = StreamingOhlcv.statefulBars(
      StreamingOhlcv.withEventTime(input.toDS(), "5 seconds"),
      widthMs = 60000L, emitRunning = false)
      .writeStream.format("noop")
      .option("checkpointLocation", dir)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val st = spark.read.format("statestore").load(dir)
    // layout contract: keyed GroupState carrying the per-window map
    assert(st.schema("key").dataType.catalogString.contains("value:string"))
    assert(st.schema("value").dataType.catalogString.contains("bars:map<bigint"))

    val rows = st
      .select(col("key.value").as("product"),
        map_values(col("value.groupState.bars")).getItem(0).as("bar"),
        col("value.timeoutTimestamp").as("timeout"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("A", "B"), s"state keys: ${rows.keySet}")

    // product A: two trades folded into one open window's running bar
    val a = rows("A").getStruct(1)
    assert(a.getAs[Long]("windowStart") == T0)
    assert(a.getAs[Double]("open") == 10.0 && a.getAs[Double]("close") == 30.0)
    assert(a.getAs[Double]("high") == 30.0 && a.getAs[Double]("low") == 10.0)
    assert(a.getAs[Long]("volume") == 3L && a.getAs[Long]("events") == 2L)
    // event-time timer armed at the window's close
    assert(rows("A").getLong(2) == T0 + 60000L)
    assert(rows("B").getStruct(1).getAs[Long]("volume") == 5L)

    // watermark-driven eviction is visible in state too: push the
    // watermark past the window and the closed bars leave the store
    val input2 = MemoryStream[Trade]
    input2.addData(Trade(T0, "I1", "A", 10.0, 1L))
    val dir2 = java.nio.file.Files.createTempDirectory("graft-state2").toString
    val q2 = StreamingOhlcv.statefulBars(
      StreamingOhlcv.withEventTime(input2.toDS(), "5 seconds"),
      widthMs = 60000L, emitRunning = false)
      .writeStream.format("noop")
      .option("checkpointLocation", dir2)
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      input2.addData(Trade(T0 + 600000, "I1", "A", 11.0, 1L)) // watermark jump
      q2.processAllAvailable()
    } finally q2.stop()
    val open = spark.read.format("statestore").load(dir2)
      .select(col("key.value").as("product"),
        map_keys(col("value.groupState.bars")).as("windows"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // the T0 window closed and was evicted; only the late window remains
    assert(open("A") == Seq((T0 + 600000) / 60000 * 60000))
  }
}
