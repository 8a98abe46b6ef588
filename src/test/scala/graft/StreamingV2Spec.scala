package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Trade
import graft.streaming.{StreamingOhlcv, StreamingOhlcvV2}

/** transformWithState engine semantics. The v2 API requires the
  * RocksDB state store provider — a per-query-start SQL conf, set on
  * the shared session around each test (the provider is read when the
  * streaming query starts, not at session build). */
class StreamingV2Spec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSpec.session

  import spark.implicits._

  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderConf)
    spark.conf.set(ProviderConf, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderConf, v)
      case None => spark.conf.unset(ProviderConf)
    }
  }

  private val T0 = 1723459200000L

  private def trade(offMs: Long, product: String, price: Double, qty: Long) =
    Trade(T0 + offMs, s"I${offMs % 7}", product, price, qty)

  test("transformWithState engine matches flatMapGroupsWithState semantics") { withRocksDb {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Trade]
    val bars = StreamingOhlcvV2.statefulBars(
      StreamingOhlcv.withEventTime(input.toDS(), "0 seconds"),
      widthMs = 60000L, emitRunning = false)
    val q = bars.writeStream.format("memory").queryName("tws")
      .outputMode("append").start()
    try {
      input.addData(
        trade(0, "P1", 10.0, 1), trade(30000, "P1", 40.0, 2),
        trade(0, "P2", 7.0, 5))
      q.processAllAvailable()
      input.addData(trade(61000, "P1", 99.0, 1)) // watermark past minute 1
      q.processAllAvailable()
      input.addData(trade(121000, "P1", 1.0, 1)) // past minute 2
      q.processAllAvailable()

      val rows = spark.table("tws").collect()
      val p1 = rows.filter(_.getAs[String]("product") == "P1")
        .minBy(_.getAs[java.sql.Timestamp]("time").getTime)
      assert(p1.getAs[Double]("open") == 10.0 && p1.getAs[Double]("close") == 40.0)
      assert(p1.getAs[Long]("volume") == 3L)
      assert(p1.getAs[Boolean]("end_of_window"))
      val p2 = rows.filter(_.getAs[String]("product") == "P2").head
      assert(p2.getAs[Double]("open") == 7.0 && p2.getAs[Long]("volume") == 5L)
    } finally q.stop()
  } }

  test("transformWithState update mode emits running bars per event") { withRocksDb {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Trade]
    val bars = StreamingOhlcvV2.statefulBars(
      StreamingOhlcv.withEventTime(input.toDS(), "0 seconds"),
      widthMs = 60000L, emitRunning = true)
    val q = bars.writeStream.format("memory").queryName("tws_run")
      .outputMode("update").start()
    try {
      input.addData(trade(0, "P1", 10.0, 1), trade(1000, "P1", 30.0, 2),
        trade(2000, "P1", 5.0, 3))
      q.processAllAvailable()
      val rows = spark.table("tws_run").filter(!col("end_of_window"))
        .orderBy("volume").collect()
      assert(rows.length == 3)
      assert(rows.map(_.getAs[Long]("volume")).toSeq == Seq(1L, 3L, 6L))
      assert(rows.last.getAs[Double]("close") == 5.0)
    } finally q.stop()
  } }
}
