package graft

import org.apache.spark.sql.SparkSession

/** v1↔v2 streaming-engine attribution at the bench's exact settings —
  * the diagnostic behind the `streaming_events_per_sec` vs
  * `streaming_v2_events_per_sec` gap: transformWithState (v2) only
  * runs on the RocksDB provider, so the raw v1-vs-v2 delta conflates
  * ENGINE cost with PROVIDER cost. This harness separates them by
  * measuring the SAME replay three ways:
  *
  *   1. v1 (flatMapGroupsWithState) on the default HDFS-backed
  *      in-memory provider — the bench's v1 figure,
  *   2. v1 on RocksDB + changelog + no-row-tracking — same engine,
  *      v2's provider,
  *   3. v2 (transformWithState) on RocksDB + changelog — the bench's
  *      v2 figure.
  *
  * (1)−(2) is the RocksDB native-store fixed cost (JNI boundary +
  * per-batch open/commit lifecycle per state partition) — the price of
  * state-larger-than-memory. (2)−(3) is the true engine delta.
  *
  * Usage: runMain graft.StreamV1V2 */
object StreamV1V2 {

  private val RocksConfs = Seq(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true",
    "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows" -> "false")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def v1(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamingOhlcv.statefulBars(df, widthMs = 60000L,
        emitRunning = false)
    def v2(df: org.apache.spark.sql.DataFrame) =
      graft.streaming.StreamingOhlcvV2.statefulBars(df, widthMs = 60000L,
        emitRunning = false)

    def withConfs[A](confs: Seq[(String, String)])(body: => A): A = {
      val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    def measure(label: String, confs: Seq[(String, String)],
        engine: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[graft.model.RunningBar]): Long =
      withConfs(confs) {
        Bench.replayRate(spark, Bench.WarmupN, engine) // warmup, discarded
        val s = Bench.samples3(Bench.replayRate(spark, Bench.StreamN, engine).rate)
        println(f"V1V2 $label%-26s ${s(1)}%7d ev/s (min ${s.head}, max ${s.last})")
        s(1)
      }

    val v1Hdfs = measure("v1/hdfs-in-memory", Nil, v1)
    val v1Rocks = measure("v1/rocksdb+changelog", RocksConfs, v1)
    val v2Rocks = measure("v2/rocksdb+changelog", RocksConfs, v2)
    println(f"V1V2 provider-cost (1-2)/1 = ${100.0 * (v1Hdfs - v1Rocks) / v1Hdfs}%.1f%%  " +
      f"engine-delta (2-3)/2 = ${100.0 * (v1Rocks - v2Rocks) / v1Rocks}%.1f%%")
    spark.stop()
  }
}
