package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.model.RunningBar

/** Output fan-out (SURVEY.md §2.2 K5/K6): the reference's flagship dual
  * emit — every running bar to Kafka, the final bar at window close to a
  * relational DB (/root/reference/7_ohlc.py:82-98; JDBC intent at
  * /root/reference/old/kfk.py:185-206). In Spark one query fans out inside
  * foreachBatch: the micro-batch DataFrame is persisted once, split on
  * `end_of_window`, and written to both targets — no second stream, no
  * double state.
  */
object Sinks {

  /** Dual-sink writer over a statefulBars(update) stream: running bars →
    * `runningSink`, final bars (end_of_window) → `finalSink` (e.g. a JDBC
    * write — /root/reference/7_ohlc.py:96-98). */
  def dualSink(
      bars: Dataset[RunningBar],
      runningSink: DataFrame => Unit,
      finalSink: DataFrame => Unit): DataStreamWriter[RunningBar] =
    bars.writeStream.foreachBatch { (batch: Dataset[RunningBar], _: Long) =>
      val df = batch.toDF().persist()
      try {
        runningSink(df.filter(!col("end_of_window")))
        finalSink(df.filter(col("end_of_window")))
      } finally { df.unpersist(); () }
    }

  /** JDBC-shaped batch sink factory (K5): the reference only ever printed
    * "pushing to db" (/root/reference/5_ohlc.py:112); here the real wiring,
    * parameterized on url/table. */
  def jdbcBatchSink(url: String, table: String, props: java.util.Properties)
      : DataFrame => Unit =
    (df: DataFrame) => df.write.mode("append").jdbc(url, table, props)

  /** Kafka-shaped batch sink (K6 running-bar leg). */
  def kafkaBatchSink(bootstrap: String, topic: String): DataFrame => Unit =
    (df: DataFrame) =>
      KafkaIO.toJsonValue(df).write
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()

  /** Exactly-once table sink over an at-least-once channel: foreachBatch
    * re-runs a batch after recovery with the SAME batchId, so writing
    * each batch into its own `_batch_id` partition with dynamic
    * partition overwrite makes the replay overwrite its own previous
    * (possibly partial) output instead of appending duplicates — the
    * standard idempotent-upsert pattern for K5-style relational/table
    * targets (a JDBC variant keys a DELETE+INSERT transaction on
    * batchId the same way). Partition count stays bounded: compact or
    * drop the _batch_id dimension downstream once batches are old. */
  def idempotentTableSink(path: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      // dynamic overwrite as a WRITER option, never the session conf: a
      // session-global toggle races concurrent writers on the same
      // SparkSession (another overwrite planned in the restored-static
      // window would wipe every committed partition at its path)
      batch.withColumn("_batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_batch_id").parquet(path)
    }
}
