package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row
import graft.model.{Schemas, Trade}

/** Kafka JSON source/sink surface (SURVEY.md §2.1 S1/S2, §2.2 K1/K2/K3;
  * reference /root/reference/3_ohlc.py:27-43, /root/reference/1_transfer.py).
  *
  * The wire format is the reference's: one JSON object per Kafka record
  * value, schema declared at build time (never inferred —
  * /root/reference/old/kfk.py:68-91 validates with
  * fail_on_missing_field). Parsing/serialization are factored into pure
  * column transforms (`parseTrades` / `toJsonValue`) so they are unit
  * testable in batch without a broker and identical in streaming.
  *
  * Scale notes: `from_json`/`to_json` are codegen'd Catalyst expressions —
  * the whole parse → window-agg pipeline stays inside WholeStageCodegen,
  * unlike the reference's per-record Python-worker hop (SURVEY.md §3.1).
  * Source parallelism = Kafka partitions; `minPartitions` can oversplit
  * hot partitions when executors outnumber them.
  */
object KafkaIO {

  /** Streaming Kafka JSON trade source (S1/S2).
    * @param startingOffsets "earliest" (reference default,
    *   /root/reference/0_kafka_json_flink.py:58) or "latest" */
  def tradeStream(
      spark: SparkSession,
      bootstrap: String,
      topic: String,
      startingOffsets: String = "earliest"): Dataset[Trade] = {
    val raw = spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
    parseTrades(raw)
  }

  /** Kafka record (binary `value`) → typed Trade. Pure transform shared by
    * the stream source and batch tests (reference deserializer,
    * /root/reference/3_ohlc.py:29-36). Records failing the declared schema
    * parse to null fields — filtered, mirroring fail_on_missing_field
    * (/root/reference/old/kfk.py:91). Every Trade field is required:
    * price/qty are primitives (a null would kill the typed stream at
    * deserialization) and instrument_id is the engines' tiebreak. */
  def parseTrades(raw: DataFrame): Dataset[Trade] = {
    import raw.sparkSession.implicits._
    raw
      .select(from_json(col("value").cast("string"), Schemas.trade).as("t"))
      .select(col("t.*"))
      .filter(col("timestamp").isNotNull && col("product").isNotNull &&
        col("price").isNotNull && col("qty").isNotNull &&
        col("instrument_id").isNotNull)
      .as[Trade]
  }

  /** Trade fields PLUS Kafka lineage (kafka_partition, kafka_offset) —
    * the unique-per-record tiebreak for deterministic open/close in the
    * declarative engines (struct(kafka_partition, kafka_offset) is
    * unique and replay-stable on a compacted-off topic). */
  def parseTradesWithLineage(raw: DataFrame): DataFrame =
    raw
      .select(col("partition").as("kafka_partition"), col("offset").as("kafka_offset"),
        from_json(col("value").cast("string"), Schemas.trade).as("t"))
      .select(col("kafka_partition"), col("kafka_offset"), col("t.*"))
      .filter(col("timestamp").isNotNull && col("product").isNotNull &&
        col("price").isNotNull && col("qty").isNotNull &&
        col("instrument_id").isNotNull)

  /** All columns → single JSON string `value` column (K1; reference
    * serializer /root/reference/0_kafka_json_flink.py:35-45). */
  def toJsonValue(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))

  /** Kafka JSON sink (K1/K2): serialize every column into the record
    * value and hand the writer back for trigger/checkpoint config. */
  def kafkaSink(df: DataFrame, bootstrap: String, topic: String): DataStreamWriter[Row] =
    toJsonValue(df).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)

  /** Console/debug sink (K3; reference .print(),
    * /root/reference/3_ohlc.py:77). */
  def consoleSink(df: DataFrame): DataStreamWriter[Row] =
    df.writeStream.format("console").option("truncate", value = false)

  /** Identity topic→topic transfer (P5, /root/reference/1_transfer.py:6-36):
    * no transform, value passes through byte-for-byte. */
  def identityTransfer(
      spark: SparkSession,
      bootstrap: String,
      inTopic: String,
      outTopic: String,
      checkpoint: String): StreamingQuery =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", inTopic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("key"), col("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", outTopic)
      .option("checkpointLocation", checkpoint)
      .start()
}
