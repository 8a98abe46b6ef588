package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Temporal

/** A CDC change event on the wire. */
case class Change(key: Long, seq: Long, ts_us: Long, op: String, val_cents: Long)

/** Temporal/CDC semantics plus the streaming-ingestion consistency
  * drill: a change stream landed through the exactly-once sink must
  * compact to the same state the batch operator computes. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("cdcApply drops delete-terminated keys; scd2 intervals tile per key") {
    val state = Temporal.cdcApply(spark, sf0001)
    val log = Temporal.changeLog(spark, sf0001).collect()
    // keys whose latest change is a delete are absent
    val lastOps = log.groupBy(_.getLong(0)).view.mapValues(rs =>
      rs.maxBy(r => (r.getLong(2), r.getLong(1))).getString(3)).toMap
    val expectAbsent = lastOps.filter(_._2 == "D").keySet
    val present = state.select("key").as[Long].collect().toSet
    assert(expectAbsent.forall(!present.contains(_)))
    assert(present == lastOps.keySet -- expectAbsent)

    // SCD2: per key, intervals are disjoint and each closes at the next
    // change's open (delete-closed gaps allowed, overlaps never)
    val hist = Temporal.scd2Build(spark, sf0001)
      .orderBy("key", "valid_from_us", "version_seq").collect()
    hist.groupBy(_.getLong(0)).values.foreach { vs =>
      vs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_us") <= b.getAs[Long]("valid_from_us") ||
            a.getAs[Long]("valid_from_us") == b.getAs[Long]("valid_from_us"),
            s"overlapping versions: $a / $b")
        case _ =>
      }
      // exactly the versions flagged current carry the sentinel
      assert(vs.count(_.getAs[Boolean]("is_current")) ==
        vs.count(_.getAs[Long]("valid_to_us") == 253402300799000000L))
    }
  }

  test("a change stream through the exactly-once sink compacts to the batch state") {
    val changes = Temporal.changeLog(spark, sf0001)
      .as[Change].collect().sortBy(c => (c.ts_us, c.seq))
    val path = Files.createTempDirectory("graft-cdc").toString
    val sink = graft.streaming.Sinks.idempotentTableSink(path)
    val input = MemoryStream[Change]
    val q = input.toDS().toDF().writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) => sink(df, id) }
      .option("checkpointLocation", s"$path-ckpt").start()
    try {
      changes.grouped(600).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    // replay one batch out-of-band: the sink must stay exactly-once
    sink(changes.take(600).toSeq.toDF().withColumn("_ignored", lit(0))
      .drop("_ignored"), 0L)

    // compact the landed log with the SAME last-writer-wins rule and
    // compare to the batch operator over the original table
    val landed = spark.read.parquet(path).drop("_batch_id")
    val compacted = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("key").orderBy(col("ts_us").desc, col("seq").desc)
      landed.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select(col("key"), col("val_cents"), col("ts_us").as("updated_us"))
    }
    val streamedState = compacted.collect().map(_.toSeq).toSet
    val batchState = Temporal.cdcApply(spark, sf0001).collect().map(_.toSeq).toSet
    assert(streamedState == batchState,
      "streamed-and-compacted state diverged from batch cdcApply")
  }
}
