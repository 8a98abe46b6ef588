package graft

import org.apache.spark.sql.functions._
import graft.operators.Windows
import graft.streaming.StreamingSessions

/** Stream ≡ batch for session windows: replaying the events table
  * through the streaming engine (with a far-future sentinel to push
  * the watermark past every real session) must produce exactly the
  * batch sessionization — merges, extents, counts, and the
  * integer-cents sums all identical. */
class StreamingSessionsSpec extends SparkSpec {

  test("streaming session windows equal batch sessionization on the same replay") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = Tables.events(spark, sf0001)
      .select(unix_micros(col("ts")).as("tus"), col("user_id"), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val sentinelTus = rows.map(_._1).max + 7L * 86400L * 1000000L

    val input = MemoryStream[(Long, Long, Double)]
    val stream = input.toDF().toDF("tus", "user_id", "value")
      .withColumn("ts", timestamp_micros(col("tus")))
    val q = StreamingSessions.userSessions(stream)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      input.addData(rows.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData((sentinelTus, -1L, 0.0)) // watermark push; filtered below
      q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row): (Long, Long, Long, Long, Double) =
      (r.getAs[java.sql.Timestamp]("session_start").getTime,
        r.getAs[java.sql.Timestamp]("session_end").getTime,
        r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))

    val got = spark.table("sess_out")
      .filter(col("user_id") =!= -1L).collect().map(key).toSet
    val expected = Windows.userSessions(spark, sf0001).collect().map(key).toSet
    assert(got == expected,
      s"stream/batch session divergence: got ${got.size}, expected ${expected.size}")
    assert(got.nonEmpty)
  }
}
