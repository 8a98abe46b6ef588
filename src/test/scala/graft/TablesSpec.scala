package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events loader must survive testdata regeneration: the driver has
  * shipped `ts` as both TIMESTAMP(NANOS) (loaded as long under the
  * legacy conf) and timestamp[us] (loaded as TIMESTAMP_NTZ). Round 5
  * lost 53 queries to exactly this drift — pin BOTH fixture schemas
  * here so the loader can never again silently assume one of them. */
class TablesSpec extends SparkSpec {

  private def tmpDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("events loader: micros timestamp fixture (current testdata)") {
    import spark.implicits._
    val dir = tmpDir("events-us")
    // java.sql.Timestamp round-trips as parquet timestamp[us]-family;
    // the loader must emit a session-TZ TimestampType either way
    Seq(
      (java.sql.Timestamp.valueOf("2026-01-01 00:00:01.500"), "u1", "view", 1.0),
      (java.sql.Timestamp.valueOf("2026-01-01 00:01:02.250"), "u2", "click", 2.0)
    ).toDF("ts", "user_id", "event_type", "amount")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    val secs = df.select(unix_timestamp($"ts")).as[Long].collect().sorted
    assert(secs.sameElements(Array(1767225601L, 1767225662L)))
  }

  test("events loader: nanos-as-long fixture (legacy testdata)") {
    import spark.implicits._
    val dir = tmpDir("events-ns")
    // A raw long column named ts emulates what the legacy-conf parquet
    // read of TIMESTAMP(NANOS) produces. 2^53+1 ns exercises the
    // precision edge the integer-div path exists for.
    val bigNs = (1L << 53) + 1001L
    Seq((bigNs, "u1"), (1500000000L, "u2")).toDF("ts", "user_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    val micros = df.select(unix_micros($"ts")).as[Long].collect().sorted
    assert(micros.sameElements(Array(1500000L, bigNs / 1000L).sorted))
  }

  test("events loader: real testdata at sf0.001 analyzes and reads") {
    val df = Tables.events(spark, sf0001)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(5).count() > 0)
  }
}
