package graft

import org.apache.spark.sql.functions._
import graft.sources.AuditStore

/** The DSv2 write-path contract (sources/AuditSink.scala): task
  * buffers surface only through commit messages, the driver publishes
  * atomically, failed jobs publish NOTHING — the semantics that make a
  * distributed write exactly-once under retries and speculation. */
class AuditSinkSpec extends SparkSpec {
  import spark.implicits._

  private def write(table: String, n: Int, mode: String = "append"): Unit =
    (1 to n).map(i => (i.toLong, s"r$i", i * 1.5)).toDF("id", "tag", "score")
      .repartition(4)
      .write.format("graft-audit").option("table", table).mode(mode).save()

  test("append writes commit atomically and read back exactly the committed rows") {
    AuditStore.drop("t1")
    write("t1", 1000)
    assert(AuditStore.rows("t1").length == 1000)
    write("t1", 500) // append accumulates
    val back = spark.read.format("graft-audit").option("table", "t1").load()
    assert(back.count() == 1500)
    // values survive the round trip intact (spot the sum)
    assert(back.agg(sum("id")).head().getLong(0) ==
      (1 to 1000).map(_.toLong).sum + (1 to 500).map(_.toLong).sum)
    assert(back.filter(col("tag") === "r7").count() == 2)
  }

  test("a failing task aborts the whole write and publishes nothing") {
    AuditStore.drop("t2")
    write("t2", 100)
    val before = AuditStore.rows("t2").length
    // one row poisons its task mid-write; other tasks may have
    // buffered thousands — none of it may land
    val poisoned = (1 to 5000).map(i => (i.toLong, s"r$i", i * 1.0)).toDF("id", "tag", "score")
      .repartition(8)
      .select(col("id"), col("tag"),
        when(col("id") === 4999L,
          expr("raise_error('poison')").cast("double")).otherwise(col("score"))
          .as("score"))
    intercept[Exception] {
      poisoned.write.format("graft-audit").option("table", "t2").mode("append").save()
    }
    assert(AuditStore.rows("t2").length == before,
      "failed job must publish nothing (atomic all-or-nothing)")
  }

  test("null fields round-trip as nulls, never phantom zeros or NPEs") {
    AuditStore.drop("t4")
    Seq((Some(1L), Option("a"), Some(1.5)),
        (None, None, None),
        (Some(3L), Option("c"), None))
      .toDF("id", "tag", "score")
      .write.format("graft-audit").option("table", "t4").mode("append").save()
    val back = spark.read.format("graft-audit").option("table", "t4").load()
    assert(back.count() == 3)
    assert(back.filter(col("id").isNull && col("tag").isNull && col("score").isNull)
      .count() == 1, "the all-null row must read back as nulls")
    assert(back.filter(col("id") === 0L).count() == 0,
      "a null BIGINT must never surface as a phantom 0")
    assert(back.agg(sum("id")).head().getLong(0) == 4L)
  }

  test("a schema-mismatched append is rejected at commit, not decoded as garbage") {
    AuditStore.drop("t5")
    write("t5", 10)
    val swapped = (1 to 5).map(i => (s"x$i", i.toLong, i * 1.0))
      .toDF("tag", "id", "score") // same names, different positions/types
    intercept[Exception] {
      swapped.write.format("graft-audit").option("table", "t5").mode("append").save()
    }
    assert(AuditStore.rows("t5").length == 10, "the bad append must publish nothing")
    // overwrite with a new schema is the sanctioned path
    swapped.write.format("graft-audit").option("table", "t5").mode("overwrite").save()
    val back = spark.read.format("graft-audit").option("table", "t5").load()
    assert(back.count() == 5 && back.schema.fieldNames.head == "tag")
  }

  test("overwrite routes through SupportsTruncate: old rows replaced in one publish") {
    AuditStore.drop("t3")
    write("t3", 300)
    write("t3", 40, mode = "overwrite")
    assert(AuditStore.rows("t3").length == 40)
    val back = spark.read.format("graft-audit").option("table", "t3").load()
    assert(back.count() == 40)
    assert(back.agg(max("id")).head().getLong(0) == 40L)
  }
}
