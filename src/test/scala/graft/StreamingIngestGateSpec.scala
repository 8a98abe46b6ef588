package graft

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.StreamingIngestGate

/** The streaming ingest gate must agree with the batch persisted-index
  * drill exactly: the same arriving documents, split across
  * micro-batches, produce the same per-document verdicts — because the
  * gate is stateless and each arrival is judged only against the
  * static corpus index, HOW the batch is chopped cannot change any
  * verdict. */
class StreamingIngestGateSpec extends SparkSpec {

  test("micro-batched verdicts equal the batch drill, regardless of chopping") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val expected = Dedup.incrementalDedupPersisted(spark, sf0001)
      .collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(expected.nonEmpty)

    val arrivals = Tables.documents(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(Dedup.IncrementalBatchMod)) === 0)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

    val input = MemoryStream[(Long, String)]
    val got = mutable.Buffer[Row]()
    val q = StreamingIngestGate.start(spark, sf0001,
      input.toDF().toDF("doc_id", "text")) { (verdict, _) =>
      got.synchronized { got ++= verdict.collect() }
    }
    try {
      // three uneven micro-batches — chopping must be invisible
      val chunks = Seq(
        arrivals.take(7),
        arrivals.slice(7, 40),
        arrivals.drop(40))
      chunks.filter(_.nonEmpty).foreach { c =>
        input.addData(c.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val gotSet = got.map(_.toSeq.map(String.valueOf)).toSet
    assert(gotSet == expected,
      s"streaming gate diverged: got ${gotSet.size} rows, expected ${expected.size}")
  }

  test("crawl pipeline (extract → gate) matches the drill for extractable docs") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // extraction returns the doc byte-identically for any doc long
    // enough to pass the length gate, so the crawl verdicts must equal
    // the batch drill restricted to extractable docs (shorter docs are
    // honestly dropped: no content survived the boilerplate gate)
    val extractable = Tables.documents(spark, sf0001)
      .filter(length(trim(col("text"))) >= graft.operators.Html.MinBlockChars)
      .select(col("doc_id")).as[Long].collect().toSet
    val expected = Dedup.incrementalDedupPersisted(spark, sf0001)
      .collect().filter(r => extractable(r.getLong(0)))
      .map(_.toSeq.map(String.valueOf)).toSet
    assert(expected.nonEmpty)

    val arrivals = Tables.documents(spark, sf0001)
      .filter(pmod(col("doc_id"), lit(Dedup.IncrementalBatchMod)) === 0)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

    val input = MemoryStream[(Long, String)]
    val got = mutable.Buffer[Row]()
    val q = StreamingIngestGate.startCrawl(spark, sf0001,
      input.toDF().toDF("doc_id", "text")) { (verdict, _) =>
      got.synchronized { got ++= verdict.collect() }
    }
    try {
      Seq(arrivals.take(20), arrivals.drop(20)).filter(_.nonEmpty).foreach { c =>
        input.addData(c.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val gotSet = got.map(_.toSeq.map(String.valueOf)).toSet
    assert(gotSet == expected,
      s"crawl pipeline diverged: got ${gotSet.size} rows, expected ${expected.size}")
  }
}
