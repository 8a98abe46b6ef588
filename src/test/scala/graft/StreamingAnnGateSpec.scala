package graft

import scala.collection.mutable

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.streaming.StreamingAnnGate

/** The streaming ANN gate must agree with the batch drill exactly:
  * the same arriving vectors, split across micro-batches, produce the
  * same per-vector verdicts — stateless gate, static index, so the
  * chopping cannot change any verdict — and every arriving vec_id
  * gets exactly one row. */
class StreamingAnnGateSpec extends SparkSpec {

  test("micro-batched ANN verdicts equal the batch drill, one row per arrival") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val expected = Similarity.annIngestGate(spark, sf0001)
      .collect().map(_.toSeq.map(String.valueOf)).toSet
    assert(expected.nonEmpty)

    val arrivals = Tables.embeddings(spark, sf0001)
      .filter(pmod(col("vec_id"), lit(4L)) === 0)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

    val input = MemoryStream[(Long, Array[Float])]
    val got = mutable.Buffer[Row]()
    val q = StreamingAnnGate.start(spark, sf0001,
      input.toDF().toDF("vec_id", "embedding"),
      corpusFilter = Similarity.annDrillFilter) { (verdict, _) =>
      got.synchronized { got ++= verdict.collect() }
    }
    try {
      val chunks = Seq(arrivals.take(3), arrivals.slice(3, 9), arrivals.drop(9))
      chunks.filter(_.nonEmpty).foreach { c =>
        input.addData(c.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val gotSet = got.map(_.toSeq.map(String.valueOf)).toSet
    assert(gotSet == expected,
      s"streaming ANN gate diverged: got ${gotSet.size} rows, expected ${expected.size}")
    assert(gotSet.size == arrivals.length,
      "gate must emit exactly one verdict per arriving vector")
  }
}
