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

  test("admitting ANN gate: re-sent admitted vectors are flagged next batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // batch 1: the drill's KEPT vectors under fresh ids — novel vs the
    // held-out-split index, so all admit; batch 2: the SAME embeddings
    // under fresh ids again — each is now within quantization error of
    // its admitted twin's codes, and the gate must see the admission
    // (self-ADC error is below the radius for ~99% of this corpus; the
    // stateless gate would keep every one of them)
    val keptIds = Similarity.annIngestGate(spark, sf0001)
      .filter(col("keep") && !col("no_content"))
      .select("batch_id").as[Long].collect().toSet
    assert(keptIds.nonEmpty)
    val keptVecs = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id").isin(keptIds.toSeq: _*))
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val batch1 = keptVecs.map { case (id, v) => (2000000L + id, v) }
    val batch2 = keptVecs.map { case (id, v) => (3000000L + id, v) }

    val input = MemoryStream[(Long, Array[Float])]
    val got = mutable.Buffer[Row]()
    val q = StreamingAnnGate.startAdmitting(spark, sf0001,
      input.toDF().toDF("vec_id", "embedding"),
      tag = "admitspec", corpusFilter = Similarity.annDrillFilter) { (verdict, _) =>
      got.synchronized { got ++= verdict.collect() }
    }
    try {
      input.addData(batch1.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(batch2.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val byId = got.map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // pre-admission verdicts: batch 1 must keep exactly like the drill
    assert(batch1.forall { case (id, _) => byId(id) },
      "batch-1 verdicts diverged from the drill (self-flagged pre-admission?)")
    // post-admission: the re-sent vectors are no longer novel
    val flagged = batch2.count { case (id, _) => !byId(id) }
    assert(flagged * 2 >= batch2.length,
      s"only $flagged/${batch2.length} re-sent admitted vectors flagged")
    assert(flagged >= 1)

    // the fixed-tag ANN gate records its admissions too: the log holds
    // exactly the kept vec_ids, so a later cutover from this generation
    // retrains on every embedding this gate accepted
    import graft.operators.{AdmissionLog, IndexStore}
    val logIds = AdmissionLog.read(spark, AdmissionLog.VecKind,
      IndexStore.suffix(sf0001, "admitspec", Similarity.annDrillFilter))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val keptArrivals = byId.collect { case (id, true) => id }.toSet
    assert(logIds == keptArrivals,
      s"ANN admission log diverged: ${logIds.size} logged, " +
        s"${keptArrivals.size} kept")
  }

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
