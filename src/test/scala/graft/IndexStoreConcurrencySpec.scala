package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Retrieval, Similarity}

/** The ADVICE-flagged race: index creation is check-then-write against
  * a /tmp path shared across callers — two concurrent creators of the
  * SAME generation used to both see tableExists=false and interleave
  * overwrites. Creation now serializes per suffix (IndexStore.lock);
  * this spec drives N threads into each ensure* simultaneously on a
  * fresh tag and asserts every caller comes back with the same table
  * names and an uncorrupted artifact (content equal to a clean
  * single-threaded build). */
class IndexStoreConcurrencySpec extends SparkSpec {

  private def race[A](n: Int)(body: => A): Seq[A] = {
    val pool = Executors.newFixedThreadPool(n)
    val gate = new CountDownLatch(1)
    try {
      val futs = (1 to n).map { _ =>
        pool.submit(new java.util.concurrent.Callable[A] {
          override def call(): A = { gate.await(); body }
        })
      }
      gate.countDown()
      futs.map(_.get(300, TimeUnit.SECONDS))
    } finally pool.shutdownNow()
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("concurrent band-index creation: one artifact, no corruption") {
    val results = race(4)(Dedup.ensureBandIndex(spark, sf0001, tag = "racespec"))
    assert(results.toSet.size == 1, s"callers disagreed on tables: $results")
    val (bandsT, _) = results.head
    // content equals what a clean build over the full corpus derives
    val expected = Dedup.bandsOf(Dedup.signaturesOnSh(Dedup.shingledOn(
      Tables.documents(spark, sf0001).select(col("doc_id"), col("text")))))
    assert(rows(spark.table(bandsT)) == rows(expected),
      "racing creators corrupted the band index")
  }

  test("concurrent text-index creation: one artifact, no corruption") {
    val results = race(4)(Retrieval.ensureTextIndex(spark, sf0001, tag = "racespec"))
    assert(results.toSet.size == 1)
    val (tfsT, statsT) = results.head
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    assert(rows(spark.table(tfsT)) == rows(Retrieval.tfsOf(docs)))
    assert(rows(spark.table(statsT)) == rows(Retrieval.statsRawOf(docs)))
  }

  test("concurrent PQ-index creation: one artifact, parity probe intact") {
    val results = race(3)(Similarity.ensurePqIndex(spark, sf0001, tag = "racespec"))
    assert(results.toSet.size == 1)
    val (booksT, codesT) = results.head
    // the probe over the raced artifact must equal the memoized
    // (default-generation) probe's verdict — built serially elsewhere
    val raced = rows(Similarity.probePqIndex(spark, sf0001, booksT, codesT))
    val (b2, c2) = Similarity.ensurePqIndex(spark, sf0001)
    assert(raced == rows(Similarity.probePqIndex(spark, sf0001, b2, c2)),
      "raced PQ artifact diverged from the serial build")
  }
}
