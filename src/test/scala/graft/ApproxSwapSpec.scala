package graft

import org.apache.spark.sql.functions._

/** The documented 100 TB swaps (exact → sketch) hold up: Profiling
  * notes `approx_count_distinct` replaces `count_distinct` at corpus
  * scale, Relational.valueQuantiles notes `approx_percentile` replaces
  * `percentile`. These specs pin the sketches to the exact answers so
  * the swap advice stays true as data or Spark versions move. */
class ApproxSwapSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf001)

  test("approx_count_distinct tracks exact distinct counts within 5%") {
    for (c <- Seq("user_id", "event_id", "value")) {
      val exact = events.agg(count_distinct(col(c))).head.getLong(0)
      val approx = events.agg(approx_count_distinct(col(c), 0.01)).head.getLong(0)
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"$c: approx $approx vs exact $exact")
    }
  }

  test("approx_percentile tracks exact quantiles within 5%") {
    val exact = events
      .agg(expr("percentile(value, array(0.25, 0.5, 0.9))")).head.getSeq[Double](0)
    val approx = events
      .agg(expr("approx_percentile(value, array(0.25, 0.5, 0.9), 1000)"))
      .head.getSeq[Double](0)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(a - e) / math.max(e, 1e-9) < 0.05, s"approx $a vs exact $e")
    }
  }
}
