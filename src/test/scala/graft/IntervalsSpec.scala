package graft

import org.apache.spark.sql.functions._
import graft.operators.Intervals

/** Grid-bucket interval joins: the equi-join reformulation must match
  * the naive range-predicate semantics exactly, pair-dedup must come
  * from the responsible-bucket rule (not a distinct), and the plan must
  * contain no nested-loop/cartesian operator. */
class IntervalsSpec extends SparkSpec {

  test("bucketized point-in-interval join equals the naive range join") {
    val bucketized = Intervals.promoOrders(spark, sf001)
      .orderBy("promo_day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // naive formulation: explicit range-predicate join (tiny scale only)
    val orders = Tables.orders(spark, sf001)
    val span = orders.agg(
      date_trunc("month", min(col("o_orderdate"))).as("lo"),
      date_trunc("month", max(col("o_orderdate"))).as("hi"))
    val promos = span.select(
        explode(sequence(col("lo"), col("hi"), expr("interval 1 month"))).as("p"))
      .select(datediff(col("p").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("sd"))
      .withColumn("ed", col("sd") + 40L)
    val pts = orders.select(
      datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("day"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val naive = pts.crossJoin(promos)
      .filter(col("day") >= col("sd") && col("day") < col("ed"))
      .groupBy(col("sd").as("promo_day"))
      .agg(count(lit(1)).as("n_orders"), (sum(col("cents")) / 100.0).as("revenue"))
      .orderBy("promo_day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    assert(bucketized.toSeq == naive.toSeq)
  }

  test("overlap pairs are emitted exactly once and match the naive join") {
    val pairs = Intervals.promoOverlaps(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // responsible-bucket rule, not distinct: no duplicates possible
    assert(pairs.toSeq == pairs.distinct.toSeq)
    // consecutive monthly 40-day promos always overlap; sanity floor
    assert(pairs.nonEmpty)
    // every reported pair genuinely overlaps with the reported length
    pairs.foreach { case (a, b, d) =>
      assert(a < b)
      assert(d == math.min(a + 40, b + 40) - math.max(a, b))
      assert(d > 0)
    }
  }

  test("bucketized plans contain no nested-loop or cartesian operator") {
    Seq(Intervals.promoOrders(spark, sf001),
        Intervals.promoOverlaps(spark, sf001)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoop"), plan)
    }
  }
}
