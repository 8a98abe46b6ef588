package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Interval (range) joins without a cartesian plan — the grid-bucket
  * expansion trick.
  *
  * A naive `a.start <= b.ts AND b.ts < a.end` join has no equi-key, so
  * Spark plans BroadcastNestedLoopJoin (driver-bound) or a cartesian
  * product (O(n·m) — dead at any scale). The standard fix quantizes time
  * onto a fixed grid: every interval replicates to the grid buckets it
  * covers, every point maps to exactly ONE bucket, and the join becomes
  * a plain hash equi-join on the bucket id followed by the exact range
  * predicate as a post-filter. Replication factor = interval length /
  * bucket width (bounded, chosen per workload); correctness is
  * unconditional because a point's bucket is always among its covering
  * interval's buckets.
  *
  * For interval×interval overlap the same expansion would emit one pair
  * per SHARED bucket — instead of a dedup shuffle (`distinct` over the
  * pair set), each pair is emitted only by its "responsible" bucket, the
  * one containing max(start_a, start_b). One extra integer comparison
  * per candidate beats a second full shuffle at 100 TB.
  *
  * Reference anchor: the reference has no joins at all (SURVEY §2.3);
  * this is part of the beyond-reference relational tier. The demo
  * workload derives a deterministic promo calendar (one 40-day promo per
  * month — overlapping by construction) and range-joins orders into it.
  */
object Intervals {

  /** Grid width in days. 16 days ⇒ a 40-day promo replicates to ≤ 4
    * buckets; at corpus scale pick ~median interval length so the
    * replication factor stays low single digits. */
  private val BucketDays = 16L

  private def cents(c: Column): Column =
    round(c * 100, 0).cast("long")

  /** Epoch-day number of a date/timestamp column (integer — immune to
    * timezone-dependent timestamp arithmetic in either engine). */
  private def epochDay(c: Column): Column =
    datediff(c.cast("date"), lit("1970-01-01").cast("date")).cast("long")

  /** The deterministic promo calendar: one promo per calendar month of
    * the orders span, each [month_start, month_start + 40 days). */
  private def promos(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .agg(date_trunc("month", min(col("o_orderdate"))).as("lo"),
        date_trunc("month", max(col("o_orderdate"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 month")))
        .as("pstart"))
      .select(epochDay(col("pstart")).as("sd"))
      .withColumn("ed", col("sd") + 40L)

  /** Point-in-interval join: orders landing inside each promo window,
    * aggregated per promo. Plan shape: intervals explode to their
    * covering buckets (≤ 4 rows each), points project ONE bucket, then
    * a plain shuffled hash join on the bucket id + exact range filter —
    * no nested-loop, no cartesian. The promo side here is tiny (one row
    * per month) and broadcasts; the bucket path is exercised because it
    * is the shape that survives when BOTH sides are large. */
  def promoOrders(spark: SparkSession, dir: String): DataFrame = {
    val iv = promos(spark, dir)
      .select(col("sd"), col("ed"),
        explode(sequence(expr(s"sd div $BucketDays"),
          expr(s"(ed - 1) div $BucketDays"))).as("bucket"))
    val pts = Tables.orders(spark, dir)
      .select(epochDay(col("o_orderdate")).as("day"),
        cents(col("o_totalprice")).as("cents"))
      .withColumn("bucket", expr(s"day div $BucketDays"))
    pts.join(iv, "bucket")
      .filter(col("day") >= col("sd") && col("day") < col("ed"))
      .groupBy(col("sd").as("promo_day"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("cents")) / 100.0).as("revenue"))
  }

  /** Interval×interval overlap join over the promo calendar itself:
    * every ordered pair of distinct promos whose windows intersect, with
    * the overlap length. Each side explodes to its covering buckets; the
    * equi-join on bucket finds every co-located pair, and the
    * responsible-bucket predicate (`bucket == max(sd_a, sd_b) div B`)
    * emits each pair exactly once — no distinct pass over the pair set. */
  def promoOverlaps(spark: SparkSession, dir: String): DataFrame = {
    val iv = promos(spark, dir)
      .select(col("sd"), col("ed"),
        explode(sequence(expr(s"sd div $BucketDays"),
          expr(s"(ed - 1) div $BucketDays"))).as("bucket"))
    val a = iv.select(col("bucket"), col("sd").as("a_sd"), col("ed").as("a_ed"))
    val b = iv.select(col("bucket"), col("sd").as("b_sd"), col("ed").as("b_ed"))
    a.join(b, "bucket")
      .filter(col("a_sd") < col("b_sd") &&
        col("a_ed") > col("b_sd") && col("b_ed") > col("a_sd"))
      .filter(col("bucket") === expr(s"greatest(a_sd, b_sd) div $BucketDays"))
      .select(col("a_sd").as("a_day"), col("b_sd").as("b_day"),
        (least(col("a_ed"), col("b_ed")) -
          greatest(col("a_sd"), col("b_sd"))).as("overlap_days"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_interval_join" -> ((s, d) => promoOrders(s, d)),
    "rel_interval_overlap" -> ((s, d) => promoOverlaps(s, d)))

  /** Oracles state the SEMANTIC definition (plain range predicates) —
    * the grid-bucket plan must reproduce it exactly. */
  private val promosSql =
    """span AS (SELECT date_trunc('month', min(o_orderdate)) AS lo,
      |    date_trunc('month', max(o_orderdate)) AS hi FROM orders),
      |promos AS (SELECT
      |    datediff('day', TIMESTAMP '1970-01-01', p.pstart)::BIGINT AS sd,
      |    datediff('day', TIMESTAMP '1970-01-01', p.pstart)::BIGINT + 40 AS ed
      |  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS pstart
      |        FROM span) p)""".stripMargin

  val oracle: Map[String, String] = Map(
    "rel_interval_join" ->
      s"""WITH $promosSql,
         |pts AS (SELECT datediff('day', TIMESTAMP '1970-01-01', o_orderdate)::BIGINT AS day,
         |    CAST(round(o_totalprice*100,0) AS BIGINT) AS cents FROM orders)
         |SELECT p.sd AS promo_day, count(*)::BIGINT AS n_orders,
         |  sum(c.cents)::BIGINT / 100.0 AS revenue
         |FROM promos p JOIN pts c ON c.day >= p.sd AND c.day < p.ed
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "rel_interval_overlap" ->
      s"""WITH $promosSql
         |SELECT a.sd AS a_day, b.sd AS b_day,
         |  (least(a.ed, b.ed) - greatest(a.sd, b.sd))::BIGINT AS overlap_days
         |FROM promos a JOIN promos b
         |  ON a.sd < b.sd AND a.ed > b.sd AND b.ed > a.sd
         |ORDER BY 1, 2""".stripMargin)
}
