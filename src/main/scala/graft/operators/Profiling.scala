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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "profile_events" -> ((s, d) => profileEvents(s, d)))

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
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")))
}
