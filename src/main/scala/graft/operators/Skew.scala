package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Skew-mitigation utilities for hot keys at cluster scale.
  *
  * A hash-partitioned shuffle sends every row of a key to ONE reducer:
  * with a zipfian key distribution (one product trading 100× the rest,
  * one stop-shingle in half the corpus) a single straggler partition
  * dominates the stage. Spark's AQE skew-join split handles the join
  * case at runtime; these utilities are the explicit, planner-level
  * versions for when AQE cannot help:
  *
  *  - `saltedAgg`: two-phase aggregation — phase 1 aggregates on
  *    (key, salt) spreading each hot key over `salt` reducers, phase 2
  *    folds the per-salt partials. Correct for any algebraic aggregate
  *    (sum/count/min/max — supply the partial→final fold). Spark's own
  *    partial aggregation already does this per-TASK; salting adds the
  *    missing per-REDUCER spread for the merge stage when distinct key
  *    cardinality is low but row counts are huge.
  *  - `saltedJoin`: fact×dim equi-join where the fact side's hot keys
  *    are salted and the (small but not broadcastable) dim side is
  *    replicated `salt` times — each hot key's rows land on `salt`
  *    reducers instead of one.
  *
  * Both are deterministic: the salt is a hash of stable columns, not a
  * random number, so results are reproducible run-to-run (a rand()
  * salt breaks retry/speculative-execution consistency).
  */
object Skew {

  /** Deterministic salt in [0, n) from stable tiebreak columns. */
  def salt(n: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(n))

  /** Two-phase salted aggregation.
    *
    * @param df       input
    * @param keys     logical grouping keys
    * @param saltCol  deterministic salt (use `salt(n, tiebreakCols)`)
    * @param partial  aggregates for phase 1 (over raw rows)
    * @param fin      aggregates for phase 2 (over phase-1 partials,
    *                 referencing the partial aliases)
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltCol: Column,
      partial: Seq[Column],
      fin: Seq[Column]): DataFrame =
    df.withColumn("_salt", saltCol)
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(fin.head, fin.tail: _*)

  /** Salted fact×dim equi-join on `key`: fact rows get a deterministic
    * salt, dim rows are replicated across all `n` salts. Equivalent to
    * `fact.join(dim, key)` for 1:N joins (each fact row still meets its
    * dim row exactly once). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, n: Int,
      tiebreak: Seq[Column]): DataFrame = {
    val saltedFact = fact.withColumn("_salt", salt(n, tiebreak: _*))
    val repDim = dim.withColumn("_salt", explode(sequence(lit(0), lit(n - 1))))
    saltedFact.join(repDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Hot-key stats over `events.event_type` (5 distinct keys — the
    * degenerate reducer-skew shape) through the two-phase salted path.
    * The oracle is the plain one-phase GROUP BY: salting must be
    * invisible in the result. Integer-cents sum keeps the double
    * aggregation order-independent across both phases and both engines. */
  def saltedTypeStats(spark: SparkSession, dir: String): DataFrame =
    saltedAgg(
      Tables.events(spark, dir),
      keys = Seq("event_type"),
      saltCol = salt(16, col("event_id")),
      partial = Seq(
        count(lit(1)).as("n_part"),
        sum(round(col("value") * 100, 0).cast("long")).as("cents_part"),
        min(col("value")).as("min_part"),
        max(col("value")).as("max_part")),
      fin = Seq(
        sum(col("n_part")).as("n"),
        (sum(col("cents_part")) / 100.0).as("sum_value"),
        min(col("min_part")).as("min_value"),
        max(col("max_part")).as("max_value")))

  /** events×customer 1:N equi-join through the salted-replicate path,
    * rolled up by market segment — again the plain join is the oracle. */
  def saltedSegmentRollup(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables.events(spark, dir)
      .withColumnRenamed("user_id", "c_custkey")
    val dim = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    saltedJoin(fact, dim, "c_custkey", n = 8, tiebreak = Seq(col("event_id")))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("sum_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted_agg" -> ((s, d) => saltedTypeStats(s, d)),
    "skew_salted_join" -> ((s, d) => saltedSegmentRollup(s, d)))

  val oracle: Map[String, String] = Map(
    "skew_salted_agg" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |  sum(CAST(round(value * 100, 0) AS BIGINT))::BIGINT / 100.0 AS sum_value,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "skew_salted_join" ->
      """SELECT c.c_mktsegment, e.event_type, count(*)::BIGINT AS n,
        |  sum(CAST(round(e.value * 100, 0) AS BIGINT))::BIGINT / 100.0 AS sum_value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
