package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
