package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (point-in-time) join — the trade↔quote temporal-join shape the
  * reference's domain implies but never implements (its pipelines only
  * window-aggregate one stream; a real market-data engine also asks
  * "the latest quote at or before each trade").
  *
  * Spark lacks a native as-of join, and the naive formulation — a range
  * join `l.ts >= r.ts` plus a per-left-row max — is a cartesian-ish
  * O(n·m) per key. The scalable Spark-first shape used here:
  *
  *   1. union both sides into one keyed stream, right-side attribute
  *      columns null on left rows;
  *   2. one window pass per key ordered by (ts, side): running
  *      `last(attr, ignoreNulls)` carries the most recent right-side
  *      values forward;
  *   3. keep left rows.
  *
  * Cost: ONE shuffle on the key + an in-partition sort — identical
  * asymptotics to a native as-of (DuckDB's ASOF JOIN, the oracle,
  * is the same sort-merge under the hood). The window is per-key, so
  * 1000-executor parallelism is key-cardinality-wide, and no state
  * beyond the sort buffer is held.
  *
  * Determinism contract: ties on the right side are collapsed to one
  * row per (key, ts) BEFORE the join (max event_id wins) — DuckDB's
  * ASOF picks an arbitrary row among equal timestamps, so the dedup
  * must live in both engines for bit-equal results.
  */
object AsOfJoin {

  /** Generic backward as-of join: for each `left` row, carry the
    * attributes of the `right` row with the greatest `ts` ≤ the left
    * row's `ts` within the same `key` (null attrs when none precedes —
    * LEFT ASOF semantics). `right` must be unique per (key, ts) — see
    * the determinism contract above — and share no column names with
    * `left` besides `key` and `ts`; its `ts` is carried as `rTsName`.
    *
    * The matched row is carried as ONE struct, not per-column: a
    * per-attribute `last(_, ignoreNulls)` would skip a matched row's
    * legitimately-NULL attribute and resurrect a STALE older value —
    * the struct is non-null whenever a right row exists, so its fields
    * arrive exactly as that row holds them (native ASOF semantics). */
  def asOfLast(left: DataFrame, right: DataFrame,
      key: String, ts: String, rTsName: String): DataFrame = {
    val attrs = right.columns.filterNot(c => c == key || c == ts).toSeq
    val leftAttrs = left.columns.filterNot(c => c == key || c == ts).toSeq
    val rStruct = org.apache.spark.sql.types.StructType(
      (ts +: attrs).map(right.schema(_)))

    // side 0 = right, 1 = left: a right row at the left row's exact ts
    // sorts first, so "at or before" includes it (ASOF >= semantics)
    val l = left.withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(rStruct))
    val r = leftAttrs.foldLeft(
      right.withColumn("_side", lit(0))
        .withColumn("_r", struct((ts +: attrs).map(col): _*))
        .drop(attrs: _*)) {
      (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(left.columns.toSeq.map(col) ++
        (col("_r").getField(ts).as(rTsName) +:
          attrs.map(a => col("_r").getField(a).as(a))): _*)
  }

  /** Backward as-of join on the NATIVE whole-operator plan
    * (graft.plans.AsOfJoinPlan → AsOfJoinExec): same contract and
    * output shape as [[asOfLast]], planned as a dedicated sort-merge —
    * one hash exchange per side, partition-local (key, ts) sorts, then
    * a streaming O(|L|+|R|) merge holding ONE candidate row. Prefer
    * this form at scale; asOfLast remains the pure-composition
    * fallback (and the differential test partner). */
  def asOfNative(left: DataFrame, right: DataFrame,
      key: String, ts: String, rTsName: String): DataFrame = {
    val spark = left.sparkSession
    graft.plans.GraftPlans.install(spark)
    // resolve names under the SESSION's case-sensitivity rule, exactly
    // as asOfLast's col() references do — the two entry points share a
    // contract and must accept the same inputs
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def same(a: String, b: String): Boolean =
      if (caseSensitive) a == b else a.equalsIgnoreCase(b)
    val attrs = right.columns.filterNot(c => same(c, key) || same(c, ts)).toSeq
    // Alias EVERY right column: fresh attribute ids decouple the right
    // output from any lineage shared with the left (self-join safety —
    // the analyzer's conflict handling only knows built-in node types).
    val r2 = right.select(
      (col(key).as("__asof_key") +: col(ts).as(rTsName) +:
        attrs.map(a => col(a).as(a))): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(a => same(a.name, n)).getOrElse(
      throw new IllegalArgumentException(s"column $n not found"))
    val lKey = attr(lPlan, key)
    // Float/double join keys are rejected: Catalyst's
    // NormalizeFloatingNumbers rule only knows built-in joins, so -0.0
    // vs 0.0 would hash to different partitions here and silently miss
    // matches that asOfLast (normalized Window) and SQL equality find.
    // As-of keys are ids/symbols in practice; timestamps stay unrestricted.
    require(!Seq(org.apache.spark.sql.types.FloatType,
        org.apache.spark.sql.types.DoubleType).contains(lKey.dataType),
      s"asOfNative does not support floating-point join keys " +
        s"(got ${lKey.dataType.catalogString} for '$key'); use asOfLast")
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
      graft.plans.AsOfJoinPlan(lPlan, rPlan,
        lKey, attr(rPlan, "__asof_key"),
        attr(lPlan, ts), attr(rPlan, rTsName)))
      .drop("__asof_key")
  }

  /** Most recent at-or-before 'purchase' for every 'click', per user. */
  private def clickLastPurchaseVia(
      join: (DataFrame, DataFrame, String, String, String) => DataFrame)(
      spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("p_event_id"),
        max_by(col("value"), col("event_id")).as("p_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    join(clicks, purchases, "user_id", "ts", "p_ts")
  }

  def clickLastPurchase(spark: SparkSession, dir: String): DataFrame =
    clickLastPurchaseVia(asOfLast(_, _, _, _, _))(spark, dir)

  /** Same query through the native AsOfJoinExec plan — both hash-match
    * the same DuckDB ASOF oracle, so the custom operator is held to the
    * full correctness bar, not just a unit spec. */
  def clickLastPurchaseNative(spark: SparkSession, dir: String): DataFrame =
    clickLastPurchaseVia(asOfNative(_, _, _, _, _))(spark, dir)

  /** Nearest-in-time join: for every click, the purchase closest in
    * EITHER direction (the sensor-fusion/market-data "nearest reading"
    * semantics ASOF alone can't give). Composed from two passes of the
    * same as-of engine — backward on `ts`, forward as backward on the
    * NEGATED epoch-microsecond axis — then one equi-join on the unique
    * click id picks the closer side; exact ties go backward. Cost: two
    * keyed window passes plus one id-keyed join, no range join, no
    * per-row subquery. Same dedup contract as [[asOfLast]] (purchases
    * unique per (user, ts)). */
  def clickNearestPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("p_event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val back = asOfLast(clicks, purchases, "user_id", "ts", "b_ts")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("b_ts"), col("p_event_id").as("b_event_id"))
    val clicksF = clicks
      .withColumn("tsn", -unix_micros(col("ts"))).drop("ts")
    val purchasesF = purchases
      .withColumn("tsn", -unix_micros(col("ts"))).drop("ts")
    val fwd = asOfLast(clicksF, purchasesF, "user_id", "tsn", "f_tsn")
      .select(col("event_id"), col("f_tsn"), col("p_event_id").as("f_event_id"))
    val bGap = unix_micros(col("ts")) - unix_micros(col("b_ts"))
    val fGap = -col("f_tsn") - unix_micros(col("ts"))
    val backWins = col("b_ts").isNotNull &&
      (col("f_tsn").isNull || bGap <= fGap)
    back.join(fwd, Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        when(col("b_ts").isNull && col("f_tsn").isNull, lit("none"))
          .when(backWins, lit("backward")).otherwise(lit("forward")).as("side"),
        when(backWins, col("b_event_id")).otherwise(col("f_event_id")).as("p_event_id"),
        when(backWins, bGap).otherwise(fGap).as("gap_us"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_asof_join" -> ((s, d) => clickLastPurchase(s, d)),
    "rel_asof_nearest" -> ((s, d) => clickNearestPurchase(s, d)),
    "rel_asof_join_native" -> ((s, d) => clickLastPurchaseNative(s, d)))

  private val asofOracleSql =
    """WITH p AS (SELECT user_id, ts, max(event_id) AS p_event_id,
      |    arg_max(value, event_id) AS p_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |c AS (SELECT event_id, user_id, ts, value
      |  FROM events WHERE event_type = 'click')
      |SELECT c.event_id, c.user_id, c.ts, c.value,
      |  p.ts AS p_ts, p.p_event_id, p.p_value
      |FROM c ASOF LEFT JOIN p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "rel_asof_join" -> asofOracleSql,
    "rel_asof_join_native" -> asofOracleSql,
    // two DuckDB ASOF passes (>= backward, <= forward), closer side
    // wins, exact tie goes backward — the engine's selection rule
    "rel_asof_nearest" ->
      """WITH p AS (SELECT user_id, ts, max(event_id) AS p_event_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |b AS (SELECT c.event_id, p.ts AS b_ts, p.p_event_id AS b_event_id
        |  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts),
        |f AS (SELECT c.event_id, p.ts AS f_ts, p.p_event_id AS f_event_id
        |  FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts)
        |SELECT c.event_id, c.user_id, c.ts,
        |  CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN 'none'
        |       WHEN f_ts IS NULL THEN 'backward'
        |       WHEN b_ts IS NULL THEN 'forward'
        |       WHEN epoch_us(c.ts) - epoch_us(b_ts)
        |            <= epoch_us(f_ts) - epoch_us(c.ts) THEN 'backward'
        |       ELSE 'forward' END AS side,
        |  CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL
        |         OR epoch_us(c.ts) - epoch_us(b_ts)
        |            <= epoch_us(f_ts) - epoch_us(c.ts)) THEN b_event_id
        |       ELSE f_event_id END AS p_event_id,
        |  CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL
        |         OR epoch_us(c.ts) - epoch_us(b_ts)
        |            <= epoch_us(f_ts) - epoch_us(c.ts))
        |         THEN epoch_us(c.ts) - epoch_us(b_ts)
        |       ELSE epoch_us(f_ts) - epoch_us(c.ts) END AS gap_us
        |FROM c JOIN b USING (event_id) JOIN f USING (event_id)
        |ORDER BY c.event_id""".stripMargin)
}
