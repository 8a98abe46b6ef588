package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The temporal/CDC stack: apply a change log to a current-state
  * snapshot, and build an SCD2 (slowly-changing-dimension type 2)
  * history with validity intervals — the two halves of every lakehouse
  * CDC pipeline, and the natural dimension source for the repo's as-of
  * join.
  *
  * The change log is derived deterministically from `orders` (op from
  * the order key's residue, value in integer cents, event time in
  * epoch microseconds), so both queries replay exactly in the oracle
  * at any scale factor.
  *
  * Scale shape: everything is per-key windows over a high-cardinality
  * key (partitions are tiny, sorts are local) or per-key aggregation —
  * one hash shuffle each; the change log is never collected or
  * cross-joined.
  */
object Temporal {

  /** Deterministic CDC log: (key, seq, ts_us, op, val_cents).
    * op: orderkey%10 ∈ 0..5 → U, 6..8 → I, 9 → D. */
  private[graft] def changeLog(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      (col("o_custkey") % 500).as("key"),
      col("o_orderkey").as("seq"),
      // o_orderdate reads as TIMESTAMP_NTZ; the session runs UTC, so the
      // cast is wall-clock-identity and matches DuckDB's epoch_us
      expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("ts_us"),
      when(col("o_orderkey") % 10 <= 5, "U")
        .when(col("o_orderkey") % 10 <= 8, "I").otherwise("D").as("op"),
      expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("val_cents"))

  /** Last-writer-wins CDC apply: the final state per key is its latest
    * change by (ts, seq) — absent entirely if that change is a delete.
    * Inserts and updates are both upserts (the usual Debezium-style
    * compaction semantics). */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKeyDesc = Window.partitionBy("key").orderBy(col("ts_us").desc, col("seq").desc)
    changeLog(spark, dir)
      .withColumn("rn", row_number().over(byKeyDesc))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("key"), col("val_cents"), col("ts_us").as("updated_us"))
  }

  /** SCD2 history build: each non-delete change opens a version valid
    * from its timestamp until the NEXT change of the same key (delete
    * included — a delete closes the prior version without opening one);
    * the last open version carries the +infinity sentinel. */
  def scd2Build(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy("key").orderBy("ts_us", "seq")
    val Sentinel = 253402300799000000L // 9999-12-31T23:59:59 in micros
    changeLog(spark, dir)
      .withColumn("valid_to_us",
        coalesce(lead("ts_us", 1).over(byKey), lit(Sentinel)))
      .filter(col("op") =!= "D")
      .select(col("key"), col("seq").as("version_seq"), col("val_cents"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"),
        (col("valid_to_us") === Sentinel).as("is_current"))
  }

  /** Point-in-time lookup of events against the SCD2 history — the
    * composition the temporal stack exists for: each event finds the
    * version valid AT its timestamp via the repo's as-of join (last
    * version opened at-or-before the event), then validity-filters so
    * delete-closed intervals reject events after the close. */
  def scd2Lookup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // asOfLast's contract: the right side must be unique per (key, ts) —
    // day-granularity change times DO tie, and which tied version an
    // as-of match picks is engine- and run-arbitrary. Semantics chosen:
    // the LATEST version opened at an instant wins (its earlier twins
    // are zero-length intervals that never validly match anyway).
    val perInstant = Window.partitionBy("key", "valid_from_us")
      .orderBy(col("version_seq").desc)
    val dim = scd2Build(spark, dir)
      .withColumn("rn", row_number().over(perInstant))
      .filter(col("rn") === 1)
      .select(col("key"), col("valid_from_us").as("ts_us"),
        col("version_seq"), col("val_cents"), col("valid_to_us"))
    val probes = Tables.events(spark, dir).select(
      (col("user_id") % 500).as("key"),
      col("event_id"),
      expr("unix_micros(ts)").as("ts_us"))
    AsOfJoin.asOfLast(probes, dim, "key", "ts_us", "valid_from_us")
      .filter(col("valid_to_us").isNotNull && col("valid_to_us") > col("ts_us"))
      .select(col("event_id"), col("key"), col("ts_us"),
        col("version_seq"), col("val_cents"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_cdc_apply" -> ((s, d) => cdcApply(s, d)),
    "rel_scd2_build" -> ((s, d) => scd2Build(s, d)),
    "rel_scd2_lookup" -> ((s, d) => scd2Lookup(s, d)))

  private val logCte =
    """log AS (SELECT o_custkey % 500 AS key, o_orderkey AS seq,
      |    epoch_us(o_orderdate) AS ts_us,
      |    CASE WHEN o_orderkey % 10 <= 5 THEN 'U'
      |         WHEN o_orderkey % 10 <= 8 THEN 'I' ELSE 'D' END AS op,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS val_cents
      |  FROM orders)""".stripMargin

  val oracle: Map[String, String] = Map(
    "rel_cdc_apply" ->
      s"""WITH $logCte,
         |r AS (SELECT *, row_number() OVER (PARTITION BY key ORDER BY ts_us DESC, seq DESC) AS rn
         |  FROM log)
         |SELECT key, val_cents, ts_us AS updated_us
         |FROM r WHERE rn = 1 AND op <> 'D'
         |ORDER BY key""".stripMargin,
    "rel_scd2_build" ->
      s"""WITH $logCte,
         |v AS (SELECT *, coalesce(lead(ts_us) OVER (PARTITION BY key ORDER BY ts_us, seq),
         |    253402300799000000) AS valid_to_us FROM log)
         |SELECT key, seq AS version_seq, val_cents, ts_us AS valid_from_us,
         |  valid_to_us, valid_to_us = 253402300799000000 AS is_current
         |FROM v WHERE op <> 'D'
         |ORDER BY key, valid_from_us, version_seq""".stripMargin,
    "rel_scd2_lookup" ->
      s"""WITH $logCte,
         |v AS (SELECT *, coalesce(lead(ts_us) OVER (PARTITION BY key ORDER BY ts_us, seq),
         |    253402300799000000) AS valid_to_us FROM log),
         |dim AS (SELECT key, ts_us AS valid_from_us, seq AS version_seq,
         |    val_cents, valid_to_us FROM v WHERE op <> 'D'
         |  QUALIFY row_number() OVER (PARTITION BY key, ts_us ORDER BY seq DESC) = 1),
         |probes AS (SELECT user_id % 500 AS key, event_id, epoch_us(ts) AS ts_us
         |  FROM events),
         |matched AS MATERIALIZED (
         |  SELECT p.event_id, p.key, p.ts_us, d.version_seq, d.val_cents,
         |    d.valid_to_us
         |  FROM probes p ASOF LEFT JOIN dim d
         |    ON p.key = d.key AND p.ts_us >= d.valid_from_us)
         |SELECT event_id, key, ts_us, version_seq, val_cents
         |FROM matched
         |WHERE valid_to_us IS NOT NULL AND valid_to_us > ts_us
         |ORDER BY event_id""".stripMargin)
}
