package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.Tables
import graft.functions.ZOrder2

/** Multi-dimensional data layout: z-order (Morton) clustering keys.
  *
  * At 100 TB the scan you never run is the cheapest operator in the
  * library: sorting a table by `zorder2(a, b)` before writing keeps
  * rows that are close in BOTH dimensions physically adjacent, so
  * per-file (or parquet row-group) min/max statistics prune reads
  * filtered on EITHER column — the mechanism behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`. A single-column sort gives perfect pruning on
  * that column and none on the other; the z-curve trades a constant
  * factor on each dimension for pruning on all of them.
  *
  * The physical write path lives in `sources/Formats.writeZOrdered`
  * (quantize → interleave → repartitionByRange → sortWithinPartitions),
  * which runs on the same native ZOrder2 expression via
  * `Formats.zValue`; this module owns the expression's SQL surface and
  * the oracle-verified locality statistics.
  *
  * `zorderTiles` is the verifiable core of that claim: bucket lineitem's
  * (l_partkey, l_suppkey) into a 1024×1024 grid, interleave with the
  * native ZOrder2 expression (functions/HashExpressions.scala), and
  * aggregate per 4096-key z-range — the "file" granularity. Each range
  * then provably covers one 64×64 tile of key space: `bbox_cells`, the
  * min/max bounding box a file's statistics would advertise, is capped
  * at 4096 cells where a one-dimensional sort's trailing dimension
  * would span the full 1024-wide axis. The oracle replays the
  * interleave bit-for-bit with the same five shift-mask rounds.
  *
  * Scale shape: one scan projection (the key is a codegen'd expression)
  * and one map-side-combined aggregation to |tiles| rows. The layout
  * write itself (`repartitionByRange(zorder2)` + write) adds the one
  * range shuffle any clustered rewrite costs.
  */
object Layout {

  /** Morton key column over two BIGINT dimension columns. */
  def zOrderKey(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder2(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Grid width per dimension (2^10 cells) and keys per "file" tile
    * (2^12 z-values = one 64×64 square of the grid). */
  val GridCells = 1024L
  val TileKeys = 4096L

  /** Per-tile occupancy and min/max bounding box of the z-clustered
    * 1024×1024 bucketing of (l_partkey, l_suppkey). */
  def zorderTiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(pmod(col("l_partkey"), lit(GridCells)).as("pa"),
        pmod(col("l_suppkey"), lit(GridCells)).as("pb"))
      .withColumn("z", zOrderKey(col("pa"), col("pb")))
      .withColumn("tile", expr(s"z div $TileKeys"))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("pa")).as("mn_a"), max(col("pa")).as("mx_a"),
        min(col("pb")).as("mn_b"), max(col("pb")).as("mx_b"))
      .withColumn("bbox_cells",
        (col("mx_a") - col("mn_a") + lit(1)) * (col("mx_b") - col("mn_b") + lit(1)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder_tiles" -> ((s, d) => zorderTiles(s, d)))

  // the five dilation rounds of HashOps.spread32 with the same mask
  // constants in decimal (0x0000FFFF0000FFFF, 0x00FF00FF00FF00FF,
  // 0x0F0F0F0F0F0F0F0F, 0x3333333333333333, 0x5555555555555555)
  private def spreadSql(c: String): Seq[String] = Seq(
    s"(($c | ($c << 16)) & 281470681808895)",
    s"(($c | ($c << 8)) & 71777214294589695)",
    s"(($c | ($c << 4)) & 1085102592571150095)",
    s"(($c | ($c << 2)) & 3689348814741910323)",
    s"(($c | ($c << 1)) & 6148914691236517205)")

  private val spreadCtes: String = {
    val steps = (0 until 5).map { i =>
      s"s${i + 1} AS (SELECT pa, pb, ${spreadSql("za")(i)} AS za, ${spreadSql("zb")(i)} AS zb FROM s$i)"
    }.mkString(",\n")
    s"""s0 AS (SELECT pa, pb, pa AS za, pb AS zb FROM b),
       |$steps""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "layout_zorder_tiles" ->
      s"""WITH b AS (SELECT (l_partkey % $GridCells)::BIGINT AS pa,
         |    (l_suppkey % $GridCells)::BIGINT AS pb FROM lineitem),
         |$spreadCtes,
         |z AS (SELECT pa, pb, (za | (zb << 1)) // $TileKeys AS tile FROM s5)
         |SELECT tile, count(*)::BIGINT AS n_rows,
         |  min(pa) AS mn_a, max(pa) AS mx_a, min(pb) AS mn_b, max(pb) AS mx_b,
         |  (max(pa) - min(pa) + 1) * (max(pb) - min(pb) + 1) AS bbox_cells
         |FROM z GROUP BY tile ORDER BY tile""".stripMargin)
}
