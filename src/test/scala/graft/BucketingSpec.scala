package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both sides on the join key
  * removes the Exchange from every subsequent join on that key — the
  * cluster-scale strategy for repeated fact⋈dim joins (SURVEY.md
  * "Partitioning & shuffle"). Verified by plan inspection: same join
  * shuffles unbucketed, does not shuffle bucketed. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-bucket").toString
    val orders = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sf0001).select("c_custkey", "c_mktsegment")

    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").mode("overwrite").saveAsTable("orders_b")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").mode("overwrite").saveAsTable("customer_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val bucketed = spark.table("orders_b").join(spark.table("customer_b"),
        col("o_custkey") === col("c_custkey"))
      val unbucketed = orders.join(customer, col("o_custkey") === col("c_custkey"))

      // executedPlan (post-EnsureRequirements) is where Exchanges appear
      assert(!bucketed.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed join must not shuffle")
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"),
        "unbucketed join shuffles (sanity)")
      // identical results either way
      assert(bucketed.count() == unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("zValue interleaves bits (Morton order)") {
    import spark.implicits._
    import graft.sources.Formats
    // 5=0101, 3=0011 → a in odd positions: (1<<1)+(1<<5)=34; b: (1<<0)+(1<<2)=5
    val r = Seq((5L, 3L)).toDF("a", "b")
      .select(Formats.zValue(col("a"), col("b"), 4).as("z")).head()
    assert(r.getLong(0) == 39L)
    // locality sanity: neighbors in (a,b) are near in z
    val zs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)).toDF("a", "b")
      .select(Formats.zValue(col("a"), col("b"), 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(zs == Seq(0L, 2L, 1L, 3L)) // one 2x2 tile = z 0..3
  }

  test("z-ordered layout bounds BOTH columns per file; 1-D clustering only one") {
    import spark.implicits._
    import graft.sources.Formats
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val dir = Files.createTempDirectory("graft-zorder")
    val zPath = s"$dir/z"; val aPath = s"$dir/a1d"
    Formats.writeZOrdered(grid, zPath, "a", "b", numFiles = 16)
    Formats.writeRangeClustered(grid, aPath, "a", numFiles = 16)

    def boxes(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("a").as("a0"), max("a").as("a1"),
        min("b").as("b0"), max("b").as("b1"))
      .collect()
    val zBoxes = boxes(zPath)
    assert(zBoxes.length == 16)
    // every z file covers a compact rectangle in BOTH dims (≤ half the
    // 0..63 extent; ideal 16-file tiling gives quarter extents)
    zBoxes.foreach { r =>
      assert(r.getAs[Long]("a1") - r.getAs[Long]("a0") <= 32, r.toString)
      assert(r.getAs[Long]("b1") - r.getAs[Long]("b0") <= 32, r.toString)
    }
    // the 1-D layout cannot bound b: its files span (almost) all of it
    assert(boxes(aPath).forall(r =>
      r.getAs[Long]("b1") - r.getAs[Long]("b0") >= 60))
  }

  test("3-D z-ordered layout bounds ALL THREE columns per file") {
    import spark.implicits._
    import graft.sources.Formats
    // a full 16x16x16 grid into 64 files: each file holds 64 cells, and
    // curve locality must keep every file's bounding box inside a
    // fraction of each 0..15 axis — a 1-D sort would span two of them
    val grid = (for (a <- 0 until 16; b <- 0 until 16; c <- 0 until 16)
      yield (a.toLong, b.toLong, c.toLong)).toDF("a", "b", "c")
    val dir = Files.createTempDirectory("graft-zorder3")
    val zPath = s"$dir/z3"; val aPath = s"$dir/a1d"
    Formats.writeZOrderedN(grid, zPath, Seq("a", "b", "c"), numFiles = 64, bits = 4)
    Formats.writeRangeClustered(grid, aPath, "a", numFiles = 64)
    def boxes(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("a").as("a0"), max("a").as("a1"),
        min("b").as("b0"), max("b").as("b1"),
        min("c").as("c0"), max("c").as("c1"))
      .collect()
    val zBoxes = boxes(zPath)
    assert(zBoxes.length == 64)
    // 64 cells/file: a file spans at most half of each 16-wide axis
    // (aligned 64-key Morton blocks are exact 4x4x4 cubes; range cuts
    // straddle at most a block boundary)
    zBoxes.foreach { r =>
      Seq(("a1", "a0"), ("b1", "b0"), ("c1", "c0")).foreach { case (hi, lo) =>
        assert(r.getAs[Long](hi) - r.getAs[Long](lo) <= 8,
          s"3-D z file spans a full axis: $r")
      }
    }
    // the 1-D layout leaves b and c unbounded: files span (almost) all
    assert(boxes(aPath).forall(r =>
      r.getAs[Long]("b1") - r.getAs[Long]("b0") >= 14 &&
        r.getAs[Long]("c1") - r.getAs[Long]("c0") >= 14))
    // the Hilbert n-D writer holds the same 3-dim bound
    val hPath = s"$dir/h3"
    Formats.writeHilbertClusteredN(grid, hPath, Seq("a", "b", "c"),
      numFiles = 64, bits = 4)
    boxes(hPath).foreach { r =>
      Seq(("a1", "a0"), ("b1", "b0"), ("c1", "c0")).foreach { case (hi, lo) =>
        assert(r.getAs[Long](hi) - r.getAs[Long](lo) <= 8,
          s"3-D hilbert file spans a full axis: $r")
      }
    }
  }

  test("aligned 3-D writer: one file per aligned tile, exact subcube per file") {
    import spark.implicits._
    import graft.sources.Formats
    import org.apache.spark.sql.graft.ColumnBridge
    // full 16^3 grid, 64 keys/file (two octant levels -> exact 4x4x4
    // aligned subcubes): the deterministic writer must land EXACTLY one
    // aligned tile in each physical file — the contract the
    // layout_*3_files driver gate hash-matches on the events table
    val grid = (for (a <- 0 until 16; b <- 0 until 16; c <- 0 until 16)
      yield (a.toLong, b.toLong, c.toLong)).toDF("a", "b", "c")
    val dir = Files.createTempDirectory("graft-aligned3")
    val path = s"$dir/z3a"
    def zkey(qs: Seq[org.apache.spark.sql.Column]) =
      ColumnBridge.column(graft.functions.ZOrderN(
        ColumnBridge.expression(array(qs: _*))))
    Formats.writeCurveClusteredAlignedN(grid, path, Seq("a", "b", "c"),
      bits = 4, keysPerFile = 64L, zkey)
    val boxes = spark.read.parquet(path)
      .withColumn("k", zkey(Seq(col("a"), col("b"), col("c"))))
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"),
        min("a").as("a0"), max("a").as("a1"),
        min("b").as("b0"), max("b").as("b1"),
        min("c").as("c0"), max("c").as("c1"),
        min("k").as("k0"), max("k").as("k1"))
      .collect()
    assert(boxes.length == 64)
    boxes.foreach { r =>
      // exactly one full tile per file, at an aligned key boundary...
      assert(r.getAs[Long]("n") == 64L, s"file is not one tile: $r")
      assert(r.getAs[Long]("k0") % 64 == 0 &&
        r.getAs[Long]("k1") == r.getAs[Long]("k0") + 63,
        s"unaligned key range: $r")
      // ...and the bbox is the exact 4-wide subcube, never wider
      Seq(("a1", "a0"), ("b1", "b0"), ("c1", "c0")).foreach { case (hi, lo) =>
        assert(r.getAs[Long](hi) - r.getAs[Long](lo) == 3,
          s"file bbox is not a 4-cube: $r")
      }
    }
    // the 64 files cover the complete disjoint tile set 0..63
    assert(boxes.map(_.getAs[Long]("k0") / 64).sorted.toSeq == (0L until 64L),
      "files do not partition the aligned tile set")
    // a keysPerFile that does not divide the key space is refused —
    // an unaligned boundary would silently forfeit the subcube bound
    intercept[IllegalArgumentException] {
      Formats.writeCurveClusteredAlignedN(grid, s"$dir/bad",
        Seq("a", "b", "c"), bits = 4, keysPerFile = 100L, zkey)
    }
    // the Hilbert walk holds the identical contract: aligned 64-key
    // (= 8^2, two octant levels) blocks are exact 4x4x4 subcubes on
    // Skilling's curve too, so the same writer + keysPerFile gives the
    // same one-tile-per-file layout under the other key
    def hkey(qs: Seq[org.apache.spark.sql.Column]) =
      ColumnBridge.column(graft.functions.HilbertN(
        ColumnBridge.expression(array(qs: _*)), 4))
    val hPath = s"$dir/h3a"
    Formats.writeCurveClusteredAlignedN(grid, hPath, Seq("a", "b", "c"),
      bits = 4, keysPerFile = 64L, hkey)
    val hBoxes = spark.read.parquet(hPath)
      .withColumn("k", hkey(Seq(col("a"), col("b"), col("c"))))
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"),
        min("a").as("a0"), max("a").as("a1"),
        min("b").as("b0"), max("b").as("b1"),
        min("c").as("c0"), max("c").as("c1"),
        min("k").as("k0"), max("k").as("k1"))
      .collect()
    assert(hBoxes.length == 64)
    hBoxes.foreach { r =>
      assert(r.getAs[Long]("n") == 64L && r.getAs[Long]("k0") % 64 == 0 &&
        r.getAs[Long]("k1") == r.getAs[Long]("k0") + 63,
        s"hilbert file is not one aligned tile: $r")
      Seq(("a1", "a0"), ("b1", "b0"), ("c1", "c0")).foreach { case (hi, lo) =>
        assert(r.getAs[Long](hi) - r.getAs[Long](lo) == 3,
          s"hilbert file bbox is not a 4-cube: $r")
      }
    }
  }

  test("zorder3 and hilbert3 tiles: aligned 4096-key blocks are exact 16x16x16 cubes") {
    // 4096 = 8^4 — four octant-subdivision levels of EITHER curve, so
    // aligned blocks are exact subcubes on both walks
    for (tiles <- Seq(graft.operators.Layout.zorder3Tiles(spark, sf0001).collect(),
        graft.operators.Layout.hilbert3Tiles(spark, sf0001).collect())) {
      assert(tiles.nonEmpty)
      tiles.foreach { r =>
        assert(r.getAs[Long]("bbox_cells") <= graft.operators.Layout.TileKeys3,
          s"tile bbox exceeds the 16^3 cube: $r")
        Seq(("mx_a", "mn_a"), ("mx_b", "mn_b"), ("mx_c", "mn_c")).foreach {
          case (hi, lo) =>
            assert(r.getAs[Long](hi) - r.getAs[Long](lo) <= 15L,
              s"tile spans more than one cube edge on $hi: $r")
        }
      }
    }
  }

  test("hilbert-clustered layout bounds BOTH columns per file, tighter worst file than morton") {
    import spark.implicits._
    import graft.sources.Formats
    val grid = (for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val dir = Files.createTempDirectory("graft-hilbert")
    val hPath = s"$dir/h"; val zPath = s"$dir/z"
    Formats.writeHilbertClustered(grid, hPath, "a", "b", numFiles = 16)
    Formats.writeZOrdered(grid, zPath, "a", "b", numFiles = 16)
    def boxes(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("a").as("a0"), max("a").as("a1"),
        min("b").as("b0"), max("b").as("b1"))
      .collect()
      .map(r => (r.getAs[Long]("a1") - r.getAs[Long]("a0") + 1) *
        (r.getAs[Long]("b1") - r.getAs[Long]("b0") + 1))
    val h = boxes(hPath); val z = boxes(zPath)
    assert(h.length == 16)
    // every Hilbert file covers a compact region (16 equal range cuts of
    // a 64x64 grid: each file holds 256 cells; curve adjacency keeps its
    // bbox within a quadrant, 32x32 = 1024 cells)
    h.foreach(area => assert(area <= 1024L, s"hilbert file bbox $area"))
    // and the WORST file's bbox is no worse than Morton's worst: range
    // cuts never straddle a Hilbert discontinuity (there are none)
    assert(h.max <= z.max)
  }

  test("compaction plan keeps contiguous non-overlapping z-ranges near target size") {
    val plan = graft.operators.Layout.compactionPlan(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(plan.nonEmpty)
    val total = plan.map(_._3).sum
    val target = (total + graft.operators.Layout.CompactionFiles - 1) /
      graft.operators.Layout.CompactionFiles
    // file ids strictly increase from 0 (sparse when one tile exceeds
    // the target: it consumes several targets' worth of cumulative);
    // z-ranges strictly ordered and disjoint — compaction must never
    // interleave tiles across output files
    assert(plan.head._1 == 0L)
    assert(plan.map(_._1).toSeq == plan.map(_._1).toSeq.sorted.distinct)
    plan.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4,
        s"files ${a._1} and ${b._1} overlap in z")
      case _ =>
    }
    // greedy fill: every file crosses the target only by its last tile,
    // so no file can reach 2x target unless a single tile does
    val maxTile = graft.operators.Layout.zorderTiles(spark, sf0001)
      .agg(org.apache.spark.sql.functions.max("n_rows")).head().getLong(0)
    plan.foreach { f =>
      assert(f._3 < target + maxTile,
        s"file ${f._1} holds ${f._3} rows vs target $target")
    }
  }

  test("hilbert2 is a bijection whose consecutive indices are grid-adjacent") {
    import graft.functions.HashOps
    // bijectivity on the full 32×32 grid: 1024 distinct indices in range
    val n = 32L
    val cells = for (x <- 0L until n; y <- 0L until n)
      yield (x, y, HashOps.hilbert2(x, y, n))
    val ds = cells.map(_._3)
    assert(ds.toSet == (0L until n * n).toSet)
    // THE Hilbert property (and what z-order lacks): walking the curve
    // in index order moves exactly one grid step at a time — every
    // contiguous key range is a connected region
    val byD = cells.map(c => c._3 -> (c._1, c._2)).toMap
    (0L until n * n - 1).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1L,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
    // contrast: Morton makes long seam jumps (e.g. crossing the half
    // grid), so the same walk over zorder2 violates adjacency
    val zCells = cells.map { case (x, y, _) => (x, y, HashOps.zorder2(x, y)) }
    val byZ = zCells.map(c => c._3 -> (c._1, c._2)).toMap
    val zJumps = (0L until n * n - 1).count { z =>
      val (x1, y1) = byZ(z); val (x2, y2) = byZ(z + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1L
    }
    assert(zJumps > 0L)
    // SQL surface: hilbert2(x, y, n) through the registered builder
    import spark.implicits._
    graft.functions.VectorFunctions.register(spark)
    val viaSql = Seq((3L, 5L), (31L, 0L)).toDF("x", "y")
      .selectExpr(s"hilbert2(x, y, $n) AS h").collect().map(_.getLong(0))
    assert(viaSql.toSeq ==
      Seq(HashOps.hilbert2(3, 5, n), HashOps.hilbert2(31, 0, n)))
  }

  test("hilbert tiles: aligned 4096-key blocks are exact 64x64 subsquares") {
    val tiles = graft.operators.Layout.hilbertTiles(spark, sf0001).collect()
    assert(tiles.nonEmpty)
    // every tile's min/max bounding box is capped at one 64×64 square —
    // the file-statistics pruning bound, same as z-order's aligned tiles
    tiles.foreach { r =>
      assert(r.getAs[Long]("bbox_cells") <= graft.operators.Layout.TileKeys,
        s"tile ${r.getAs[Long]("tile")} bbox ${r.getAs[Long]("bbox_cells")}")
    }
  }

  test("layout_dpp_join's registered plan carries the runtime partition-pruning filter") {
    // the driver gate hash-matches the RESULT through the partitioned
    // fact; this pins the MECHANISM — the dim's selective predicate
    // must become a dynamicpruning subquery on the fact scan, or the
    // query silently degrades to a full-corpus read that still returns
    // the right rows (SourcesSpec drills the same shape on ad-hoc
    // temp dirs; this covers the exact registered query)
    val q = graft.operators.Layout.dppJoin(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the fact scan:\n$plan")
    // two langs survive the dim filter — per-partition grain, one
    // output row per read partition (a too-aggressive prune would
    // drop a row, which the driver gate's hash then catches)
    assert(q.collect().length == 2)
  }

  test("layout_bloom_prune_join's registered plan carries the injected runtime bloom filter") {
    // the driver gate hash-matches the RESULT through the injected
    // plan; this pins the MECHANISM — the dim's selective predicate
    // must become a might_contain probe on the fact side, or the query
    // silently degrades to an unpruned shuffle join that still returns
    // the right rows (SourcesSpec drills the same shape with ad-hoc
    // session confs; this covers the exact registered query, whose
    // confs live on its own child session)
    val q = graft.operators.Layout.bloomPruneJoin(spark, sf0001)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain"),
      s"expected an injected runtime bloom filter on the fact side:\n$optimized")
    val physical = q.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"),
      s"bloom-pruned join plans a cartesian:\n$physical")
    // returnflag × linestatus grain: several groups, never one row
    assert(q.collect().length > 1)
  }

  test("skipping report: curves stay compact on both dims, row-major collapses on the trailing one") {
    val rows = graft.operators.Layout.skippingReport(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_tiles"),
        r.getAs[Long]("point_avg_milli"), r.getAs[Long]("a_sel_avg_milli"),
        r.getAs[Long]("b_sel_avg_milli")))).toMap
    assert(rows.keySet == Set("hilbert", "rowmajor", "zorder"))
    val (_, _, _, rmB) = rows("rowmajor")
    Seq("zorder", "hilbert").foreach { c =>
      val (_, _, _, cb) = rows(c)
      // the 1-D sort's trailing-dimension selectivity must be far worse
      // than either curve's — the whole point of multidimensional layout
      assert(rmB > 2 * cb, s"$c b_sel $cb vs rowmajor $rmB")
    }
    rows.foreach { case (name, (n, p, a, b)) =>
      assert(n > 0 && p >= 0 && a >= n / 2 && b >= n / 2,
        s"$name: extents can't undercut one cell per tile ($n, $p, $a, $b)")
      // per-dim expected tiles read can never exceed reading every tile
      assert(a <= n * 1000 && b <= n * 1000, s"$name selectivity overflow")
    }
    // closed-form identity: point_avg equals sum(bbox)/cells replayed
    // from the tile frame directly
    val direct = graft.operators.Layout.zorderTiles(spark, sf0001)
      .agg(sum(col("bbox_cells"))).collect()(0).getLong(0)
    assert(rows("zorder")._2 ==
      direct * 1000L / (graft.operators.Layout.GridCells * graft.operators.Layout.GridCells))
  }
}
