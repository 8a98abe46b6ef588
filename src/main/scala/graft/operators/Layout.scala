package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.Tables
import graft.functions.{Hilbert2, HilbertN, ZOrder2, ZOrderN}

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

  /** The ONE 2-D tile-statistics aggregation both curve variants run —
    * a curve choice is ONLY a key expression; the grid, the quantizer,
    * and the bbox statistics must never diverge between them. */
  private def tiles2(spark: SparkSession, dir: String,
      key: (Column, Column) => Column): DataFrame =
    Tables.lineitem(spark, dir)
      .select(pmod(col("l_partkey"), lit(GridCells)).as("pa"),
        pmod(col("l_suppkey"), lit(GridCells)).as("pb"))
      .withColumn("k", key(col("pa"), col("pb")))
      .withColumn("tile", expr(s"k div $TileKeys"))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("pa")).as("mn_a"), max(col("pa")).as("mx_a"),
        min(col("pb")).as("mn_b"), max(col("pb")).as("mx_b"))
      .withColumn("bbox_cells",
        (col("mx_a") - col("mn_a") + lit(1)) * (col("mx_b") - col("mn_b") + lit(1)))

  /** Per-tile occupancy and min/max bounding box of the z-clustered
    * 1024×1024 bucketing of (l_partkey, l_suppkey). */
  def zorderTiles(spark: SparkSession, dir: String): DataFrame =
    tiles2(spark, dir, zOrderKey)

  /** Hilbert key column over two BIGINT dimension columns already in
    * [0, GridCells). */
  def hilbertKey(a: Column, b: Column): Column =
    ColumnBridge.column(Hilbert2(
      ColumnBridge.expression(a), ColumnBridge.expression(b), GridCells))

  /** [[zorderTiles]]'s twin on the Hilbert curve — same grid, same
    * tile granularity, same per-tile bbox statistics. Aligned 4^k-key
    * blocks of the Hilbert curve are exact 2^k×2^k subsquares (the
    * curve is defined by recursive quadrant subdivision), so full
    * tiles bound bbox_cells at [[TileKeys]] like z-order does; the
    * curve's edge over Morton is that ARBITRARY contiguous ranges stay
    * compact too — consecutive keys are always grid-adjacent (no
    * Morton seam jumps), which is what a range-scan over a clustered
    * file layout actually reads. BucketingSpec asserts the adjacency
    * property against the native expression directly. */
  def hilbertTiles(spark: SparkSession, dir: String): DataFrame =
    tiles2(spark, dir, hilbertKey)

  /** Data-skipping effectiveness report — the clustering-quality
    * number a lakehouse's min/max file pruning actually realizes,
    * closed-form from per-tile statistics (no probe join needed):
    * for a uniform point query, the expected tiles read is
    * Σ bbox_cells / GridCells²; for a single-dimension equality
    * predicate it is Σ extent_dim / GridCells (a tile is read iff its
    * min/max range covers the predicate value). Reported ×1000 in
    * truncating integer division for three layouts over the SAME rows
    * and tile granularity: z-order, Hilbert, and row-major
    * (pa·GridCells + pb — the 1-D sort baseline). The story the
    * numbers tell: both curves stay compact on BOTH dimensions, while
    * row-major is perfect on the leading dimension and collapses on
    * the trailing one (every tile spans the full pb axis, so a
    * pb-predicate reads the entire table).
    *
    * Scale shape: three scan projections (each key a codegen'd
    * expression) into \|tiles\|-row aggregates; the report itself is
    * 3-row algebra. */
  def skippingReport(spark: SparkSession, dir: String): DataFrame = {
    def stats(name: String, t: DataFrame): DataFrame =
      t.agg(count(lit(1)).as("n_tiles"),
        sum(col("bbox_cells")).as("sum_bbox"),
        sum(col("mx_a") - col("mn_a") + lit(1)).as("sum_a_ext"),
        sum(col("mx_b") - col("mn_b") + lit(1)).as("sum_b_ext"))
        .select(lit(name).as("layout"), col("n_tiles"),
          expr(s"sum_bbox * 1000 div ${GridCells * GridCells}").as("point_avg_milli"),
          expr(s"sum_a_ext * 1000 div $GridCells").as("a_sel_avg_milli"),
          expr(s"sum_b_ext * 1000 div $GridCells").as("b_sel_avg_milli"))
    stats("hilbert", hilbertTiles(spark, dir))
      .unionByName(stats("rowmajor",
        tiles2(spark, dir, (a, b) => a * lit(GridCells) + b)))
      .unionByName(stats("zorder", zorderTiles(spark, dir)))
  }

  /** Morton key over ANY number of BIGINT dimension columns (bit j of
    * dim i at bit j·k+i; each dim truncated to ⌊63/k⌋ bits — see
    * HashOps.zorderN). */
  def zOrderKeyN(dims: Column*): Column =
    ColumnBridge.column(ZOrderN(
      ColumnBridge.expression(array(dims: _*))))

  /** Hilbert key over ANY number of BIGINT dimension columns already in
    * [0, 2^bits) — Skilling's n-D transpose (HashOps.hilbertN). */
  def hilbertKeyN(bits: Int, dims: Column*): Column =
    ColumnBridge.column(HilbertN(
      ColumnBridge.expression(array(dims: _*)), bits))

  /** 3-D grid width (2^7 per axis) and keys per tile for the events
    * layout: 4096 keys = one 16×16×16 cube of (minute, user, type)
    * space (4096 = 8^4: four recursion levels of either curve's
    * octant subdivision, so ALIGNED 4096-key blocks are exact subcubes
    * on the Morton and the Hilbert walk alike). */
  val GridCells3 = 128L
  // derived, not hardcoded — resizing the grid cannot desynchronize
  // the key's bit-plane count from the cell range (the HilbertRounds
  // discipline below)
  val GridBits3: Int = java.lang.Long.numberOfTrailingZeros(GridCells3)
  val TileKeys3 = 4096L

  /** The shared 3-D grid projection of the events table
    * (minute-of-ts, user_id, event_type-code), each dimension in
    * [0, GridCells3). The minute bucket uses an exact long FLOOR
    * division — `(a - pmod(a, n)) div n` is n·⌊a/n⌋ in pure long
    * arithmetic — because Spark's `div` truncates toward zero while
    * the DuckDB oracle's `//` floors; the pair only agrees for
    * non-negative micros, and a pre-epoch event timestamp would
    * otherwise hash-fail the gate on an engine-semantics divergence
    * rather than a real defect. The oracle mirrors with a
    * non-negative `((x % n) + n) % n` wrap matching pmod on every
    * dimension, so both engines are total-sign-agnostic. */
  private def dims3(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        pmod(expr(
          "(unix_micros(ts) - pmod(unix_micros(ts), 60000000)) div 60000000"),
          lit(GridCells3)).as("pa"),
        pmod(col("user_id"), lit(GridCells3)).as("pb"),
        pmod(length(col("event_type")) * lit(31L) + ascii(col("event_type")),
          lit(GridCells3)).cast("long").as("pc"))

  /** The dims3 projection as oracle SQL (DuckDB dialect) — edit in
    * lockstep with [[dims3]]. */
  private val dims3Sql: String =
    s"""SELECT
       |    (((epoch_us(ts) // 60000000) % $GridCells3 + $GridCells3) % $GridCells3)::BIGINT AS pa,
       |    ((user_id % $GridCells3 + $GridCells3) % $GridCells3)::BIGINT AS pb,
       |    (((length(event_type) * 31 + ascii(event_type)) % $GridCells3 + $GridCells3) % $GridCells3)::BIGINT AS pc
       |  FROM events""".stripMargin

  /** The ONE 3-D tile-statistics aggregation both curve variants run
    * over the events table — as with [[tiles2]], a curve is only a key
    * expression. */
  private def tiles3(spark: SparkSession, dir: String,
      key: (Column, Column, Column) => Column): DataFrame =
    dims3(spark, dir)
      .withColumn("k", key(col("pa"), col("pb"), col("pc")))
      .withColumn("tile", expr(s"k div $TileKeys3"))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("pa")).as("mn_a"), max(col("pa")).as("mx_a"),
        min(col("pb")).as("mn_b"), max(col("pb")).as("mx_b"),
        min(col("pc")).as("mn_c"), max(col("pc")).as("mx_c"))
      .withColumn("bbox_cells",
        (col("mx_a") - col("mn_a") + lit(1)) *
          (col("mx_b") - col("mn_b") + lit(1)) *
          (col("mx_c") - col("mn_c") + lit(1)))

  /** Per-tile occupancy and 3-D bounding box of the z-clustered
    * 128³ bucketing of the events table on (minute-of-ts, user_id,
    * event_type) — the layout a large event log actually wants:
    * time-range scans, per-user lookups, AND per-type slices all prune
    * on one clustering key. The type dimension quantizes the string
    * deterministically (length·31 + first code point, both engines'
    * `length`/`ascii`) so the oracle replays the whole key bit-for-bit
    * — the 3-D interleave via the five standard 21-bit shift-mask
    * dilation rounds. Each full tile provably covers one 16³ cube:
    * `bbox_cells` ≤ 4096 where a 1-D time sort's trailing dims would
    * span the full 128-wide axes (bbox up to 2·10⁶ cells). Same scale
    * shape as [[zorderTiles]]: one scan projection (the key is one
    * codegen'd expression) + one map-side-combined aggregate. */
  def zorder3Tiles(spark: SparkSession, dir: String): DataFrame =
    tiles3(spark, dir, (a, b, c) => zOrderKeyN(a, b, c))

  /** [[zorder3Tiles]]'s twin on the n-D Hilbert walk (Skilling's
    * transpose, HashOps.hilbertN) — same grid, same tile granularity,
    * same per-tile 3-D bbox statistics, and the same curve edge as in
    * 2-D: ARBITRARY contiguous key ranges stay compact (consecutive
    * indices always grid-adjacent), where Morton ranges can straddle a
    * seam jump. The oracle replays the walk bit-for-bit: the
    * inverse-undo rounds unrolled one CTE per (bit-plane, dimension)
    * with simultaneous column updates, Gray encode and the parity fold
    * as closed forms, and the final transpose as a 3-way Morton
    * interleave (bit j of dimension i lands at 3j + (2−i)). */
  def hilbert3Tiles(spark: SparkSession, dir: String): DataFrame =
    tiles3(spark, dir, (a, b, c) => hilbertKeyN(GridBits3, a, b, c))

  /** Curve keys per output file for the aligned 3-D clustered write:
    * 8^6 = 2^18, so the 128³ grid lands in 8 files and every file's
    * key range is an ALIGNED block of six octant-recursion levels — an
    * exact 64×64×64 subcube on the Morton and the Hilbert walk alike.
    * bbox_cells per file is therefore provably ≤ [[KeysPerFile3]]. */
  val KeysPerFile3 = 262144L

  /** Written-layout roots, one physical write per (session, dir,
    * curve) — the files gate reads a real on-disk layout, and the
    * write is a generation artifact exactly like a persisted index
    * (Bench's repeat samples re-read, never re-write). The path is
    * pid-scoped AND session-token-scoped: it needs no cross-run
    * determinism (the gate's OUTPUT derives every value from file
    * CONTENT, never from paths); pid keeps concurrent JVMs apart, and
    * the session token keeps a SECOND SparkSession in the same JVM
    * from mode("overwrite")-rewriting the exact path the first
    * session's memo still re-reads mid-aggregation. Every written
    * root is swept by one JVM shutdown hook — without it each
    * (pid, session) accumulates a full grid copy in java.io.tmpdir. */
  private val files3Paths = new SessionDirMemo[String]

  private val writtenLayoutRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private lazy val layoutSweepHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      // best-effort recursive delete shared with the bench's sweep —
      // one copy of the walk, one place to fix it
      writtenLayoutRoots.forEach(d => graft.Bench.deleteRecursively(d))
    }))

  /** Guaranteed-unique per-session token: identityHashCode is NOT
    * unique (two live sessions can collide, and a GC'd session's hash
    * can be reused — re-enabling the overwrite-while-reading hazard
    * the token exists to prevent), so each session draws a random
    * token once, held weakly so the map never pins sessions. */
  private val sessionTokens = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private def sessionToken(spark: SparkSession): String =
    sessionTokens.computeIfAbsent(spark,
      _ => java.util.UUID.randomUUID().toString.replace("-", "").take(12))

  /** Session-unique path component + exit-sweep registration for a
    * written-layout root. */
  private def layoutRoot(spark: SparkSession, stem: String, dir: String): String = {
    layoutSweepHook
    val p = s"${sys.props("java.io.tmpdir")}/$stem-" +
      s"${ProcessHandle.current().pid()}-" +
      s"s${sessionToken(spark)}-" +
      dir.replaceAll("[^A-Za-z0-9._-]", "_")
    writtenLayoutRoots.add(p)
    p
  }

  /** Per-FILE statistics of a tile-aligned 3-D-clustered physical
    * write of the events grid — the driver-gate proof that
    * `Formats.writeCurveClusteredAlignedN`'s file-skipping contract
    * holds on disk, not only in the key math ([[zorder3Tiles]] gates
    * the key; THIS gates the write path): rows are physically written,
    * read back, and grouped by `input_file_name()` — the actual file
    * boundary — with each file labeled by the aligned tile its CONTENT
    * occupies (`min(curveKey) div KeysPerFile3`). If the writer ever
    * mixed two tiles into one file, that file's row count and bbox
    * absorb both tiles and the hash gate goes red; if it split one
    * tile across two files, two output rows carry the same fid and the
    * row count goes red. The DuckDB oracle replays the assignment as a
    * pure function of the row — fid = curveKey // KeysPerFile3 — which
    * is exactly the determinism the aligned writer guarantees and the
    * sampled writeZOrderedN cannot.
    *
    * Scale shape: one clustered write of the projected grid (the same
    * one range-free shuffle any clustered rewrite costs, amortized
    * across runs by the memo), then a scan of the written files with a
    * map-side-combined aggregate to |files| rows. */
  private def files3(spark: SparkSession, dir: String, curve: String,
      key: Seq[Column] => Column): DataFrame = {
    val path = files3Paths(spark, s"$dir#$curve") {
      val p = layoutRoot(spark, s"graft-layout3files-$curve", dir)
      graft.sources.Formats.writeCurveClusteredAlignedN(
        dims3(spark, dir), p, Seq("pa", "pb", "pc"), GridBits3,
        KeysPerFile3, key)
      p
    }
    spark.read.parquet(path)
      .withColumn("k", key(Seq(col("pa"), col("pb"), col("pc"))))
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("pa")).as("mn_a"), max(col("pa")).as("mx_a"),
        min(col("pb")).as("mn_b"), max(col("pb")).as("mx_b"),
        min(col("pc")).as("mn_c"), max(col("pc")).as("mx_c"),
        min(col("k")).as("mn_k"))
      .select(expr(s"mn_k div ${KeysPerFile3}L").as("fid"), col("n_rows"),
        col("mn_a"), col("mx_a"), col("mn_b"), col("mx_b"),
        col("mn_c"), col("mx_c"),
        ((col("mx_a") - col("mn_a") + lit(1)) *
          (col("mx_b") - col("mn_b") + lit(1)) *
          (col("mx_c") - col("mn_c") + lit(1))).as("bbox_cells"))
  }

  /** [[files3]] on the Morton key. */
  def zorder3Files(spark: SparkSession, dir: String): DataFrame =
    files3(spark, dir, "zorder", qs => zOrderKeyN(qs: _*))

  /** Keys per file for the 2-D aligned clustered write: 4^8, so the
    * 1024² lineitem grid lands in 16 files and every file's key range
    * is an aligned block of eight quadrant-recursion levels — an exact
    * 256×256 subsquare. */
  val KeysPerFile2 = 65536L

  /** 2-D twin of [[files3]] over the lineitem (l_partkey, l_suppkey)
    * grid on the native ZOrder2 key — same write-path contract, same
    * content-derived file labeling, same DuckDB replay (the spreadCtes
    * interleave that already gates the tile math). */
  def zorder2Files(spark: SparkSession, dir: String): DataFrame = {
    val key = (qs: Seq[Column]) => zOrderKey(qs(0), qs(1))
    val path = files3Paths(spark, s"$dir#zorder2") {
      val p = layoutRoot(spark, "graft-layout2files-zorder", dir)
      graft.sources.Formats.writeCurveClusteredAlignedN(
        Tables.lineitem(spark, dir)
          .select(pmod(col("l_partkey"), lit(GridCells)).as("pa"),
            pmod(col("l_suppkey"), lit(GridCells)).as("pb")),
        p, Seq("pa", "pb"),
        java.lang.Long.numberOfTrailingZeros(GridCells), KeysPerFile2, key)
      p
    }
    spark.read.parquet(path)
      .withColumn("k", key(Seq(col("pa"), col("pb"))))
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("pa")).as("mn_a"), max(col("pa")).as("mx_a"),
        min(col("pb")).as("mn_b"), max(col("pb")).as("mx_b"),
        min(col("k")).as("mn_k"))
      .select(expr(s"mn_k div ${KeysPerFile2}L").as("fid"), col("n_rows"),
        col("mn_a"), col("mx_a"), col("mn_b"), col("mx_b"),
        ((col("mx_a") - col("mn_a") + lit(1)) *
          (col("mx_b") - col("mn_b") + lit(1))).as("bbox_cells"))
  }

  /** [[files3]] on the Skilling n-D Hilbert walk. */
  def hilbert3Files(spark: SparkSession, dir: String): DataFrame =
    files3(spark, dir, "hilbert", qs => hilbertKeyN(GridBits3, qs: _*))

  /** Output files the compaction plan targets. */
  val CompactionFiles = 16L

  /** Small-file compaction plan over the z-clustered tiles — the
    * `OPTIMIZE` binpack step a lakehouse table needs after streaming
    * ingest litters it with small files: assign z-ADJACENT tiles to
    * output files of ~total/16 rows each by greedy cumulative fill.
    * Because the assignment is monotone in z, every output file covers
    * one CONTIGUOUS z-range — compaction never un-clusters the layout,
    * so the min/max pruning zorderTiles proves is preserved (the
    * property LayoutSpec asserts as non-overlapping file ranges).
    *
    * Scale shape: the corpus pays only zorderTiles' scan + one
    * map-side-combined aggregate to |tiles| rows; the cumulative and
    * the binning run over that bounded ≤256-row frame (tiles, never
    * rows), with the 1-row total broadcast in. */
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tiles = zorderTiles(spark, dir).select(col("tile"), col("n_rows"))
    val tot = tiles.agg(sum(col("n_rows")).as("total"))
    val w = Window.orderBy(col("tile"))
      .rowsBetween(Window.unboundedPreceding, 0)
    tiles.crossJoin(broadcast(tot))
      .withColumn("target",
        expr(s"(total + $CompactionFiles - 1) div $CompactionFiles"))
      .withColumn("cum", sum(col("n_rows")).over(w))
      .withColumn("out_file", expr("(cum - n_rows) div target"))
      .groupBy(col("out_file"))
      .agg(count(lit(1)).as("n_tiles"), sum(col("n_rows")).as("n_rows"),
        min(col("tile")).as("tile_min"), max(col("tile")).as("tile_max"))
  }

  /** Written partition-pruned corpus roots, one per (session, dir). */
  private val dppPaths = new SessionDirMemo[String]

  /** Dynamic-partition-pruning driver gate: the documents corpus
    * physically PARTITIONED by `lang` (the curated-output layout
    * `Formats.writeCuratedParquet` produces), joined to a file-backed
    * dimension whose selective predicate (`verdict = 'keep'`, true for
    * exactly the min lang) lives on a DIM attribute — the 100 TB shape
    * static pruning cannot touch and DPP turns into a runtime
    * partition filter on the fact scan (SourcesSpec pins the
    * `dynamicpruning` subquery in this exact plan; THIS query gates
    * the result through that partitioned+pruned path against DuckDB).
    * The dim must be file-backed: a literal LocalRelation
    * constant-folds its filter away and the DPP rule no longer sees a
    * selective predicate.
    *
    * TWO langs survive the dim filter (the two smallest, a bounded
    * 2-row driver pull), not one: the result is per-PARTITION grain —
    * one row per kept lang with that partition's row count, char sum,
    * and doc-id extrema — so the hash pins each read partition's
    * content individually. An r15 version kept one lang and emitted
    * one aggregate row; the widened gate catches a scan that prunes
    * too aggressively (a missing partition is a missing row, not a
    * luckily-identical aggregate), while the `dynamicpruning` plan pin
    * (BucketingSpec) still guards against the opposite failure of
    * silently reading everything.
    *
    * Scale shape: the fact side reads only the kept lang partitions
    * (runtime pruning, no full scan), the dim broadcasts, and the
    * aggregate is map-side combined to |kept langs| rows. The write is
    * a once-per-generation artifact (memoized, swept on exit) exactly
    * like the curve-clustered layouts above. */
  def dppJoin(spark: SparkSession, dir: String): DataFrame = {
    val base = dppPaths(spark, dir) {
      val p = layoutRoot(spark, "graft-layout-dpp", dir)
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      graft.sources.Formats.writeCuratedParquet(docs, s"$p/fact", "lang")
      // bounded driver pull: the two smallest langs
      val kept = Tables.documents(spark, dir).select(col("lang")).distinct()
        .orderBy(col("lang")).limit(2).collect().map(_.getString(0)).toSeq
      Tables.documents(spark, dir).select(col("lang")).distinct()
        .withColumn("verdict",
          when(col("lang").isin(kept: _*), lit("keep")).otherwise(lit("drop")))
        .write.mode("overwrite").parquet(s"$p/dim")
      p
    }
    val fact = spark.read.parquet(s"$base/fact")
    val dim = spark.read.parquet(s"$base/dim")
      .filter(col("verdict") === "keep")
    fact.join(dim, Seq("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
  }

  /** Child session carrying the runtime bloom-filter confs, one per
    * parent session (weakly held — the memo never pins a session).
    * The confs must be session-scoped because registration hands the
    * DataFrame back to a caller that sets nothing: floored thresholds
    * plus a disabled broadcast would rewrite every OTHER query's plan
    * if set on the shared session, and Spark resolves optimizer confs
    * at execution, not at DataFrame construction — so the query builds
    * against its own session and the confs ride with it. newSession()
    * shares the SparkContext and inherits the builder-level confs
    * (shuffle partitions, timezone, local.dir) from the shared
    * SparkConf; only the four bloom knobs diverge. */
  private val bloomSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, SparkSession]())
  private def bloomSession(spark: SparkSession): SparkSession =
    bloomSessions.computeIfAbsent(spark, parent => {
      val s = parent.newSession()
      // the injection gate: build a bloom from the FILTERED dim keys
      // (creation side must be under its threshold) and row-prune the
      // fact scan before its shuffle (application side must clear its
      // scan threshold — floored, since sf0.01/sf0.1 sit far below the
      // 10 GB production default). Broadcast is disabled because a
      // broadcast-hash join already sees only matching rows — the
      // bloom pattern exists precisely for the dim too big to
      // broadcast, which is what -1 simulates at test scale.
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s
    })

  /** Runtime bloom-filter pruning driver gate — the row-level sibling
    * of [[dppJoin]]: a selective predicate on a DIM attribute
    * (`o_orderpriority = '1-URGENT'`, ~1/5 of orders) prunes the FACT
    * scan side at runtime via Spark's InjectRuntimeFilter — a bloom
    * built from the filtered dim's join keys, applied as
    * `might_contain` on `l_orderkey` BEFORE the fact's shuffle. At
    * 100 TB this is the difference between shuffling the whole fact
    * table and shuffling the ~matching fraction when the dim is too
    * big to broadcast. BucketingSpec pins the `might_contain` plan
    * shape on this exact registered query; THIS query gates the
    * RESULT through the injected-filter plan against DuckDB — a bloom
    * false-positive leaking through the equi-join, or a false
    * negative dropping a matching row, both hash-fail. Per-group
    * grain (returnflag × linestatus with count/sum/extrema), not one
    * aggregate row, for the same reason dppJoin widened. */
  def bloomPruneJoin(spark: SparkSession, dir: String): DataFrame = {
    val s = bloomSession(spark)
    val fact = Tables.lineitem(s, dir)
    val dim = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"),
        min(col("l_orderkey")).as("min_ok"),
        max(col("l_orderkey")).as("max_ok"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_dpp_join" -> ((s, d) => dppJoin(s, d)),
    "layout_bloom_prune_join" -> ((s, d) => bloomPruneJoin(s, d)),
    "layout_zorder_tiles" -> ((s, d) => zorderTiles(s, d)),
    "layout_skipping_report" -> ((s, d) => skippingReport(s, d)),
    "layout_zorder3_tiles" -> ((s, d) => zorder3Tiles(s, d)),
    "layout_hilbert_tiles" -> ((s, d) => hilbertTiles(s, d)),
    "layout_hilbert3_tiles" -> ((s, d) => hilbert3Tiles(s, d)),
    "layout_zorder3_files" -> ((s, d) => zorder3Files(s, d)),
    "layout_hilbert3_files" -> ((s, d) => hilbert3Files(s, d)),
    "layout_zorder2_files" -> ((s, d) => zorder2Files(s, d)),
    "layout_compaction_plan" -> ((s, d) => compactionPlan(s, d)))

  /** Bit planes in the Hilbert walk = log2(GridCells) — derived, not
    * hardcoded, so resizing the grid can't desynchronize the oracle
    * from HashOps.hilbert2 (which derives its rounds the same way). */
  private val HilbertRounds: Int =
    java.lang.Long.numberOfTrailingZeros(GridCells)

  /** The xy2d walk unrolled: one CTE per bit plane, s = GridCells/2 … 1,
    * state columns suffixed per round (no lateral-alias capture), flip
    * constant n−1 = ${GridCells − 1}. Mirrors HashOps.hilbert2 exactly. */
  private val hilbertCtes: String = {
    val rounds = (0 until HilbertRounds).map { i =>
      val s = GridCells >> (i + 1)
      val (x, y, d) = (s"x$i", s"y$i", s"d$i")
      val rx = s"(CASE WHEN ($x & $s) != 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN ($y & $s) != 0 THEN 1 ELSE 0 END)"
      s"""h${i + 1} AS (SELECT pa, pb,
         |  CASE WHEN ($y & $s) = 0 THEN (CASE WHEN ($x & $s) != 0
         |    THEN ${GridCells - 1} - $y ELSE $y END) ELSE $x END AS x${i + 1},
         |  CASE WHEN ($y & $s) = 0 THEN (CASE WHEN ($x & $s) != 0
         |    THEN ${GridCells - 1} - $x ELSE $x END) ELSE $y END AS y${i + 1},
         |  $d + $s * $s * xor(3 * $rx, $ry) AS d${i + 1}
         |  FROM h$i)""".stripMargin
    }
    s"h0 AS (SELECT pa, pb, pa AS x0, pb AS y0, 0::BIGINT AS d0 FROM b),\n" +
      rounds.mkString(",\n")
  }

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

  // the five dilation rounds of the standard 21-bit 3-D Morton spread
  // (bit j → bit 3j), mask constants in decimal (0x1FFFFF,
  // 0x1F00000000FFFF, 0x1F0000FF0000FF, 0x100F00F00F00F00F,
  // 0x10C30C30C30C30C3, 0x1249249249249249) — value-identical to
  // HashOps.zorderN's generic loop at k=3, proven in HashExpressionsSpec
  private def spread3Sql(c: String): Seq[String] = Seq(
    s"($c & 2097151)",
    s"(($c | ($c << 32)) & 8725724278095871)",
    s"(($c | ($c << 16)) & 8725728556220671)",
    s"(($c | ($c << 8)) & 1157144660301377551)",
    s"(($c | ($c << 4)) & 1207822528635744451)",
    s"(($c | ($c << 2)) & 1317624576693539401)")

  private val spread3Ctes: String = {
    val steps = (0 until 6).map { i =>
      s"t${i + 1} AS (SELECT pa, pb, pc, ${spread3Sql("za")(i)} AS za, " +
        s"${spread3Sql("zb")(i)} AS zb, ${spread3Sql("zc")(i)} AS zc FROM t$i)"
    }.mkString(",\n")
    s"""t0 AS (SELECT pa, pb, pc, pa AS za, pb AS zb, pc AS zc FROM b),
       |$steps""".stripMargin
  }

  /** Skilling's walk unrolled for the 3-D Hilbert oracle — mirrors
    * HashOps.hilbertN exactly (proven identical to this simultaneous
    * per-step formulation over the full 128³ grid in
    * HashExpressionsSpec). Dimension 0 is the accumulator dimension of
    * the inverse-undo step; its own step's else-branch is a no-op
    * (t = (x0 ^ x0) & p = 0), so only the flip survives. State columns
    * are suffixed per step (hilbertCtes' "no lateral-alias capture"
    * discipline) so each CTE unambiguously reads the PREVIOUS step's
    * values — exactly the algorithm's use of the pre-update x0 for
    * both halves of the exchange step — without depending on the
    * engine's alias-precedence rules. */
  private val hilbert3Ctes: String = {
    val buf = Seq.newBuilder[String]
    var s = 0
    def x(c: Int) = s"x${c}_$s" // current step's state column names
    buf += s"g0 AS (SELECT pa, pb, pc, pa AS ${x(0)}, pb AS ${x(1)}, pc AS ${x(2)} FROM b)"
    val planes = (1 until GridBits3).map(j => 1L << j).reverse // 64 … 2
    for (q <- planes) {
      val p = q - 1
      val (a0, a1, a2) = (x(0), x(1), x(2))
      s += 1
      buf += s"""g$s AS (SELECT pa, pb, pc,
         |  CASE WHEN ($a0 & $q) != 0 THEN xor($a0, $p) ELSE $a0 END AS ${x(0)},
         |  $a1 AS ${x(1)}, $a2 AS ${x(2)} FROM g${s - 1})""".stripMargin
      val (b0, b1, b2) = (x(0), x(1), x(2))
      s += 1
      buf += s"""g$s AS (SELECT pa, pb, pc,
         |  CASE WHEN ($b1 & $q) != 0 THEN xor($b0, $p)
         |       ELSE xor($b0, (xor($b0, $b1) & $p)) END AS ${x(0)},
         |  CASE WHEN ($b1 & $q) != 0 THEN $b1
         |       ELSE xor($b1, (xor($b0, $b1) & $p)) END AS ${x(1)},
         |  $b2 AS ${x(2)} FROM g${s - 1})""".stripMargin
      val (c0, c1, c2) = (x(0), x(1), x(2))
      s += 1
      buf += s"""g$s AS (SELECT pa, pb, pc,
         |  CASE WHEN ($c2 & $q) != 0 THEN xor($c0, $p)
         |       ELSE xor($c0, (xor($c0, $c2) & $p)) END AS ${x(0)},
         |  $c1 AS ${x(1)},
         |  CASE WHEN ($c2 & $q) != 0 THEN $c2
         |       ELSE xor($c2, (xor($c0, $c2) & $p)) END AS ${x(2)} FROM g${s - 1})""".stripMargin
    }
    // Gray encode across dimensions (x2 reads the UPDATED x1 = x1^x0)
    val (d0, d1, d2) = (x(0), x(1), x(2))
    s += 1
    buf += s"""g$s AS (SELECT pa, pb, pc, $d0 AS ${x(0)},
       |  xor($d1, $d0) AS ${x(1)}, xor($d2, xor($d1, $d0)) AS ${x(2)} FROM g${s - 1})""".stripMargin
    // parity fold off the last dimension, applied to every coordinate
    val (e0, e1, e2) = (x(0), x(1), x(2))
    val tExpr = planes
      .map(q => s"(CASE WHEN ($e2 & $q) != 0 THEN ${q - 1} ELSE 0 END)")
      .reduce((a, b) => s"xor($a, $b)")
    s += 1
    buf += s"g$s AS (SELECT pa, pb, pc, $e0, $e1, $e2, $tExpr AS t FROM g${s - 1})"
    s += 1
    buf += s"""g$s AS (SELECT pa, pb, pc,
       |  xor($e0, t) AS za0, xor($e1, t) AS zb0, xor($e2, t) AS zc0 FROM g${s - 1})""".stripMargin
    // transpose = 3-way interleave, dimension 0 in the HIGH lane;
    // spread rounds suffixed for the same no-alias-capture reason
    val spreads = (0 until 6).map { r =>
      val src = if (r == 0) s"g$s" else s"u$r"
      s"u${r + 1} AS (SELECT pa, pb, pc, ${spread3Sql(s"za$r")(r)} AS za${r + 1}, " +
        s"${spread3Sql(s"zb$r")(r)} AS zb${r + 1}, " +
        s"${spread3Sql(s"zc$r")(r)} AS zc${r + 1} FROM $src)"
    }
    (buf.result() ++ spreads).mkString(",\n")
  }

  val oracle: Map[String, String] = Map(
    "layout_bloom_prune_join" ->
      """SELECT l.l_returnflag AS l_returnflag,
        |       l.l_linestatus AS l_linestatus,
        |       count(*)::BIGINT AS n_items,
        |       sum(l.l_quantity) AS sum_qty,
        |       min(l.l_orderkey) AS min_ok, max(l.l_orderkey) AS max_ok
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "layout_dpp_join" ->
      """WITH kept AS (
        |  SELECT lang FROM (SELECT DISTINCT lang FROM documents)
        |  ORDER BY lang LIMIT 2
        |),
        |dim AS (
        |  SELECT lang,
        |         CASE WHEN lang IN (SELECT lang FROM kept)
        |              THEN 'keep' ELSE 'drop' END AS verdict
        |  FROM (SELECT DISTINCT lang FROM documents)
        |)
        |SELECT d.lang AS lang, count(*)::BIGINT AS n_docs,
        |       sum(length(d.text))::BIGINT AS chars,
        |       min(d.doc_id) AS min_doc, max(d.doc_id) AS max_doc
        |FROM documents d JOIN dim ON d.lang = dim.lang
        |WHERE dim.verdict = 'keep'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "layout_hilbert3_tiles" ->
      s"""WITH b AS ($dims3Sql),
         |$hilbert3Ctes,
         |z AS (SELECT pa, pb, pc,
         |    ((za6 << 2) | (zb6 << 1) | zc6) // $TileKeys3 AS tile FROM u6)
         |SELECT tile, count(*)::BIGINT AS n_rows,
         |  min(pa) AS mn_a, max(pa) AS mx_a, min(pb) AS mn_b, max(pb) AS mx_b,
         |  min(pc) AS mn_c, max(pc) AS mx_c,
         |  (max(pa) - min(pa) + 1) * (max(pb) - min(pb) + 1)
         |    * (max(pc) - min(pc) + 1) AS bbox_cells
         |FROM z GROUP BY tile ORDER BY tile""".stripMargin,
    "layout_zorder3_tiles" ->
      s"""WITH b AS ($dims3Sql),
         |$spread3Ctes,
         |z AS (SELECT pa, pb, pc,
         |    (za | (zb << 1) | (zc << 2)) // $TileKeys3 AS tile FROM t6)
         |SELECT tile, count(*)::BIGINT AS n_rows,
         |  min(pa) AS mn_a, max(pa) AS mx_a, min(pb) AS mn_b, max(pb) AS mx_b,
         |  min(pc) AS mn_c, max(pc) AS mx_c,
         |  (max(pa) - min(pa) + 1) * (max(pb) - min(pb) + 1)
         |    * (max(pc) - min(pc) + 1) AS bbox_cells
         |FROM z GROUP BY tile ORDER BY tile""".stripMargin,
    "layout_zorder3_files" ->
      s"""WITH b AS ($dims3Sql),
         |$spread3Ctes,
         |z AS (SELECT pa, pb, pc,
         |    (za | (zb << 1) | (zc << 2)) // $KeysPerFile3 AS fid FROM t6)
         |SELECT fid, count(*)::BIGINT AS n_rows,
         |  min(pa) AS mn_a, max(pa) AS mx_a, min(pb) AS mn_b, max(pb) AS mx_b,
         |  min(pc) AS mn_c, max(pc) AS mx_c,
         |  (max(pa) - min(pa) + 1) * (max(pb) - min(pb) + 1)
         |    * (max(pc) - min(pc) + 1) AS bbox_cells
         |FROM z GROUP BY fid ORDER BY fid""".stripMargin,
    "layout_hilbert3_files" ->
      s"""WITH b AS ($dims3Sql),
         |$hilbert3Ctes,
         |z AS (SELECT pa, pb, pc,
         |    ((za6 << 2) | (zb6 << 1) | zc6) // $KeysPerFile3 AS fid FROM u6)
         |SELECT fid, count(*)::BIGINT AS n_rows,
         |  min(pa) AS mn_a, max(pa) AS mx_a, min(pb) AS mn_b, max(pb) AS mx_b,
         |  min(pc) AS mn_c, max(pc) AS mx_c,
         |  (max(pa) - min(pa) + 1) * (max(pb) - min(pb) + 1)
         |    * (max(pc) - min(pc) + 1) AS bbox_cells
         |FROM z GROUP BY fid ORDER BY fid""".stripMargin,
    "layout_zorder2_files" ->
      s"""WITH b AS (SELECT (l_partkey % $GridCells)::BIGINT AS pa,
         |    (l_suppkey % $GridCells)::BIGINT AS pb FROM lineitem),
         |$spreadCtes,
         |z AS (SELECT pa, pb, (za | (zb << 1)) // $KeysPerFile2 AS fid FROM s5)
         |SELECT fid, count(*)::BIGINT AS n_rows,
         |  min(pa) AS mn_a, max(pa) AS mx_a, min(pb) AS mn_b, max(pb) AS mx_b,
         |  (max(pa) - min(pa) + 1) * (max(pb) - min(pb) + 1) AS bbox_cells
         |FROM z GROUP BY fid ORDER BY fid""".stripMargin,
    "layout_zorder_tiles" ->
      s"""WITH b AS (SELECT (l_partkey % $GridCells)::BIGINT AS pa,
         |    (l_suppkey % $GridCells)::BIGINT AS pb FROM lineitem),
         |$spreadCtes,
         |z AS (SELECT pa, pb, (za | (zb << 1)) // $TileKeys AS tile FROM s5)
         |SELECT tile, count(*)::BIGINT AS n_rows,
         |  min(pa) AS mn_a, max(pa) AS mx_a, min(pb) AS mn_b, max(pb) AS mx_b,
         |  (max(pa) - min(pa) + 1) * (max(pb) - min(pb) + 1) AS bbox_cells
         |FROM z GROUP BY tile ORDER BY tile""".stripMargin,
    "layout_hilbert_tiles" ->
      s"""WITH b AS (SELECT (l_partkey % $GridCells)::BIGINT AS pa,
         |    (l_suppkey % $GridCells)::BIGINT AS pb FROM lineitem),
         |$hilbertCtes,
         |z AS (SELECT pa, pb, d$HilbertRounds // $TileKeys AS tile FROM h$HilbertRounds)
         |SELECT tile, count(*)::BIGINT AS n_rows,
         |  min(pa) AS mn_a, max(pa) AS mx_a, min(pb) AS mn_b, max(pb) AS mx_b,
         |  (max(pa) - min(pa) + 1) * (max(pb) - min(pb) + 1) AS bbox_cells
         |FROM z GROUP BY tile ORDER BY tile""".stripMargin,
    // closed-form skipping stats from per-tile min/max — the same
    // tile CTEs as the two curve queries plus the row-major baseline
    "layout_skipping_report" -> {
      def layerSql(name: String, tileSrc: String): String =
        s"""SELECT '$name' AS layout, count(*)::BIGINT AS n_tiles,
           |  (sum((mx_a - mn_a + 1) * (mx_b - mn_b + 1))::BIGINT * 1000)
           |    // ${GridCells * GridCells} AS point_avg_milli,
           |  (sum(mx_a - mn_a + 1)::BIGINT * 1000) // $GridCells AS a_sel_avg_milli,
           |  (sum(mx_b - mn_b + 1)::BIGINT * 1000) // $GridCells AS b_sel_avg_milli
           |FROM (SELECT tile, min(pa) AS mn_a, max(pa) AS mx_a,
           |    min(pb) AS mn_b, max(pb) AS mx_b FROM $tileSrc GROUP BY tile)""".stripMargin
      s"""WITH b AS (SELECT (l_partkey % $GridCells)::BIGINT AS pa,
         |    (l_suppkey % $GridCells)::BIGINT AS pb FROM lineitem),
         |$spreadCtes,
         |zt AS (SELECT pa, pb, (za | (zb << 1)) // $TileKeys AS tile FROM s5),
         |$hilbertCtes,
         |ht AS (SELECT pa, pb, d$HilbertRounds // $TileKeys AS tile FROM h$HilbertRounds),
         |rt AS (SELECT pa, pb, (pa * $GridCells + pb) // $TileKeys AS tile FROM b)
         |${layerSql("hilbert", "ht")}
         |UNION ALL ${layerSql("rowmajor", "rt")}
         |UNION ALL ${layerSql("zorder", "zt")}
         |ORDER BY layout""".stripMargin
    },
    "layout_compaction_plan" ->
      s"""WITH b AS (SELECT (l_partkey % $GridCells)::BIGINT AS pa,
         |    (l_suppkey % $GridCells)::BIGINT AS pb FROM lineitem),
         |$spreadCtes,
         |z AS (SELECT (za | (zb << 1)) // $TileKeys AS tile FROM s5),
         |t AS (SELECT tile, count(*)::BIGINT AS n_rows FROM z GROUP BY 1),
         |tot AS (SELECT sum(n_rows)::BIGINT AS total FROM t),
         |c AS (SELECT tile, n_rows,
         |    sum(n_rows) OVER (ORDER BY tile
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
         |    (tot.total + $CompactionFiles - 1) // $CompactionFiles AS target
         |  FROM t, tot)
         |SELECT (cum - n_rows) // target AS out_file,
         |  count(*)::BIGINT AS n_tiles, sum(n_rows)::BIGINT AS n_rows,
         |  min(tile) AS tile_min, max(tile) AS tile_max
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)
}
