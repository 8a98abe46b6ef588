package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Uniform declared-schema readers/writers for the batch formats a
  * training-data pipeline ingests and curates (JSON-lines lives in
  * JsonSource): CSV for interchange, ORC/Parquet for columnar at-rest.
  * Same contract as JsonSource: schemas are declared, never inferred
  * (inference costs a full extra pass — at 100 TB that doubles the
  * read), and malformed records either fail loudly (FAILFAST) or land
  * capturable in `_corrupt_record` — never silent null-filled rows.
  */
object Formats {

  /** CSV with declared schema; strict = FAILFAST on malformed rows,
    * permissive = malformed rows captured in `_corrupt_record`.
    * multiLine handles quoted embedded newlines (document text!) —
    * Spark's default line-split read would shred such records. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      failOnMalformed: Boolean, header: Boolean = true): DataFrame = {
    val full = if (failOnMalformed) schema else schema.add("_corrupt_record", "string")
    spark.read.schema(full)
      .option("header", header)
      .option("multiLine", true)
      .option("mode", if (failOnMalformed) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header).csv(path)

  /** ORC with a declared schema — ORC is self-describing, so the
    * declared schema acts as validation (a silently renamed/retyped
    * upstream column errors instead of flowing through). */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Curated-output writer: partitioned by a low-cardinality column so
    * downstream scans prune partitions (the layout a cleaned corpus
    * should land in — partition pruning is free filtering at 100 TB). */
  def writeCuratedParquet(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Range-clustered parquet layout: rows range-partitioned and sorted
    * on `clusterCol`, so each output file owns a disjoint value range.
    * Parquet row-group min/max stats then let ANY engine skip whole
    * files on a `clusterCol` predicate — data skipping is the cheapest
    * filter there is at 100 TB (no read beats a fast read). The 1-D
    * cousin of Z-ordering; use the Z-curve when two+ columns need it. */
  def writeRangeClustered(df: DataFrame, path: String, clusterCol: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, df(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(path)

  /** Compact a parquet dataset to ~`targetMB`-sized files — the
    * small-files repair every long-lived table needs (a table landed by
    * thousands of streaming micro-batches pays per-file open/footer
    * costs that dwarf the actual read; object stores throttle the
    * request storm on top). Output file count comes from the on-disk
    * byte size; `coalesce` narrows without a shuffle when shrinking.
    * Returns the output file count. */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
      targetMB: Int = 256): Int = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    // ceiling: a 511 MB input at target 256 must be 2 files, not one 511
    val nFiles = math.max(1,
      ((bytes + targetMB.toLong * 1024 * 1024 - 1) / (targetMB.toLong * 1024 * 1024)).toInt)
    val df = spark.read.parquet(inPath)
    // coalesce only shrinks; growing the file count (few huge inputs)
    // needs the shuffle — compaction is a rare maintenance pass
    val sized = if (nFiles <= df.rdd.getNumPartitions) df.coalesce(nFiles)
      else df.repartition(nFiles)
    sized.write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Morton/Z-value: interleave the low `bits` bits of two NON-NEGATIVE
    * integer columns (a in the odd positions). Runs on the native
    * fused ZOrder2 expression (functions/HashExpressions.scala — five
    * shift-mask dilation rounds in one codegen call, vs the 2·bits
    * composed bitwise ops this used to expand to); inputs are masked
    * to `bits` bits to keep the historical truncation contract, and
    * ZOrder2's (even, odd) convention is swapped to preserve this
    * function's a-in-odd-positions output bit-for-bit. */
  def zValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.graft.ColumnBridge
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = lit((1L << bits) - 1)
    ColumnBridge.column(graft.functions.ZOrder2(
      ColumnBridge.expression(b.cast("long").bitwiseAND(mask)),
      ColumnBridge.expression(a.cast("long").bitwiseAND(mask))))
  }

  /** Z-order-clustered parquet layout over TWO columns — the 2-D
    * upgrade of [[writeRangeClustered]]: rows are quantized per column
    * (uniform-width buckets from one cheap min/max agg; swap in
    * approxQuantile cuts for equi-depth on skewed data), Z-interleaved,
    * then range-partitioned and sorted on the Z-value. Every output
    * file owns a compact rectangle-ish region of (c1, c2) space, so
    * parquet min/max stats let any engine skip files on predicates
    * over EITHER column — 1-D clustering can only serve one of them.
    * The standard lakehouse layout trick (Delta/Iceberg OPTIMIZE
    * ZORDER), here as a plain-parquet primitive. */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
      numFiles: Int, bits: Int = 16): Unit =
    writeCurveClustered(df, path, c1, c2, numFiles, bits, zValue(_, _, bits))

  /** Hilbert value over two quantized NON-NEGATIVE columns on the
    * 2^bits × 2^bits grid (functions/HashExpressions.scala Hilbert2 —
    * see HashOps.hilbert2). */
  def hValue(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.graft.ColumnBridge
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val n = 1L << bits
    val mask = lit(n - 1)
    ColumnBridge.column(graft.functions.Hilbert2(
      ColumnBridge.expression(a.cast("long").bitwiseAND(mask)),
      ColumnBridge.expression(b.cast("long").bitwiseAND(mask)), n))
  }

  /** [[writeZOrdered]] on the Hilbert curve: same quantize → interleave
    * → range-partition → sort pipeline, but consecutive curve values
    * are always grid-adjacent, so file boundaries (ARBITRARY cuts of
    * the key range, not aligned tiles) enclose compact regions where
    * Morton cuts can straddle a seam jump. */
  def writeHilbertClustered(df: DataFrame, path: String, c1: String, c2: String,
      numFiles: Int, bits: Int = 16): Unit =
    writeCurveClustered(df, path, c1, c2, numFiles, bits, hValue(_, _, bits))

  /** [[writeZOrdered]] for ANY dimension count: the same NaN-safe
    * quantize → interleave → range-partition → sort pipeline over the
    * native ZOrderN expression, so a table clustered on (time, user,
    * type) prunes file reads on all three predicates. */
  def writeZOrderedN(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int, bits: Int = 16): Unit =
    writeCurveClusteredN(df, path, cols, numFiles, bits,
      qs => org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.ZOrderN(org.apache.spark.sql.graft.ColumnBridge
          .expression(org.apache.spark.sql.functions.array(qs: _*)))))

  /** [[writeHilbertClustered]] for ANY dimension count (Skilling n-D
    * walk — HashOps.hilbertN). */
  def writeHilbertClusteredN(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int, bits: Int = 16): Unit =
    writeCurveClusteredN(df, path, cols, numFiles, bits,
      qs => org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.HilbertN(org.apache.spark.sql.graft.ColumnBridge
          .expression(org.apache.spark.sql.functions.array(qs: _*)), bits)))

  private def writeCurveClusteredN(df: DataFrame, path: String,
      cols: Seq[String], numFiles: Int, bits: Int,
      key: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column): Unit = {
    import org.apache.spark.sql.functions._
    require(cols.size >= 2, "need at least two clustering columns")
    require(cols.size * bits <= 63,
      s"${cols.size} dims × $bits bits exceeds a positive long")
    // NaN poisons the quantizer silently (max() ranks NaN greatest, so
    // hi = NaN makes every row's bucket 0 and the advertised k-D bound
    // degrades) — strip NaN from the extent agg, pin NaN/null rows to
    // bucket 0 explicitly
    def clean(c: String) = {
      val d = col(c).cast("double")
      when(isnan(d), lit(null)).otherwise(d)
    }
    val aggs = cols.flatMap(c => Seq(min(clean(c)), max(clean(c))))
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    val buckets = (1L << bits) - 1
    val qs = cols.zipWithIndex.map { case (c, i) =>
      if (mm.isNullAt(2 * i) || mm.getDouble(2 * i + 1) == mm.getDouble(2 * i))
        lit(0L)
      else {
        val (lo, hi) = (mm.getDouble(2 * i), mm.getDouble(2 * i + 1))
        ((coalesce(clean(c), lit(lo)) - lit(lo)) / lit(hi - lo) * buckets)
          .cast("long")
      }
    }
    df.withColumn("__z", key(qs))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Tile-ALIGNED n-D clustered write over PRE-QUANTIZED long
    * dimensions: file boundaries sit at multiples of `keysPerFile`
    * along the curve instead of at sampled row-count cuts. Two
    * properties the sampled [[writeZOrderedN]] pipeline cannot give:
    *
    *  - when `keysPerFile` is a power of 8^k (3-D) / 4^k (2-D), every
    *    file's key range is an ALIGNED curve block = an exact
    *    subcube/subsquare of key space, so the per-file min/max
    *    bounding box is provably ≤ keysPerFile cells — the strongest
    *    file-skipping statistics a clustered layout can advertise;
    *  - the row→file assignment is a pure function of the row
    *    (`curveKey div keysPerFile`) — DETERMINISTIC across runs and
    *    replayable by any engine, where repartitionByRange's sampled
    *    boundaries shift with the sample. That replayability is what
    *    lets a correctness gate hash-match per-file statistics against
    *    an independent oracle.
    *
    * The cost of alignment is occupancy skew (tiles are equal in KEY
    * space, not row count); the sampled writer balances rows instead.
    * A lakehouse uses both: aligned tiles for hot dimensions that need
    * guaranteed pruning bounds, sampled cuts for balanced file sizes.
    *
    * One task per tile via an explicit partitioner (partition id =
    * file id) — the one place a custom RDD partitioner is the right
    * tool: no DataFrame repartitioning is value-exact (`repartition`
    * hashes, so two tiles can collide into one task and one FILE,
    * silently widening that file's bbox past the advertised bound;
    * `repartitionByRange` samples). Dims must already be in
    * [0, 2^bits) — quantize upstream (this is the writer a layout
    * pipeline calls AFTER its grid projection; [[writeZOrderedN]]
    * owns the raw-double quantize path). Empty tiles write no file. */
  def writeCurveClusteredAlignedN(df: DataFrame, path: String,
      dims: Seq[String], bits: Int, keysPerFile: Long,
      key: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column): Unit = {
    import org.apache.spark.sql.functions._
    require(dims.size >= 2, "need at least two clustering columns")
    require(dims.size * bits <= 63,
      s"${dims.size} dims × $bits bits exceeds a positive long")
    val totalKeys = 1L << (dims.size * bits)
    require(keysPerFile >= 1 && totalKeys % keysPerFile == 0,
      s"keysPerFile=$keysPerFile must divide the 2^${dims.size * bits}-key space")
    val nFiles = totalKeys / keysPerFile
    require(nFiles <= (1L << 20),
      s"$nFiles aligned tiles — raise keysPerFile (a million-file write " +
        "is a small-files bug, not a layout)")
    val spark = df.sparkSession
    val keyed = df
      .withColumn("__z", key(dims.map(col)))
      .withColumn("__fid", expr(s"__z div ${keysPerFile}L"))
    val schema = keyed.schema
    val fidIdx = schema.fieldIndex("__fid")
    val partitioned = keyed.rdd
      .map(r => (r.getLong(fidIdx), r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = nFiles.toInt
        // dims are required in [0, 2^bits), so fid is in [0, nFiles) by
        // construction; an out-of-range dim fails here loudly rather
        // than landing in a wrong file
        override def getPartition(k: Any): Int = k.asInstanceOf[Long].toInt
      })
      .values
    spark.createDataFrame(partitioned, schema)
      .sortWithinPartitions("__z")
      .drop("__z", "__fid")
      .write.mode("overwrite").parquet(path)
  }

  // the 2-D writers are the N-D pipeline at k = 2 — one quantizer, one
  // NaN discipline, one place to fix either
  private def writeCurveClustered(df: DataFrame, path: String, c1: String,
      c2: String, numFiles: Int, bits: Int,
      key: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Unit =
    writeCurveClusteredN(df, path, Seq(c1, c2), numFiles, bits,
      qs => key(qs(0), qs(1)))
}
