package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 deterministic trade-generator source — the reference's
  * mock/generator sources (/root/reference/old/gen.py:13-36 synthetic
  * feed: ~2000 products, price 1–1000, qty 1–100;
  * /root/reference/old/beam2.py:7-16 in-pipeline mock DoFn) rebuilt at
  * the Spark connector tier:
  *
  * {{{
  * spark.read.format("graft-trades").option("rows", 200000).load()
  * }}}
  *
  * Why a full TableProvider and not `spark.range(n).select(...)`: the
  * connector tier is where a REAL source (Kafka snapshot, archive
  * format) plugs in, and this implementation exercises the whole
  * contract a 100 TB source needs —
  *
  *  - '''partition planning''': the [0, rows) sequence range is split
  *    into `partitions` independent [[InputPartition]]s, so a
  *    1000-executor cluster reads 1000 splits in parallel (exactly how
  *    a file/offset-range source plans);
  *  - '''column pruning''' ([[SupportsPushDownRequiredColumns]]): the
  *    reader materializes ONLY projected columns — `.explain` shows
  *    the pruned ReadSchema, and e.g. a count over 2 columns never
  *    builds the other 4;
  *  - '''filter pushdown''' ([[SupportsPushDownFilters]]): range
  *    predicates on `seq` narrow the PLANNED ranges — partitions that
  *    fall wholly outside the bound are never scheduled (the DSv2
  *    analogue of parquet row-group/partition pruning). Other filters
  *    stay residual and Spark re-applies them.
  *
  * Determinism contract (the DuckDB oracle replays it from
  * `range(rows)`): every field derives from the row's sequence number
  * by the C-rand LCG step h(i,s) = ((i+s)·1103515245 + 12345) mod 2³¹
  * — pure BIGINT arithmetic, no overflow below i ≈ 8·10⁹, identical in
  * both engines (the repo-wide explicit-arithmetic rule; engine hash
  * builtins are never oracle-replayable).
  */
class GenTradesSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-trades"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenTradesSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenTradesTable(new CaseInsensitiveStringMap(properties))
}

object GenTradesSource {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  /** OHLCV-style rollup over the generated feed, read THROUGH the DSv2
    * connector (not a derived DataFrame): the scan in this plan carries
    * a pruned ReadSchema (4 of 6 columns) and a pushed seq-range that
    * shrank the planned partitions before scheduling. `dir` is unused —
    * the source is its own data. */
  def ohlcvByProduct(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft-trades").option("rows", 200000L).load()
      .where(col("seq") >= 50000L && col("seq") < 150000L)
      .groupBy(col("product"))
      .agg(
        min_by(col("price"), col("seq")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("seq")).as("close"),
        sum(col("qty")).as("volume"),
        count(lit(1)).as("n_trades"))
      .orderBy(col("product"))

  /** count/min/max(seq) answered INSIDE the connector (aggregate
    * pushdown): the plan carries no Aggregate operator and the source
    * generates zero wire rows — the metadata fast path (parquet
    * footers, Iceberg manifests) at the DSv2 tier, composed with the
    * pushed seq-range narrowing. */
  def feedStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.format("graft-trades").option("rows", 200000L).load()
      .where(col("seq") >= 50000L && col("seq") < 150000L)
      .agg(count(lit(1)).as("n_rows"),
        min(col("seq")).as("min_seq"), max(col("seq")).as("max_seq"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_gen_trades_stats" -> ((s, d) => feedStats(s, d)),
    "src_gen_trades_ohlcv" -> ((s, d) => ohlcvByProduct(s, d)))

  /** DuckDB replays the LCG from range(): identical BIGINT arithmetic,
    * identical rows — the oracle checks the connector's planning
    * (range narrowing included) produced exactly the declared feed. */
  val oracle: Map[String, String] = Map(
    "src_gen_trades_stats" ->
      """SELECT count(*)::BIGINT AS n_rows, min(range) AS min_seq,
        |  max(range) AS max_seq
        |FROM range(0, 200000) WHERE range >= 50000 AND range < 150000""".stripMargin,
    "src_gen_trades_ohlcv" ->
      """WITH g AS (
        |  SELECT range AS seq,
        |    'Product_' || ((((range + 3) * 1103515245 + 12345) % 2147483648) % 1999 + 1) AS product,
        |    ((((range + 1) * 1103515245 + 12345) % 2147483648) % 1000 + 1)::DOUBLE AS price,
        |    (((range + 2) * 1103515245 + 12345) % 2147483648) % 100 + 1 AS qty
        |  FROM range(0, 200000)
        |  WHERE range >= 50000 AND range < 150000)
        |SELECT product, arg_min(price, seq) AS open, max(price) AS high,
        |  min(price) AS low, arg_max(price, seq) AS close,
        |  sum(qty)::BIGINT AS volume, count(*)::BIGINT AS n_trades
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin)

  /** The reference's 5-field trade wire shape (SURVEY.md §1.1) plus the
    * generator's own sequence number; timestamps ride as epoch-ms
    * BIGINT exactly as on the reference wire. */
  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("timestamp", LongType, nullable = false),
    StructField("instrument_id", StringType, nullable = false),
    StructField("product", StringType, nullable = false),
    StructField("price", DoubleType, nullable = false),
    StructField("qty", LongType, nullable = false)))

  val DefaultRows = 100000L
  val BaseTs = 1723459200000L // 2024-08-12T10:40:00Z, the gen.py era

  /** One LCG step — the whole wire record derives from (seq, salt). */
  def h(i: Long, salt: Long): Long =
    ((i + salt) * 1103515245L + 12345L) % 2147483648L

  /** SQL table-valued-function form of the connector — `SELECT * FROM
    * gen_trades(100000)` — built by resolving the literal row count
    * into a DSv2 relation over [[GenTradesTable]] (same planning,
    * pruning, and pushdown as the reader path). Registered per-session
    * via ColumnBridge.registerTableFunction and cluster-wide via
    * GraftExtensions.injectTableFunction. */
  def tableFunctionBuilder(
      args: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val n = args match {
      case Seq(Literal(v: Long, LongType)) => v
      case Seq(Literal(v: Int, IntegerType)) => v.toLong
      case _ => throw new IllegalArgumentException(
        "gen_trades(rows) expects one integer literal")
    }
    val opts = new CaseInsensitiveStringMap(
      java.util.Map.of("rows", n.toString))
    org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
      .create(new GenTradesTable(opts), None, None)
  }

  /** Getter per field, resolved ONCE per partition reader — resolving
    * by name per row would put six string compares in the scan hot
    * path. */
  def fieldGetter(name: String): Long => Any = name match {
    case "seq" => i => i
    case "timestamp" => i => BaseTs + i * 500L
    case "instrument_id" => i => UTF8String.fromString("I" + h(i, 4) % 100L)
    case "product" => i => UTF8String.fromString("Product_" + (h(i, 3) % 1999L + 1L))
    case "price" => i => (h(i, 1) % 1000L + 1L).toDouble
    case "qty" => i => h(i, 2) % 100L + 1L
  }
}

class GenTradesTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_gen_trades"
  override def schema(): StructType = GenTradesSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ o.asScala).asJava)
    new GenTradesScanBuilder(merged)
  }
}

class GenTradesScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownOffset
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN {

  private val totalRows =
    options.asScala.getOrElse("rows", GenTradesSource.DefaultRows.toString).toLong
  private val numPartitions =
    options.asScala.getOrElse("partitions", "32").toInt
  require(totalRows >= 0, s"rows must be >= 0, got $totalRows")
  require(numPartitions > 0, s"partitions must be > 0, got $numPartitions")

  private var required: StructType = GenTradesSource.schema
  private var lo: Long = 0L
  private var hi: Long = totalRows // exclusive
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accept seq-range predicates by narrowing [lo, hi); everything else
    * is residual. Accepted filters MUST be fully applied by the range —
    * Spark re-evaluates only the residual it gets back, it does NOT
    * re-check accepted filters — so the boundary arithmetic saturates
    * instead of overflowing (seq > Long.MaxValue must yield the empty
    * range, not wrap to "all rows"). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // saturating exclusive-upper / inclusive-lower increments
    def succ(v: Long): Long = if (v == Long.MaxValue) Long.MaxValue else v + 1
    val (acc, residual) = filters.partition {
      case GreaterThan("seq", v: Long) =>
        if (v == Long.MaxValue) hi = lo else lo = math.max(lo, succ(v)); true
      case GreaterThanOrEqual("seq", v: Long) => lo = math.max(lo, v); true
      case LessThan("seq", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("seq", v: Long) => hi = math.min(hi, succ(v)); true
      case EqualTo("seq", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, succ(v)); true
      case _ => false
    }
    accepted = acc
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  // ---- aggregate pushdown ------------------------------------------------
  // COUNT(*), MIN(seq), MAX(seq) with no grouping are pure planning
  // arithmetic over the (already filter-narrowed) [lo, hi) range: the
  // source answers them WITHOUT generating a single row. This is the
  // statistics fast path every metadata-rich format has (parquet
  // footers, Iceberg manifests) expressed at the connector tier —
  // complete pushdown, so Spark plans no aggregate at all.
  private var pushedAggTags: Option[Seq[String]] = None

  private def translateAggs(agg: Aggregation): Option[Seq[String]] = {
    if (agg.groupByExpressions.nonEmpty) return None
    val tags = agg.aggregateExpressions.map {
      case _: CountStar => "count"
      case m: Min => m.column match {
        case f: NamedReference if f.fieldNames.sameElements(Array("seq")) => "min"
        case _ => return None
      }
      case m: Max => m.column match {
        case f: NamedReference if f.fieldNames.sameElements(Array("seq")) => "max"
        case _ => return None
      }
      case _ => return None
    }
    Some(tags.toSeq)
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translateAggs(agg).isDefined

  // ---- limit / offset / top-N pushdown -----------------------------------
  // The feed's storage order IS ascending seq, so LIMIT trims hi,
  // OFFSET advances lo, and a top-N sorted by seq (either direction)
  // is a range trim — the scan generates exactly the requested window
  // instead of rows for Spark to drop. All three return true = fully
  // handled; Spark plans no Limit/Offset/Sort over the scan.
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, if (lo > Long.MaxValue - limit) Long.MaxValue else lo + limit)
    true
  }
  override def isPartiallyPushed(): Boolean = false

  override def pushOffset(offset: Int): Boolean = {
    lo = math.min(hi, if (lo > Long.MaxValue - offset) Long.MaxValue else lo + offset)
    true
  }

  /** Top-N sorted by seq ASCENDING is exactly "first N of the window" —
    * the readers already emit ascending seq, so full pushdown holds.
    * DESCENDING is rejected (NOT mutated-then-rejected): the set would
    * be right but the emission order wrong, and a complete TopN push
    * promises sorted output. */
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.SortDirection
    val ascSeq = orders.length == 1 &&
      orders(0).direction() == SortDirection.ASCENDING &&
      (orders(0).expression() match {
        case f: NamedReference => f.fieldNames.sameElements(Array("seq"))
        case _ => false
      })
    if (ascSeq) pushLimit(limit) else false
  }

  override def pushAggregation(agg: Aggregation): Boolean =
    translateAggs(agg) match {
      case Some(tags) => pushedAggTags = Some(tags); true
      case None => false
    }

  private val rowsPerBatch =
    options.asScala.getOrElse("rowsPerBatch", "10000").toLong

  override def build(): Scan = pushedAggTags match {
    case Some(tags) => new GenTradesStatsScan(tags, lo, math.max(lo, hi))
    case None =>
      new GenTradesScan(required, lo, math.max(lo, hi), numPartitions,
        rowsPerBatch)
  }
}

/** One-row, one-partition scan answering a completely-pushed-down
  * aggregation from range arithmetic: count = hi−lo, min = lo,
  * max = hi−1 (min/max null on an empty range, count 0 — SQL
  * aggregate semantics). */
class GenTradesStatsScan(tags: Seq[String], lo: Long, hi: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(tags.zipWithIndex.map {
    case (t, i) => StructField(s"agg_$i", LongType, nullable = t != "count")
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-trades stats [$lo, $hi) PushedAggregates=[${tags.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GenTradesRange(0, 1)) // one token partition, one row
  override def createReaderFactory(): PartitionReaderFactory =
    new GenTradesStatsReaderFactory(tags, lo, hi)
}

class GenTradesStatsReaderFactory(tags: Seq[String], lo: Long, hi: Long)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val values: Array[Any] = tags.map {
      case "count" => (hi - lo): Any
      case "min" => if (hi > lo) lo: Any else null
      case "max" => if (hi > lo) (hi - 1): Any else null
    }.toArray
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = new GenericInternalRow(values)
      override def close(): Unit = ()
    }
  }
}

case class GenTradesRange(start: Long, end: Long) extends InputPartition

class GenTradesScan(
    required: StructType, lo: Long, hi: Long, numPartitions: Int,
    rowsPerBatch: Long = 10000L)
    extends Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {

  override def readSchema(): StructType = required

  // ---- runtime filtering (the DSv2 dynamic-pruning handshake) ----------
  // Spark hands the scan the build side's seq values AT EXECUTION TIME
  // (after planning); the scan narrows its planned ranges to their
  // envelope before any reader runs — the Iceberg partition-prune
  // mechanism. Pruning is best-effort for correctness (the join still
  // applies its condition), so the [min, max] envelope is safe and
  // keeps planInputPartitions arithmetic.
  private var rtLo: Long = lo
  private var rtHi: Long = hi

  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("seq"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case org.apache.spark.sql.sources.In("seq", vs) if vs.nonEmpty =>
      val longs = vs.collect { case l: Long => l }
      if (longs.nonEmpty) {
        rtLo = math.max(rtLo, longs.min)
        rtHi = math.min(rtHi, longs.max + 1)
      }
    case _ => // unsupported runtime filter: ignore (join re-checks)
  }

  /** Exact planning statistics from the (filter-narrowed) range — the
    * connector-tier equivalent of parquet footer counts. Reporting
    * them lets Catalyst make its OWN join-strategy call: a narrowed
    * feed under the broadcast threshold is broadcast automatically,
    * no hint needed (spec-proven). ~40 bytes/row: 3 longs + a double
    * + two short strings. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val n = math.max(0L, hi - lo)
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(n * 40L)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(n)
    }
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GenTradesMicroBatchStream(required, lo, hi, numPartitions, rowsPerBatch)
  override def description(): String =
    s"graft-trades [$lo, $hi) cols=${required.fieldNames.mkString(",")}"

  /** Even range splits — empty tails are simply not planned, the DSv2
    * analogue of partition pruning. Bounds come from the RUNTIME-
    * narrowed range (equal to the planning-time one unless a runtime
    * filter arrived). */
  override def planInputPartitions(): Array[InputPartition] = {
    val (l, h) = (rtLo, rtHi)
    val n = h - l
    if (n <= 0) return Array.empty
    val parts = math.min(numPartitions.toLong, n).toInt
    val step = (n + parts - 1) / parts
    (0 until parts).iterator
      .map(p => GenTradesRange(l + p * step, math.min(l + (p + 1) * step, h)))
      .filter(r => r.end > r.start)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GenTradesReaderFactory(required.fieldNames)
}

/** Stream position = next unread sequence number; serialized as its
  * decimal string (the Kafka-source offset-log pattern). */
case class GenTradesOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

/** The generator as a LIVE feed (the reference runs gen.py as a
  * standalone producer beside the pipeline — here the replay is the
  * connector's own streaming tier): each micro-batch advances the
  * sequence cursor by up to `rowsPerBatch`, planned as range splits
  * with the same reader the batch scan uses.
  *
  * Pacing goes through [[SupportsAdmissionControl]] — the Kafka-source
  * mechanism: the engine hands `latestOffset` the batch's START offset
  * plus a ReadLimit and the source answers with the capped end, so the
  * offset log never records rows a batch did not read (capping inside
  * planInputPartitions instead would silently drop the remainder of
  * every batch). Offsets restart from the checkpoint log via
  * deserializeOffset, so a recovered query resumes mid-sequence
  * without duplication — deterministic rows make that provable. */
class GenTradesMicroBatchStream(
    required: StructType, lo: Long, hi: Long, numPartitions: Int,
    rowsPerBatch: Long) extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = GenTradesOffset(lo)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rowsPerBatch)

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    import org.apache.spark.sql.connector.read.streaming.{ReadAllAvailable, ReadMaxRows}
    val s = startOffset.asInstanceOf[GenTradesOffset].pos
    // honor the ENGINE's limit, not only our default: Trigger.Once/
    // AvailableNow hand ReadAllAvailable expecting the whole feed in
    // one batch — capping it at rowsPerBatch would silently truncate
    val cap = limit match {
      case _: ReadAllAvailable => hi - s
      case m: ReadMaxRows => m.maxRows()
      case _ => rowsPerBatch
    }
    GenTradesOffset(math.min(s + math.max(cap, 0L), hi))
  }

  // legacy no-admission-control path: everything available
  override def latestOffset(): Offset = GenTradesOffset(hi)

  override def reportLatestOffset(): Offset = GenTradesOffset(hi)

  override def deserializeOffset(json: String): Offset =
    GenTradesOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    new GenTradesScan(required,
      start.asInstanceOf[GenTradesOffset].pos,
      end.asInstanceOf[GenTradesOffset].pos, numPartitions)
      .planInputPartitions()

  override def createReaderFactory(): PartitionReaderFactory =
    new GenTradesReaderFactory(required.fieldNames)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class GenTradesReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[GenTradesRange]
    val getters = fields.map(GenTradesSource.fieldGetter)
    new PartitionReader[InternalRow] {
      private var i = r.start - 1
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow =
        new GenericInternalRow(getters.map(g => g(i)): Array[Any])
      override def close(): Unit = ()
    }
  }
}
