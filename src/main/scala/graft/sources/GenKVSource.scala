package graft.sources

import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("graft-kv")` — a bucket-partitioned DSv2 table
  * demonstrating STORAGE-PARTITIONED JOINS, the 100 TB co-located-join
  * mechanism (Iceberg/Delta bucketing at the connector tier).
  *
  * Each of the `buckets` input partitions generates exactly the keys
  * ≡ bucket (mod buckets), exposes the bucket as a schema column, and
  * declares it via `SupportsReportPartitioning` as
  * `KeyGroupedPartitioning(identity(bucket))` with per-partition
  * values (`HasPartitionKey`). Two such tables with the same bucket
  * count join WITHOUT any shuffle exchange: Spark pairs equal-valued
  * partitions group-wise (`spark.sql.sources.v2.bucketing.enabled`),
  * which at warehouse scale replaces the two largest exchanges of a
  * fact⋈fact join with zero network movement. The identity transform
  * (not `bucket(n, key)`) is deliberate: an anonymous path-style table
  * has no FunctionCatalog for Spark to resolve a bucket function
  * against, so the bucket id rides as a real column — the same trick
  * Hive-style layouts use.
  *
  * Options: `keys` (distinct key count, one row per key), `buckets`,
  * `salt` (varies the value stream so two instances differ).
  * Deterministic via the repo LCG — DuckDB replays it from range().
  */
class GenKVSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-kv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenKVSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenKVTable(new CaseInsensitiveStringMap(properties))
}

object GenKVSource {
  val schema: StructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("value", LongType, nullable = false)))

  /** Row value for a key: the trade-generator LCG, salt-shifted. */
  def valueOf(key: Long, salt: Long): Long =
    GenTradesSource.h(key, salt) % 1000L

  /** Fact⋈fact co-partitioned join THROUGH the connector: two 100k-key
    * instances joined on (bucket, key) and rolled up per bucket. With
    * storage-partitioned joins enabled the whole scan→join→agg chain
    * plans with ZERO shuffle exchanges (the key-grouped scan satisfies
    * the join's distribution AND the groupBy(bucket) after it); only
    * the 32-row final sort exchanges. The confs are set here — and
    * deliberately NOT restored: planning is lazy, so they must still
    * be live when the caller acts on the frame. Leak contract: both
    * confs only influence scans that REPORT KeyGroupedPartitioning
    * (in this repo, only graft-kv itself) — every parquet/generator
    * scan and join elsewhere plans identically with or without them,
    * so query order cannot change any other plan shape. */
  def coPartitionJoin(spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    def side(salt: Int) = spark.read.format("graft-kv")
      .option("keys", 100000).option("buckets", 32).option("salt", salt).load()
    val a = side(1); val b = side(2)
    a.join(b, Seq("bucket", "key"))
      .select(col("bucket"), a("value").as("va"), b("value").as("vb"))
      .groupBy("bucket")
      .agg(sum("va").as("sum_a"), sum("vb").as("sum_b"),
        count(lit(1)).as("n_pairs"))
      .orderBy("bucket")
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map("src_kv_copartition_join" -> ((s, d) => coPartitionJoin(s, d)))

  /** DuckDB replays both LCG sides from range(); joining on key alone
    * is equivalent (bucket is key mod 32 on both sides). */
  val oracle: Map[String, String] = Map(
    "src_kv_copartition_join" ->
      """WITH a AS (SELECT range AS key, (range % 32)::INT AS bucket,
        |    (((range + 1) * 1103515245 + 12345) % 2147483648) % 1000 AS value
        |  FROM range(0, 100000)),
        |b AS (SELECT range AS key,
        |    (((range + 2) * 1103515245 + 12345) % 2147483648) % 1000 AS value
        |  FROM range(0, 100000))
        |SELECT a.bucket, sum(a.value)::BIGINT AS sum_a, sum(b.value)::BIGINT AS sum_b,
        |  count(*)::BIGINT AS n_pairs
        |FROM a JOIN b USING (key)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}

class GenKVTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graft_gen_kv"
  override def schema(): StructType = GenKVSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ o.asScala).asJava)
    new ScanBuilder {
      override def build(): Scan = new GenKVScan(
        merged.asScala.getOrElse("keys", "1000").toLong,
        merged.asScala.getOrElse("buckets", "8").toInt,
        merged.asScala.getOrElse("salt", "0").toLong)
    }
  }
}

class GenKVScan(nKeys: Long, buckets: Int, salt: Long)
    extends Scan with Batch with SupportsReportPartitioning {
  require(buckets > 0 && nKeys >= 0)

  override def readSchema(): StructType = GenKVSource.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-kv keys=$nKeys buckets=$buckets salt=$salt"

  /** The SPJ contract: clustered on `bucket`, one declared value per
    * input partition. */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("bucket")), buckets)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until buckets)
      .map(b => GenKVPartition(b, nKeys, buckets, salt): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GenKVReaderFactory
}

/** One bucket: generates keys b, b+P, b+2P, … < nKeys. */
case class GenKVPartition(bucket: Int, nKeys: Long, buckets: Int, salt: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

class GenKVReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kv = p.asInstanceOf[GenKVPartition]
    new PartitionReader[InternalRow] {
      private var k = kv.bucket.toLong - kv.buckets
      override def next(): Boolean = { k += kv.buckets; k < kv.nKeys }
      override def get(): InternalRow = new GenericInternalRow(
        Array[Any](k, kv.bucket, GenKVSource.valueOf(k, kv.salt)))
      override def close(): Unit = ()
    }
  }
}
