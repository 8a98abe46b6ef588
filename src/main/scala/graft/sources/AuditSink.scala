package graft.sources

import java.util
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `df.write.format("graft-audit")` — the WRITE half of the connector
  * tier (the read half is GenTradesSource/GenKVSource with the full
  * pushdown suite): an in-memory audit table implementing DSv2's
  * two-phase commit contract.
  *
  * The contract is the whole point — it is what makes a distributed
  * write exactly-once under retries and speculation:
  *
  *  - each TASK buffers its rows and surfaces them only through its
  *    `WriterCommitMessage` (task commit = phase one; a failed or
  *    speculative-loser task's buffer is dropped via `abort`, and
  *    Spark's output commit coordinator ensures one winner per
  *    partition);
  *  - the DRIVER makes the job's results visible atomically in
  *    `BatchWrite.commit(messages)` (phase two) — readers see the old
  *    table or the new rows, never a torn prefix; `abort` publishes
  *    nothing. This mirrors how Iceberg/Delta commit a snapshot from
  *    collected task manifests; the storage here is a process-local
  *    map because the contract, not the medium, is the deliverable.
  *
  * `SaveMode.Append` appends atomically; `.mode("overwrite")` routes
  * through `SupportsTruncate` (truncate + append in one atomic
  * publish). Tables are named by the `table` option and readable back
  * via `spark.read.format("graft-audit").option("table", …)` —
  * committed rows only. Supported column types: the primitive four the
  * demo schemas use (long, int, double, string).
  */
class AuditSink extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-audit"
  // the writer's DataFrame schema flows into getTable (external
  // metadata); reads of an existing table replay the stored schema
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AuditStore.schemaOf(AuditSink.tableName(options))
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AuditTable(AuditSink.tableName(new CaseInsensitiveStringMap(properties)), schema)
}

object AuditSink {
  private[sources] def tableName(options: CaseInsensitiveStringMap): String =
    options.getOrDefault("table", "default")
}

/** Process-local committed storage: name → (schema, committed rows).
  * Mutations happen ONLY inside `BatchWrite.commit` under the store
  * lock — the atomic-visibility point of the two-phase protocol. */
object AuditStore {
  private val tables = TrieMap.empty[String, (StructType, Vector[Array[Any]])]

  def schemaOf(name: String): StructType =
    tables.get(name).map(_._1).getOrElse(StructType(Nil))

  def rows(name: String): Vector[Array[Any]] =
    tables.get(name).map(_._2).getOrElse(Vector.empty)

  def drop(name: String): Unit = tables.remove(name)

  private[sources] def publish(
      name: String, schema: StructType,
      append: Vector[Array[Any]], truncate: Boolean): Unit =
    tables.synchronized {
      // an append onto an existing table must match its schema — old
      // rows were encoded under it, and replacing it would decode them
      // under the wrong column layout at scan time
      val existing = if (truncate) StructType(Nil) else schemaOf(name)
      if (existing.nonEmpty && existing != schema)
        throw new IllegalArgumentException(
          s"graft-audit append schema ${schema.catalogString} does not match " +
            s"table '$name' schema ${existing.catalogString}; use overwrite")
      val prev = if (truncate) Vector.empty else rows(name)
      tables.put(name, (schema, prev ++ append))
    }
}

private[sources] class AuditTable(name: String, writeSchema: StructType)
    extends Table with SupportsWrite with SupportsRead {
  override def name(): String = s"graft-audit($name)"
  override def schema(): StructType =
    if (writeSchema != null && writeSchema.nonEmpty) writeSchema
    else AuditStore.schemaOf(name)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.BATCH_READ,
      TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AuditWriteBuilder(name, info.schema(), truncate = false)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = AuditStore.schemaOf(name)
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(new InputPartition {})
      override def createReaderFactory(): PartitionReaderFactory = {
        val schema = AuditStore.schemaOf(name)
        val rows = AuditStore.rows(name)
        (_: InputPartition) => new PartitionReader[InternalRow] {
          private val it = rows.iterator
          private var cur: Array[Any] = _
          override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
          override def get(): InternalRow =
            new GenericInternalRow(cur.zipWithIndex.map {
              case (v: String, i) if schema(i).dataType == StringType =>
                UTF8String.fromString(v)
              case (v, _) => v.asInstanceOf[AnyRef]
            }.asInstanceOf[Array[Any]])
          override def close(): Unit = ()
        }
      }
    }
}

private[sources] class AuditWriteBuilder(
    name: String, schema: StructType, truncate: Boolean)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new AuditWriteBuilder(name, schema, truncate = true)
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new AuditBatchWrite(name, schema, truncate)
  }
}

/** One task's committed rows, shipped to the driver at task commit. */
private[sources] case class AuditRows(rows: Array[Array[Any]])
    extends WriterCommitMessage

private[sources] class AuditBatchWrite(
    name: String, schema: StructType, truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory(schema)
  // phase two: one atomic publish of every surviving task's buffer —
  // this is the only place committed state changes
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    AuditStore.publish(name, schema,
      messages.iterator.flatMap(_.asInstanceOf[AuditRows].rows).toVector,
      truncate)
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class AuditWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Vector.newBuilder[Array[Any]]
      override def write(row: InternalRow): Unit =
        buf += schema.fields.zipWithIndex.map { case (f, i) =>
          // null check first: getLong/getDouble on a null slot would
          // silently store a phantom 0, getUTF8String would NPE
          if (row.isNullAt(i)) null
          else f.dataType match {
            case LongType => row.getLong(i)
            case IntegerType => row.getInt(i)
            case DoubleType => row.getDouble(i)
            case StringType => row.getUTF8String(i).toString
            case t => throw new IllegalArgumentException(
              s"graft-audit supports long/int/double/string, got ${t.catalogString}")
          }
        }.asInstanceOf[Array[Any]]
      // phase one: rows leave the task ONLY through the commit message
      override def commit(): WriterCommitMessage = AuditRows(buf.result().toArray)
      override def abort(): Unit = () // buffer dropped; nothing published
      override def close(): Unit = ()
    }
}
