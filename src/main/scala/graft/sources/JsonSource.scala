package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Declared-schema JSON sources (SURVEY.md §2.1 S4 — the reference's
  * connector table with JSON-Schema validation,
  * /root/reference/old/kfk.py:60-114): schemas are fixed at build time,
  * never inferred, and `fail_on_missing_field(True)`
  * (/root/reference/old/kfk.py:91) maps to strict-mode rejection of
  * records whose declared non-nullable fields are absent.
  *
  * Scale note: schema inference on JSON costs a full extra pass over
  * the data before the real read — at 100 TB that is the difference
  * between one scan and two. Declaring the schema also lets the reader
  * prune unprojected fields during parsing.
  */
object JsonSource {

  /** Batch JSON-lines read with a declared schema.
    * @param failOnMissing FAILFAST: any malformed/missing-field record
    *   aborts the read (the reference's fail_on_missing_field). false:
    *   PERMISSIVE — malformed records land in `_corrupt_record` (note
    *   Spark requires `.cache()` before a query that references ONLY
    *   `_corrupt_record` on a raw file scan). */
  def jsonLines(spark: SparkSession, path: String, schema: StructType,
      failOnMissing: Boolean): DataFrame = {
    val mode = if (failOnMissing) "FAILFAST" else "PERMISSIVE"
    val full = if (failOnMissing) schema
      else schema.add("_corrupt_record", "string")
    spark.read.schema(full).option("mode", mode).json(path)
  }

  /** Streaming variant (same contract over a file-watch source). */
  def jsonLinesStream(spark: SparkSession, path: String, schema: StructType,
      failOnMissing: Boolean): DataFrame =
    spark.readStream.schema(schema)
      .option("mode", if (failOnMissing) "FAILFAST" else "PERMISSIVE")
      .json(path)

  /** Parse an embedded JSON string column against a declared schema —
    * the Kafka-value path. Strict mode drops records where a declared
    * NON-NULLABLE field parsed to null (the closest batch analog of
    * fail_on_missing_field: `from_json` never throws per-record);
    * nullable fields — e.g. RichTrade's counterparty/OTC columns — may
    * legitimately be absent. */
  def parseJson(df: DataFrame, column: String, schema: StructType,
      failOnMissing: Boolean): DataFrame = {
    val parsed = df.withColumn("_parsed", from_json(col(column), schema))
    val flat = parsed.select(col("_parsed.*"))
    val required = schema.fields.filterNot(_.nullable)
    if (!failOnMissing || required.isEmpty) flat
    else flat.filter(required.map(f => col(f.name).isNotNull).reduce(_ && _))
  }
}
