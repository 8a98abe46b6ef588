package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Uniform declared-schema readers/writers for the batch formats a
  * training-data pipeline ingests and curates (JSON-lines lives in
  * JsonSource): CSV for interchange, ORC/Parquet for columnar at-rest.
  * Same contract as JsonSource: schemas are declared, never inferred
  * (inference costs a full extra pass — at 100 TB that doubles the
  * read), and strict mode rejects malformed records loudly.
  */
object Formats {

  /** CSV with declared schema; strict = FAILFAST on malformed rows. */
  def csv(spark: SparkSession, path: String, schema: StructType,
      failOnMalformed: Boolean, header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header)
      .option("mode", if (failOnMalformed) "FAILFAST" else "PERMISSIVE")
      .csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header).csv(path)

  /** ORC — columnar with predicate pushdown, the parquet alternative. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Curated-output writer: partitioned by a low-cardinality column so
    * downstream scans prune partitions (the layout a cleaned corpus
    * should land in — partition pruning is free filtering at 100 TB). */
  def writeCuratedParquet(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
