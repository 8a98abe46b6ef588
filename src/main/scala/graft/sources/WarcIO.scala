package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** WARC-style archive I/O — the wire format a web-crawl pipeline
  * actually starts from (CommonCrawl ships WARC): records framed as
  *
  *   WARC/1.0\r\n
  *   WARC-Type: response\r\n
  *   WARC-Record-ID: <urn:graft:doc:ID>\r\n
  *   Content-Length: N\r\n
  *   \r\n
  *   <N chars of payload>\r\n\r\n
  *
  * Production WARCs are gzip members and therefore NOT splittable —
  * the unit of parallelism is the FILE (CommonCrawl ships ~64k files
  * per crawl precisely so clusters can scale by file count). The
  * reader honors that shape: one task per file (`wholetext`), records
  * parsed sequentially within it by Content-Length framing. The
  * writer shards deterministically (hash-placed, id-sorted within
  * shard) so re-runs and other engines produce byte-identical
  * archives — same discipline as SourceHealth.shardOrder.
  *
  * Payload lengths are counted in characters (the synthetic corpus is
  * ASCII, chars == bytes); a production build counts UTF-8 bytes and
  * slices on byte offsets. The roundtrip query validates the declared
  * Content-Length against the parsed payload per record, so a framing
  * bug cannot pass silently. */
object WarcIO {

  private val RecordSep = "WARC/1.0\r\n"

  /** Write `docs` (doc_id, text) as up to `files` WARC shard files
    * under `path` — byte-deterministic: records are hash-placed by
    * their doc_id residue (a pure function of the data, so rewrites
    * and other engines reproduce identical shard bytes) and id-sorted
    * within each shard. Residues can hash-collide into one partition,
    * so fewer than `files` non-empty shards is possible. */
  def write(docs: DataFrame, path: String, files: Int): Unit =
    docs
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .repartition(files, pmod(col("doc_id"), lit(files.toLong)))
      .sortWithinPartitions(col("doc_id"))
      .select(concat(
        lit(RecordSep),
        lit("WARC-Type: response\r\n"),
        lit("WARC-Record-ID: <urn:graft:doc:"), col("doc_id"), lit(">\r\n"),
        lit("Content-Length: "), length(col("text")), lit("\r\n"),
        lit("\r\n"),
        col("text"), lit("\r")).as("value"))
      .write.mode("overwrite").text(path)

  /** Read a WARC shard directory back to (doc_id, declared_length,
    * payload): one task per file, records recovered by header parse +
    * Content-Length slice. Pure column algebra over the per-file
    * strings — splitting on the record marker, then each record's
    * payload cut to its DECLARED length (the separator-trim fallback
    * would mask framing bugs; the declared slice surfaces them). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(explode(split(col("value"), java.util.regex.Pattern.quote(RecordSep)))
        .as("rec"))
      .filter(length(col("rec")) > 0)
      .select(
        regexp_extract(col("rec"), "WARC-Record-ID: <urn:graft:doc:([0-9]+)>", 1)
          .cast("long").as("doc_id"),
        regexp_extract(col("rec"), "Content-Length: ([0-9]+)", 1)
          .cast("long").as("declared_length"),
        col("rec"))
      .withColumn("payload",
        expr("substring(substring_index(rec, '\r\n\r\n', -1), 1, " +
          "cast(declared_length as int))"))
      .drop("rec")

  /** Roundtrip drill as an oracle-checked query: shard the documents
    * table to WARC once per (dir) generation, read it back through the
    * framing parser, and emit per-record digests + the length
    * validation — the oracle recomputes the same digests straight off
    * the parquet, so any framing/parse defect breaks hash parity. */
  /** Write-once-per-generation archive of `dir`'s documents table;
    * returns its path. The archive is deterministic, so an existing
    * shard set is exactly what this run would write. */
  private[graft] def ensureArchive(spark: SparkSession, dir: String): String = {
    val base = dir.split('/').filter(_.nonEmpty).lastOption.getOrElse("root")
      .replaceAll("[^A-Za-z0-9]", "_")
    val path = s"/tmp/graft_warc/$base"
    val marker = new java.io.File(path, "_SUCCESS")
    if (!marker.exists()) {
      write(Tables.documents(spark, dir).select(col("doc_id"), col("text")),
        path, files = 8)
    }
    path
  }

  def roundtrip(spark: SparkSession, dir: String): DataFrame = {
    val path = ensureArchive(spark, dir)
    read(spark, path)
      .select(col("doc_id"), col("declared_length"),
        (length(col("payload")) === col("declared_length")).as("length_ok"),
        md5(col("payload")).as("payload_md5"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_warc_roundtrip" -> ((s, d) => roundtrip(s, d)))

  val oracle: Map[String, String] = Map(
    "src_warc_roundtrip" ->
      """SELECT doc_id, length(text)::BIGINT AS declared_length,
        |  true AS length_ok, md5(text) AS payload_md5
        |FROM documents ORDER BY doc_id""".stripMargin)
}
