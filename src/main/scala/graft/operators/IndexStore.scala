package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.lit

/** Shared naming + locking discipline for persisted per-generation
  * index artifacts (the dedup band/span indexes, the ANN
  * codebook/codes index): every such artifact is a bucketed parquet
  * table written ONCE per corpus generation under [[root]], keyed by
  * source dir (basename + full-path hash — two dirs sharing a basename
  * must never collide) and by the corpus predicate that defines which
  * docs the generation covers (part of the index's IDENTITY — two
  * indexes over different corpus subsets must never share a path).
  *
  * Creation is check-then-write against a path shared across sessions,
  * so builders serialize per suffix via [[lock]] — unlike DirMemo
  * (where a duplicate build is benign), a racing overwrite of the same
  * files corrupts the table. Distinct suffixes still build
  * concurrently. */
private[graft] object IndexStore {

  /** Filesystem root for persisted index generations (overridable so
    * specs can use an isolated scratch dir). */
  def root: String =
    sys.props.getOrElse("graft.index.root", "/tmp/graft_indexes")

  /** Identifier-safe table/dir suffix per source dir. */
  def dirSuffix(dir: String): String = {
    val base = dir.split('/').filter(_.nonEmpty).lastOption.getOrElse("root")
      .replaceAll("[^A-Za-z0-9]", "_")
    val h = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(dir))
    s"${base}_$h"
  }

  /** The corpus predicate folded into the suffix (the default all-docs
    * predicate adds nothing, keeping production names stable). */
  def predSuffix(corpusFilter: Column): String = {
    val sql = corpusFilter.toString
    if (sql == lit(true).toString) ""
    else "_p" + Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(sql))
  }

  /** Full suffix for one index generation. */
  def suffix(dir: String, tag: String, corpusFilter: Column): String =
    dirSuffix(dir) + (if (tag.isEmpty) "" else s"_$tag") +
      predSuffix(corpusFilter)

  private val locks = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Build lock for one index suffix — hold for the whole
    * check-then-write. */
  def lock(key: String): AnyRef = locks.computeIfAbsent(key, _ => new AnyRef)

  /** Drop one generation table AND its on-disk files — the final step
    * of a generation rollover, once probes have swapped to the new
    * generation. A no-op for a table that does not exist, so a retried
    * rollover never fails on an already-dropped generation. Files go
    * FIRST, catalog entry second: the retry guard is tableExists, so a
    * crash between the two must leave the table visible — a harmless
    * empty-location entry the retry re-drops — where the reverse order
    * would orphan the data files permanently behind a no-op retry. */
  def drop(spark: org.apache.spark.sql.SparkSession, table: String): Unit =
    if (spark.catalog.tableExists(table)) {
      val loc = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location
      val p = new org.apache.hadoop.fs.Path(loc)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      spark.sql(s"DROP TABLE `$table`")
      ()
    }

  /** Rewrite a bucketed index table back to one file per bucket
    * without changing a row — the compaction step after ingest merges
    * (each `insertInto` appends a new file per bucket). Stage the
    * current rows to a scratch dir first (the table's own files are
    * about to be overwritten), then rewrite through the exact create
    * path: repartition on the bucket keys (same murmur hash as
    * bucketBy, so each task holds exactly one bucket) + bucketBy +
    * sortBy, preserving the sort metadata bucketed reads rely on.
    * Callers hold the generation's build lock. */
  def rewriteBucketed(spark: org.apache.spark.sql.SparkSession, table: String,
      path: String, buckets: Int, keys: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.col
    val tmp = s"$root/compact_stage_$table"
    spark.table(table).write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp)
      .repartition(buckets, keys.map(col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .saveAsTable(table)
    val p = new org.apache.hadoop.fs.Path(tmp)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    ()
  }
}
