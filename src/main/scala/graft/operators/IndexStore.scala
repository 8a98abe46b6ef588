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
  * concurrently.
  *
  * SINGLE-DRIVER CONTRACT: [[lock]] is a JVM-local monitor, so every
  * serialization it provides — generation builds, ingest merges,
  * compactions, [[AdmissionLog]] reads/appends — holds only among the
  * SparkSessions of ONE driver JVM. That is the intended deployment
  * unit (one curation driver owns one index root, as one Structured
  * Streaming query owns its checkpoint dir); point a SECOND driver at
  * the same `graft.index.root` and nothing serializes across them: two
  * builders can check-then-write the same suffix and interleave file
  * writes (corrupt table), or a reader in driver A can land inside
  * driver B's compact drop-and-recreate window and silently read the
  * log as empty. Deployments that genuinely need multiple writer
  * drivers must partition generations between them (distinct roots or
  * distinct suffix namespaces) or front the root with an external
  * lease; this library deliberately does not fake cross-JVM locking
  * with marker files, whose expiry/fencing semantics a filesystem
  * cannot make safe. */
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
    * generation. A no-op for a table that does not exist (and has no
    * pending tombstone), so a retried rollover never fails on an
    * already-dropped generation.
    *
    * Sequence: record the location in a tombstone file derived from the
    * table name, DROP the catalog entry, delete the data files, sweep
    * the tombstone. Catalog-first is the reader-safety order: while the
    * entry exists the files are complete, so a straggler resolving the
    * table either plans against the full file set (and, if the delete
    * lands mid-read, dies with a hard FILE_NOT_EXIST — never silent
    * partial rows) or fails resolution cleanly once the entry is gone.
    * The reverse (files-first) order leaves a window where the
    * still-cataloged table lists an emptied location and SILENTLY
    * returns zero rows — Spark treats a missing root dir as an empty
    * listing, so no rename trick closes that window from the file side.
    * The tombstone closes the orphan window catalog-first used to have:
    * a crash between the DROP and the file delete leaves tableExists
    * false, and a retry guarded on it alone would no-op with the data
    * files orphaned forever — instead the retry reads the recorded
    * location back and sweeps it.
    *
    * The tombstone is written to a temp path and RENAMED into place
    * (rename is atomic on the supported filesystems), so a crash
    * mid-write can never leave a truncated location for the retry to
    * sweep — a truncated prefix of the real location can name the index
    * root or a sibling table's directory. Defense in depth on the read
    * side: [[drop]] refuses to sweep any recorded path that is not
    * exactly one level below [[root]] (every index table is created at
    * `$root/<family>_<sfx>`), so even a corrupt tombstone can never
    * aim the recursive delete at the root itself or at unrelated data
    * outside it. */
  def drop(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rootQ = {
      val rp = new org.apache.hadoop.fs.Path(root)
      rp.getFileSystem(conf).makeQualified(rp)
    }
    val fs = rootQ.getFileSystem(conf)
    val tomb = new org.apache.hadoop.fs.Path(rootQ, s".drop_tomb_$table")
    // a prior drop() that died between creating the staging file and
    // renaming it into place leaves `.drop_tomb_<table>.tmp` behind
    // forever (the dot prefix keeps it out of every sweep path) —
    // clear any such orphan best-effort before this attempt stages its
    // own; the staging create() below overwrites anyway, so this only
    // matters for the retry branch and for not accumulating litter
    fs.delete(new org.apache.hadoop.fs.Path(rootQ, s".drop_tomb_$table.tmp"),
      false)
    def sweep(locStr: String): Unit = {
      val p = fs.makeQualified(new org.apache.hadoop.fs.Path(locStr))
      require(p.getParent == rootQ && !p.getName.startsWith("."),
        s"drop($table): recorded location '$locStr' is not an index-table " +
          s"directory directly under $rootQ — refusing to sweep")
      fs.delete(p, true)
      ()
    }
    if (spark.catalog.tableExists(table)) {
      val loc = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString
      val tmp = new org.apache.hadoop.fs.Path(rootQ, s".drop_tomb_$table.tmp")
      val out = fs.create(tmp, true)
      out.write(loc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
      fs.delete(tomb, true) // clear any stale artifact at the tombstone path
      // Hadoop rename reports most failures by returning false, not
      // throwing — proceeding without the tombstone would reopen the
      // crash-orphan window the whole mechanism exists to close
      require(fs.rename(tmp, tomb),
        s"drop($table): failed to move the tombstone into place ($tmp -> $tomb)")
      spark.sql(s"DROP TABLE `$table`")
      sweep(loc)
    } else if (fs.exists(tomb)) {
      // a prior drop crashed between its catalog DROP and file delete
      val len = fs.getFileStatus(tomb).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(tomb)
      try in.readFully(buf) finally in.close()
      sweep(new String(buf, java.nio.charset.StandardCharsets.UTF_8))
    }
    fs.delete(tomb, false)
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
