package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StringType, StructType}

/** Per-generation record of everything an admitting gate accepted —
  * the raw (id, payload) rows a generation rollover needs to rebuild
  * or retrain the next generation's artifacts WITHOUT the caller
  * hand-carrying the admitted frames ([[Rollover.cutover]] reads it at
  * snapshot time and again at swap promotion to fold the in-between
  * delta). The index tables alone cannot serve this role: they hold
  * signatures/codes, not the text/embedding the retrain consumes.
  *
  * Layout mirrors the index families it feeds: one bucketed parquet
  * table per (generation suffix, kind), bucketed on the id so the
  * per-batch novelty anti-join and every rollover read stay
  * bucket-local — at production scale the log holds one generation's
  * admissions (millions of rows), and an unbucketed per-batch
  * anti-join against it would shuffle the whole log every micro-batch.
  *
  * Appends are novelty-filtered (anti-join on the id) under the log's
  * own lock — JVM-local, see the SINGLE-DRIVER CONTRACT on
  * [[IndexStore]]: a second driver sharing the index root would race
  * these appends and the every-N compacts unserialized — so
  * at-least-once batch replays append nothing and the log
  * keeps a distinct-id invariant; the rollover builders additionally
  * dropDuplicates on their side, so even a blind writer would be
  * absorbed. The log is part of the generation's drop inventory
  * ([[Rollover.dropGeneration]]) — it dies with its generation, after
  * [[Rollover.cutover]] has carried its rows forward into the next
  * generation's log. */
private[graft] object AdmissionLog {

  /** Kind "doc": (doc_id LONG, text STRING) — the text-tier gates. */
  val DocKind = "doc"
  /** Kind "vec": (vec_id LONG, embedding ARRAY<FLOAT>) — the ANN gate. */
  val VecKind = "vec"

  private[graft] def keyOf(kind: String) =
    if (kind == VecKind) "vec_id" else "doc_id"
  private def bucketsOf(kind: String) =
    if (kind == VecKind) Similarity.AnnIndexBuckets else Dedup.IndexBuckets
  private def schemaOf(kind: String): StructType =
    if (kind == VecKind)
      new StructType().add("vec_id", LongType).add("embedding", ArrayType(FloatType))
    else
      new StructType().add("doc_id", LongType).add("text", StringType)

  def tableName(kind: String, sfx: String) = s"graft_admlog_${kind}_$sfx"

  /** The build-lock key every log operation serializes on — exposed so
    * callers composing a check-then-append of their own (Scaling's
    * monitor-tick probe) hold the SAME lock instead of a re-typed
    * string that a rename here would silently desynchronize. */
  def lockKey(kind: String, sfx: String): String = s"admlog_${kind}_" + sfx

  /** The log's rows, or an empty correctly-typed frame when no gate has
    * admitted anything under this generation yet. LAZY — safe only when
    * no concurrent compact can drop-and-recreate the table mid-read;
    * consumers that race a live gate use [[snapshot]]. */
  def read(spark: SparkSession, kind: String, sfx: String): DataFrame = {
    val t = tableName(kind, sfx)
    if (spark.catalog.tableExists(t)) spark.table(t)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schemaOf(kind))
  }

  /** A MATERIALIZED copy of the log taken under the log's own lock —
    * what a cutover snapshots and what its promotion catch-up re-reads.
    * The lock matters: the gate's every-N [[compact]] rewrites through
    * a drop-and-recreate `saveAsTable`, and an unlocked read landing in
    * that window would see a missing table and silently return the
    * empty frame — a generation built from corpus alone, every
    * admission lost with no error. */
  def snapshot(spark: SparkSession, kind: String, sfx: String): DataFrame =
    IndexStore.lock(lockKey(kind, sfx)).synchronized {
      read(spark, kind, sfx).localCheckpoint()
    }

  /** [[snapshot]] restricted to the id column — what the catch-up and
    * foldInto anti-joins consume. The log carries full payloads (text /
    * embeddings) and grows across generations; materializing all of it
    * to use one column would be the stall-the-stream cost the id-only
    * delta pruning exists to avoid. */
  def snapshotIds(spark: SparkSession, kind: String, sfx: String): DataFrame =
    IndexStore.lock(lockKey(kind, sfx)).synchronized {
      read(spark, kind, sfx).select(col(keyOf(kind))).localCheckpoint()
    }

  /** The log's full rows for a given (small) id frame, fetched under
    * the log lock — the payload fetch for a fold delta, AFTER an
    * id-only diff has already pruned to the rows a successor is
    * missing. The ids are broadcast into a semi-join, so the bucketed
    * log is scanned in place (never shuffled, never copied), and only
    * the delta itself is materialized. */
  def snapshotDelta(spark: SparkSession, kind: String, sfx: String,
      ids: DataFrame): DataFrame =
    IndexStore.lock(lockKey(kind, sfx)).synchronized {
      read(spark, kind, sfx)
        .join(org.apache.spark.sql.functions.broadcast(
          ids.select(col(keyOf(kind)))), Seq(keyOf(kind)), "left_semi")
        .localCheckpoint()
    }

  /** Record one batch's admissions: create the generation's log on
    * first append, then fold in only ids the log has never seen (the
    * anti-join is bucket-local on the id). Same staging discipline as
    * the index merges — the novelty frame is materialized before the
    * insert so the write never reads its own target. */
  def append(spark: SparkSession, kind: String, sfx: String,
      rows: DataFrame): Unit = {
    val t = tableName(kind, sfx)
    val key = keyOf(kind)
    val buckets = bucketsOf(kind)
    val cols = schemaOf(kind).fieldNames.map(col).toSeq
    IndexStore.lock(lockKey(kind, sfx)).synchronized {
      if (!spark.catalog.tableExists(t)) {
        rows.select(cols: _*).dropDuplicates(key)
          .repartition(buckets, col(key))
          .write.mode("overwrite").format("parquet")
          .bucketBy(buckets, key)
          .sortBy(key)
          .option("path", s"${IndexStore.root}/admlog_${kind}_$sfx")
          .saveAsTable(t)
      } else {
        val novel = rows.select(cols: _*).dropDuplicates(key)
          .join(spark.table(t).select(col(key)), Seq(key), "left_anti")
          .localCheckpoint()
        novel.repartition(buckets, col(key))
          .write.mode("append").format("parquet").insertInto(t)
      }
      // inside foreachBatch the insert executes under the micro-batch
      // session CLONE (rows derives from the batch frame) and refreshes
      // only that clone's relation cache — refresh the caller's too, or
      // a cutover that read the log pre-append (the snapshot) re-reads
      // a stale file listing at promotion and the catch-up folds
      // nothing (same discipline as Dedup.mergeBatchIntoBandIndex)
      spark.catalog.refreshTable(t)
    }
  }

  /** The log's row count, taken under the log lock — the unlocked
    * [[read]].count() a monitor might write instead can land inside a
    * gate's every-N [[compact]] (a drop-and-recreate) and either crash
    * on deleted files or silently read the missing table as zero. */
  def count(spark: SparkSession, kind: String, sfx: String): Long =
    IndexStore.lock(lockKey(kind, sfx)).synchronized {
      read(spark, kind, sfx).count()
    }

  def trainedTable(kind: String, sfx: String) = s"graft_admtrained_${kind}_$sfx"

  /** Record how many log rows the generation's artifacts were TRAINED
    * on — the cutover writes the build snapshot's size here when it
    * seeds the new generation's log with that snapshot. Admission
    * pressure measures staleness as log size MINUS this mark, so a
    * cutover-built generation starts at zero pressure instead of
    * inheriting every prior generation's admissions (logs carry
    * forward across cutovers by design). A crash between the seed
    * append and this mark leaves the mark at zero on retry — pressure
    * then OVERSTATES staleness and rotates early, never late. */
  def markTrained(spark: SparkSession, kind: String, sfx: String, n: Long): Unit = {
    import spark.implicits._
    val t = trainedTable(kind, sfx)
    IndexStore.lock(s"admtrained_${kind}_" + sfx).synchronized {
      Seq(n).toDF("n_trained").coalesce(1)
        .write.mode("overwrite").format("parquet")
        .option("path", s"${IndexStore.root}/admtrained_${kind}_$sfx")
        .saveAsTable(t)
    }
  }

  /** The trained mark, zero when no cutover has seeded this log. */
  def trainedCount(spark: SparkSession, kind: String, sfx: String): Long = {
    val t = trainedTable(kind, sfx)
    IndexStore.lock(s"admtrained_${kind}_" + sfx).synchronized {
      if (spark.catalog.tableExists(t)) spark.table(t).head().getLong(0) else 0L
    }
  }

  /** Rewrite the log back to one file per bucket — scheduled by the
    * admitting gates on the same every-N cadence as their index
    * compaction, so a long-running gate's log cannot accrete one file
    * per bucket per batch forever. Row-identical by construction. */
  def compact(spark: SparkSession, kind: String, sfx: String): Unit = {
    val t = tableName(kind, sfx)
    IndexStore.lock(lockKey(kind, sfx)).synchronized {
      if (spark.catalog.tableExists(t))
        IndexStore.rewriteBucketed(spark, t,
          s"${IndexStore.root}/admlog_${kind}_$sfx", bucketsOf(kind),
          Seq(keyOf(kind)))
    }
  }
}
