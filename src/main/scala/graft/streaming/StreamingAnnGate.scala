package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** The embedding twin of [[StreamingIngestGate]]: vectors arrive as a
  * stream (each new document's embedding, straight off the encoder),
  * and every micro-batch is probed against the standing corpus's
  * persisted IVF-PQ index — `Similarity.annGateVerdict` per batch,
  * emitting one keep/drop verdict row per arriving vec_id.
  *
  * Same topology argument as the text gate: the codes/books tables are
  * STATIC generation artifacts, so the right shape is a per-batch
  * batch-join against the bucketed codes table — the probe touches
  * only the compressed index (no raw corpus embeddings, no per-batch
  * driver work beyond the one ~50-row books load), each micro-batch
  * shuffles only itself into the cell layout, and the gate holds zero
  * streaming state. Arrivals are deliberately not checked against
  * each other; within-batch duplication belongs to the next
  * generation's full pass.
  *
  * Index over the FULL standing corpus by default; `corpusFilter`
  * exists so drills/specs reproduce the batch drill's held-out split
  * explicitly. */
object StreamingAnnGate {

  /** Start the gate over a streaming (vec_id, embedding) frame; `sink`
    * receives each micro-batch's verdict frame (batch_id, n_dups,
    * best_dist2_micro, keep, no_content) — every arriving vec_id gets
    * exactly one row; zero-norm vectors pass through flagged
    * no_content=true. */
  def start(spark: SparkSession, dir: String, vecs: DataFrame,
      tag: String = "", corpusFilter: Column = lit(true))(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val (booksT, codesT) = Similarity.ensurePqIndex(spark, dir, tag, corpusFilter)
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(Similarity.annGateVerdict(spark, batch, booksT, codesT), batchId)
      }
      .start()
  }

  /** The ADMITTING form (twin of
    * [[StreamingIngestGate.startAdmitting]]): each micro-batch's KEPT
    * vectors are encoded with the generation's FROZEN books and folded
    * into the codes table before the next batch probes — a vector
    * near-duplicating an embedding accepted seconds ago is flagged.
    * Verdicts are checkpointed pre-admission (a lazy probe
    * re-evaluated post-merge would self-flag the batch); quantization
    * of admitted vectors uses the standing books by design — drift
    * repairs at the next generation's retrain. */
  def startAdmitting(spark: SparkSession, dir: String, vecs: DataFrame,
      tag: String = "", corpusFilter: Column = lit(true),
      compactEvery: Int = StreamingIngestGate.CompactEveryMerges)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val (booksT, codesT) = Similarity.ensurePqIndex(spark, dir, tag, corpusFilter)
    val sfx = graft.operators.IndexStore.suffix(dir, tag, corpusFilter)
    val merges = new java.util.concurrent.atomic.AtomicLong(0L)
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val verdict = Similarity.annGateVerdict(spark, batch, booksT, codesT)
          .localCheckpoint()
        sink(verdict, batchId)
        val kept = batch.join(
          verdict.filter(col("keep") && !col("no_content"))
            .select(col("batch_id").as("vec_id")),
          "vec_id")
          .select(col("vec_id"), col("embedding"))
          .localCheckpoint()
        // logged for the same reason as the text gate's fixed-tag form:
        // a later cutover from this generation must see every admission.
        // files-per-bucket stays <= compactEvery for the life of the
        // stream; the rewrite is row-identical (PersistedAnnIndexSpec)
        StreamingIngestGate.maintain(spark,
          graft.operators.AdmissionLog.VecKind, sfx, kept,
          merges, compactEvery)(
          k => Similarity.mergeBatchIntoPqIndex(spark, dir, k, tag, corpusFilter))(
          () => Similarity.compactPqIndex(spark, dir, tag, corpusFilter))
      }
      .start()
  }

  /** [[startAdmitting]] with a swappable generation (twin of
    * [[StreamingIngestGate.startAdmittingRollable]]): the generation is
    * read once per micro-batch ([[GenerationRef.advance]], which also
    * promotes a pending [[graft.operators.Rollover.cutover]] under this
    * batch's serialization), so probe and admission-merge always hit
    * the same (books, codes) pair and a handoff lands at a batch
    * boundary. This is where the frozen-book drift contract
    * closes: `Similarity.rolloverPqIndex` RETRAINS the next
    * generation's books on corpus + admitted vectors, the swap flips
    * probes over, and the old generation drops — RolloverSpec asserts
    * the retrained books quantize the merged set no worse than the
    * frozen books did. */
  def startAdmittingRollable(spark: SparkSession, dir: String,
      vecs: DataFrame, gen: GenerationRef,
      compactEvery: Int = StreamingIngestGate.CompactEveryMerges)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val merges = new java.util.concurrent.atomic.AtomicLong(0L)
    vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // advance() also promotes a pending Rollover.cutover swap under
        // this batch's serialization — see StreamingIngestGate's twin
        val (tag, cf) = gen.advance()
        val (booksT, codesT) = Similarity.ensurePqIndex(spark, dir, tag, cf)
        val verdict = Similarity.annGateVerdict(spark, batch, booksT, codesT)
          .localCheckpoint()
        sink(verdict, batchId)
        val kept = batch.join(
          verdict.filter(col("keep") && !col("no_content"))
            .select(col("batch_id").as("vec_id")),
          "vec_id")
          .select(col("vec_id"), col("embedding"))
          .localCheckpoint()
        StreamingIngestGate.maintain(spark,
          graft.operators.AdmissionLog.VecKind,
          graft.operators.IndexStore.suffix(dir, tag, cf), kept,
          merges, compactEvery)(
          k => Similarity.mergeBatchIntoPqIndex(spark, dir, k, tag, cf))(
          () => Similarity.compactPqIndex(spark, dir, tag, cf))
      }
      .start()
  }
}
