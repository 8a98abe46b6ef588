package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** Whole-generation rollover orchestration — the operational entry
  * point a curation deployment calls once per cycle: rebuild or
  * RETRAIN every persisted artifact family for the next generation
  * from the standing corpus plus everything the admitting gates
  * accepted since the last one, while the current generation keeps
  * serving; then swap probes (the rollable gates' `GenerationRef`)
  * and [[dropGeneration]] the old tag.
  *
  * Family-by-family semantics live with their operators
  * ([[Dedup.rolloverBandIndex]], [[Similarity.rolloverPqIndex]],
  * [[Retrieval.rolloverTextIndex]], the model rollovers in
  * TextAnalysis/Curation); this object only sequences them, so the
  * per-family parity proofs (RolloverSpec, PersistedModelSpec) carry
  * over unchanged. Each family build is itself suffix-locked and
  * check-then-build, so a crashed rollover RESUMES by re-calling
  * [[generation]] — finished families are catalog hits. */
object Rollover {

  /** All table-name prefixes one generation owns, in (prefix, path
    * stem) form — the drop inventory. */
  private val Families: Seq[String] = Seq(
    "graft_band_idx_", "graft_sets_idx_", "graft_span_idx_",
    "graft_tfs_idx_", "graft_txtstats_idx_",
    "graft_pq_books_", "graft_pq_codes_",
    "graft_charlm_idx_", "graft_clsw_idx_", "graft_clsstats_idx_",
    "graft_bpem_idx_", "graft_bpev_idx_")

  /** Build generation `newTag` across every family: the dedup band and
    * span indexes, the text postings, and the three model artifacts
    * from corpus ∪ `admittedDocs`; the ANN books+codes retrained from
    * corpus ∪ the admitted vectors when a vector batch is supplied
    * (the doc and vector corpora are separate tables with separate
    * corpus predicates — `annAdmitted` carries its own filter; None
    * skips the ANN family). Returns the new generation's tables by
    * family, all serving immediately. */
  def generation(spark: SparkSession, dir: String,
      admittedDocs: DataFrame, newTag: String,
      corpusFilter: Column = lit(true),
      annAdmitted: Option[(DataFrame, Column)] = None): Map[String, Seq[String]] = {
    val (bandsT, setsT) =
      Dedup.rolloverBandIndex(spark, dir, admittedDocs, newTag, corpusFilter)
    val spanT =
      Dedup.rolloverSpanIndex(spark, dir, admittedDocs, newTag, corpusFilter)
    val (tfsT, txtStatsT) =
      Retrieval.rolloverTextIndex(spark, dir, admittedDocs, newTag, corpusFilter)
    val lmT =
      TextAnalysis.rolloverCharLmModel(spark, dir, admittedDocs, newTag, corpusFilter)
    val (bpeMergesT, bpeVocabT) =
      TextAnalysis.rolloverBpeModel(spark, dir, admittedDocs, newTag, corpusFilter)
    val (clsWT, clsStatsT) =
      Curation.rolloverClassifierModel(spark, dir, admittedDocs, newTag, corpusFilter)
    val ann = annAdmitted.map { case (vecs, vecFilter) =>
      val (booksT, codesT) =
        Similarity.rolloverPqIndex(spark, dir, vecs, newTag, vecFilter)
      "ann" -> Seq(booksT, codesT)
    }
    Map(
      "band" -> Seq(bandsT, setsT),
      "span" -> Seq(spanT),
      "text" -> Seq(tfsT, txtStatsT),
      "charlm" -> Seq(lmT),
      "bpe" -> Seq(bpeMergesT, bpeVocabT),
      "classifier" -> Seq(clsWT, clsStatsT)) ++ ann
  }

  /** Retire one generation completely: drop every family table that
    * exists under the tag's suffix (tables + files; missing families
    * are skipped, so partial generations drop cleanly too). Call only
    * after probes have swapped off the tag. */
  def dropGeneration(spark: SparkSession, dir: String, tag: String,
      corpusFilter: Column = lit(true)): Unit = {
    val sfx = IndexStore.suffix(dir, tag, corpusFilter)
    Families.foreach(p => IndexStore.drop(spark, p + sfx))
  }
}
