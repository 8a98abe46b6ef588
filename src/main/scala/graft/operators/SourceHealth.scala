package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Source-level corpus governance — the per-domain/per-source stage of a
  * web-scale curation pipeline (the FineWeb/RefinedWeb "domain filtering"
  * shape: judge whole SOURCES on aggregate health, not documents one by
  * one), plus the two bookend reports around it: a one-row corpus
  * datasheet and the deterministic shard/order assignment a training-run
  * writer emits last.
  *
  * Extension beyond the reference surface (the reference is OHLCV-only);
  * same family as [[Curation]].
  *
  * Scale notes:
  *  - `sourceFilter` pays the one digest-keyed corpus shuffle every
  *    exact-dedup pass pays (attribute each copy to its source), then
  *    reduces to |sources| rows map-side — at 100 TB the rollup frame is
  *    thousands of rows, never corpus-sized.
  *  - `corpusCard` computes the dup count from the digest histogram
  *    directly (sum of copies−1) — no join back to the corpus at all.
  *  - `shardOrder`'s per-shard window is the production writer shape on
  *    purpose: one shard = one output file = one task's sorted stream.
  *    NumShards scales with the CLUSTER (file count), not the data, so
  *    the "window" is each writer ordering its own file — there is no
  *    global sort anywhere.
  */
object SourceHealth {

  /** Below this many documents a source verdict is noise, not signal. */
  val MinDocs = 10L

  /** Maximum tolerated share of exact-duplicate (non-canonical) copies. */
  val DupMaxMilli = 200L

  private def qMilli = floor(TextAnalysis.qualityExpr * lit(1000.0)).cast("long")

  /** Per-source health rollup + keep/drop verdict: doc and token counts,
    * exact-duplicate rate (a copy counts against the source that holds
    * the NON-canonical doc — the source that re-published, not the
    * origin), and mean quality in milli. A source is kept iff it has
    * enough documents, its dup rate is under [[DupMaxMilli]], and its
    * mean quality is at or above the corpus-wide mean (a relative cut:
    * absolute quality thresholds drift per corpus, the corpus mean does
    * not). The verdict frame is what a pipeline broadcast-joins back to
    * drop whole sources before any per-document work. */
  def sourceFilter(spark: SparkSession, dir: String): DataFrame = {
    // narrow per-doc frame (text dropped) materialized once: it feeds
    // BOTH sides of the canon join, and perSource is itself read twice
    // (corpus mean + final select) — without the checkpoint the
    // quality-feature scan ran 4× per query
    val base = Tables.documents(spark, dir)
      .select(col("doc_id") +: col("source") +: md5(col("text")).as("digest") +:
        TextAnalysis.qualityFeatures(col("text")): _*)
      .select(col("doc_id"), col("source"), col("digest"),
        col("n_tokens"), qMilli.as("q_milli"))
      .localCheckpoint()
    val canon = base.groupBy(col("digest")).agg(min(col("doc_id")).as("canon_id"))
    // the rollup is read twice (corpus mean + final select) — it is
    // |sources| rows, so materializing it costs nothing and saves a
    // second digest-keyed corpus shuffle
    val perSource = base.join(canon, Seq("digest"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("doc_id") =!= col("canon_id"), lit(1L)).otherwise(lit(0L)))
          .as("dup_docs"),
        sum(col("q_milli")).as("sum_q"))
      .localCheckpoint()
    // corpus mean from the bounded rollup, not a second corpus scan:
    // every doc lands in exactly one source row, so the sums agree
    val corpusMean = perSource
      .agg(expr("sum(sum_q) div sum(n_docs)").as("corpus_q_milli"))
    perSource.crossJoin(broadcast(corpusMean))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("dup_docs"),
        expr("1000 * dup_docs div n_docs").as("dup_rate_milli"),
        expr("sum_q div n_docs").as("mean_q_milli"),
        col("corpus_q_milli"))
      .withColumn("keep",
        col("n_docs") >= MinDocs &&
          col("dup_rate_milli") <= DupMaxMilli &&
          col("mean_q_milli") >= col("corpus_q_milli"))
  }

  /** One-row corpus datasheet: the numbers a dataset card leads with.
    * Doc/token/source/language counts, exact-duplicate copies (count of
    * docs that are a repeat of some earlier doc = Σ per-digest
    * (copies − 1), straight off the digest histogram), and mean quality.
    * One corpus scan + the digest reduce; the result is a single row
    * however large the corpus. */
  def corpusCard(spark: SparkSession, dir: String): DataFrame = {
    // same discipline as sourceFilter: the totals and the digest
    // histogram both read this frame — one scan, not two
    val base = Tables.documents(spark, dir)
      .select(col("doc_id") +: col("source") +: col("lang") +:
        md5(col("text")).as("digest") +:
        TextAnalysis.qualityFeatures(col("text")): _*)
      .select(col("doc_id"), col("source"), col("lang"), col("digest"),
        col("n_tokens"), qMilli.as("q_milli"))
      .localCheckpoint()
    val totals = base.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum(col("n_tokens")).as("n_tokens"),
      sum(col("q_milli")).as("sum_q"))
    val dups = base.groupBy(col("digest")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c") - lit(1L)).as("dup_docs"))
    totals.crossJoin(broadcast(dups))
      .select(col("n_docs"), col("n_langs"), col("n_sources"),
        col("n_tokens"), col("dup_docs"),
        expr("1000 * dup_docs div n_docs").as("dup_rate_milli"),
        expr("sum_q div n_docs").as("mean_q_milli"),
        expr("n_tokens div n_docs").as("mean_doc_tokens"))
  }

  /** Output shard count — in production this is the number of output
    * FILES (scaled to the cluster: ~one per writer task), so each
    * shard's window below is one task ordering its own file. */
  val NumShards = 16L

  /** Deterministic training-order assignment — the last stage of a
    * curation run, where the kept corpus becomes N shuffled shards a
    * trainer streams in order. Shard = hash32(doc_id) mod N (placement),
    * position = rank of an INDEPENDENT second hash within the shard
    * (intra-shard shuffle; hash37 so placement and order don't
    * correlate). A pure function of the data: reruns, speculative
    * tasks, and other engines produce byte-identical shard files —
    * the property a rand()-shuffle writer silently loses on retry. */
  def shardOrder(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("ord_hash"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        pmod(Sketches.hash32(col("doc_id")), lit(NumShards)).as("shard"),
        Sketches.hash37(col("doc_id")).as("ord_hash"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("ord_hash"), col("pos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "curation_source_filter" -> ((s, d) => sourceFilter(s, d)),
    "curation_shard_order" -> ((s, d) => shardOrder(s, d)),
    "profile_corpus_card" -> ((s, d) => corpusCard(s, d)))

  private def baseCte: String =
    s"""t AS (SELECT doc_id, source, lang, md5(text) AS digest,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |q AS (SELECT doc_id, source, lang, digest, len(toks)::BIGINT AS n_tokens,
       |    floor((${TextAnalysis.qualitySql}) * 1000)::BIGINT AS q_milli
       |  FROM t)""".stripMargin

  val oracle: Map[String, String] = Map(
    "curation_source_filter" ->
      s"""WITH $baseCte,
         |c AS (SELECT digest, min(doc_id) AS canon_id FROM q GROUP BY 1),
         |s AS (SELECT source, count(*)::BIGINT AS n_docs,
         |    sum(n_tokens)::BIGINT AS n_tokens,
         |    sum(CASE WHEN doc_id <> canon_id THEN 1 ELSE 0 END)::BIGINT AS dup_docs,
         |    sum(q_milli)::BIGINT AS sum_q
         |  FROM q JOIN c USING (digest) GROUP BY 1),
         |m AS (SELECT (sum(sum_q) // sum(n_docs))::BIGINT AS corpus_q_milli FROM s)
         |SELECT source, n_docs, n_tokens, dup_docs,
         |  1000 * dup_docs // n_docs AS dup_rate_milli,
         |  sum_q // n_docs AS mean_q_milli,
         |  corpus_q_milli,
         |  (n_docs >= $MinDocs AND 1000 * dup_docs // n_docs <= $DupMaxMilli
         |    AND sum_q // n_docs >= corpus_q_milli) AS keep
         |FROM s, m ORDER BY source""".stripMargin,
    "profile_corpus_card" ->
      s"""WITH $baseCte,
         |tot AS (SELECT count(*)::BIGINT AS n_docs,
         |    count(DISTINCT lang)::BIGINT AS n_langs,
         |    count(DISTINCT source)::BIGINT AS n_sources,
         |    sum(n_tokens)::BIGINT AS n_tokens,
         |    sum(q_milli)::BIGINT AS sum_q FROM q),
         |d AS (SELECT sum(c - 1)::BIGINT AS dup_docs
         |  FROM (SELECT count(*)::BIGINT AS c FROM q GROUP BY digest))
         |SELECT n_docs, n_langs, n_sources, n_tokens, dup_docs,
         |  1000 * dup_docs // n_docs AS dup_rate_milli,
         |  sum_q // n_docs AS mean_q_milli,
         |  n_tokens // n_docs AS mean_doc_tokens
         |FROM tot, d""".stripMargin,
    "curation_shard_order" ->
      s"""WITH h0 AS (SELECT doc_id,
         |    ${Sketches.foldSql("doc_id::VARCHAR", 31L, 0L)} AS f31,
         |    ${Sketches.foldSql("doc_id::VARCHAR", 37L, 7L)} AS f37
         |  FROM documents),
         |h AS (SELECT doc_id,
         |    (${Sketches.mixColSql("f31")}) % $NumShards AS shard,
         |    ${Sketches.mixColSql("f37")} AS ord_hash
         |  FROM h0)
         |SELECT doc_id, shard::BIGINT AS shard, ord_hash::BIGINT AS ord_hash,
         |  row_number() OVER (PARTITION BY shard ORDER BY ord_hash, doc_id)::BIGINT AS pos
         |FROM h ORDER BY doc_id""".stripMargin)
}
