package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.tokens

/** Full-text retrieval over the corpus — BM25 ranking in exact integer
  * arithmetic.
  *
  * Training-data curation needs search (find documents matching an
  * eval-set phrase, audit what the dedup kept for a topic), and BM25 is
  * the standard lexical ranker. Classic BM25 is float-valued
  * (ln-based idf, fractional length norm) — summation order would
  * change the last bits and break cross-engine verification. This
  * variant is BM25 with every factor mapped to scaled integers
  * (SC = 10^6): the idf's log-odds argument (N−df+0.5)/(df+0.5) is kept
  * as the exact rational (2(N−df)+1)/(2df+1) instead of its logarithm,
  * and the tf saturation / length normalization (k1 = 1.2, b = 0.75)
  * use integer division at every step. Same monotonicity in tf, df, and
  * dl as BM25 (the log is monotone — rankings agree except where the
  * log's compression would reorder multi-term sums), and every score is
  * a BIGINT both engines reproduce exactly.
  *
  * Scale shape: the inverted index (doc_id, token) → tf is ONE
  * map-side-combined shuffle of the corpus; query terms, per-term df,
  * and corpus stats are broadcast (a query's term list is KBs); the
  * final ranking is the bounded map-side top-k Aggregator — k ×
  * partitions rows per query cross the last shuffle, never the
  * candidate set. No windows, no cartesian products.
  */
object Retrieval {

  private val SC = 1000000L
  private[graft] val K = 5

  /** Fixed query workload (terms drawn from the corpus vocabulary). */
  val QueryTerms: Seq[(String, String)] = Seq(
    "q_hash_join" -> Seq("hash", "join"),
    "q_slow_scan" -> Seq("slow", "scan", "filter"),
    "q_stream_key" -> Seq("stream", "order", "key"))
    .flatMap { case (q, ts) => ts.map(q -> _) }

  /** Fixed phrase workload — ordered multi-token phrases (the thing a
    * bag-of-words index cannot answer). */
  val PhraseQueries: Seq[(String, Seq[String])] = Seq(
    "p_table_value" -> Seq("table", "value"),
    "p_scan_slow" -> Seq("scan", "slow"),
    "p_slow_fast_table" -> Seq("slow", "fast", "table"))

  /** EXACT phrase search — rank documents by occurrences of an ordered
    * token phrase, the positional-postings capability next to the
    * bag-of-words BM25 family. Matching is the classic
    * positional-intersection: explode (doc, pos, token) postings, join
    * the broadcast (phrase, offset, token) query table on token, and a
    * phrase occurrence at `start` exists iff all plen distinct offsets
    * land on start = pos − offset. Top-[[K]] docs per phrase by
    * (occurrences DESC, doc_id), through the bounded top-k Aggregator —
    * all integer, no window.
    *
    * Scale shape: one postings explode (map-side; at scale this is the
    * once-per-generation positional index), the query table broadcast,
    * and the (phrase, doc, start) aggregate map-side combined — rows
    * bounded by matches of INDIVIDUAL terms, never doc×phrase. */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame =
    phraseSearchOn(spark, Tables.documents(spark, dir))

  /** Core over any (doc_id, text) frame — spec seam. */
  private[graft] def phraseSearchOn(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val q = PhraseQueries
      .flatMap { case (p, ts) => ts.zipWithIndex.map { case (t, i) => (p, i.toLong, t) } }
      .toDF("phrase", "off", "token")
    val plen = PhraseQueries.map { case (p, ts) => (p, ts.length.toLong) }
      .toDF("phrase", "plen")
    val posts = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("token"))
    // per (phrase, doc, start): one joined row per matched offset —
    // count(*) IS the matched-offset count (a fixed (start, off) pins
    // pos and token, so it can contribute at most one row)
    val starts = posts.join(broadcast(q), "token")
      .select(col("phrase"), col("doc_id"), (col("pos") - col("off")).as("start"))
      .groupBy("phrase", "doc_id", "start")
      .agg(count(lit(1)).as("k"))
    val occ = starts.join(broadcast(plen), "phrase")
      .filter(col("k") === col("plen") && col("start") >= 0L)
      .groupBy("phrase", "doc_id")
      .agg(count(lit(1)).as("n_occurrences"))
    val topk = udaf(new graft.functions.TopKByLongScore(K))
    occ.groupBy("phrase")
      .agg(topk(col("doc_id"), col("n_occurrences")).as("top"))
      .select(col("phrase"), posexplode(col("top")))
      .select(col("phrase"), (col("pos") + lit(1)).as("rnk"),
        col("col.vec_id").as("doc_id"), col("col.score").as("n_occurrences"))
  }

  /** Proximity window (tokens, inclusive) and the fixed term-pair
    * workload for [[proximitySearch]]. */
  val ProxW = 5L
  val ProxQueries: Seq[(String, (String, String))] = Seq(
    "x_hash_join" -> (("hash", "join")),
    "x_slow_filter" -> (("slow", "filter")),
    "x_stream_key" -> (("stream", "key")))

  /** PROXIMITY search — rank documents by how often a term PAIR
    * co-occurs within [[ProxW]] tokens (unordered), the relevance
    * signal between bag-of-words (any distance) and [[phraseSearch]]
    * (exact adjacency). n_near = count of (posₐ, pos_b) position pairs
    * with |posₐ − pos_b| ≤ W — exact integers, top-[[K]] docs per pair
    * by (n_near DESC, doc_id) through the bounded Aggregator.
    *
    * Scale shape: two postings slices joined per doc (bounded by the
    * individual terms' occurrence counts — the band filter prunes at
    * the join), query pairs broadcast, no window. */
  def proximitySearch(spark: SparkSession, dir: String): DataFrame =
    proximitySearchOn(spark, Tables.documents(spark, dir))

  private[graft] def proximitySearchOn(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val qa = ProxQueries.map { case (q, (a, _)) => (q, a) }.toDF("pair", "token")
    val qb = ProxQueries.map { case (q, (_, b)) => (q, b) }.toDF("pair", "token")
    val posts = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("token"))
    val a = posts.join(broadcast(qa), "token")
      .select(col("pair"), col("doc_id"), col("pos").as("pa"))
    val b = posts.join(broadcast(qb), "token")
      .select(col("pair"), col("doc_id"), col("pos").as("pb"))
    val near = a.join(b, Seq("pair", "doc_id"))
      .filter(abs(col("pa") - col("pb")) <= lit(ProxW))
      .groupBy("pair", "doc_id")
      .agg(count(lit(1)).as("n_near"))
    val topk = udaf(new graft.functions.TopKByLongScore(K))
    near.groupBy("pair")
      .agg(topk(col("doc_id"), col("n_near")).as("top"))
      .select(col("pair"), posexplode(col("top")))
      .select(col("pair"), (col("pos") + lit(1)).as("rnk"),
        col("col.vec_id").as("doc_id"), col("col.score").as("n_near"))
  }

  /** Integer-BM25 top-5 documents per query over the corpus table —
    * scored against the memoized corpus index. */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame =
    topKFromScores(cachedScores(spark, dir, QueryTerms), K)

  /** The corpus inverted index (doc_id, dl, token, tf) — dl rides the
    * groupBy key (functionally dependent on doc_id) to avoid a join
    * back. THE artifact a production retrieval stack materializes once
    * per generation and every pass reads; here memoized per
    * (session, dir) like the dedup pair frames, so bm25/RRF/PRF stop
    * re-exploding the corpus per query. */
  private[graft] def tfsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("token"))
      .groupBy("doc_id", "dl", "token").agg(count(lit(1)).as("tf"))

  /** 1-row corpus stats — computed from the DOCS frame, not the index,
    * so zero-token documents still count toward n_docs/avgdl. */
  private[operators] def statsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .agg(count(lit(1)).as("n_docs"), sum(size(col("toks"))).as("sum_dl"))
      .select(col("n_docs"), expr(s"(sum_dl * $SC) div n_docs").as("avgdl_sc"))

  private val tfsMemo = new DirMemo
  private val statsMemo = new DirMemo
  private val dfsMemo = new DirMemo
  private def tfsCached(spark: SparkSession, dir: String): DataFrame =
    tfsMemo(spark, dir)(tfsOf(Tables.documents(spark, dir)).localCheckpoint())
  private def statsCached(spark: SparkSession, dir: String): DataFrame =
    statsMemo(spark, dir)(statsOf(Tables.documents(spark, dir)).localCheckpoint())

  /** Per-token document frequency over the memoized index — the df
    * side-table every IR engine stores next to its postings (vocab-
    * bounded: one row per distinct token). r16: the scorers and the
    * PRF/tf-idf pipelines each re-aggregated df from the full postings
    * per query; the memo makes that a generation artifact like
    * tfs/stats. */
  private def dfsCached(spark: SparkSession, dir: String): DataFrame =
    dfsMemo(spark, dir)(
      tfsCached(spark, dir).groupBy("token").agg(count(lit(1)).as("df"))
        .localCheckpoint())

  /** Weight-1 scores against the memoized index. For the STANDARD
    * query set the scored frame itself is memoized per (session, dir)
    * (r17): six queries (bm25/RRF/MMR/PRF stage 1/nDCG/MRR-MAP) probe
    * the identical (query_id, doc_id, score_sc) frame — |queries| ×
    * matched-docs rows, post-aggregation bounded — and each was paying
    * the full postings scoring pass per execution. The same
    * score-once-per-generation shape a retrieval stack's evaluation
    * harness materializes. */
  private val scoresMemo = new DirMemo
  private def cachedScores(spark: SparkSession, dir: String,
      queryTerms: Seq[(String, String)]): DataFrame = {
    def build() = {
      import spark.implicits._
      bm25ScoresWeightedFrom(tfsCached(spark, dir), statsCached(spark, dir),
        queryTerms.toDF("query_id", "token").withColumn("w", lit(1L)),
        Some(dfsCached(spark, dir)))
    }
    if (queryTerms eq QueryTerms) scoresMemo(spark, dir)(build().localCheckpoint())
    else build()
  }

  // ------------------------------------- persisted text-index lifecycle

  /** Raw additive corpus stats (n_docs, sum_dl) — the PERSISTED form:
    * unlike the derived avgdl_sc, these combine under ingest merges by
    * exact integer addition, so probe-after-merge equals a full
    * rebuild bit for bit (a stored quotient would lose the remainder). */
  private[graft] def statsRawOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(size(col("toks"))), lit(0L)).as("sum_dl"))

  /** Write-once-per-generation TEXT retrieval index (the third index
    * family to get the dedup-style persisted lifecycle, after the LSH
    * band index and the IVF-PQ codes): the inverted index (doc_id, dl,
    * token, tf) as a parquet table BUCKETED BY TOKEN — the probe key:
    * per-term df aggregation and the query-term join both consume the
    * scan in its on-disk layout — plus the 1-row additive stats table.
    * Later probes (this session or the next) never re-tokenize or
    * re-scan the corpus. */
  private[graft] def ensureTextIndex(spark: SparkSession, dir: String,
      tag: String = "", corpusFilter: Column = lit(true)): (String, String) = {
    val sfx = IndexStore.suffix(dir, tag, corpusFilter)
    val tfsT = s"graft_tfs_idx_$sfx"
    val statsT = s"graft_txtstats_idx_$sfx"
    IndexStore.lock("txt_" + sfx).synchronized {
      if (!spark.catalog.tableExists(tfsT) ||
          !spark.catalog.tableExists(statsT)) {
        writeTextIndex(Tables.documents(spark, dir).filter(corpusFilter)
          .select(col("doc_id"), col("text")), sfx, tfsT, statsT)
      }
    }
    (tfsT, statsT)
  }

  /** Text-index build core over an explicit docs frame — shared by
    * [[ensureTextIndex]] (corpus) and [[rolloverTextIndex]] (corpus ∪
    * admitted). Postings and the additive stats row depend only on the
    * SET of input docs. Callers hold the generation's build lock. */
  private def writeTextIndex(docs: DataFrame, sfx: String,
      tfsT: String, statsT: String): Unit = {
    tfsOf(docs)
      .repartition(TextIndexBuckets, col("token"))
      .write.mode("overwrite").format("parquet")
      .bucketBy(TextIndexBuckets, "token")
      .sortBy("token")
      .option("path", s"${IndexStore.root}/tfs_$sfx")
      .saveAsTable(tfsT)
    statsRawOf(docs)
      .coalesce(1)
      .write.mode("overwrite").format("parquet")
      .option("path", s"${IndexStore.root}/txtstats_$sfx")
      .saveAsTable(statsT)
  }

  /** Generation ROLLOVER for the text-index family (see
    * [[Dedup.rolloverBandIndex]]): rebuild generation `newTag`'s
    * postings + stats from corpus ∪ admitted docs. Both artifacts are
    * untrained and additive, so rollover ≡ the merged old generation
    * exactly — RolloverSpec asserts row parity AND probe parity, then
    * drops the old generation and proves probes keep serving. */
  private[graft] def rolloverTextIndex(spark: SparkSession, dir: String,
      admittedDocs: DataFrame, newTag: String,
      corpusFilter: Column = lit(true)): (String, String) = {
    val sfx = IndexStore.suffix(dir, newTag, corpusFilter)
    val tfsT = s"graft_tfs_idx_$sfx"
    val statsT = s"graft_txtstats_idx_$sfx"
    IndexStore.lock("txt_" + sfx).synchronized {
      if (!spark.catalog.tableExists(tfsT) ||
          !spark.catalog.tableExists(statsT)) {
        // dedup the admitted frame (at-least-once sinks replay docs) —
        // duplicate doc rows inflate df and n_docs in every later probe
        writeTextIndex(
          Tables.documents(spark, dir).filter(corpusFilter)
            .select(col("doc_id"), col("text"))
            .unionByName(admittedDocs.dropDuplicates("doc_id")
              .select(col("doc_id"), col("text"))),
          sfx, tfsT, statsT)
      }
    }
    (tfsT, statsT)
  }

  val TextIndexBuckets = 32

  /** Probe the persisted index with any weighted query-term frame —
    * [[bm25ScoresWeightedFrom]] over table reads, the derived avgdl
    * reconstructed from the additive stats. */
  private[graft] def scoresFromTextIndex(spark: SparkSession,
      tfsT: String, statsT: String, qterms: DataFrame): DataFrame =
    bm25ScoresWeightedFrom(
      spark.table(tfsT),
      spark.table(statsT)
        .select(col("n_docs"), expr(s"(sum_dl * $SC) div n_docs").as("avgdl_sc")),
      qterms)

  /** [[bm25TopK]] served from the persisted index — hash-identical
    * ranking (shares the recompute twin's oracle verbatim), zero
    * corpus work at query time. The query tokens are driver literals,
    * so they push into BOTH postings scans as an `isin` on the bucket/
    * sort column — bucket pruning plus a parquet predicate, instead of
    * two full-postings scans filtered only at the broadcast join
    * (every posting row outside the query vocabulary is skipped at the
    * scan; at corpus scale that is the difference between reading |q|
    * token buckets and reading the inverted index). */
  def bm25TopKPersisted(spark: SparkSession, dir: String): DataFrame = {
    val (tfsT, statsT) = ensureTextIndex(spark, dir)
    import spark.implicits._
    val qtoks = QueryTerms.map(_._2).distinct
    topKFromScores(bm25ScoresWeightedFrom(
      spark.table(tfsT).filter(col("token").isin(qtoks: _*)),
      spark.table(statsT)
        .select(col("n_docs"), expr(s"(sum_dl * $SC) div n_docs").as("avgdl_sc")),
      QueryTerms.toDF("query_id", "token").withColumn("w", lit(1L))), K)
  }

  /** The BETWEEN-generations step: append an accepted batch's postings
    * through the bucket spec and fold its (n_docs, sum_dl) into the
    * stats row by exact integer addition — df and avgdl seen by later
    * probes are then EXACTLY the merged corpus's (no stale-stats
    * window at all, unlike production engines that refresh global
    * stats lazily; the additive representation is what makes that
    * free). */
  private[graft] def mergeBatchIntoTextIndex(spark: SparkSession, dir: String,
      batchDocs: DataFrame, tag: String = "",
      corpusFilter: Column = lit(true)): Unit = {
    val (tfsT, statsT) = ensureTextIndex(spark, dir, tag, corpusFilter)
    val sfx = IndexStore.suffix(dir, tag, corpusFilter)
    IndexStore.lock("txt_" + sfx).synchronized {
      tfsOf(batchDocs)
        .repartition(TextIndexBuckets, col("token"))
        .write.mode("append").format("parquet").insertInto(tfsT)
      val old = spark.table(statsT).collect().head
      val add = statsRawOf(batchDocs).collect().head
      import spark.implicits._
      Seq((old.getLong(0) + add.getLong(0), old.getLong(1) + add.getLong(1)))
        .toDF("n_docs", "sum_dl")
        .coalesce(1)
        .write.mode("overwrite").format("parquet")
        .option("path", s"${IndexStore.root}/txtstats_$sfx")
        .saveAsTable(statsT)
      spark.catalog.refreshTable(tfsT) // see Dedup.mergeBatchIntoBandIndex
      spark.catalog.refreshTable(statsT)
    }
  }

  /** Maintenance twin of [[Dedup.compactBandIndex]]: one file per
    * token bucket after K merges. */
  private[graft] def compactTextIndex(spark: SparkSession, dir: String,
      tag: String = "", corpusFilter: Column = lit(true)): Unit = {
    val sfx = IndexStore.suffix(dir, tag, corpusFilter)
    IndexStore.lock("txt_" + sfx).synchronized {
      IndexStore.rewriteBucketed(spark, s"graft_tfs_idx_$sfx",
        s"${IndexStore.root}/tfs_$sfx", TextIndexBuckets, Seq("token"))
    }
  }

  /** The (query_id, doc_id, score_sc) BM25 frame — the scoring core
    * shared by the top-k query and the RRF fusion. */
  private[operators] def bm25Scores(
      docs: DataFrame, queryTerms: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bm25ScoresWeighted(docs,
      queryTerms.toDF("query_id", "token").withColumn("w", lit(1L)))
  }

  /** Weighted core: qterms is a bounded (query_id, token, w) frame
    * (broadcast throughout); each term's BM25 contribution is scaled
    * by its integer weight — the RM3-style expanded-query shape where
    * original terms outweigh mined expansion terms. Weight 1
    * reproduces plain BM25 exactly. */
  private[graft] def bm25ScoresWeighted(
      docs: DataFrame, qterms: DataFrame): DataFrame =
    bm25ScoresWeightedFrom(tfsOf(docs), statsOf(docs), qterms)

  /** The scoring arithmetic over a prebuilt (tfs, stats) index pair. */
  private[operators] def bm25ScoresWeightedFrom(
      tfs: DataFrame, stats: DataFrame, qterms: DataFrame,
      dfsAll: Option[DataFrame] = None): DataFrame = {
    // df per query token: probe the generation's df side-table when the
    // caller holds one (vocab-bounded memo) instead of re-aggregating
    // the full postings per scoring pass — identical counts either way
    val dfs = dfsAll match {
      case Some(d) =>
        d.join(broadcast(qterms.select("token").distinct()), Seq("token"))
      case None => tfs
        .join(broadcast(qterms.select("token").distinct()), Seq("token"))
        .groupBy("token").agg(count(lit(1)).as("df"))
    }
    tfs
      .join(broadcast(qterms), Seq("token"))
      .join(broadcast(dfs), Seq("token"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_sc", expr(s"($SC * (2 * (n_docs - df) + 1)) div (2 * df + 1)"))
      .withColumn("norm_sc", expr(s"250000 + (3 * dl * $SC * $SC) div (4 * avgdl_sc)"))
      // tf saturation reduced to MILLI scale before touching idf: the
      // factor is bounded by k1+1 = 2.2 (sat_milli ≤ 2200), so
      // idf_sc · sat_milli stays under 2^63 up to ~10^9 docs — a raw
      // idf_sc · tf · SC product would overflow at corpus scale for
      // rare terms (idf_sc ≈ SC·2N at df=1)
      .withColumn("sat_milli",
        expr(s"(tf * 2200 * $SC) div (tf * $SC + (12 * norm_sc) div 10)"))
      .withColumn("contrib", expr("w * ((idf_sc * sat_milli) div 1000)"))
      .groupBy("query_id", "doc_id").agg(sum("contrib").as("score_sc"))
  }

  /** Scoring core over any (doc_id, text) frame — separable so specs
    * can probe ranking semantics on constructed corpora. */
  def bm25On(docs: DataFrame, queryTerms: Seq[(String, String)], k: Int): DataFrame =
    topKFromScores(bm25Scores(docs, queryTerms), k)

  private[graft] def topKFromScores(scores: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(k))
    scores.groupBy(col("query_id"))
      // score_sc < 2^53, so the double round-trip through the top-k
      // buffer is exact
      .agg(topk(col("doc_id"), col("score_sc").cast("double")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + lit(1)).as("rnk"),
        col("col.vec_id").as("doc_id"), col("col.cosine").cast("long").as("score_sc"))
  }

  private val TfidfK = 5

  /** Per-document top-5 characteristic terms by tf·idf — the other
    * direction from bm25TopK (documents per query): terms per document,
    * the standard keyword/topic-surfacing pass over a corpus.
    *
    * Exact integer scoring, same philosophy as the BM25 variant above:
    * idf is kept linear (1/df) instead of logarithmic, so the score is
    * the single BIGINT `(tf * SC) div df` both engines reproduce
    * exactly. Within one document the corpus-size factor N of any idf
    * formulation is a constant and drops out of the ranking; linear vs
    * log idf only reorders terms where the log's compression of df
    * ratios crosses a tf ratio — an acceptable trade for bit-exact
    * cross-engine verification (tf ≤ dl keeps tf·SC far below 2^63 for
    * any real document).
    *
    * Scale shape: (doc, token) tf is ONE map-side-combined shuffle of
    * the corpus; df is a second vocab-keyed aggregation of that frame
    * (rows = distinct (doc, token) pairs, already partial-aggregated);
    * the tf⋈df equi-join shuffles on token; the final per-document
    * ranking is the bounded map-side top-k Aggregator — never a global
    * window over the scored pairs. */
  def tfidfTopK(spark: SparkSession, dir: String): DataFrame =
    // memoized index + df side-table (r16): the r15 form re-tokenized
    // the corpus and re-aggregated df per run; tf counts are identical
    // (dl is functionally determined by doc_id, so the extra grouping
    // key in the shared index changes nothing)
    tfidfFrom(tfsCached(spark, dir).select("doc_id", "token", "tf"),
      dfsCached(spark, dir), TfidfK)

  /** Scoring core over any (doc_id, text) frame. */
  def tfidfOn(docs: DataFrame, k: Int): DataFrame = {
    val tfs = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    tfidfFrom(tfs, tfs.groupBy("token").agg(count(lit(1)).as("df")), k)
  }

  /** tf-idf ranking over a prebuilt (doc_id, token, tf) index and its
    * (token, df) side-table. */
  private def tfidfFrom(tfs: DataFrame, dfs: DataFrame, k: Int): DataFrame = {
    val scored = tfs.join(dfs, Seq("token"))
      .withColumn("tfidf_sc", expr(s"(tf * $SC) div df"))
    val topk = udaf(new graft.functions.TopKTermsByLongScore(k))
    scored.groupBy(col("doc_id"))
      .agg(topk(col("token"), col("tfidf_sc")).as("top"))
      .select(col("doc_id"), posexplode(col("top")))
      .select(col("doc_id"), (col("pos") + lit(1)).as("rnk"),
        col("col.term").as("term"), col("col.score").as("tfidf_sc"))
  }

  /** RRF constant (Cormack et al.'s 60), candidate pool per ranker,
    * and fused results kept per query. */
  private[operators] val RrfPoolK = 20
  private[operators] val RrfK = 5
  /** Coverage composite pack base: n_matched · 2^40 dominates any
    * capped tf_sum, keeping the composite exact in a BIGINT. */
  private val CovBase = 1L << 40

  /** Hybrid retrieval by reciprocal-rank fusion — the standard way to
    * blend rankers with incommensurable scores (RRF: score =
    * Σ 1/(60 + rank), Cormack et al. 2009; what production hybrid
    * search runs over its lexical + semantic legs). Leg one is the
    * integer BM25 above; leg two is the coordination ranker (distinct
    * query terms matched, total matched tf as tiebreak — the boolean
    * coverage signal BM25's per-term saturation can underweight).
    * Reciprocal ranks are integer milli (1000000 div (60 + rank)), so
    * the fused score is BIGINT-exact.
    *
    * Scale shape: each leg truncates to a [[RrfPoolK]] pool via the
    * bounded exact-long top-k aggregator BEFORE any ranking window —
    * the row_number that turns pool position into a rank runs over
    * ≤ poolK rows per query, never the candidate set, and the fusion
    * join + final top-k operate on ≤ 2·poolK rows per query. */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame =
    rrfFusionFrom(cachedScores(spark, dir, QueryTerms),
      tfsCached(spark, dir).select("doc_id", "token", "tf"),
      QueryTerms, RrfPoolK, RrfK)

  /** Fusion core over any (doc_id, text) frame — spec seam. */
  def rrfFusionOn(docs: DataFrame, queryTerms: Seq[(String, String)],
      poolK: Int, k: Int): DataFrame =
    rrfFusionFrom(bm25Scores(docs, queryTerms),
      tfsOf(docs).select("doc_id", "token", "tf"), queryTerms, poolK, k)

  private def rrfFusionFrom(scoresA: DataFrame, tfsD: DataFrame,
      queryTerms: Seq[(String, String)], poolK: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = scoresA.sparkSession
    import spark.implicits._
    val topLong = udaf(new graft.functions.TopKByLongScore(poolK))
    def pool(scored: DataFrame, scoreCol: String, rankName: String): DataFrame =
      scored.groupBy(col("query_id"))
        .agg(topLong(col("doc_id"), col(scoreCol)).as("top"))
        .select(col("query_id"), posexplode(col("top")))
        .select(col("query_id"), (col("pos") + lit(1)).as(rankName),
          col("col.vec_id").as("doc_id"))

    val poolA = pool(scoresA, "score_sc", "rank_a")

    val qterms = queryTerms.toDF("query_id", "token")
    val cov = tfsD
      .join(broadcast(qterms), Seq("token"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_matched"), sum(col("tf")).as("tf_sum"))
      .withColumn("cov_score",
        col("n_matched") * lit(CovBase) + least(col("tf_sum"), lit(CovBase - 1)))
    val poolB = pool(cov, "cov_score", "rank_b")

    val fused = poolA.join(poolB, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_milli",
        coalesce(expr("1000000 div (60 + rank_a)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + rank_b)"), lit(0L)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_milli").desc, col("doc_id"))
    fused
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("rrf_milli"))
  }

  /** Feedback-pool and expansion-term sizes for [[prfExpansion]], and
    * the minimum corpus df for an expansion term — the same hapax
    * guard as [[TextAnalysis.PmiMinSupport]]: under linear idf a
    * feedback doc's one-off token scores an unbeatable fb_tf·SC/1,
    * so without min support every expansion slot goes to noise words
    * that recall nothing. */
  private[operators] val PrfFeedbackK = 3
  private[operators] val PrfExpandK = 2
  private[operators] val PrfMinDf = 2L

  /** Pseudo-relevance feedback (RM3-lite, Lavrenko & Croft 2001 /
    * Abdul-Jaleel et al. 2004 shape): run the query, assume the top
    * [[PrfFeedbackK]] documents are relevant, mine the
    * [[PrfExpandK]] most characteristic non-query terms from them
    * (feedback tf × linear idf, the same exact-integer scoring
    * discipline as tfidfTopK), then re-run an EXPANDED weighted query
    * — original terms weight 2, expansion terms weight 1 — and return
    * the final top-k. The standard recall-repair loop a retrieval
    * stack runs when queries underspecify the corpus vocabulary.
    *
    * Scale shape: both retrieval passes are the broadcast-query BM25
    * core (the corpus never shuffles on anything but the inverted
    * index build); the mining stage touches only the feedback docs'
    * postings — |queries| × [[PrfFeedbackK]] docs semi-joined
    * map-side — and the expanded term frame (queries × a handful of
    * terms, localCheckpoint-materialized since two joins consume it)
    * broadcasts like any query. At 100 TB the inverted index would be
    * a shared materialized artifact across the passes, as elsewhere. */
  def prfExpansion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    prfFrom(
      q => bm25ScoresWeightedFrom(tfsCached(spark, dir),
        statsCached(spark, dir), q, Some(dfsCached(spark, dir))),
      tfsCached(spark, dir).select("doc_id", "token", "tf"),
      QueryTerms, PrfFeedbackK, PrfExpandK, K,
      dfsAll = Some(dfsCached(spark, dir)),
      // stage 1 is plain weight-1 BM25 over the standard query set —
      // the memoized score frame, not a fresh scoring pass (r17)
      baseScores = Some(cachedScores(spark, dir, QueryTerms)))
  }

  /** PRF core over any (doc_id, text) frame — spec seam. */
  def prfOn(docs: DataFrame, queryTerms: Seq[(String, String)],
      fbK: Int, exK: Int, k: Int): DataFrame =
    prfFrom(q => bm25ScoresWeighted(docs, q),
      tfsOf(docs).select("doc_id", "token", "tf"), queryTerms, fbK, exK, k)

  /** The RM3 stages over a weighted-scoring function and a prebuilt
    * (doc_id, token, tf) index. */
  private def prfFrom(score: DataFrame => DataFrame, tfsD: DataFrame,
      queryTerms: Seq[(String, String)], fbK: Int, exK: Int, k: Int,
      dfsAll: Option[DataFrame] = None,
      baseScores: Option[DataFrame] = None): DataFrame = {
    val spark = tfsD.sparkSession
    import spark.implicits._
    // stage 1: feedback pool — top-fbK docs per query, plain BM25
    val topLong = udaf(new graft.functions.TopKByLongScore(fbK))
    val qtW1 = queryTerms.toDF("query_id", "token").withColumn("w", lit(1L))
    val fb = baseScores.getOrElse(score(qtW1)).groupBy(col("query_id"))
      .agg(topLong(col("doc_id"), col("score_sc")).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t.vec_id").as("doc_id"))
    // stage 2: expansion mining — feedback docs' terms, original query
    // terms excluded, scored by feedback-tf × linear idf
    val allDf = dfsAll.getOrElse(
      tfsD.groupBy("token").agg(count(lit(1)).as("df")))
    val qt = queryTerms.toDF("query_id", "token")
    val cand = broadcast(fb).join(tfsD, Seq("doc_id"))
      .join(broadcast(qt), Seq("query_id", "token"), "left_anti")
      .groupBy("query_id", "token").agg(sum(col("tf")).as("fb_tf"))
    val topTerms = udaf(new graft.functions.TopKTermsByLongScore(exK))
    val expTerms = allDf.filter(col("df") >= PrfMinDf)
      .join(broadcast(cand), Seq("token"))
      .withColumn("exp_sc", expr(s"(fb_tf * $SC) div df"))
      .groupBy(col("query_id"))
      .agg(topTerms(col("token"), col("exp_sc")).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t.term").as("token"))
      .localCheckpoint() // consumed by df-count AND the scoring join
    // stage 3: weighted re-scoring — originals outweigh expansions 2:1
    val expanded = qt.withColumn("w", lit(2L))
      .unionByName(expTerms.withColumn("w", lit(1L)))
    val topk = udaf(new graft.functions.TopKByLongScore(k))
    score(expanded).groupBy(col("query_id"))
      .agg(topk(col("doc_id"), col("score_sc")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + lit(1)).as("rnk"),
        col("col.vec_id").as("doc_id"), col("col.score").as("score_sc"))
  }

  /** MMR pool/output sizes and λ×10 (Carbonell & Goldstein 1998's
    * maximal marginal relevance, λ = 0.7). */
  val MmrPoolK = 10
  val MmrK = 5
  val MmrLambda10 = 7L

  /** MMR-diversified rerank — the cross-family composition a RAG/
    * dataset-curation stack runs after lexical retrieval: pool the
    * BM25 top-[[MmrPoolK]], then greedily select [[MmrK]] docs
    * maximizing λ·relevance − (1−λ)·max-similarity-to-already-selected,
    * with similarity from the document EMBEDDINGS (near-duplicate pool
    * entries stop crowding out coverage). All-integer selection state:
    * relevance pool-normalized to milli, cosines milli-rounded (the
    * Similarity discipline — identical bits cross-engine), mmr in
    * deci-milli (λ×10 = 7, so mmr = 7·rel − 3·pen exactly), ties to
    * the smaller doc_id; a doc with no embedding row takes penalty 0
    * (diversity-neutral) rather than dropping from the ranking.
    *
    * Scale shape: everything after the memoized BM25 scoring runs on
    * BOUNDED frames — the pool is ≤ poolK rows per query, the pairwise
    * sim table ≤ poolK² per query, and each greedy round is a join +
    * argmax over those; the corpus is touched exactly once, by the
    * scoring pass. Pool, sims, and each round's selected set are
    * checkpointed — `selected` feeds two joins per round, so an
    * unreduced loop plan doubles per round. */
  def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.cosineSim
    val topPool = udaf(new graft.functions.TopKByLongScore(MmrPoolK))
    val pool0 = cachedScores(spark, dir, QueryTerms).groupBy(col("query_id"))
      .agg(topPool(col("doc_id"), col("score_sc")).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t.vec_id").as("doc_id"),
        col("t.score").as("score_sc"))
    val mx = pool0.groupBy("query_id").agg(max("score_sc").as("mx"))
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val pool = pool0.join(broadcast(mx), "query_id")
      // an all-zero pool (possible once integer idf truncates to 0 for
      // corpus-saturating terms at ~10^6 docs) must normalize to 0,
      // not divide by zero — NULL here would poison the greedy argmax
      .withColumn("rel_milli",
        when(col("mx") === 0L, lit(0L))
          .otherwise(expr("(score_sc * 1000) div mx")))
      .join(emb, Seq("doc_id"), "left")
      .select("query_id", "doc_id", "rel_milli", "embedding")
      .localCheckpoint()
    val sims = pool.as("a").join(pool.as("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.query_id").as("query_id"), col("a.doc_id").as("di"),
        col("b.doc_id").as("dj"),
        coalesce(
          round(cosineSim(col("a.embedding"), col("b.embedding")) * 1000, 0)
            .cast("long"),
          lit(0L)).as("sim_milli"))
    mmrSelect(pool.select("query_id", "doc_id", "rel_milli"), sims)
  }

  /** The greedy rounds over a (query_id, doc_id, rel_milli) pool and a
    * (query_id, di, dj, sim_milli) pair table — spec seam.
    *
    * Both inputs are bounded by CONSTRUCTION — ≤ poolK rows and
    * ≤ poolK² pairs per query, independent of corpus size — so the
    * greedy selection runs on the DRIVER (the PQ-LUT discipline:
    * head-of-ranking work on frames the retrieval stage already
    * shrank). All corpus-scale arithmetic (BM25 scoring, pool
    * normalization, milli-rounded cosines) happens distributed BEFORE
    * the collect, so the driver loop is pure integer selection —
    * identical bits to the former lazy-plan version, which paid five
    * checkpoint jobs and ~15 joins of scheduling latency for the same
    * ≤ 80-row result (2.9 s quiet → sub-second). */
  private[graft] def mmrSelect(p: DataFrame, sims: DataFrame): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    val pool = p.select("query_id", "doc_id", "rel_milli").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val simMap = sims.select("query_id", "di", "dj", "sim_milli").collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    val out = Seq.newBuilder[(String, Long, Long, Long)]
    pool.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (q, rows) =>
      var remaining = rows.map(t => (t._2, t._3)).toList
      var selectedDocs = List.empty[Long]
      for (i <- 1 to MmrK if remaining.nonEmpty) {
        // m = λ·rel − (1−λ)·max-sim-to-selected in exact deci-milli;
        // ties to the smaller doc_id. The max spans PRESENT pair rows
        // only, falling back to 0 when none exists — the former
        // left-join+coalesce plan's semantics; defaulting each missing
        // pair to 0 inside the max would flip the penalty's sign for a
        // sparse sims frame whose present sims are all negative
        val scored = remaining.map { case (d, rel) =>
          val present = selectedDocs.flatMap(s => simMap.get((q, d, s)))
          val pen = if (present.isEmpty) 0L else present.max
          (d, rel * MmrLambda10 - pen * (10L - MmrLambda10))
        }
        val (bd, bm) = scored.minBy { case (d, m) => (-m, d) }
        out += ((q, i.toLong, bd, bm))
        selectedDocs ::= bd
        remaining = remaining.filterNot(_._1 == bd)
      }
    }
    out.result().toDF("query_id", "rnk", "doc_id", "mmr_deci")
  }

  /** Dirichlet smoothing mass (Zhai & Lafferty 2001's standard μ). */
  val DirichletMu = 2000L

  /** Query-likelihood ranking with Dirichlet smoothing — the language-
    * modeling member of the classic lexical trio (BM25 / QL / fusion):
    * score(q,d) = Σ_t ln P̂(t|d) with P̂ = (tf + μ·P(t|C)) / (dl + μ),
    * ranked via the corpus-prior-normalized ratio (dividing by
    * Π P(t|C) is doc-independent, so rankings are identical and every
    * ln argument is the exact BIGINT rational
    * (tf·C + μ·cf) / ((dl+μ)·cf), converted to double identically in
    * both engines — the charLmScore discipline; the per-doc sum spans
    * ≤|q| terms and is rounded to 6 decimals before ranking, so ties
    * break on doc_id the same way cross-engine). Unlike BM25's
    * tf-only sum, a doc is scored on EVERY query term — absence costs
    * the smoothed-prior penalty, which is what makes QL prefer docs
    * covering all terms.
    *
    * Scale shape: dl × query-terms is a broadcast crossJoin (bounded
    * multiplier ≤|q| rows per doc); tf/cf restrict the token explode
    * to query terms before any shuffle; the 1-row corpus total and
    * the |q|-row cf frame broadcast. The integer products stay under
    * 2^63 through ~10^12-token corpora (tf·C ≤ dl·C ≈ 10^15,
    * μ·cf ≤ 2·10^15), and under double's 2^53 exact-integer range at
    * the same bound. Final ranking is the bounded top-k aggregator. */
  def qlTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // everything but dl derives from the memoized inverted index (cf =
    // Σtf per query term, C = Σtf overall); dl comes off the docs frame
    // so zero-token documents still rank — one cheap corpus scan
    // instead of the three tokenize+explode passes the generic path pays
    val qt = QueryTerms.toDF("query_id", "token")
    val tfs = tfsCached(spark, dir)
    val restricted = tfs
      .join(broadcast(qt.select("token").distinct()), Seq("token"))
    val dl = Tables.documents(spark, dir)
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("dl"))
    qlRank(dl,
      qt.join(restricted.groupBy("token").agg(sum(col("tf")).as("cf")),
        Seq("token")),
      tfs.agg(sum(col("tf")).as("c")),
      restricted.select("doc_id", "token", "tf"),
      DirichletMu, K)
  }

  def qlOn(docs: DataFrame, queryTerms: Seq[(String, String)],
      mu: Long, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qt = queryTerms.toDF("query_id", "token")
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
    val dl = toks.select(col("doc_id"), size(col("toks")).cast("long").as("dl"))
    val tokq = toks.select(col("doc_id"), explode(col("toks")).as("token"))
      .join(broadcast(qt.select("token").distinct()), Seq("token"))
    val cf = tokq.groupBy("token").agg(count(lit(1)).as("cf"))
    val c = toks.agg(sum(size(col("toks"))).cast("long").as("c"))
    val tfq = tokq.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    qlRank(dl, qt.join(cf, Seq("token")), c, tfq, mu, k)
  }

  /** The Dirichlet scoring + ranking over prebuilt frames: per-doc
    * lengths, (query_id, token, cf), the 1-row corpus total, and the
    * query-restricted (doc_id, token, tf) postings. */
  private def qlRank(dl: DataFrame, qtCf: DataFrame, c: DataFrame,
      tfq: DataFrame, mu: Long, k: Int): DataFrame = {
    val scores = dl
      .crossJoin(broadcast(qtCf))
      .crossJoin(broadcast(c))
      .join(tfq, Seq("doc_id", "token"), "left")
      .withColumn("lr", log(
        (coalesce(col("tf"), lit(0L)) * col("c") + lit(mu) * col("cf"))
          .cast("double") /
          ((col("dl") + lit(mu)) * col("cf")).cast("double")))
      .groupBy("query_id", "doc_id").agg(round(sum("lr"), 6).as("score"))
    val topk = udaf(new graft.functions.TopKByScore(k))
    scores.groupBy(col("query_id"))
      .agg(topk(col("doc_id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + lit(1)).as("rnk"),
        col("col.vec_id").as("doc_id"), col("col.cosine").as("score"))
  }

  /** Evaluation depth for [[ndcgEval]]. */
  val NdcgK = 10

  /** Ranking-quality evaluation: nDCG@[[NdcgK]] of the BM25 ranking
    * against a deterministic graded-relevance oracle — the quality
    * gate a retrieval stack runs after every index/ranker change.
    * Relevance grade of (query, doc) = number of the query's distinct
    * terms the doc contains (0..|terms|): independent of the ranker's
    * scores, engine-exact, and graded (so DCG's 2^rel gain curve is
    * actually exercised). DCG folds (2^rel − 1)/log2(rank+1) in rank
    * order; the ideal ranking re-sorts the full grade multiset
    * descending; both folds run over explicitly ORDERED lists so the
    * float sums are replayed element-for-element by the oracle.
    *
    * Scale shape: the ranking is the bounded top-k frame (k×queries
    * rows); grades come from the memoized tf index joined to the
    * broadcast term list (rows = postings of the query terms only);
    * the per-query grade lists are bounded by those postings — a
    * production run with corpus-wide terms swaps the collect for the
    * bounded top-k aggregator, losing nothing (IDCG only needs the k
    * largest grades). */
  def ndcgEval(spark: SparkSession, dir: String): DataFrame = {
    val ranked = topKFromScores(cachedScores(spark, dir, QueryTerms), NdcgK)
      .select(col("query_id"), col("rnk"), col("doc_id"))
    val q = {
      import spark.implicits._
      QueryTerms.toDF("query_id", "token")
    }
    // tfs rows are distinct (doc, token), so count(*) = matched terms
    val rel = tfsCached(spark, dir)
      .join(broadcast(q), "token")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("rel"))
    val dcg = ranked
      .join(rel, Seq("query_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("rnk"), col("rel")))).as("gs"))
      .select(col("query_id"),
        size(col("gs")).cast("long").as("n_ranked"),
        expr("""aggregate(gs, 0.0D,
          (a, s) -> a + (pow(2.0D, s.rel) - 1.0D) / log2(cast(s.rnk + 1 as double)))""")
          .as("dcg"))
    val ideal = rel
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel_docs"),
        sort_array(collect_list(col("rel")), asc = false).as("rs"))
      .select(col("query_id"), col("n_rel_docs"),
        expr(s"""aggregate(
          transform(sequence(1, least(size(rs), $NdcgK)),
            i -> (pow(2.0D, element_at(rs, i)) - 1.0D) / log2(cast(i + 1 as double))),
          0.0D, (a, x) -> a + x)""").as("idcg"))
    dcg.join(ideal, "query_id")
      .select(col("query_id"), col("n_ranked"), col("n_rel_docs"),
        round(col("dcg"), 6).as("dcg"),
        round(col("idcg"), 6).as("idcg"),
        round(col("dcg") / col("idcg"), 6).as("ndcg"))
  }

  /** Phrase relevance per query: the query's first two terms as an
    * adjacent bigram. Term-membership cuts are DEGENERATE on this
    * corpus (any-term: BM25 only ranks term-containing docs; all-term:
    * hundreds of docs hold every term, so top-K is all-relevant) —
    * adjacency is exactly what bag-of-words BM25 cannot see, which
    * makes it an honest relevance oracle: the ranker hits some phrase
    * docs and misses others, and MRR/MAP measure by how much. */
  val QueryPhrases: Seq[(String, String)] = Seq(
    "q_hash_join" -> "hash join",
    "q_slow_scan" -> "slow scan",
    "q_stream_key" -> "stream order")

  /** MRR + MAP@K over the same BM25 ranking as [[ndcgEval]], binary
    * relevance = phrase match ([[QueryPhrases]]) — the other two
    * ranking metrics an IR eval harness reports. Reciprocal rank is exact
    * integer micros (10^6 div first-relevant-rank); average precision
    * sums precision-at-hit in rank order with an explicit ordered
    * fold (the nDCG float discipline) and normalizes by
    * min(R, K), then micro-rounds. Reads the memoized score and tf
    * frames — the corpus is never re-scanned. */
  def mrrMapEval(spark: SparkSession, dir: String): DataFrame = {
    val ranked = topKFromScores(cachedScores(spark, dir, QueryTerms), NdcgK)
      .select(col("query_id"), col("rnk"), col("doc_id"))
    val phrases = {
      import spark.implicits._
      QueryPhrases.toDF("query_id", "phrase")
    }
    val rel = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .crossJoin(broadcast(phrases))
      .filter(col("text").contains(col("phrase")))
      .select(col("query_id"), col("doc_id"), lit(1L).as("rel"))
    val g = ranked
      .join(rel, Seq("query_id", "doc_id"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0L)))
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("rnk"), col("rel")))).as("gs"))
    val nRel = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel_docs"))
    g.join(nRel, "query_id")
      .withColumn("first_rel_rnk",
        expr("array_min(transform(filter(gs, s -> s.rel > 0), s -> s.rnk))"))
      .withColumn("ap_sum", expr(
        """aggregate(transform(sequence(1, size(gs)), i ->
          |  IF(element_at(gs, i).rel > 0,
          |     cast(size(filter(slice(gs, 1, i), s -> s.rel > 0)) as double)
          |       / cast(element_at(gs, i).rnk as double),
          |     0.0D)), 0.0D, (a, x) -> a + x)""".stripMargin))
      .select(col("query_id"),
        size(col("gs")).cast("long").as("n_ranked"),
        col("n_rel_docs"),
        col("first_rel_rnk"),
        expr("CASE WHEN first_rel_rnk IS NULL THEN 0L ELSE 1000000L div first_rel_rnk END")
          .as("rr_micro"),
        expr(s"""CASE WHEN least(n_rel_docs, $NdcgK) > 0
                |  THEN cast(round(ap_sum / cast(least(n_rel_docs, $NdcgK) as double)
                |       * 1000000.0D, 0) as bigint)
                |  ELSE 0L END""".stripMargin).as("ap_micro"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_ndcg_eval" -> ((s, d) => ndcgEval(s, d)),
    "text_mrr_map_eval" -> ((s, d) => mrrMapEval(s, d)),
    "text_mmr_rerank" -> ((s, d) => mmrRerank(s, d)),
    "text_ql_topk" -> ((s, d) => qlTopK(s, d)),
    "text_rrf_fusion" -> ((s, d) => rrfFusion(s, d)),
    "text_bm25_topk" -> ((s, d) => bm25TopK(s, d)),
    "text_phrase_search" -> ((s, d) => phraseSearch(s, d)),
    "text_proximity_search" -> ((s, d) => proximitySearch(s, d)),
    "text_bm25_topk_persisted" -> ((s, d) => bm25TopKPersisted(s, d)),
    "text_prf_expansion" -> ((s, d) => prfExpansion(s, d)),
    "text_tfidf_topk" -> ((s, d) => tfidfTopK(s, d)))

  private val qPhrasesSql = QueryPhrases
    .map { case (q, ph) => s"('$q', '$ph')" }.mkString(", ")

  private val qValuesSql = QueryTerms
    .map { case (q, t) => s"('$q', '$t')" }.mkString(", ")

  /** Shared CTE chain through the (query_id, doc_id, score_sc) BM25
    * frame — the bm25 top-k and the RRF fusion both build on it. */
  private val bm25ScoreCteSql =
    s"""toks0 AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
       |tf AS (SELECT doc_id, len(toks)::BIGINT AS dl, unnest(toks) AS token FROM toks0),
       |tfs AS (SELECT doc_id, dl, token, count(*)::BIGINT AS tf FROM tf GROUP BY 1, 2, 3),
       |stats AS (SELECT count(*)::BIGINT AS n_docs,
       |    (sum(len(toks))::BIGINT * $SC) // count(*)::BIGINT AS avgdl_sc FROM toks0),
       |q(query_id, token) AS (VALUES $qValuesSql),
       |dfs AS (SELECT token, count(*)::BIGINT AS df FROM tfs
       |  WHERE token IN (SELECT DISTINCT token FROM q) GROUP BY 1),
       |sc AS (
       |  SELECT q.query_id, t.doc_id,
       |    sum((((${SC} * (2 * (s.n_docs - d.df) + 1)) // (2 * d.df + 1))
       |         * ((t.tf * 2200 * $SC)
       |            // (t.tf * $SC
       |                + (12 * (250000 + (3 * t.dl * $SC * $SC) // (4 * s.avgdl_sc))) // 10)))
       |        // 1000)::BIGINT AS score_sc
       |  FROM tfs t JOIN q ON t.token = q.token JOIN dfs d ON t.token = d.token
       |  CROSS JOIN stats s
       |  GROUP BY 1, 2)""".stripMargin

  /** One greedy MMR round: penalties vs the selected set s(i−1),
    * candidate scores, per-query argmax, accumulate. */
  private def mmrRoundSql(i: Int): String = {
    val prev = s"s${i - 1}"
    s"""pen$i AS (SELECT s.query_id, s.di AS doc_id, max(s.sim_milli) AS pen
       |  FROM sims s JOIN $prev ON $prev.query_id = s.query_id AND $prev.doc_id = s.dj
       |  GROUP BY 1, 2),
       |c$i AS (SELECT p.query_id, p.doc_id,
       |    $MmrLambda10 * p.rel_milli - ${10 - MmrLambda10} * coalesce(n.pen, 0) AS m
       |  FROM pool p LEFT JOIN pen$i n
       |    ON n.query_id = p.query_id AND n.doc_id = p.doc_id
       |  WHERE NOT EXISTS (SELECT 1 FROM $prev
       |    WHERE $prev.query_id = p.query_id AND $prev.doc_id = p.doc_id)),
       |p$i AS (SELECT query_id, doc_id, m AS mmr_deci, $i::BIGINT AS rnk FROM c$i
       |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY m DESC, doc_id) = 1),
       |s$i AS (SELECT * FROM $prev UNION ALL SELECT * FROM p$i)""".stripMargin
  }

  private lazy val bm25TopkOracleSql: String =
    s"""WITH $bm25ScoreCteSql
       |SELECT query_id,
       |  row_number() OVER (PARTITION BY query_id ORDER BY score_sc DESC, doc_id) AS rnk,
       |  doc_id, score_sc
       |FROM sc QUALIFY rnk <= $K ORDER BY query_id, rnk""".stripMargin

  val oracle: Map[String, String] = Map(
    // two postings slices banded at |pa - pb| <= W, row_number top-k
    "text_proximity_search" -> {
      val va = ProxQueries.map { case (q, (a, _)) => s"('$q', '$a')" }.mkString(", ")
      val vb = ProxQueries.map { case (q, (_, b)) => s"('$q', '$b')" }.mkString(", ")
      s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
         |p AS (SELECT doc_id, j::BIGINT - 1 AS pos, t[j] AS token
         |  FROM toks, UNNEST(range(1, len(t) + 1)) AS u(j)),
         |qa AS (SELECT * FROM (VALUES $va) v(pair, token)),
         |qb AS (SELECT * FROM (VALUES $vb) v(pair, token)),
         |a AS (SELECT qa.pair, p.doc_id, p.pos AS pa FROM p JOIN qa ON p.token = qa.token),
         |b AS (SELECT qb.pair, p.doc_id, p.pos AS pb FROM p JOIN qb ON p.token = qb.token),
         |near AS (SELECT a.pair, a.doc_id, count(*)::BIGINT AS n_near
         |  FROM a JOIN b ON b.pair = a.pair AND b.doc_id = a.doc_id
         |  WHERE abs(a.pa - b.pb) <= $ProxW GROUP BY 1, 2)
         |SELECT pair, rnk, doc_id, n_near FROM (
         |  SELECT pair, doc_id, n_near,
         |    row_number() OVER (PARTITION BY pair
         |      ORDER BY n_near DESC, doc_id)::BIGINT AS rnk
         |  FROM near)
         |WHERE rnk <= $K ORDER BY pair, rnk""".stripMargin
    },
    // same positional intersection: (phrase, off, token) VALUES table,
    // start = pos - off, full-offset filter, row_number top-k
    "text_phrase_search" -> {
      val vals = PhraseQueries.flatMap { case (ph, ts) =>
        ts.zipWithIndex.map { case (t, i) => s"('$ph', $i, '$t')" }
      }.mkString(", ")
      val lens = PhraseQueries.map { case (ph, ts) => s"('$ph', ${ts.length})" }
        .mkString(", ")
      s"""WITH toks AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t FROM documents),
         |p AS (SELECT doc_id, j::BIGINT - 1 AS pos, t[j] AS token
         |  FROM toks, UNNEST(range(1, len(t) + 1)) AS u(j)),
         |q AS (SELECT * FROM (VALUES $vals) v(phrase, off, token)),
         |pl AS (SELECT * FROM (VALUES $lens) v(phrase, plen)),
         |st AS (SELECT q.phrase, p.doc_id, p.pos - q.off AS start, count(*)::BIGINT AS k
         |  FROM p JOIN q ON p.token = q.token GROUP BY 1, 2, 3),
         |occ AS (SELECT st.phrase, st.doc_id, count(*)::BIGINT AS n_occurrences
         |  FROM st JOIN pl ON pl.phrase = st.phrase
         |  WHERE st.k = pl.plen AND st.start >= 0 GROUP BY 1, 2)
         |SELECT phrase, rnk, doc_id, n_occurrences FROM (
         |  SELECT phrase, doc_id, n_occurrences,
         |    row_number() OVER (PARTITION BY phrase
         |      ORDER BY n_occurrences DESC, doc_id)::BIGINT AS rnk
         |  FROM occ)
         |WHERE rnk <= $K ORDER BY phrase, rnk""".stripMargin
    },
    // same ranked pool, same graded relevance, same ORDERED float
    // folds (list_reduce left fold ≡ Spark aggregate)
    "text_ndcg_eval" ->
      s"""WITH $bm25ScoreCteSql,
         |ranked AS (SELECT query_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_sc DESC, doc_id) AS rnk, doc_id
         |  FROM sc QUALIFY rnk <= $NdcgK),
         |rel AS (SELECT q.query_id, t.doc_id, count(*)::BIGINT AS rel
         |  FROM tfs t JOIN q ON t.token = q.token GROUP BY 1, 2),
         |g AS (SELECT r.query_id, r.rnk, coalesce(rel.rel, 0) AS rel
         |  FROM ranked r LEFT JOIN rel
         |    ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id),
         |d AS (SELECT query_id,
         |    list(struct_pack(rnk := rnk, rel := rel) ORDER BY rnk) AS gs
         |  FROM g GROUP BY 1),
         |dc AS (SELECT query_id, len(gs)::BIGINT AS n_ranked,
         |    list_reduce(list_prepend(0.0, list_transform(gs,
         |      s -> (pow(2.0, s.rel) - 1.0) / log2((s.rnk + 1)::DOUBLE))),
         |      (a, b) -> a + b) AS dcg
         |  FROM d),
         |ri AS (SELECT query_id, count(*)::BIGINT AS n_rel_docs,
         |    list_sort(list(rel), 'DESC') AS rs FROM rel GROUP BY 1),
         |ic AS (SELECT query_id, n_rel_docs,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(range(1, least(len(rs), $NdcgK) + 1),
         |        i -> (pow(2.0, rs[i]) - 1.0) / log2((i + 1)::DOUBLE))),
         |      (a, b) -> a + b) AS idcg
         |  FROM ri)
         |SELECT dc.query_id, n_ranked, n_rel_docs,
         |  round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
         |  round(dcg / idcg, 6) AS ndcg
         |FROM dc JOIN ic ON dc.query_id = ic.query_id
         |ORDER BY dc.query_id""".stripMargin,
    // same ranked list + binary relevance cut; reciprocal rank in
    // exact integer micros, AP's precision-at-hit fold explicitly
    // ordered, normalized by min(R, K) then micro-rounded
    "text_mrr_map_eval" ->
      s"""WITH $bm25ScoreCteSql,
         |ranked AS (SELECT query_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_sc DESC, doc_id) AS rnk, doc_id
         |  FROM sc QUALIFY rnk <= $NdcgK),
         |ph(query_id, phrase) AS (VALUES $qPhrasesSql),
         |rel AS (SELECT p.query_id, d.doc_id, 1::BIGINT AS rel
         |  FROM documents d, ph p WHERE contains(d.text, p.phrase)),
         |g AS (SELECT r.query_id, r.rnk, coalesce(rel.rel, 0) AS rel
         |  FROM ranked r LEFT JOIN rel
         |    ON rel.query_id = r.query_id AND rel.doc_id = r.doc_id),
         |d AS (SELECT query_id,
         |    list(struct_pack(rnk := rnk, rel := rel) ORDER BY rnk) AS gs
         |  FROM g GROUP BY 1),
         |nr AS (SELECT query_id, count(*)::BIGINT AS n_rel_docs FROM rel GROUP BY 1),
         |m AS (SELECT d.query_id, len(gs)::BIGINT AS n_ranked, n_rel_docs,
         |    list_min(list_transform(list_filter(gs, s -> s.rel > 0),
         |      s -> s.rnk)) AS first_rel_rnk,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(range(1, len(gs) + 1),
         |        i -> CASE WHEN gs[i].rel > 0
         |          THEN len(list_filter(gs[1:i], s -> s.rel > 0))::DOUBLE
         |            / gs[i].rnk::DOUBLE
         |          ELSE 0.0 END)),
         |      (a, b) -> a + b) AS ap_sum
         |  FROM d JOIN nr ON nr.query_id = d.query_id)
         |SELECT query_id, n_ranked, n_rel_docs, first_rel_rnk,
         |  (CASE WHEN first_rel_rnk IS NULL THEN 0
         |        ELSE 1000000 // first_rel_rnk END)::BIGINT AS rr_micro,
         |  (CASE WHEN least(n_rel_docs, $NdcgK) > 0
         |        THEN round(ap_sum / least(n_rel_docs, $NdcgK)::DOUBLE
         |             * 1000000.0)::BIGINT
         |        ELSE 0 END)::BIGINT AS ap_micro
         |FROM m ORDER BY query_id""".stripMargin,
    "text_mmr_rerank" ->
      s"""WITH $bm25ScoreCteSql,
         |pool0 AS (SELECT query_id, doc_id, score_sc FROM sc
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY score_sc DESC, doc_id) <= $MmrPoolK),
         |mx AS (SELECT query_id, max(score_sc) AS mx FROM pool0 GROUP BY 1),
         |pool AS (SELECT p.query_id, p.doc_id,
         |    CASE WHEN m.mx = 0 THEN 0
         |      ELSE (p.score_sc * 1000) // m.mx END AS rel_milli,
         |    e.embedding
         |  FROM pool0 p JOIN mx m USING (query_id)
         |  LEFT JOIN embeddings e ON e.vec_id = p.doc_id),
         |sims AS (SELECT a.query_id, a.doc_id AS di, b.doc_id AS dj,
         |    CASE WHEN a.embedding IS NULL OR b.embedding IS NULL THEN 0
         |      ELSE CAST(round((${Similarity.cosSql("a.embedding", "b.embedding")}) * 1000, 0) AS BIGINT)
         |    END AS sim_milli
         |  FROM pool a JOIN pool b
         |    ON a.query_id = b.query_id AND a.doc_id <> b.doc_id),
         |s1 AS (SELECT query_id, doc_id, $MmrLambda10 * rel_milli AS mmr_deci,
         |    1::BIGINT AS rnk
         |  FROM pool
         |  QUALIFY row_number() OVER (PARTITION BY query_id
         |    ORDER BY rel_milli DESC, doc_id) = 1),
         |${(2 to MmrK).map(mmrRoundSql).mkString(",\n")}
         |SELECT query_id, rnk, doc_id, mmr_deci FROM s$MmrK
         |ORDER BY query_id, rnk""".stripMargin,
    "text_ql_topk" ->
      s"""WITH toks0 AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks FROM documents),
         |dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM toks0),
         |tok AS (SELECT doc_id, unnest(toks) AS token FROM toks0),
         |q(query_id, token) AS (VALUES $qValuesSql),
         |cf AS (SELECT token, count(*)::BIGINT AS cf FROM tok
         |  WHERE token IN (SELECT token FROM q) GROUP BY 1),
         |c AS (SELECT count(*)::BIGINT AS c FROM tok),
         |tfq AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok
         |  WHERE token IN (SELECT token FROM q) GROUP BY 1, 2),
         |sc AS (SELECT q.query_id, d.doc_id,
         |    round(sum(ln((coalesce(t.tf, 0) * c.c + $DirichletMu * cf.cf)::DOUBLE
         |      / ((d.dl + $DirichletMu) * cf.cf)::DOUBLE)), 6) AS score
         |  FROM dl d CROSS JOIN q JOIN cf ON cf.token = q.token CROSS JOIN c
         |  LEFT JOIN tfq t ON t.doc_id = d.doc_id AND t.token = q.token
         |  GROUP BY 1, 2)
         |SELECT query_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk,
         |  doc_id, score
         |FROM sc QUALIFY rnk <= $K ORDER BY query_id, rnk""".stripMargin,
    // the persisted drill is BY CONSTRUCTION the same query as its
    // recompute twin (only the plan's input artifact differs) — the
    // shared oracle proves the on-disk index path ranks identically
    "text_bm25_topk_persisted" -> bm25TopkOracleSql,
    "text_bm25_topk" -> bm25TopkOracleSql,
    // both pool rankings, the same 2^40 coverage composite, integer
    // reciprocal ranks, and the same (rrf DESC, doc_id) final order
    "text_rrf_fusion" ->
      s"""WITH $bm25ScoreCteSql,
         |ra AS (SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY score_sc DESC, doc_id) AS rank_a
         |  FROM sc QUALIFY rank_a <= $RrfPoolK),
         |cov AS (SELECT q.query_id, t.doc_id, count(*)::BIGINT AS n_matched,
         |    sum(t.tf)::BIGINT AS tf_sum
         |  FROM tfs t JOIN q ON t.token = q.token GROUP BY 1, 2),
         |cs AS (SELECT query_id, doc_id,
         |    n_matched * ${CovBase} + least(tf_sum, ${CovBase - 1}) AS cov_score
         |  FROM cov),
         |rb AS (SELECT query_id, doc_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cov_score DESC, doc_id) AS rank_b
         |  FROM cs QUALIFY rank_b <= $RrfPoolK),
         |f AS (SELECT coalesce(ra.query_id, rb.query_id) AS query_id,
         |    coalesce(ra.doc_id, rb.doc_id) AS doc_id,
         |    (coalesce(1000000 // (60 + ra.rank_a), 0)
         |     + coalesce(1000000 // (60 + rb.rank_b), 0))::BIGINT AS rrf_milli
         |  FROM ra FULL OUTER JOIN rb
         |    ON ra.query_id = rb.query_id AND ra.doc_id = rb.doc_id)
         |SELECT query_id,
         |  row_number() OVER (PARTITION BY query_id
         |    ORDER BY rrf_milli DESC, doc_id)::BIGINT AS rnk,
         |  doc_id, rrf_milli
         |FROM f QUALIFY rnk <= $RrfK ORDER BY query_id, rnk""".stripMargin,
    // the full two-pass chain: feedback pool (score DESC, doc_id),
    // expansion mining with NOT EXISTS original-term exclusion and the
    // (exp_sc DESC, term) rank, then the weighted rescore with the
    // identical integer BM25 factors under the expanded df table
    "text_prf_expansion" ->
      s"""WITH $bm25ScoreCteSql,
         |fb AS (SELECT query_id, doc_id FROM (
         |    SELECT query_id, doc_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY score_sc DESC, doc_id) AS r
         |    FROM sc) WHERE r <= $PrfFeedbackK),
         |tfsd AS (SELECT doc_id, token, tf FROM tfs),
         |alldf AS (SELECT token, count(*)::BIGINT AS df FROM tfsd GROUP BY 1),
         |cand AS (SELECT f.query_id, t.token, sum(t.tf)::BIGINT AS fb_tf
         |  FROM fb f JOIN tfsd t USING (doc_id)
         |  WHERE NOT EXISTS (SELECT 1 FROM q
         |    WHERE q.query_id = f.query_id AND q.token = t.token)
         |  GROUP BY 1, 2),
         |ex AS (SELECT query_id, token FROM (
         |    SELECT c.query_id, c.token,
         |      row_number() OVER (PARTITION BY c.query_id
         |        ORDER BY (c.fb_tf * $SC) // d.df DESC, c.token) AS r
         |    FROM cand c JOIN alldf d USING (token)
         |    WHERE d.df >= $PrfMinDf) WHERE r <= $PrfExpandK),
         |q2 AS (SELECT query_id, token, 2::BIGINT AS w FROM q
         |  UNION ALL SELECT query_id, token, 1::BIGINT AS w FROM ex),
         |dfs2 AS (SELECT token, count(*)::BIGINT AS df FROM tfs
         |  WHERE token IN (SELECT DISTINCT token FROM q2) GROUP BY 1),
         |sc2 AS (SELECT q2.query_id, t.doc_id,
         |    sum(q2.w * ((((${SC} * (2 * (s.n_docs - d.df) + 1)) // (2 * d.df + 1))
         |         * ((t.tf * 2200 * $SC)
         |            // (t.tf * $SC
         |                + (12 * (250000 + (3 * t.dl * $SC * $SC) // (4 * s.avgdl_sc))) // 10)))
         |        // 1000))::BIGINT AS score_sc
         |  FROM tfs t JOIN q2 ON t.token = q2.token JOIN dfs2 d ON t.token = d.token
         |  CROSS JOIN stats s
         |  GROUP BY 1, 2)
         |SELECT query_id,
         |  row_number() OVER (PARTITION BY query_id ORDER BY score_sc DESC, doc_id) AS rnk,
         |  doc_id, score_sc
         |FROM sc2 QUALIFY rnk <= $K ORDER BY query_id, rnk""".stripMargin,
    "text_tfidf_topk" ->
      s"""WITH t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token FROM documents),
         |tfs AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM t GROUP BY 1, 2),
         |dfs AS (SELECT token, count(*)::BIGINT AS df FROM tfs GROUP BY 1),
         |sc AS (SELECT doc_id, token AS term, (tf * $SC) // df AS tfidf_sc
         |  FROM tfs JOIN dfs USING (token))
         |SELECT doc_id,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_sc DESC, term) AS rnk,
         |  term, tfidf_sc
         |FROM sc QUALIFY rnk <= $TfidfK ORDER BY doc_id, rnk""".stripMargin)
}
