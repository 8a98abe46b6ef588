package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.cosineSim

/** Similarity search over the `embeddings` table (training-data
  * pipeline extension, SURVEY.md §7.1(7)): brute-force cosine top-k as
  * the exact baseline, and an IVF-style cell-probed variant as the
  * scale path.
  *
  * Plan shape at scale:
  *  - the query set is tiny and BROADCAST — the corpus never shuffles;
  *    each executor streams its corpus partitions once against all
  *    queries (classic brute-force kNN layout);
  *  - cosine is the fused-loop native expression
  *    (graft.functions.CosineSimilarity), inside whole-stage codegen;
  *  - IVF: candidates are pruned to the query's cell (here the
  *    pre-assigned `label` plays the role of the coarse-quantizer
  *    assignment; a production build would k-means its own centroids) —
  *    probing 1 of C cells cuts scanned vectors by ~C×, the standard
  *    recall/cost knob (Jégou et al., "Product quantization for nearest
  *    neighbor search", 2011);
  *  - top-k per query via a bounded typed Aggregator
  *    (graft.functions.TopKByScore): map-side partial top-k, then one
  *    small merge — each map task forwards ≤ k candidates per query, so
  *    shuffle volume is k × partitions per query regardless of corpus
  *    size. (A `row_number` window would instead shuffle EVERY scored
  *    row into one reducer partition per query — the single-stage global
  *    window is the 100 TB scale-killer this shape avoids.)
  */
object Similarity {

  val NumQueries = 8
  val TopK = 10
  val IvfTopK = 5

  private def queriesDf(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))

  /** Partial/merge top-k over (query_id, vec_id, cosine) rows: map-side
    * bounded top-k per query, one tiny final merge, rank by explode
    * position. Identical semantics (and float bits) to
    * `row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC,
    * vec_id) <= k`, without the global window's single-reducer funnel. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(k))
    scored
      .groupBy(col("query_id"))
      .agg(topk(col("vec_id"), col("cosine")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + lit(1)).as("rnk"),
        col("col.vec_id").as("vec_id"), col("col.cosine").as("cosine"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Exact brute-force cosine top-k for each query vector. */
  def topKBruteForce(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    topKPerQuery(
      broadcast(queriesDf(spark, dir))
        .join(emb, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          cosineSim(col("qv"), col("embedding")).as("cosine")),
      TopK)
  }

  /** IVF-probed approximate top-k: only the query's cell is scanned. */
  def topKIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    topKPerQuery(
      broadcast(queriesDf(spark, dir))
        .join(emb, col("label") === col("qlabel") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          cosineSim(col("qv"), col("embedding")).as("cosine")),
      IvfTopK)
  }

  /** LSH-probed approximate top-k — the bucketed scale path the sign-LSH
    * dedup already pays for: corpus vectors carry an 8-bit
    * random-hyperplane bucket (Dedup.signBucketed — computed in the scan,
    * zero shuffle), and each query probes its own bucket plus all 8
    * Hamming-1 neighbors (multi-probe LSH, Lv et al. VLDB 2007 — the
    * standard recall knob without more tables). The 9 probe keys per
    * query form a tiny broadcast side of an EQUI-join on `bucket`, so the
    * corpus is hash-pruned to ~9/256 of its rows before any cosine is
    * computed — compare brute force, which scores everything.
    * Each corpus vector has exactly ONE bucket and the 9 probe buckets
    * are distinct, so no candidate dedup is needed. */
  def topKLsh(spark: SparkSession, dir: String): DataFrame = {
    val b = Dedup.signBucketed(spark, dir)
    val q = b.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("bucket").as("qb"))
    val flipMasks = typedlit(0L +: (0 until Dedup.HyperplaneBits).map(1L << _))
    val probes = q
      .select(col("query_id"), col("qv"), col("qb"), explode(flipMasks).as("mask"))
      .select(col("query_id"), col("qv"),
        col("qb").bitwiseXOR(col("mask")).as("bucket"))
    topKPerQuery(
      broadcast(probes).join(b, Seq("bucket"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          cosineSim(col("qv"), col("embedding")).as("cosine")),
      IvfTopK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> ((s, d) => topKBruteForce(s, d)),
    "sim_topk_ivf" -> ((s, d) => topKIvf(s, d)),
    "sim_topk_lsh" -> ((s, d) => topKLsh(s, d)))

  /** Cosine with the same operation order as the native expression:
    * index-ordered fold of dot and both norms, then one division. */
  private def cosSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a) + 1),
       |      k -> $a[k]::DOUBLE * $b[k]::DOUBLE)), (x, v) -> x + v)
       |  / (sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($a) + 1),
       |      k -> $a[k]::DOUBLE * $a[k]::DOUBLE)), (x, v) -> x + v))
       |   * sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, len($b) + 1),
       |      k -> $b[k]::DOUBLE * $b[k]::DOUBLE)), (x, v) -> x + v)))""".stripMargin

  val oracle: Map[String, String] = Map(
    "sim_topk_bruteforce" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
         |  WHERE vec_id < $NumQueries),
         |c AS (SELECT query_id, e.vec_id,
         |    ${cosSql("qv", "e.embedding")} AS cosine
         |  FROM q, embeddings e WHERE e.vec_id <> query_id),
         |r AS (SELECT query_id, vec_id, cosine,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
         |  FROM c)
         |SELECT query_id, rnk, vec_id, cosine FROM r WHERE rnk <= $TopK
         |ORDER BY query_id, rnk""".stripMargin,
    "sim_topk_ivf" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
         |  FROM embeddings WHERE vec_id < $NumQueries),
         |c AS (SELECT query_id, e.vec_id,
         |    ${cosSql("qv", "e.embedding")} AS cosine
         |  FROM q, embeddings e WHERE e.label = qlabel AND e.vec_id <> query_id),
         |r AS (SELECT query_id, vec_id, cosine,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
         |  FROM c)
         |SELECT query_id, rnk, vec_id, cosine FROM r WHERE rnk <= $IvfTopK
         |ORDER BY query_id, rnk""".stripMargin,
    // Replays Dedup.signBucketed bit for bit (same zero-norm filter, same
    // 8 data-derived hyperplanes, raw-dot sign per bit), then the 9
    // multi-probe XOR masks {0, 1<<k} and the bounded top-k as a
    // row_number window — identical semantics (and float bits, cosSql's
    // index-ordered fold) to the Spark plan.
    "sim_topk_lsh" ->
      s"""WITH nz AS (SELECT vec_id, embedding FROM embeddings
         |  WHERE list_reduce(list_prepend(0.0::DOUBLE,
         |      list_transform(range(1, len(embedding) + 1),
         |        k -> embedding[k]::DOUBLE * embedding[k]::DOUBLE)), (a, v) -> a + v) > 0),
         |planes AS (SELECT vec_id AS plane_id, embedding AS plane
         |  FROM nz WHERE vec_id < ${Dedup.HyperplaneBits}),
         |b AS (SELECT e.vec_id, e.embedding,
         |    sum(CASE WHEN list_reduce(list_prepend(0.0::DOUBLE,
         |        list_transform(range(1, len(e.embedding) + 1),
         |          k -> e.embedding[k]::DOUBLE * p.plane[k]::DOUBLE)),
         |        (a, v) -> a + v) >= 0
         |      THEN (1::BIGINT << p.plane_id) ELSE 0 END)::BIGINT AS bucket
         |  FROM nz e, planes p GROUP BY 1, 2),
         |q AS (SELECT vec_id AS query_id, embedding AS qv, bucket AS qb
         |  FROM b WHERE vec_id < $NumQueries),
         |probes AS (SELECT query_id, qv, xor(qb, mask) AS bucket
         |  FROM q, (SELECT unnest([0${(0 until Dedup.HyperplaneBits).map(k => s", ${1L << k}").mkString}]) AS mask)),
         |c AS (SELECT query_id, b.vec_id,
         |    ${cosSql("qv", "b.embedding")} AS cosine
         |  FROM probes JOIN b USING (bucket) WHERE b.vec_id <> query_id),
         |r AS (SELECT query_id, vec_id, cosine,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rnk
         |  FROM c)
         |SELECT query_id, rnk, vec_id, cosine FROM r WHERE rnk <= $IvfTopK
         |ORDER BY query_id, rnk""".stripMargin)
}
