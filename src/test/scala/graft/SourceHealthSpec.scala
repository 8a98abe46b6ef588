package graft

import org.apache.spark.sql.functions._
import graft.operators.SourceHealth

class SourceHealthSpec extends SparkSpec {

  test("source filter covers every source, verdict recomputes, and splits") {
    val rows = SourceHealth.sourceFilter(spark, sf001).collect()
    val nSources = Tables.documents(spark, sf001)
      .select("source").distinct().count()
    assert(rows.length == nSources)
    // rollup conserves the corpus: per-source docs sum to the doc count
    val nDocs = Tables.documents(spark, sf001).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // the relative quality cut genuinely splits the demo corpus
    val keeps = rows.map(_.getAs[Boolean]("keep"))
    assert(keeps.contains(true) && keeps.contains(false))
    rows.foreach { r =>
      val expected = r.getAs[Long]("n_docs") >= SourceHealth.MinDocs &&
        r.getAs[Long]("dup_rate_milli") <= SourceHealth.DupMaxMilli &&
        r.getAs[Long]("mean_q_milli") >= r.getAs[Long]("corpus_q_milli")
      assert(r.getAs[Boolean]("keep") == expected, s"source ${r.getString(0)}")
    }
  }

  test("corpus card is one self-consistent row") {
    val r = SourceHealth.corpusCard(spark, sf001).collect() match {
      case Array(only) => only
      case other => fail(s"expected one row, got ${other.length}")
    }
    val docs = Tables.documents(spark, sf001)
    assert(r.getAs[Long]("n_docs") == docs.count())
    assert(r.getAs[Long]("n_langs") ==
      docs.select("lang").distinct().count())
    assert(r.getAs[Long]("n_sources") ==
      docs.select("source").distinct().count())
    assert(r.getAs[Long]("mean_doc_tokens") ==
      r.getAs[Long]("n_tokens") / r.getAs[Long]("n_docs"))
    assert(r.getAs[Long]("dup_docs") >= 0L)
  }

  test("shard order is a deterministic permutation with dense per-shard positions") {
    val rows = SourceHealth.shardOrder(spark, sf001).collect()
    val nDocs = Tables.documents(spark, sf001).count()
    // a permutation: every doc exactly once
    assert(rows.length == nDocs)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == nDocs)
    // positions are 1..count(shard) within each shard, ranked by the
    // independent order hash (ties impossible: rank breaks on doc_id)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      assert(shard >= 0 && shard < SourceHealth.NumShards)
      val byPos = rs.sortBy(_.getAs[Long]("pos"))
      assert(byPos.map(_.getAs[Long]("pos")).toSeq == (1L to rs.length))
      val hashes = byPos.map(r =>
        (r.getAs[Long]("ord_hash"), r.getAs[Long]("doc_id"))).toSeq
      assert(hashes == hashes.sorted)
    }
    // placement and order are a pure function of the data
    val again = SourceHealth.shardOrder(spark, sf001).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq)
  }
}
