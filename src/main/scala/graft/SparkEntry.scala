package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator suite; each suite
  * object owns its query map and (where SQL-expressible) its DuckDB
  * oracle map. Column names are aligned between the Spark result and the
  * oracle SQL — the driver's compare hashes values under sorted column
  * names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * 1-minute OHLCV candlesticks over the events stream table — the
    * reference's essence (/root/reference/7_ohlc.py). */
  def entry(spark: SparkSession): DataFrame =
    Ohlcv.bars1m(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Ohlcv.queries ++ Relational.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      Windows.queries ++ Pipeline.queries ++ RichTrades.queries ++
      Skew.queries ++ Curation.queries ++ AsOfJoin.queries ++
      Profiling.queries ++ Sketches.queries ++ Retrieval.queries ++
      Graph.queries ++ Behavior.queries ++ Warehouse.queries ++
      Temporal.queries ++ Intervals.queries ++ Layout.queries ++
      SourceHealth.queries ++ Html.queries ++
      graft.sources.GenTradesSource.queries ++
      graft.sources.GenKVSource.queries ++
      graft.sources.WarcIO.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Ohlcv.oracle ++ Relational.oracle ++ TextAnalysis.oracle ++
      Dedup.oracle ++ Similarity.oracle ++ Multimodal.oracle ++
      Windows.oracle ++ Pipeline.oracle ++ RichTrades.oracle ++
      Skew.oracle ++ Curation.oracle ++ AsOfJoin.oracle ++
      Profiling.oracle ++ Sketches.oracle ++ Retrieval.oracle ++
      Graph.oracle ++ Behavior.oracle ++ Warehouse.oracle ++
      Temporal.oracle ++ Intervals.oracle ++ Layout.oracle ++
      SourceHealth.oracle ++ Html.oracle ++
      graft.sources.GenTradesSource.oracle ++
      graft.sources.GenKVSource.oracle ++
      graft.sources.WarcIO.oracle
}
