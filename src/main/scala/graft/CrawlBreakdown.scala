package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main (StreamBreakdown's batch sibling): attribute
  * pipeline_crawl's cost across its three stages — WARC archive read
  * (Content-Length framing walk), + boilerplate extraction, + Gopher
  * gate — so a cost change can be pinned to the reader or the
  * extractor instead of adjudicated from the composed number.
  * Usage: runMain graft.CrawlBreakdown [sfDir] */
object CrawlBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = graft.sources.WarcIO.ensureArchive(spark, sfDir)
    def docs = graft.sources.WarcIO.read(spark, path)
      .select(col("doc_id"), col("payload").as("text"))
    val stages: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "read_only" -> (() => docs),
      "read_extract" -> (() => graft.operators.Html.extractOn(docs)),
      "full_crawl" -> (() => graft.operators.Pipeline.crawlPipeline(spark, sfDir)),
      "parquet_extract" -> (() => graft.operators.Html.extractOn(
        Tables.documents(spark, sfDir).select(col("doc_id"), col("text")))))
    // warmup pass (JIT + archive cache), then median-of-3 per stage
    stages.foreach { case (_, f) =>
      f().write.format("noop").mode("overwrite").save()
    }
    stages.foreach { case (name, f) =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"CRAWLBREAKDOWN $name%-16s median=${ts.sorted.apply(1)}%.2f " +
        f"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
