package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.util.control.NonFatal

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * A FAILED query deletes any stale result directory from a previous
  * run and is omitted from oracle_sql.json — stale-but-correct parquet
  * must never let a regression pass the compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional third arg: comma-separated query names (iteration aid —
    // the driver always runs the full surface with two args)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, None)
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    def deleteRecursively(p: java.io.File): Unit = {
      if (p.isDirectory) Option(p.listFiles()).foreach(_.foreach(deleteRecursively))
      p.delete(); ()
    }

    val selected = only.fold(SparkEntry.queries)(f => SparkEntry.queries.filter(kv => f(kv._1)))
    val failed: Map[String, String] = selected.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch {
        case NonFatal(e) =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          deleteRecursively(new java.io.File(s"$outDir/$name"))
          Some(name -> String.valueOf(e.getMessage).take(500))
      }
    }

    val json = (SparkEntry.oracleSql.filter(kv => selected.contains(kv._1)) -- failed.keys)
      .map { case (k, v) => s"${JsonUtil.q(k)}: ${JsonUtil.q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // regressions must be LOUD: a failed query becomes an artifact entry,
    // not a silent shrink of oracle_sql.json (round 5's 41-query
    // regression surfaced only as "fewer queries")
    val failedJson = failed.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${JsonUtil.q(k)}: ${JsonUtil.q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/failed.json"), failedJson)
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} FAILED queries: ${failed.keys.toSeq.sorted.mkString(", ")}")
    spark.stop()
  }
}
