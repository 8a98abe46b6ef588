package graft
import org.apache.spark.sql.SparkSession

/** Iteration aid: median-of-3 timing for a comma-separated subset of
  * SparkEntry.queries (the full Bench run is minutes; re-measuring one
  * plan change should not be). Usage: runMain graft.BenchOne <sfDir> <q1,q2,...> */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm session
    Tables.lineitem(spark, sfDir).limit(1).collect()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHONE $name%-24s median=${ts.sorted.apply(1)}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
