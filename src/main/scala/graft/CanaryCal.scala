package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, count, lit, xxhash64, max}

/** Derives the quiet-host canary reference band for
  * BENCH_CANARY_REF.json: runs the EXACT probe pair graft.Bench
  * measures at every block-group fencepost (same session shape — same
  * master, shuffle partitions, spark.local.dir policy), N alternating
  * samples per class after an off-clock warm pair, and prints the
  * suggested reference JSON. Run it on a KNOWN-QUIET host (check the
  * loadavg lines it prints) and commit the output; the bench compares
  * each run's minimum fence against `band × *_quiet_sec` to emit
  * `run_contended`.
  *
  * The suggested reference is the quiet MEDIAN per class:
  * `run_contended` fires on the run's MINIMUM fence, and the minimum
  * of ~9 independent quiet draws exceeds the quiet median with
  * probability ~0.5^9 — so a quiet run false-flags essentially never
  * even BEFORE the 1.5× band, while the median stays robust to a
  * couple of contaminated calibration samples (the max is one bad
  * sample away from an uselessly wide band). Usage:
  *   sbt "runMain graft.CanaryCal [samplesPerClass]"
  */
object CanaryCal {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(12)
    // same local-dir policy as Bench INCLUDING the override: the
    // shuffle probe must measure the same storage tier the bench's
    // fences will run on, or a disk-local.dir bench compares its
    // fences against a tmpfs-calibrated band (spurious run_contended)
    val localDir = {
      val base = sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
        if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
          "/dev/shm" else sys.props("java.io.tmpdir"))
      val d = java.nio.file.Paths.get(base,
        s"graft-canarycal-${ProcessHandle.current().pid()}")
      java.nio.file.Files.createDirectories(d)
      d.toString
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadavg(): String = try {
      val s = scala.io.Source.fromFile("/proc/loadavg")
      try s.mkString.trim.split("\\s+").take(3).mkString(" ") finally s.close()
    } catch { case scala.util.control.NonFatal(_) => "unavailable" }
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // probe bodies duplicated from Bench deliberately AS A PAIR with
    // the names below: the probe version IS the name pair, so an edit
    // here without renaming breaks the contract the same way it would
    // in Bench — keep both files in lockstep
    def cpuProbe(): Double = time {
      spark.range(400000000L).select(xxhash64(col("id")).as("h"))
        .agg(max(col("h"))).write.format("noop").mode("overwrite").save()
    }
    def shufProbe(): Double = time {
      spark.range(24000000L).repartition(64, col("id"))
        .agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    }
    cpuProbe(); shufProbe() // off-clock warm pair, like the bench
    val samples = (1 to n).map { i =>
      val c = cpuProbe(); val s = shufProbe()
      println(f"[canarycal] sample $i%2d: cpu=$c%.3f shuf=$s%.3f load=${loadavg()}")
      (c, s)
    }
    spark.stop()
    Bench.deleteRecursively(localDir)
    val cpu = samples.map(_._1).sorted
    val shuf = samples.map(_._2).sorted
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(f"[canarycal] cpu  min=${cpu.head}%.3f med=${cpu(cpu.size / 2)}%.3f max=${cpu.last}%.3f")
    println(f"[canarycal] shuf min=${shuf.head}%.3f med=${shuf(shuf.size / 2)}%.3f max=${shuf.last}%.3f")
    val ref =
      s"""{"probe_version":"synthetic:range400M-xxhash-max+synthetic:range24M-repart64-count",
         | "host":${JsonUtil.q(Bench.hostFingerprint())},
         | "cpu_quiet_sec":${f3(cpu(cpu.size / 2))},
         | "shuf_quiet_sec":${f3(shuf(shuf.size / 2))},
         | "band":1.5,
         | "derived":"graft.CanaryCal, n=$n quiet samples, quiet-median per class"}""".stripMargin
    println("[canarycal] suggested BENCH_CANARY_REF.json:")
    println(ref)
  }
}
