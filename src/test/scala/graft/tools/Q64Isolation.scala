package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolation re-measurement for q64_salted_join's unexplained r3→r4 bench
  * swing (1.13 s → 3.46 s with no code change). Runs the query solo at
  * sf0.1 under the exact Bench session shape (local[32], shuffle=8, AQE on),
  * N timed repetitions after a warmup, sampling hypervisor steal from
  * /proc/stat around each run so a noisy number is attributable in-file.
  * Also repeats the series at shuffle=32 to test the verdict's AQE-
  * coalescing suspect. Results recorded in SURVEY.md §8.
  *
  * Run: sbt "Test/runMain graft.tools.Q64Isolation"
  */
object Q64Isolation {
  private def stealJiffies(): Long = {
    val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
    // cpu  user nice system idle iowait irq softirq steal ...
    line.trim.split("\\s+").drop(1).map(_.toLong).lift(7).getOrElse(0L)
  }
  private def totalJiffies(): Long = {
    val line = scala.io.Source.fromFile("/proc/stat").getLines().next()
    line.trim.split("\\s+").drop(1).map(_.toLong).sum
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val q = graft.SparkEntry.queries("q64_salted_join")
    // warmup: JIT + parquet reader, untimed
    q(spark, "/root/testdata/sf0.001").count()
    q(spark, "/root/testdata/sf0.1").count()

    def series(label: String, n: Int): Unit = {
      val times = (1 to n).map { _ =>
        val (s0, t0) = (stealJiffies(), totalJiffies())
        val w0 = System.nanoTime()
        q(spark, "/root/testdata/sf0.1").count()
        val dt = (System.nanoTime() - w0) / 1e9
        val stealPct =
          100.0 * (stealJiffies() - s0) / math.max(1L, totalJiffies() - t0)
        println(f"[$label] run: $dt%.3f s  steal: $stealPct%.1f%%")
        dt
      }
      println(f"[$label] min=${times.min}%.3f  median=${times.sorted.apply(n / 2)}%.3f  max=${times.max}%.3f")
    }

    series("shuffle=8", 7)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    series("shuffle=32", 7)
    spark.stop()
  }
}
