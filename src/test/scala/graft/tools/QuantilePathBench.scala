package graft.tools

import org.apache.spark.sql.SparkSession

/** Crossover measurement for the quantile core's size-based path choice
  * (verdict r4 #4): times q82 (and the heavier q91, which runs the
  * machinery twice) at sf0.1 under the Bench session shape with the path
  * forced each way, so the threshold default rests on measured numbers,
  * not guesses. Results recorded in SURVEY.md §8.
  *
  * Run: sbt "Test/runMain graft.tools.QuantilePathBench"
  */
object QuantilePathBench {
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
    graft.functions.GraftFunctions.register(spark)

    def drop(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def time(q: String, n: Int): Double = {
      val fn = graft.SparkEntry.queries(q)
      fn(spark, "/root/testdata/sf0.001").count(); drop() // warm
      (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, "/root/testdata/sf0.1").count()
        val dt = (System.nanoTime() - t0) / 1e9
        drop()
        dt
      }.min
    }
    val key = "spark.graft.quantiles.windowPathMaxPairs"
    for (q <- Seq("q82_exact_quantiles", "q91_mad_outliers")) {
      spark.conf.set(key, Long.MaxValue.toString)
      val w = time(q, 5)
      spark.conf.set(key, "0")
      val b = time(q, 5)
      spark.conf.unset(key)
      val d = time(q, 5)
      println(f"[$q] window=$w%.3f s  bucketed=$b%.3f s  default=$d%.3f s")
    }
    spark.stop()
  }
}
