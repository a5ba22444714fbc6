package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone steady-state timer for individual SparkEntry queries —
  * Bench's exact session settings (local[32], shuffle=8, AQE on) and
  * per-query state hygiene, restricted to the names passed on the command
  * line so a single query's time can be re-measured without the 300-query
  * sweep.
  *
  * Run: sbt "Test/runMain graft.tools.QueryTimer q307_coreness [q...]"
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q307_coreness")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def drop(): Unit = {
      try {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      } catch { case _: Throwable => () }
    }
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      fn(spark, "/root/testdata/sf0.001").count() // JIT warm
      drop()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, "/root/testdata/sf0.1").count()
        val dt = (System.nanoTime() - t0) / 1e9
        drop()
        dt
      }
      println(f"[timer] $name pass1=${times(0)}%.2f s pass2=${times(1)}%.2f s min=${times.min}%.2f s")
    }
    spark.stop()
  }
}
