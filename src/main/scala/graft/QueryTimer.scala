package graft

import org.apache.spark.sql.SparkSession

/** Solo steady-state timer for one registered query — the adjudication tool
  * the bench guard's in-sweep numbers get checked against. A guard-tripped
  * query's sweep time carries its neighbors' cache pressure and scheduler
  * noise; this main runs exactly one query, warm, N times, and prints the
  * min — the figure that separates "the plan moved" from "the machine
  * moved". Usage: `runMain graft.QueryTimer <queryName> [reps=3]` with
  * `SPARK_GRAFT_SF_DIR` selecting the data.
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryTimer <queryName> [reps]")
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(
      name, sys.error(s"unknown query: $name"))
    def dropState(): Unit = {
      try {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      } catch { case _: Throwable => () }
    }
    // one untimed warmup at the target SF (JIT + parquet footer cache)
    fn(spark, sfDir).count()
    dropState()
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      dropState()
      dt
    }
    println(f"""{"query":"$name","sf":"$sfDir","reps":$reps,"times":[${times.map(t => f"$t%.3f").mkString(",")}],"min":${times.min}%.3f}""")
    spark.stop()
  }
}
