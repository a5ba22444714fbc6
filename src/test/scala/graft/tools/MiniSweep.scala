package graft.tools

import org.apache.spark.sql.SparkSession

/** Controlled experiment for the round-11 sweep-vs-solo gap: runs a list of
  * registered queries back-to-back, Bench-style (warmup at sf0.001 first,
  * then two timed passes at sf0.1, min per query, dropQueryState between) —
  * optionally with extra JVM hygiene (forced GC) after each query's untimed
  * state drop. Prints per-query mins and the total, so the hypothesis
  * "sweep times carry accumulated JVM garbage that solo runs don't pay"
  * gets a number.
  *
  * Run: sbt "Test/runMain graft.tools.MiniSweep <gc|nogc> q1 q2 ..."
  */
object MiniSweep {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MiniSweep <gc|nogc> <query> [query ...]")
    val doGc = args(0) == "gc"
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.codegen.cache.maxEntries", "10000") // match Bench (round-11)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def drop(): Unit = {
      try {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      } catch { case _: Throwable => () }
      if (doGc) System.gc()
    }
    // Bench-style warmup at sf0.001
    names.foreach { n =>
      try { graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count(); () }
      catch { case _: Throwable => () }
      drop()
    }
    def pass(): Map[String, Double] = names.map { n =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").count()
      val dt = (System.nanoTime() - t0) / 1e9
      drop()
      n -> dt
    }.toMap
    val (p1, p2) = (pass(), pass())
    var tot = 0.0
    names.foreach { n =>
      val m = math.min(p1(n), p2(n)); tot += m
      println(f"[minisweep:${args(0)}] $n p1=${p1(n)}%.2f p2=${p2(n)}%.2f min=$m%.2f")
    }
    println(f"[minisweep:${args(0)}] TOTAL min-sum over ${names.size} queries: $tot%.2f s")
    spark.stop()
  }
}
