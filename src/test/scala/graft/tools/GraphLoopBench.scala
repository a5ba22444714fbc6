package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused timing for the three iterative graph queries (bench ranks 1, 5,
  * 10 of round 5) — before/after harness for the loop-scoped shuffle-sizing
  * port (Graph.withRoundConf / RoundChain). Mirrors Bench's protocol: warm
  * pass at sf0.001, two timed passes at sf0.1, min per query, state dropped
  * between queries.
  *
  * Run: sbt "Test/runMain graft.tools.GraphLoopBench"
  */
object GraphLoopBench {
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
    val names = Seq("q189_sssp", "q130_kcore", "q150_khop_reach", "q103_pagerank")
    for (n <- names) { graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count(); drop() }
    def pass(): Map[String, Double] = names.map { n =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.1").count()
      val dt = (System.nanoTime() - t0) / 1e9
      drop()
      n -> dt
    }.toMap
    val (p1, p2) = (pass(), pass())
    for (n <- names)
      println(f"$n%-18s min ${math.min(p1(n), p2(n))}%.2f s  (p1 ${p1(n)}%.2f  p2 ${p2(n)}%.2f)")
    // leftover pinned blocks would indicate a RoundChain leak
    println(s"pinned RDDs after drop: ${spark.sparkContext.getPersistentRDDs.size}")
    spark.stop()
  }
}
