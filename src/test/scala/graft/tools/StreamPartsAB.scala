package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the streaming gates under different `spark.sql.shuffle.partitions`
  * scoped around the query invocation — the knob that fixes the number of
  * state-store partitions (and RocksDB instances) a stateful streaming
  * query commits per microbatch. Hypothesis (round-11 QueryLedger): the
  * microbatch jobs' executor time is dominated by per-partition RocksDB
  * open/commit fixed cost (~0.5 s/task over KB-sized batches), so fewer
  * state partitions at tiny scale should cut the streaming family's wall
  * without touching results (outputs are set-equal under any partitioning).
  *
  * Run: sbt "Test/runMain graft.tools.StreamPartsAB <parts> q... "
  */
object StreamPartsAB {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StreamPartsAB <parts> <query> [query ...]")
    val parts = args(0)
    val names = args.drop(1).toSeq
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
      System.gc()
    }
    val key = "spark.sql.shuffle.partitions"
    def runScoped(n: String, dir: String): Map[String, Double] = names.map { q =>
      val prev = spark.conf.get(key)
      spark.conf.set(key, n)
      val t0 = System.nanoTime()
      try graft.SparkEntry.queries(q)(spark, dir).count()
      finally spark.conf.set(key, prev)
      val dt = (System.nanoTime() - t0) / 1e9
      drop()
      q -> dt
    }.toMap
    runScoped(parts, "/root/testdata/sf0.001") // warm
    val p1 = runScoped(parts, "/root/testdata/sf0.1")
    val p2 = runScoped(parts, "/root/testdata/sf0.1")
    var tot = 0.0
    names.foreach { q =>
      val m = math.min(p1(q), p2(q)); tot += m
      println(f"[streamparts:$parts] $q p1=${p1(q)}%.2f p2=${p2(q)}%.2f min=$m%.2f")
    }
    println(f"[streamparts:$parts] TOTAL over ${names.size}: $tot%.2f s")
    spark.stop()
  }
}
