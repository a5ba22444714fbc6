package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Graph

/** Round-9: extend the 100× rung (≈ sf10 volume) to the ITERATIVE graph
  * family — r8's ladder took only the four shuffle-heaviest flagships to
  * 100× and left LPA / PPR / SSSP / harmonic / k-hop at 30× (VERDICT r8
  * "What's missing" #3). Same disjoint-replica inflation, ledger format,
  * and steal annotation as [[ScaleLadderR8]]; 30× re-anchored in-session so
  * the 30→100 slope is one machine state.
  *
  * Run: SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.tools.GraphLadder100"
  * (optionally pass query names). Results → SURVEY §8.10.
  */
object GraphLadder100 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = args.toSet

    val totalShuffle = new java.util.concurrent.atomic.AtomicLong(0L)
    val maxStageShuffle = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val b = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        totalShuffle.addAndGet(b)
        maxStageShuffle.updateAndGet(m => math.max(m, b))
        ()
      }
    })

    var keepIds: Set[Int] = Set.empty
    def drop(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filter(kv => !keepIds.contains(kv._1))
        .values.foreach(_.unpersist(blocking = false))
    }
    def stealTotal(): (Long, Long) = {
      try {
        val f = scala.io.Source.fromFile("/proc/stat")
        val cols = try f.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        finally f.close()
        (cols.lift(7).getOrElse(0L), cols.sum)
      } catch { case _: Throwable => (0L, 1L) }
    }
    def ledger(q: String, scale: String)(body: => Long): Unit =
      if (only.isEmpty || only(q)) {
        drop()
        Thread.sleep(300)
        totalShuffle.set(0L); maxStageShuffle.set(0L)
        val (s0, j0) = stealTotal()
        val t0 = System.nanoTime()
        val rows = try body catch {
          case e: Throwable =>
            println(f"LEDGER|$q|$scale|FAILED|${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
            drop()
            return
        }
        val wall = (System.nanoTime() - t0) / 1e9
        val (s1, j1) = stealTotal()
        val stealPct = 100.0 * (s1 - s0) / math.max(1L, j1 - j0)
        Thread.sleep(500)
        println(f"LEDGER|$q|$scale|$wall%.2f|$rows|${totalShuffle.get / 1048576.0}%.1f|${maxStageShuffle.get / 1048576.0}%.1f|steal=$stealPct%.2f%%")
        drop()
      }

    val dir = "/root/testdata/sf0.1"
    def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
    val urgent = t("orders").filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val op = t("lineitem").join(urgent, Seq("l_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val part = t("part").select(col("p_partkey"), col("p_size"))
    val baseEdges = op.as("a")
      .join(op.as("b"), col("a.l_orderkey") === col("b.l_orderkey")
        && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .join(part.select(col("p_partkey").as("u"), col("p_size").as("su")), Seq("u"))
      .join(part.select(col("p_partkey").as("v"), col("p_size").as("sv")), Seq("v"))
      .select(col("u"), col("v"), (lit(1L) + abs(col("su") - col("sv"))).as("w"))
      .localCheckpoint()
    val baseKeep = spark.sparkContext.getPersistentRDDs.keySet.toSet
    keepIds = baseKeep
    println(s"base: edges=${baseEdges.count()}")

    val Off = 10000000L
    def edgesAt(f: Int): DataFrame =
      baseEdges.crossJoin(spark.range(f.toLong).toDF("rep"))
        .select((col("u") + col("rep") * Off).as("u"),
          (col("v") + col("rep") * Off).as("v"), col("w"))

    val scales = sys.env.get("GRAFT_LADDER_SCALES")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(30, 100))
    for (f <- scales) {
      val tag = s"${f}x"
      val e = edgesAt(f).localCheckpoint()
      keepIds = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val eUv = e.select(col("u"), col("v"))
      // per-replica-invariant seed panels: pmod keeps the same 50 seeds in
      // every replica, so output rows must scale exactly with f
      def seedPanel(name: String): DataFrame =
        e.select(col("u").as(name)).unionAll(e.select(col("v").as(name)))
          .distinct().filter(pmod(col(name), lit(Off)) < 50)

      ledger("q301_lpa", tag) { Graph.labelPropagation(eUv, rounds = 4).count() }
      ledger("q334_ppr", tag) {
        Graph.personalizedPageRankInt(eUv, seedPanel("seed"), iters = 5).count()
      }
      ledger("q189_sssp", tag) {
        Graph.shortestPathsInt(e, seedPanel("node"), maxRounds = 16).count()
      }
      ledger("q341_harmonic", tag) {
        Graph.harmonicCentralityInt(eUv, seedPanel("seed"), k = 4).count()
      }
      ledger("q150_khop", tag) {
        Graph.kHopCounts(eUv, seedPanel("seed"), k = 3).count()
      }

      keepIds = baseKeep
      drop()
    }
    spark.stop()
  }
}
