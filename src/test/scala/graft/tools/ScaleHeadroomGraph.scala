package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Graph

/** 10x headroom runs for the iterative graph operators, by the same
  * disjoint-replica inflation discipline as the dedup family's
  * ScaleHeadroom: the sf0.1 co-supply graph (241k edges / 20k nodes) is
  * replicated with node ids offset per replica, so the 10x corpus is ten
  * disjoint copies — per-replica round counts are invariant by
  * construction, which makes wall-clock ratio the honest scaling signal
  * (a super-linear ratio would mean the per-round shuffles or the
  * broadcast decisions degrade with graph size, not that the algorithm
  * needs more rounds). Seeds are replicated with the same offsets so
  * per-replica work is identical. Results recorded in SURVEY.md §8.7.
  *
  * Run: sbt "Test/runMain graft.tools.ScaleHeadroomGraph"
  */
object ScaleHeadroomGraph {
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

    // the base edge list is a shared localCheckpoint reused across all
    // runs — a localCheckpoint CANNOT be recomputed once unpersisted, so
    // the per-run state drop must exempt its blocks
    var keepIds: Set[Int] = Set.empty
    def drop(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filter(kv => !keepIds.contains(kv._1))
        .values.foreach(_.unpersist(blocking = false))
    }
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // sf0.1 co-supply graph with the q189 weight (1 + |size diff|), built
    // once; inflation offsets both endpoints by replica * 10M (disjoint)
    val dir = "/root/testdata/sf0.1"
    val part = spark.read.parquet(s"$dir/part.parquet")
      .select(col("p_partkey"), col("p_size"))
    val urgent = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val op = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(urgent, Seq("l_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val base = op.as("a")
      .join(op.as("b"), col("a.l_orderkey") === col("b.l_orderkey")
        && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .join(part.select(col("p_partkey").as("u"), col("p_size").as("su")), Seq("u"))
      .join(part.select(col("p_partkey").as("v"), col("p_size").as("sv")), Seq("v"))
      .select(col("u"), col("v"), (lit(1L) + abs(col("su") - col("sv"))).as("w"))
      .localCheckpoint()
    keepIds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val nBase = base.count()

    def inflate(factor: Int): DataFrame =
      if (factor == 1) base
      else base.crossJoin(spark.range(factor.toLong).toDF("rep"))
        .select((col("u") + col("rep") * 10000000L).as("u"),
          (col("v") + col("rep") * 10000000L).as("v"), col("w"))
        .localCheckpoint()

    def seedsOf(e: DataFrame): DataFrame = e
      .select(col("u").as("seed")).unionAll(e.select(col("v").as("seed")))
      .distinct().filter(pmod(col("seed"), lit(10000000L)) < 50)

    def run(name: String, factor: Int)(body: DataFrame => DataFrame): (Long, Double) = {
      val e = inflate(factor)
      val (n, dt) = timed { body(e).count() }
      drop(); (n, dt)
    }

    def sweep(name: String)(body: DataFrame => DataFrame): Unit = {
      run(name, 1)(body) // warm (JIT + page cache)
      val (n1, t1) = run(name, 1)(body)
      val (n10, t10) = run(name, 10)(body)
      val linear = if (n10 == 10 * n1) "rows 10x exact" else s"ROWS MISMATCH $n1 -> $n10"
      println(f"[$name] 1x: $t1%.2f s ($n1 rows)  10x: $t10%.2f s ($n10 rows)  " +
        f"ratio ${t10 / t1}%.1f  ($linear)")
    }

    println(s"base edges: $nBase")
    sweep("pageRankIntFixed i=5")(e => Graph.pageRankIntFixed(e.select("u", "v"), iters = 5))
    sweep("kCore k=8")(e => Graph.kCore(e.select("u", "v"), k = 8))
    sweep("shortestPathsInt r<=16")(e => Graph.shortestPathsInt(e, seedsOf(e), maxRounds = 16))
    sweep("kHopCounts k=3")(e => Graph.kHopCounts(e.select("u", "v"), seedsOf(e), k = 3))
    sweep("labelPropagation r=4")(e => Graph.labelPropagation(e.select("u", "v"), rounds = 4))
    sweep("coreness")(e => Graph.coreness(e.select("u", "v")))
    // modularity output is one row regardless of scale, so the rows-10x
    // check does not apply; time it separately over precomputed labels
    for (factor <- Seq(1, 10)) {
      val e = inflate(factor)
      val labels = Graph.labelPropagation(e.select("u", "v"), rounds = 4).localCheckpoint()
      val (_, dt) = timed { Graph.modularity(e.select("u", "v"), labels).count() }
      println(f"[modularity over precomputed labels] ${factor}x: $dt%.2f s")
      drop()
    }
    spark.stop()
  }
}
