package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Graph

/** 10× headroom for kTruss and personalizedPageRankInt, disjoint-replica
  * device (node ids offset per replica): per-replica peel rounds and PPR
  * trajectories are invariant by construction, so truss edge rows and
  * PPR output rows must be exactly 10×. Results recorded in SURVEY §8.7.
  *
  * Run: sbt "Test/runMain graft.tools.ScaleHeadroomR6c"
  */
object ScaleHeadroomR6c {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

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

    val dir = "/root/testdata/sf0.1"
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
      .distinct().localCheckpoint()
    keepIds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    println(s"base edges: ${base.count()}")
    def inflate(factor: Int): DataFrame =
      if (factor == 1) base
      else base.crossJoin(spark.range(factor.toLong).toDF("rep"))
        .select((col("u") + col("rep") * 10000000L).as("u"),
          (col("v") + col("rep") * 10000000L).as("v"))

    for (f <- Seq(1, 10)) {
      val keepSnapshot = keepIds
      val e = inflate(f).localCheckpoint()
      keepIds = keepIds ++ spark.sparkContext.getPersistentRDDs.keySet
      val (nTruss, dt) = timed {
        Graph.kTruss(e, k = 5, maxRounds = 12).count()
      }
      println(f"kTruss x$f: edges=$nTruss wall=$dt%.2f s")
      drop()
      val seeds = e.select(col("u").as("seed"))
        .unionAll(e.select(col("v").as("seed")))
        .distinct().filter(pmod(col("seed"), lit(10000000L)) < 50)
      val (nPpr, dt2) = timed {
        Graph.personalizedPageRankInt(e, seeds, iters = 5).count()
      }
      println(f"personalizedPageRankInt x$f: rows=$nPpr wall=$dt2%.2f s")
      keepIds = keepSnapshot
      drop()
    }
    spark.stop()
  }
}
