package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for q307 coreness at sf0.1: stepsPerCheckpoint 4 vs 8, alternated
  * same-session so ambient drift cancels. Also prints round counts.
  *
  * Run: sbt "Test/runMain graft.tools.CorenessAB"
  */
object CorenessAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val urgent = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val op = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(urgent, Seq("l_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = op.as("a")
      .join(op.as("b"), col("a.l_orderkey") === col("b.l_orderkey")
        && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct().localCheckpoint()
    println(s"edges: ${edges.count()}")

    // warm
    graft.ops.Graph.coreness(edges, 64, 4).count()

    def run(steps: Int): Double = {
      val t0 = System.nanoTime()
      val n = graft.ops.Graph.coreness(edges, 64, steps).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[steps=$steps] $dt%.2f s  nodes=$n")
      dt
    }
    // alternate to cancel drift
    (1 to 3).foreach { _ => run(4); run(8) }
    spark.stop()
  }
}
