package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for q307 coreness at sf0.1: ranked raw votes (round-6 form) vs the
  * capped-vote histogram (round-7 form), alternated same-session so ambient
  * drift cancels. Also asserts the two fixed points are bit-identical
  * (md5 of the sorted result set).
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

    def fingerprint(df: org.apache.spark.sql.DataFrame): String =
      df.select(md5(concat_ws(":", col("node"), col("coreness"))).as("h"))
        .agg(md5(concat_ws("", collect_list(col("h")))))
        .head().getString(0)

    // identical fixed points (cheap check once, warm for both forms):
    // shipped exchange-free coreness vs the lab's round-6 ranked form
    val fpShipped = fingerprint(
      graft.ops.Graph.coreness(edges, 64, 4).orderBy("node"))
    val fpRanked = fingerprint(
      graft.ops.CorenessLab.run(edges, "ranked").orderBy("node"))
    println(s"fixed points identical: ${fpShipped == fpRanked}  ($fpShipped)")
    require(fpShipped == fpRanked, "shipped vs ranked coreness fixed points differ")

    def run(tag: String, f: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = f().count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[$tag] $dt%.2f s  nodes=$n")
      dt
    }
    // alternate to cancel drift
    (1 to 3).foreach { _ =>
      run("ranked ", () => graft.ops.CorenessLab.run(edges, "ranked"))
      run("shipped", () => graft.ops.Graph.coreness(edges, 64, 4))
    }
    spark.stop()
  }
}
