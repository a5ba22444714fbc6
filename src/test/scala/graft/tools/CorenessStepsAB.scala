package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 A/B: coreness stepsPerCheckpoint 4 (shipped default) vs 6 vs 8 —
  * fewer materialized jobs per convergence at constant fixed point. The
  * fixed point is invariant (extra steps past convergence are identity), so
  * only the job count / plan depth trade moves. Alternated same-session so
  * ambient drift cancels; fingerprints asserted identical first.
  *
  * Run: sbt "Test/runMain graft.tools.CorenessStepsAB"
  */
object CorenessStepsAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.codegen.cache.maxEntries", "10000") // match Bench (round-11)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
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
      df.orderBy("node")
        .select(md5(concat_ws(":", col("node"), col("coreness"))).as("h"))
        .agg(md5(concat_ws("", collect_list(col("h")))))
        .head().getString(0)

    val steps = Seq(4, 6, 8)
    val fps = steps.map(k => k -> fingerprint(graft.ops.Graph.coreness(edges, 64, k)))
    println(s"fingerprints: $fps")
    require(fps.map(_._2).distinct.size == 1, "fixed points differ across step counts")

    def run(k: Int): Double = {
      val t0 = System.nanoTime()
      graft.ops.Graph.coreness(edges, 64, k).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[steps=$k] $dt%.2f s")
      dt
    }
    val acc = scala.collection.mutable.Map[Int, List[Double]]().withDefaultValue(Nil)
    (1 to 3).foreach { _ =>
      steps.foreach { k => acc(k) = run(k) :: acc(k) }
    }
    steps.foreach { k =>
      println(f"[steps=$k] min=${acc(k).min}%.2f s over ${acc(k).size} runs")
    }
    spark.stop()
  }
}
