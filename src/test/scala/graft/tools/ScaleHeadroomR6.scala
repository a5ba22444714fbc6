package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Graph, Similarity}

/** 10× headroom for the round-6 operators, disjoint-replica device (node
  * ids offset per replica, so per-replica round counts are invariant by
  * construction and output rows must be exactly 10×):
  * maximalIndependentSet, greedyMatching, wlColors, deterministicWalks on
  * the sf0.1 co-supply graph; kCenterCoreset on a 10×-replicated embedding
  * corpus (vec ids offset; k centers stay k, so the rows-10× check does
  * not apply — wall time and the exact-integer trajectory are the point).
  * Results recorded in SURVEY §8.7.
  *
  * Run: sbt "Test/runMain graft.tools.ScaleHeadroomR6"
  */
object ScaleHeadroomR6 {
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
        .localCheckpoint()

    def sweep(name: String)(body: DataFrame => DataFrame): Unit = {
      def run(factor: Int): (Long, Double) = {
        val e = inflate(factor)
        val (n, dt) = timed { body(e).count() }
        drop(); (n, dt)
      }
      run(1) // warm
      val (n1, t1) = run(1)
      val (n10, t10) = run(10)
      val linear = if (n10 == 10 * n1) "rows 10x exact" else s"ROWS MISMATCH $n1 -> $n10"
      println(f"[$name] 1x: $t1%.2f s ($n1 rows)  10x: $t10%.2f s ($n10 rows)  " +
        f"ratio ${t10 / t1}%.1f  ($linear)")
    }

    sweep("maximalIndependentSet")(e => Graph.maximalIndependentSet(e))
    sweep("greedyMatching")(e => Graph.greedyMatching(e))
    sweep("wlColors r=3")(e => Graph.wlColors(e, rounds = 3))
    sweep("deterministicWalks s=8")(e => Graph.deterministicWalks(e, steps = 8))

    // k-center: replicate the embedding corpus with offset ids; k stays 8
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .localCheckpoint()
    keepIds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    for (factor <- Seq(1, 1, 10)) {
      val df =
        if (factor == 1) emb
        else emb.crossJoin(spark.range(factor.toLong).toDF("rep"))
          .select((col("vec_id") + col("rep") * 10000000L).as("vec_id"), col("embedding"))
          .localCheckpoint()
      val (n, dt) = timed { Similarity.kCenterCoreset(df, "vec_id", "embedding", k = 8).count() }
      println(f"[kCenterCoreset k=8] ${factor}x: $dt%.2f s ($n rows)")
      drop()
    }
    spark.stop()
  }
}
