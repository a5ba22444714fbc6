package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Clustering, Graph}

/** 10× headroom for the late-round-6 operators:
  *
  * - gridDbscan on the per-user activity points, 10× by disjoint COORDINATE
  *   replicas (x offset per replica by a gap > eps, so each replica
  *   clusters independently — roles and per-replica cluster structure are
  *   invariant by construction and output rows must be exactly 10×).
  * - harmonicCentralityInt / diameterSweep on the sf0.1 co-supply graph,
  *   10× by the disjoint-replica node-id-offset device (ScaleHeadroomR6).
  *   Harmonic output rows are 10× the per-replica seed panel; the sweep's
  *   trajectory changes across replicas (md5 of offset ids ⇒ different
  *   start), so wall time and a sane diameter are the check there.
  *
  * Results recorded in SURVEY §8.7. Run:
  *   sbt "Test/runMain graft.tools.ScaleHeadroomR6b"
  */
object ScaleHeadroomR6b {
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

    // ---- gridDbscan: per-user activity points, coordinate-offset replicas
    val pts = spark.read.parquet(s"$dir/events.parquet")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("x"), countDistinct(to_date(col("ts"))).as("y"))
      .select(col("user_id").cast("long").as("id"), col("x"), col("y"))
      .localCheckpoint()
    keepIds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val nPts = pts.count()
    println(s"base points: $nPts")
    def inflatePts(factor: Int): DataFrame =
      if (factor == 1) pts
      else pts.crossJoin(spark.range(factor.toLong).toDF("rep"))
        .select((col("id") + col("rep") * 10000000L).as("id"),
          // gap 1000 >> eps=1: replicas can never be eps-neighbors
          (col("x") + col("rep") * 1000L).as("x"), col("y"))
    for (f <- Seq(1, 10)) {
      val in = inflatePts(f).localCheckpoint()
      val (out, dt) = timed {
        val r = Clustering.gridDbscan(in, eps = 1L, minPts = 10L)
        val roles = r.groupBy(col("role")).count().collect()
          .map(x => (x.getString(0), x.getLong(1))).toMap
        (r.count(), roles)
      }
      println(f"gridDbscan x$f: rows=${out._1} roles=${out._2} wall=$dt%.2f s")
      drop()
    }

    // ---- co-supply graph replicas for the two graph ops
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
    keepIds = keepIds ++ spark.sparkContext.getPersistentRDDs.keySet
    println(s"base edges: ${base.count()}")
    def inflateEdges(factor: Int): DataFrame =
      if (factor == 1) base
      else base.crossJoin(spark.range(factor.toLong).toDF("rep"))
        .select((col("u") + col("rep") * 10000000L).as("u"),
          (col("v") + col("rep") * 10000000L).as("v"))

    for (f <- Seq(1, 10)) {
      // pin the loop-local input across BOTH measurements: the mid-loop
      // drop() would otherwise free this checkpoint's blocks while the
      // second operator still reads them
      val keepSnapshot = keepIds
      val e = inflateEdges(f).localCheckpoint()
      keepIds = keepIds ++ spark.sparkContext.getPersistentRDDs.keySet
      // per-replica seed panel: the q331 seeds (< 50) exist only in replica
      // 0 under the offset device, so replicate them explicitly
      val seeds = e.select(col("u").as("seed"))
        .unionAll(e.select(col("v").as("seed")))
        .distinct().filter(pmod(col("seed"), lit(10000000L)) < 50)
      val (n, dt) = timed {
        Graph.harmonicCentralityInt(e, seeds, k = 3).count()
      }
      println(f"harmonicCentralityInt x$f: rows=$n wall=$dt%.2f s")
      drop()
      val (row, dt2) = timed {
        Graph.diameterSweep(e, maxRounds = 12).head()
      }
      println(f"diameterSweep x$f: $row wall=$dt2%.2f s")
      keepIds = keepSnapshot
      drop()
    }
    spark.stop()
  }
}
