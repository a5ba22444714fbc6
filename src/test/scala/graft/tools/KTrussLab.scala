package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Graph, RoundTrace}

/** Round-9 task 4: attribute q335_ktruss's 100× wall slope. The r8 ladder
  * measured k-truss wall 3.77× for 3.33× data (ratio 1.13, the worst of the
  * four flagships) while its shuffle stayed exactly linear (3.35×) — so
  * something per-stage is super-proportional and it is NOT shuffle volume.
  * Hypotheses from VERDICT r8: sort spill in the peel semi-joins; round
  * count growth (ruled in/out by RoundTrace — the replicated graph has
  * identical per-replica structure, so rounds SHOULD be scale-invariant).
  *
  * Device: the observe-fused loop runs ONE action per round, so per-JOB
  * attribution IS per-round attribution ([[StageLedger]]); the job-wise
  * 100/30 ratio column names the stage whose growth exceeds the 3.33× data
  * step.
  *
  * Run: SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.tools.KTrussLab 30 100"
  * Results → SURVEY §8.10.
  */
object KTrussLab {
  def main(args: Array[String]): Unit = {
    // A/B pin for the support-aggregation form (env → sys prop so the
    // forked JVM sees it): plain | repart | unset = the heap-derived auto
    sys.env.get("GRAFT_KTRUSS_AGG")
      .foreach(v => sys.props("graft.ktruss.supportAgg") = v)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ledger = new StageLedger(spark)
    val dir = "/root/testdata/sf0.1"
    def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
    val part = t("part").select(col("p_partkey"), col("p_size"))
    val urgent = t("orders").filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val op = t("lineitem").join(urgent, Seq("l_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val baseEdges = op.as("a")
      .join(op.as("b"), col("a.l_orderkey") === col("b.l_orderkey")
        && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
      .join(part.select(col("p_partkey").as("u")), Seq("u"))
      .join(part.select(col("p_partkey").as("v")), Seq("v"))
      .select(col("u"), col("v"))
      .localCheckpoint()
    println(s"base edges=${baseEdges.count()}")

    val Off = 10000000L
    def edgesAt(f: Int): DataFrame =
      baseEdges.crossJoin(spark.range(f.toLong).toDF("rep"))
        .select((col("u") + col("rep") * Off).as("u"),
          (col("v") + col("rep") * Off).as("v"))

    // keep the base localCheckpoint's blocks alive across scale loops
    // (unpersisting them before edgesAt materializes throws
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — the ScaleLadderR8 keepIds rule)
    val keepIds = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(30, 100)
    for (f <- scales) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filter(kv => !keepIds.contains(kv._1))
        .values.foreach(_.unpersist(blocking = false))
      val e = edgesAt(f).localCheckpoint()
      ledger.start()
      val t0 = System.nanoTime()
      val n = Graph.kTruss(e, k = 5, maxRounds = 12).count()
      val wall = (System.nanoTime() - t0) / 1e9
      ledger.stop()
      println(f"SCALE ${f}x: wall=$wall%.2f s rows=$n rounds=${RoundTrace("ktruss")}")
      ledger.print(topStages = 12)
      e.unpersist(blocking = false)
    }
    spark.stop()
  }
}
