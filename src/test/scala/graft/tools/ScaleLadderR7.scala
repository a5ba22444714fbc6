package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Clustering, Dedup, Graph, Relational}

/** Round-7 CONSOLIDATED scale ladder: the top-15 bench queries (by the
  * BENCH_r06 driver ranking) at 1×/10×/30× disjoint-replica inflation in one
  * session, one ledger line per (query, scale) carrying wall seconds, output
  * rows, and shuffle-write bytes (total + largest single stage). Inflation
  * devices are the established per-family ones:
  *   - graph: node-id offsets per replica (per-replica round counts
  *     invariant by construction — ScaleHeadroomGraph's device);
  *   - documents: every token suffixed with the replica index (cross-replica
  *     Jaccard exactly 0 — ScaleHeadroom's device);
  *   - points: coordinate offsets ≫ eps (replicas cannot interact);
  *   - plain tables (lineitem): row replication (distribution-shape
  *     queries need volume, not disjointness).
  * sf0.1 is the largest on-disk SF, so 30× ≈ sf3 volume for these inputs.
  *
  * Also runs the PLANTED-HUB skew case (round-7 task 3): the 10× graph plus
  * one node adjacent to half of all nodes, through the vote-machinery
  * operators (coreness, LPA) — the hub ledger line's wall vs the no-hub 10×
  * line is the skew verdict.
  *
  * Run: sbt "Test/runMain graft.tools.ScaleLadderR7" (optionally pass query
  * names to restrict). Results recorded in SURVEY.md §8.8.
  */
object ScaleLadderR7 {
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
    graft.functions.GraftFunctions.register(spark)
    val only = args.toSet

    // ---- shuffle accounting: stage-completion listener, drained by a
    // short settle sleep before reading (listener delivery is async)
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
    def ledger(q: String, scale: String)(body: => Long): Unit =
      if (only.isEmpty || only(q)) {
        drop()
        Thread.sleep(300)
        totalShuffle.set(0L); maxStageShuffle.set(0L)
        val t0 = System.nanoTime()
        val rows = try body catch {
          case e: Throwable =>
            println(f"LEDGER|$q|$scale|FAILED|${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
            drop()
            return
        }
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500) // settle listener delivery
        println(f"LEDGER|$q|$scale|$wall%.2f|$rows|${totalShuffle.get / 1048576.0}%.1f|${maxStageShuffle.get / 1048576.0}%.1f")
        drop()
      }

    val dir = "/root/testdata/sf0.1"
    def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

    // ---- base inputs (shared localCheckpoints, exempt from drop()) ----
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
      .join(part.select(col("p_partkey").as("u"), col("p_size").as("su")), Seq("u"))
      .join(part.select(col("p_partkey").as("v"), col("p_size").as("sv")), Seq("v"))
      .select(col("u"), col("v"), (lit(1L) + abs(col("su") - col("sv"))).as("w"))
      .localCheckpoint()
    val baseDocs = t("documents").select(col("doc_id"), col("text")).localCheckpoint()
    val basePoints = t("events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("x"), countDistinct(to_date(col("ts"))).as("y"))
      .localCheckpoint()
    val baseLineitem = t("lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
      .localCheckpoint()
    val baseKeep = spark.sparkContext.getPersistentRDDs.keySet.toSet
    keepIds = baseKeep
    println(s"base: edges=${baseEdges.count()} docs=${baseDocs.count()} " +
      s"points=${basePoints.count()} lineitem=${baseLineitem.count()}")

    val Off = 10000000L
    def edgesAt(f: Int): DataFrame =
      if (f == 1) baseEdges
      else baseEdges.crossJoin(spark.range(f.toLong).toDF("rep"))
        .select((col("u") + col("rep") * Off).as("u"),
          (col("v") + col("rep") * Off).as("v"), col("w"))
    def docsAt(f: Int): DataFrame =
      if (f == 1) baseDocs else ReplicaInflation.docsAt(baseDocs, f)
    def pointsAt(f: Int): DataFrame =
      if (f == 1) basePoints
      else basePoints.crossJoin(spark.range(f.toLong).toDF("rep"))
        .select((col("user_id") + col("rep") * Off).as("user_id"),
          (col("x") + col("rep") * Off).as("x"), col("y"))
    def lineitemAt(f: Int): DataFrame =
      if (f == 1) baseLineitem
      else baseLineitem.crossJoin(spark.range(f.toLong).toDF("rep"))
        .select((col("l_orderkey") + col("rep") * Off).as("l_orderkey"),
          col("l_returnflag"), col("l_extendedprice"))

    val scales = Seq(1, 10, 30)
    for (f <- scales) {
      val tag = s"${f}x"
      // materialize the scaled edge list once per scale; graph queries share it
      val e = if (f == 1) baseEdges else edgesAt(f).localCheckpoint()
      keepIds = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val eUv = e.select(col("u"), col("v"))

      ledger("q307_coreness", tag) { Graph.coreness(eUv).count() }
      ledger("q335_ktruss", tag) { Graph.kTruss(eUv, k = 5, maxRounds = 12).count() }
      ledger("q189_sssp", tag) {
        val seeds = e.select(col("u").as("node")).unionAll(e.select(col("v").as("node")))
          .distinct().filter(pmod(col("node"), lit(Off)) < 50)
        Graph.shortestPathsInt(e, seeds, maxRounds = 16).count()
      }
      ledger("q334_ppr", tag) {
        val seeds = e.select(col("u").as("seed")).unionAll(e.select(col("v").as("seed")))
          .distinct().filter(pmod(col("seed"), lit(Off)) < 50)
        Graph.personalizedPageRankInt(eUv, seeds, iters = 5).count()
      }
      ledger("q302_modularity", tag) {
        Graph.modularity(eUv, Graph.labelPropagation(eUv, rounds = 4)).count()
      }
      ledger("q342_densest_peel", tag) { Graph.densestSubgraphPeel(eUv, maxRounds = 24).count() }
      ledger("q310_luby_mis", tag) { Graph.maximalIndependentSet(eUv).count() }
      ledger("q333_diameter_sweep", tag) { Graph.diameterSweep(eUv, maxRounds = 12).count() }
      ledger("q301_lpa", tag) { Graph.labelPropagation(eUv, rounds = 4).count() }
      ledger("q317_matching", tag) { Graph.greedyMatching(eUv).count() }
      ledger("q218_rank_corr", tag) {
        val pr = Graph.pageRankIntFixed(eUv, iters = 5)
        val deg = eUv.select(col("u").as("node")).unionAll(eUv.select(col("v").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        val ra = Relational.globalRank(pr, "rank", "node", "ra").select(col("node"), col("ra"))
        val rb = Relational.globalRank(deg, "deg", "node", "rb").select(col("node"), col("rb"))
        ra.join(rb, Seq("node"))
          .agg(count(lit(1)), sum((col("ra") - col("rb")) * (col("ra") - col("rb"))))
          .count()
      }

      // docs family
      val docs = if (f == 1) baseDocs else docsAt(f).localCheckpoint()
      keepIds = spark.sparkContext.getPersistentRDDs.keySet.toSet
      ledger("q85_dedup_cascade", tag) {
        val base = graft.ops.Par.spread(docs, col("doc_id"))
          .select(col("doc_id"), Dedup.wordSetSignature(col("text")).as("sig"), col("text"))
        val reps = base.groupBy(col("sig"))
          .agg(min(col("doc_id")).as("rep"), min_by(col("text"), col("doc_id")).as("text"))
          .localCheckpoint(true)
        val edges2 = Dedup.verifiedNearDups(
          reps.select(col("rep").as("doc_id"), col("text")), "doc_id", "text",
          threshold = 0.95, numHashes = 96, bands = 16, broadcastAttach = false)
          .select(col("id_a"), col("id_b"))
        val cc = Dedup.connectedComponents(reps.select(col("rep")), edges2)
        base.select(col("doc_id"), col("sig"))
          .join(reps.select(col("sig"), col("rep")), "sig")
          .join(cc, "rep")
          .groupBy(col("component")).agg(count(lit(1)))
          .count()
      }
      ledger("q309_stream_neardup", tag) {
        val tmp = s"/tmp/ladder-docs-$f"
        docs.write.mode("overwrite").parquet(tmp)
        val stream = spark.readStream
          .schema(spark.read.parquet(tmp).schema).parquet(tmp)
        graft.streaming.StreamOps.streamingVerifiedNearDups(
          spark, stream, spark.read.parquet(tmp), "doc_id", "text",
          threshold = 0.95, numHashes = 96, bands = 16).count()
      }

      // plain-table family
      ledger("q91_mad_outliers", tag) {
        Relational.madOutliers(lineitemAt(f), "l_returnflag", "l_extendedprice", k = 3.0).count()
      }
      ledger("q332_grid_dbscan", tag) {
        Clustering.gridDbscan(
          pointsAt(f).select(col("user_id"), col("x"), col("y")), eps = 1L, minPts = 10L).count()
      }

      // planted hub (task 3): 10× graph + one node adjacent to HALF of all
      // nodes — the vote machinery's worst skew shape
      if (f == 10) {
        val hub = Off * 99L
        val hubEdges = eUv.select(col("u").as("node")).unionAll(eUv.select(col("v").as("node")))
          .distinct().filter(pmod(col("node"), lit(2)) === 0)
          .select(least(col("node"), lit(hub)).as("u"), greatest(col("node"), lit(hub)).as("v"))
        val eHub = eUv.unionAll(hubEdges).localCheckpoint()
        keepIds = spark.sparkContext.getPersistentRDDs.keySet.toSet
        println(s"hub edges total=${eHub.count()}")
        ledger("q307_coreness", "10x+hub") { Graph.coreness(eHub).count() }
        ledger("q301_lpa", "10x+hub") { Graph.labelPropagation(eHub, rounds = 4).count() }
        eHub.unpersist(blocking = false)
      }

      // release this scale's checkpoints (the base set stays pinned — a
      // localCheckpoint cannot be recomputed once unpersisted)
      keepIds = baseKeep
      drop()
    }
    spark.stop()
  }
}
