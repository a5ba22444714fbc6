package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Graph}

/** Round-8 ladder extension: the 30× rung was the r7 ladder's last point,
  * so the sort-merge regime (past the broadcast cliff) had exactly one
  * observation for the four shuffle-heaviest flagships. This adds the 100×
  * rung (≈ sf10 volume over the sf0.1 inputs) for q335/q85/q309/q307, with
  * a same-session 30× re-anchor (q85/q309's code changed this round: fused
  * CC rounds, latest-bucket collapse) so the 30→100 slope is measured on
  * one machine state, not spliced across rounds. Same inflation devices
  * and ledger format as [[ScaleLadderR7]].
  *
  * Run: SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.tools.ScaleLadderR8"
  * (optionally pass query names). Results recorded in SURVEY.md §8.9.
  */
object ScaleLadderR8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // the streaming MEMORY sink collects the bucket index to the driver
      // (a gate-harness device — a production index lands in parquet via
      // runToParquet); at the 300x rung the index crosses the 1 GiB
      // default maxResultSize, so raise it for the measurement JVM
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
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
    // hypervisor-steal sampling around each measurement (the Bench.scala
    // device): this box is shared, and an r8 rerun of one rung measured
    // 3× swings with unchanged code — a ledger line without its ambient
    // annotation cannot be adjudicated later
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

    // same base inputs as the r7 ladder (co-purchase graph, documents)
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
    val baseKeep = spark.sparkContext.getPersistentRDDs.keySet.toSet
    keepIds = baseKeep
    println(s"base: edges=${baseEdges.count()} docs=${baseDocs.count()}")

    val Off = 10000000L
    def edgesAt(f: Int): DataFrame =
      baseEdges.crossJoin(spark.range(f.toLong).toDF("rep"))
        .select((col("u") + col("rep") * Off).as("u"),
          (col("v") + col("rep") * Off).as("v"), col("w"))
    def docsAt(f: Int): DataFrame = ReplicaInflation.docsAt(baseDocs, f)

    val scales = sys.env.get("GRAFT_LADDER_SCALES")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(30, 100))
    for (f <- scales) {
      val tag = s"${f}x"
      val e = edgesAt(f).localCheckpoint()
      keepIds = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val eUv = e.select(col("u"), col("v"))

      ledger("q307_coreness", tag) { Graph.coreness(eUv).count() }
      ledger("q335_ktruss", tag) { Graph.kTruss(eUv, k = 5, maxRounds = 12).count() }
      e.unpersist(blocking = false)

      val docs = docsAt(f).localCheckpoint()
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
        // single-file feed, as in the r7 ladder: the rung measures the
        // index+expand+verify volume curve, not the per-batch commit tax
        // (that is measured separately — SURVEY §8.9's multi-batch table)
        val tmp = s"/tmp/ladder8-docs-$f"
        docs.write.mode("overwrite").parquet(tmp)
        val stream = spark.readStream
          .schema(spark.read.parquet(tmp).schema).parquet(tmp)
        graft.streaming.StreamOps.streamingVerifiedNearDups(
          spark, stream, spark.read.parquet(tmp), "doc_id", "text",
          threshold = 0.95, numHashes = 96, bands = 16).count()
      }

      keepIds = baseKeep
      drop()
    }
    spark.stop()
  }
}
