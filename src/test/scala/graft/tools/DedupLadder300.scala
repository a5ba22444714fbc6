package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Round-10: extend the scale ladder to **300×** for the two heaviest
  * non-graph, non-streaming dedup flagships still measured only to 100×
  * (VERDICT r9 "Next round" #8): q85 (exact-collapse → MinHash+LSH →
  * verify cascade) and q98 (PPJoin positional prefix filter, exact
  * recall). Same disjoint-replica inflation, ledger format, in-session
  * 100× re-anchor and steal annotation as [[ScaleLadderR8]] /
  * [[GraphLadder100]], so the 100→300 slope is one machine state.
  *
  * Replica construction keeps every replica a disjoint TOKEN space
  * (`tok_i` suffix per replica): document frequencies per token are
  * replica-invariant, so PPJoin prefixes are identical in every replica
  * and true-pair output must scale exactly ×f — any super-linear rows
  * value is a cross-replica leak (= a correctness bug), any super-linear
  * shuffle slope is a scale cliff.
  *
  * Both queries run their corpus-scale shuffle-attach regime
  * (`broadcastAttach = false`): the ladder measures the 100 TB shape,
  * not the small-corpus broadcast shortcut.
  *
  * Run: SPARK_DRIVER_MEM=80g sbt "Test/runMain graft.tools.DedupLadder300"
  * (optionally pass query names; GRAFT_LADDER_SCALES=100,300 to pin
  * rungs). Results → SURVEY §8.10.
  */
object DedupLadder300 {
  def main(args: Array[String]): Unit = {
    val b0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // GRAFT_NO_AUTOBROADCAST=1: pin the pure-shuffle regime at EVERY rung,
    // for isolating AQE broadcast-vs-SMJ regime boundaries from true
    // operator slope (the 100->300 attribution run)
    val spark = (if (sys.env.get("GRAFT_NO_AUTOBROADCAST").contains("1"))
      b0.config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    else b0).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
    val baseDocs = t("documents").select(col("doc_id"), col("text")).localCheckpoint()
    val baseKeep = spark.sparkContext.getPersistentRDDs.keySet.toSet
    keepIds = baseKeep
    println(s"base: docs=${baseDocs.count()}")

    def docsAt(f: Int): DataFrame = ReplicaInflation.docsAt(baseDocs, f)

    val scales = sys.env.get("GRAFT_LADDER_SCALES")
      .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(100, 300))
    for (f <- scales) {
      val tag = s"${f}x"
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

      ledger("q98_prefix_jaccard", tag) {
        val reps = Dedup.representatives(docs, "doc_id", "text")
        Dedup.prefixFilterJaccardPairs(reps, "doc_id", "text",
          threshold = 0.9, broadcastAttach = false)
          .count()
      }

      keepIds = baseKeep
      drop()
    }
    spark.stop()
  }
}
