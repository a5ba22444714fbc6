package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 task 3 follow-up: attribute q309's RESIDUAL super-linear shuffle.
  * With the expansion join fixed (self-tuned broadcast bound; one-exchange
  * SMJ form), the 30→100× total-shuffle slope measured 4.13× (broadcast
  * regime) / 3.97× (SMJ-pinned) for 3.33× data, and the SMJ-extra column is
  * LINEAR (+641 → +1992 MB) — so ~24% excess bytes live in some OTHER stage
  * of the index→expand→verify pipeline. This lab re-runs the rung pair with
  * the [[StageLedger]] per-job/per-stage tables to name that stage (and to
  * rule retries/recomputes in or out — a recomputed stage double-counts its
  * shuffle write in the ladder's byte totals).
  *
  * Run: SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.tools.Q309Lab 30 100"
  * Results → SURVEY §8.10.
  */
object Q309Lab {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // the streaming MEMORY sink collects the bucket index to the driver
      // (gate-harness device; production uses runToParquet) — past the
      // 1 GiB default at the 300× rung, same as ScaleLadderR8
      .config("spark.driver.maxResultSize", "8g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val ledger = new StageLedger(spark)
    val dir = "/root/testdata/sf0.1"
    val baseDocs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()
    println(s"base docs=${baseDocs.count()}")
    val keepIds = spark.sparkContext.getPersistentRDDs.keySet.toSet

    def docsAt(f: Int): DataFrame = ReplicaInflation.docsAt(baseDocs, f)

    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(30, 100)
    for (f <- scales) {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs
        .filter(kv => !keepIds.contains(kv._1))
        .values.foreach(_.unpersist(blocking = false))
      val tmp = s"/tmp/q309lab-docs-$f"
      docsAt(f).write.mode("overwrite").parquet(tmp)
      val stream = spark.readStream
        .schema(spark.read.parquet(tmp).schema).parquet(tmp)
      ledger.start()
      val t0 = System.nanoTime()
      val n = graft.streaming.StreamOps.streamingVerifiedNearDups(
        spark, stream, spark.read.parquet(tmp), "doc_id", "text",
        threshold = 0.95, numHashes = 96, bands = 16).count()
      val wall = (System.nanoTime() - t0) / 1e9
      ledger.stop()
      println(f"SCALE ${f}x: wall=$wall%.2f s rows=$n")
      ledger.print(topStages = 14)
    }
    spark.stop()
  }
}
