package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 task 6: the 300× rung for the STREAMING family's restart
  * protocols (q354 stream-stream-join restart, q359 session restart) —
  * graphs and dedup have 300× ledger rows (§8.9/§8.11); this closes the
  * streaming gap. q309's 300× point comes from [[Q309Lab]] (`Q309Lab
  * 300`), which already parameterizes its rungs.
  *
  * Construction: the sf0.1 `events` table inflated by f DISJOINT-USER
  * replicas (event_id·f+i, user_id·f+i — the [[ReplicaInflation]]
  * discipline applied to the event stream: no join pair or session can
  * cross replicas, so output rows MUST scale exactly ×f; ts is
  * unchanged, so the time-split staging and watermark behavior are
  * scale-invariant). Each rung stages its own work dir via the
  * registered queries themselves — the ladder runs the exact gate code,
  * including the two-run restart and its "post-restart run processes
  * ONLY the new file" require.
  *
  * Columns: wall (noisy; min over nothing — one restart protocol per
  * rung), output rows (deterministic, must be ×f), per-stage shuffle
  * bytes ([[StageLedger]]), and the RocksDB checkpoint tree size on
  * disk after the second run (the state-size slope; the dir outlives
  * the query until JVM exit, which is what makes the du possible).
  *
  * Run: SPARK_DRIVER_MEM=64g sbt "Test/runMain graft.tools.StreamLadder300 30 100 300"
  * Results → SURVEY §8.12.
  */
object StreamLadder300 {
  def main(args: Array[String]): Unit = {
    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(30, 100, 300)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val baseEv = graft.Tables(spark, "/root/testdata/sf0.1", "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .localCheckpoint()
    println(s"base events=${baseEv.count()}")
    val keepIds = spark.sparkContext.getPersistentRDDs.keySet.toSet

    def eventsAt(f: Int): DataFrame =
      baseEv.crossJoin(spark.range(f.toLong).toDF("i"))
        .select(
          (col("event_id") * f + col("i")).as("event_id"),
          col("ts"),
          (col("user_id") * f + col("i")).as("user_id"),
          col("event_type"), col("value"), col("props"))

    def duBytes(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(duBytes).sum

    def ckptBytes(tag: String, sfDir: String): Long = {
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val base = new java.io.File(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"),
        s"graft-$tag-$key-p${ProcessHandle.current().pid()}")
      duBytes(new java.io.File(base, "ckpt"))
    }

    val ledger = new StageLedger(spark)
    for (f <- scales) {
      val evDir = s"/tmp/streamlad-ev-$f"
      eventsAt(f).write.mode("overwrite").parquet(s"$evDir/events.parquet")
      for ((q, tag) <- Seq(("q354_restart_join", "q354"),
        ("q359_restart_sessions", "q359"))) {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs
          .filter(kv => !keepIds.contains(kv._1))
          .values.foreach(_.unpersist(blocking = false))
        ledger.start()
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(spark, evDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        ledger.stop()
        val ck = ckptBytes(tag, evDir)
        println(f"LADDER $q ${f}x: wall=$wall%.2f s rows=$n ckptMB=${ck / 1e6}%.1f")
        ledger.print(topStages = 8)
      }
      // free the staged input before the next rung
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
        x.delete(); ()
      }
      rm(new java.io.File(evDir))
    }
    spark.stop()
  }
}
