package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.{BloomSkipping, Skipping}

/** Round-10 evidence probe: bloom-filter skipping at a realistic file
  * grain. Builds a 256-file scattered layout from sf0.1 lineitem (the
  * shape of a year of small appends after partial compaction — every
  * file spans ~the full l_orderkey domain, so stats prune nothing), then
  * measures an equality lookup three ways:
  *
  *   full   — plain `spark.read.parquet(root).filter(...)`
  *   stats  — pruned read with manifest only (bloom index removed)
  *   bloom  — pruned read with manifest + bloom index
  *
  * Prints wall seconds, files touched, and rows returned for each; the
  * point is the files-touched ratio (256 → a handful) and that the
  * probe-side decision cost (driver JSON parse + ≤256 bloom probes) is
  * milliseconds, not a second scan.
  *
  * Run: SPARK_DRIVER_MEM=16g sbt "Test/runMain graft.tools.BloomScaleProbe"
  */
object BloomScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = "/tmp/graft-bloomprobe-256"
    val done = new java.io.File(root, "_PROBE_DONE")
    if (!done.exists()) {
      spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
        .repartition(256)
        .write.mode("overwrite").parquet(root)
      Skipping.writeManifest(spark, root, Seq("l_orderkey", "l_quantity"))
      BloomSkipping.writeBloomIndex(spark, root, Seq("l_orderkey"))
      done.createNewFile()
      ()
    }

    val key = spark.read.parquet(root)
      .filter(col("l_orderkey") % 7 === 0)
      .agg(max(col("l_orderkey"))).collect()(0).getLong(0)
    val pred = s"l_orderkey = $key"

    def timed(tag: String)(body: => (Long, String)): Unit = {
      // 2 passes, min — same discipline as Bench
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val (rows, extra) = body
        ((System.nanoTime() - t0) / 1e9, rows, extra)
      }
      val best = runs.minBy(_._1)
      println(f"PROBE|$tag|${best._1}%.3f|rows=${best._2}|${best._3}")
    }

    timed("full") {
      (spark.read.parquet(root).filter(pred).count(), "files=256")
    }
    // stats-only: hide the bloom index
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val idx = new org.apache.hadoop.fs.Path(root, BloomSkipping.IndexName)
    val hidden = new org.apache.hadoop.fs.Path(root, "_bloom_hidden")
    fs.rename(idx, hidden)
    timed("stats") {
      val pr = Skipping.readPrunedDetailed(spark, root, pred)
      (pr.df.count(), s"files=${pr.selected}/${pr.total} fallback=${pr.fallback}")
    }
    fs.rename(hidden, idx)
    timed("bloom") {
      val pr = Skipping.readPrunedDetailed(spark, root, pred)
      (pr.df.count(),
        s"files=${pr.selected}/${pr.total} stats=${pr.statsSelected} fallback=${pr.fallback}")
    }
    spark.stop()
  }
}
