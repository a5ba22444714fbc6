package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Headroom measurement for the flagship dedup cascade (q85's shape): run
  * MinHash-LSH near-dup detection over the sf0.1 corpus and a synthetically
  * 10×-inflated version of it, and compare CANDIDATE-PAIR growth against the
  * all-pairs quadratic. Inflation appends ~12.5% copy-distinct junk tokens
  * per replica, so replicas are NOT near-dups of each other (Jaccard ≤ 8/9 <
  * 0.95) — the corpus genuinely grows 10× in near-dup-free content while
  * preserving each replica's internal duplicate structure. A bucketing
  * scheme that is linear in corpus size should show ~10× candidates at 10×
  * docs; all-pairs would show 100×. Results recorded in SURVEY.md §8.
  *
  * Run: sbt "Test/runMain graft.tools.ScaleHeadroom"
  */
object ScaleHeadroom {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession
      .builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))

    def inflate(factor: Int): DataFrame =
      docs
        .crossJoin(spark.range(factor.toLong).toDF("i"))
        .select(
          (col("doc_id") * factor + col("i")).as("doc_id"),
          concat(
            col("text"), lit(" "),
            array_join(
              transform(
                sequence(lit(1),
                  greatest(size(split(trim(col("text")), "\\s+")) / 8, lit(1))),
                k => concat(lit("zz"), col("i"), lit("x"), k)),
              " ")).as("text"))

    def measure(label: String, d: DataFrame): Unit = {
      val n = d.count()
      val t0 = System.nanoTime()
      val reps = Dedup.representatives(d, "doc_id", "text").localCheckpoint(true)
      val nReps = reps.count()
      val cands = Dedup
        .minHashCandidates(reps, "doc_id", "text", numHashes = 96, bands = 16)
        .count()
      val verified = Dedup
        .verifiedNearDups(reps, "doc_id", "text",
          threshold = 0.95, numHashes = 96, bands = 16, broadcastAttach = false)
        .localCheckpoint(true)
      val nVerified = verified.count()
      val cc = Dedup.connectedComponents(reps.select(col("doc_id")),
        verified.select(col("id_a"), col("id_b")))
      val nComponents = cc.select(col("component")).distinct().count()
      val secs = (System.nanoTime() - t0) / 1e9
      val allPairs = nReps * (nReps - 1) / 2
      println(f"$label: docs=$n reps=$nReps lsh_candidates=$cands " +
        f"(all-pairs would be $allPairs, ratio ${cands.toDouble / allPairs}%.6f) " +
        f"verified=$nVerified components=$nComponents " +
        f"shuffle_partitions=${spark.conf.get("spark.sql.shuffle.partitions")} " +
        f"cascade_secs=$secs%.1f")
    }

    measure("  1x", docs)
    measure(" 10x", inflate(10))
    spark.stop()
  }
}
