package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Bpe, Relational}

/** 10x headroom runs for the round-5 devices: the bucketed global prefix
  * sum (q139/q148/q223's machinery) and BPE merge training (q226). Both
  * should scale ~linearly in input: globalPrefixSum's only data-sized
  * shuffles are the bucket assignment and the in-bucket windows (the bucket
  * table stays nBuckets rows however big the input); BPE's per-round pair
  * table is vocabulary-sized, and the vocabulary inflation here is genuine
  * (replica-suffixed tokens — disjoint across replicas, the ScaleHeadroom
  * corpus-inflation discipline). Results recorded in SURVEY.md §8.6.
  *
  * Run: sbt "Test/runMain graft.tools.ScaleHeadroomR5"
  */
object ScaleHeadroomR5 {
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

    def drop(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // ---- globalPrefixSum over synthetic populations (hash-valued keys so
    // bucket occupancy is uniform; unique (v, tie) by construction)
    def prefixRun(n: Long): Double = {
      val df = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(1000000L)).as("v"),
        col("id").as("tie"), (col("id") % 97).as("m"))
      val (_, dt) = timed {
        // consume cum+rk: a bare count() lets column pruning DELETE the
        // window operators and times nothing (measured: 20M "in" 0.36 s)
        Relational.globalPrefixSum(df, "v", "tie", "m", "cum",
            includeCurrent = true, rankCol = Some("rk"))
          .agg(sum(col("cum") + col("rk"))).collect()
      }
      drop(); dt
    }
    // comparison arm: the single-reducer unpartitioned window form
    def windowRun(n: Long): Double = {
      import org.apache.spark.sql.expressions.{Window => W}
      val df = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(1000000L)).as("v"),
        col("id").as("tie"), (col("id") % 97).as("m"))
      val w = W.orderBy(col("v"), col("tie"))
      val (_, dt) = timed {
        df.withColumn("cum", sum(col("m")).over(
            w.rowsBetween(W.unboundedPreceding, 0)))
          .withColumn("rk", row_number().over(w))
          .agg(sum(col("cum") + col("rk"))).collect()
      }
      drop(); dt
    }
    prefixRun(100000L); windowRun(100000L) // warm
    val p1 = prefixRun(2000000L)
    val p10 = prefixRun(20000000L)
    val w1 = windowRun(2000000L)
    val w10 = windowRun(20000000L)
    println(f"[globalPrefixSum] 2M: $p1%.2f s  20M: $p10%.2f s  ratio ${p10 / p1}%.1f" +
      f"   [single-window] 2M: $w1%.2f s  20M: $w10%.2f s  ratio ${w10 / w1}%.1f")

    // ---- BPE over the sf0.1 vocabulary and a 10x replica-suffixed one
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def vocab(factor: Int): DataFrame = {
      val base = docs
        .select(explode(graft.ops.TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val inflated =
        if (factor == 1) base
        else base.crossJoin(spark.range(factor.toLong).toDF("i"))
          .select(concat(col("token"), lit("_"), col("i")).as("token"), col("cnt"))
      inflated.select(Bpe.charSeq(col("token")).as("seq"), col("cnt"))
    }
    def bpeRun(factor: Int): (Long, Double) = {
      val v = vocab(factor).localCheckpoint()
      val n = v.count()
      val (_, dt) = timed { Bpe.trainMerges(v, "seq", "cnt", rounds = 4).count() }
      drop(); (n, dt)
    }
    // the synthetic corpus vocabulary is tiny (~31 tokens at sf0.1), so the
    // honest scale test inflates it 100x and 10000x — pair-table volume
    // grows with vocabulary x word length, the device's real driver
    bpeRun(100) // warm
    val (n1, b1) = bpeRun(100)
    val (n10, b10) = bpeRun(10000)
    println(f"[bpe 4 rounds] vocab $n1: $b1%.2f s   vocab $n10: $b10%.2f s   ratio ${b10 / b1}%.1f")
    spark.stop()
  }
}
