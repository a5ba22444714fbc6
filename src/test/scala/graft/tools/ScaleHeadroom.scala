package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Headroom measurement for the flagship dedup cascade (q85's shape): run
  * MinHash-LSH near-dup detection over the sf0.1 corpus and a synthetically
  * 10×-inflated version of it, and compare CANDIDATE-PAIR growth against the
  * all-pairs quadratic. Inflation suffixes every token with the replica
  * index, so replica token spaces are fully DISJOINT (cross-replica Jaccard
  * = 0) while each replica preserves the original corpus's internal
  * duplicate structure — the corpus genuinely grows 10× in distinct
  * content. (Appending junk tokens instead would NOT work: even 12.5% junk
  * leaves cross-replica Jaccard ≈ 0.89, and a 16-band×6-row banding catches
  * 0.89-similar pairs with probability ≈ 1 — candidates would grow
  * quadratically because the corpus is quadratically self-similar, not
  * because the operator buckets wrongly.) A bucketing scheme linear in
  * corpus size should show ~10× candidates and ~10× verified pairs at 10×
  * docs; all-pairs would show 100×. Results recorded in SURVEY.md §8.5.
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
          array_join(
            transform(
              filter(split(trim(col("text")), "\\s+"), t => t =!= ""),
              t => concat(t, lit("_"), col("i"))),
            " ").as("text"))

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

    // ---- prefix-filter exact join headroom (q98's operator): inflation
    // keeps replica token spaces disjoint, so candidates/output should grow
    // ~10× at 10× docs if the candidate scheme is linear in true similarity
    // structure (all-pairs verify would grow 100×). Shuffle attach — the
    // corpus-scale arm. ----
    def measurePrefix(label: String, d: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val reps = Dedup.representatives(d, "doc_id", "text").localCheckpoint(true)
      val nReps = reps.count()
      val pairs = Dedup
        .prefixFilterJaccardPairs(reps, "doc_id", "text", threshold = 0.9,
          broadcastAttach = false)
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      val allPairs = nReps * (nReps - 1) / 2
      println(f"prefix $label: reps=$nReps exact_pairs=$pairs " +
        f"(all-pairs verify would be $allPairs) secs=$secs%.1f")
    }
    measurePrefix("  1x", docs)
    measurePrefix(" 10x", inflate(10))

    // ---- triangle-counting headroom (q100's operator): replica node
    // spaces are disjoint (node·f + i), so edges, wedges, and triangles
    // should all grow ~10× at 10× — the degree-ordered orientation keeps
    // wedge volume linear in components, never cross-replica. ----
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    val ord = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val op = li.join(ord, Seq("l_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = op.as("a")
      .join(op.as("b"), col("a.l_orderkey") === col("b.l_orderkey")
        && col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct().localCheckpoint(true)
    def inflateEdges(factor: Int): DataFrame =
      edges.crossJoin(spark.range(factor.toLong).toDF("i"))
        .select((col("u") * factor + col("i")).as("u"),
          (col("v") * factor + col("i")).as("v"))
    def measureTriangles(label: String, e: DataFrame): Unit = {
      val nE = e.count()
      val t0 = System.nanoTime()
      val tri = graft.ops.Graph.triangleCounts(e)
        .agg(sum(col("n_triangles")).as("s")).collect()(0).getLong(0) / 3
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"triangles $label: edges=$nE triangles=$tri secs=$secs%.1f")
    }
    measureTriangles("  1x", edges)
    measureTriangles(" 10x", inflateEdges(10))
    spark.stop()
  }
}
