package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Diagnose the q85 ladder's replica-proportionality drift (round-10):
  * components/replica measured 2822.0 at 30x but 2822.12 at 100x and
  * 2822.47 at 300x — SOMETHING in exact-collapse -> LSH -> verify -> CC
  * interacts across replicas. Count each stage per f: distinct sigs,
  * verified edges, components. The stage whose per-replica count drifts
  * names the bug (or the benign mechanism).
  */
object Q85ReplicaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val baseDocs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()

    def docsAt(f: Int): DataFrame = ReplicaInflation.docsAt(baseDocs, f)

    for (f <- sys.env.get("GRAFT_PROBE_SCALES")
        .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 3, 10, 30))) {
      val docs = docsAt(f).localCheckpoint()
      val base = graft.ops.Par.spread(docs, col("doc_id"))
        .select(col("doc_id"), Dedup.wordSetSignature(col("text")).as("sig"), col("text"))
      val reps = base.groupBy(col("sig"))
        .agg(min(col("doc_id")).as("rep"), min_by(col("text"), col("doc_id")).as("text"))
        .localCheckpoint(true)
      val nReps = reps.count()
      val edges = Dedup.verifiedNearDups(
        reps.select(col("rep").as("doc_id"), col("text")), "doc_id", "text",
        threshold = 0.95, numHashes = 96, bands = 16, broadcastAttach = false)
        .select(col("id_a"), col("id_b")).localCheckpoint(true)
      val nEdges = edges.count()
      val cc = Dedup.connectedComponents(reps.select(col("rep")), edges)
      val nComp = cc.select(col("component")).distinct().count()
      println(f"PROBE|f=$f|reps=$nReps|perRep=${nReps.toDouble / f}%.3f" +
        f"|edges=$nEdges|edgesPer=${nEdges.toDouble / f}%.3f" +
        f"|comp=$nComp|compPer=${nComp.toDouble / f}%.3f")
    }
    spark.stop()
  }
}
