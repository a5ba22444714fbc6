package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Stage-2 of the q85 ladder-drift diagnosis: at f=100, find the exact
  * verified-edge pairs PRESENT in the base run but MISSING from a
  * replica, then re-test each missing pair: its true suffixed-set
  * jaccard, whether LSH banding emitted it as a candidate, and what the
  * verify measured. Whichever stage disagrees with the base run names
  * the mechanism.
  */
object Q85LostPairProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val f = 100
    val baseDocs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint()

    def reps(docs: DataFrame): DataFrame =
      graft.ops.Par.spread(docs, col("doc_id"))
        .select(col("doc_id"), Dedup.wordSetSignature(col("text")).as("sig"), col("text"))
        .groupBy(col("sig"))
        .agg(min(col("doc_id")).as("rep"), min_by(col("text"), col("doc_id")).as("text"))
        .select(col("rep").as("doc_id"), col("text"))

    def edges(r: DataFrame): DataFrame =
      Dedup.verifiedNearDups(r, "doc_id", "text",
        threshold = 0.95, numHashes = 96, bands = 16, broadcastAttach = false)
        .select(col("id_a"), col("id_b"))

    // base edge set over base reps
    val baseEdges = edges(reps(baseDocs).localCheckpoint(true)).localCheckpoint(true)
    println(s"base edges: ${baseEdges.count()}")

    val docs = ReplicaInflation.docsAt(baseDocs, f).localCheckpoint()
    val bigReps = reps(docs).localCheckpoint(true)
    val bigEdges = edges(bigReps).localCheckpoint(true)
    println(s"f=$f edges: ${bigEdges.count()}")

    // expected edges: base (a,b) -> (a*f+i, b*f+i); base rep doc_ids map
    // to replica-i reps by the same doc_id transform (order-preserving)
    val expected = baseEdges.crossJoin(spark.range(f.toLong).toDF("i"))
      .select((col("id_a") * f + col("i")).as("id_a"),
        (col("id_b") * f + col("i")).as("id_b"))
    val missing = expected.join(bigEdges, Seq("id_a", "id_b"), "left_anti")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val extra = bigEdges.join(expected, Seq("id_a", "id_b"), "left_anti")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    println(s"missing=${missing.length} extra=${extra.length}")
    missing.take(20).foreach { case (a, b) =>
      println(s"MISSING|$a|$b|replica=${a % f}|base=(${a / f},${b / f})")
    }
    extra.take(20).foreach { case (a, b) =>
      println(s"EXTRA|$a|$b|replica_a=${a % f}|replica_b=${b % f}|base=(${a / f},${b / f})")
    }

    // re-test the first few missing pairs end to end
    val probePairs = missing.take(5)
    if (probePairs.nonEmpty) {
      val ids = probePairs.flatMap(p => Seq(p._1, p._2)).distinct.toSeq
      val pr = bigReps.filter(col("doc_id").isin(ids: _*))
        .localCheckpoint(true)
      // true string-set jaccard + hashed jaccard for each pair
      val ws = pr.select(col("doc_id"),
        array_sort(array_distinct(graft.ops.TextAnalysis.tokens(col("text")))).as("toks"),
        array_sort(transform(array_distinct(graft.ops.TextAnalysis.tokens(col("text"))),
          t => xxhash64(t))).as("hs"))
        .collect().map(r => r.getLong(0) ->
          (r.getSeq[String](1).toSet, r.getSeq[Long](2), r.getSeq[Long](2).toSet)).toMap
      probePairs.foreach { case (a, b) =>
        val (ta, ha, hsa) = ws(a); val (tb, hb, hsb) = ws(b)
        val sj = ta.intersect(tb).size.toDouble / ta.union(tb).size
        val hj = hsa.intersect(hsb).size.toDouble / hsa.union(hsb).size
        println(f"PAIR|$a|$b|strJac=$sj%.6f|hashJac=$hj%.6f" +
          s"|dupHashA=${ha.size - hsa.size}|dupHashB=${hb.size - hsb.size}")
      }
      // were they candidates?
      val cands = Dedup.minHashCandidatesRaw(
        graft.ops.Par.spread(bigReps, col("doc_id")), "doc_id", "text", 96, 16)
        .filter(col("id_a").isin(ids: _*) && col("id_b").isin(ids: _*))
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      probePairs.foreach { case (a, b) =>
        println(s"CAND|$a|$b|candidate=${cands.contains((a, b))}")
      }
    }
    spark.stop()
  }
}
