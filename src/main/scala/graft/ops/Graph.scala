package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge DataFrames — the operators a corpus pipeline
  * needs once pairwise relations exist (near-dup edges, co-occurrence,
  * citation/link graphs). Connected components lives in
  * [[Dedup.connectedComponents]] (it is the dedup-cascade step); here are the
  * non-iterative ones.
  */
object Graph {

  /** Per-node triangle participation counts by DEGREE-ORDERED ORIENTATION
    * (the compact-forward / node-iterator+ algorithm, Schank & Wagner 2005):
    * orient every undirected edge from its (degree, id)-smaller endpoint to
    * the larger, build wedges from shared sources, and close each wedge with
    * one membership join against the oriented edge list. Each triangle is
    * found exactly once — from its lowest-degree corner — and the per-source
    * wedge fanout is bounded by the oriented OUT-degree, which the
    * orientation caps at O(√m) regardless of raw degree skew: a celebrity
    * node of degree 10⁶ generates wedges only toward its few
    * HIGHER-degree neighbors, not C(10⁶,2) pairs. Total wedge volume is
    * O(m^{3/2}) worst case (optimal for exact listing); everything is three
    * shuffles (degrees, wedge build on src, closure on (b,c)) — no
    * iteration, no driver state.
    *
    * Input: first two columns are the endpoints. Direction, duplicate edges,
    * reversed duplicates, and self-loops are all normalized away first, so
    * callers can feed raw pair lists (e.g. [[Dedup.verifiedNearDups]]
    * output). Output: (node, n_triangles), nodes in ≥ 1 triangle — exact
    * integers.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    // canonical undirected edge set: u < v, no self-loops, no duplicates
    // (a duplicate or reversed-duplicate edge would count its triangles
    // multiple times; a self-loop would close every wedge at its node)
    val canon = edges
      .filter(col(uName).isNotNull && col(vName).isNotNull && col(uName) =!= col(vName))
      .select(least(col(uName), col(vName)).as("u"), greatest(col(uName), col(vName)).as("v"))
      .distinct()
    val deg = canon
      .select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val e = canon
      .join(deg.withColumnsRenamed(Map("node" -> "u", "d" -> "du")), "u")
      .join(deg.withColumnsRenamed(Map("node" -> "v", "d" -> "dv")), "v")
    // (degree, id) is a TOTAL order ⇒ the orientation is acyclic — that is
    // what makes "count each triangle at its smallest corner" exact
    val uFirst = (col("du") < col("dv")) || (col("du") === col("dv") && col("u") < col("v"))
    val ori = e.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"),
      when(uFirst, col("dv")).otherwise(col("du")).as("dst_d"))
    // wedges (a→b, a→c) with b before c in the same (degree, id) order —
    // each unordered wedge once; the closing edge is then oriented b→c
    val w1 = ori.select(col("src"), col("dst").as("b"), col("dst_d").as("b_d"))
    val w2 = ori.select(col("src"), col("dst").as("c"), col("dst_d").as("c_d"))
    val wedges = w1
      .join(w2, Seq("src"))
      .filter(col("b_d") < col("c_d") || (col("b_d") === col("c_d") && col("b") < col("c")))
      .select(col("src").as("a"), col("b"), col("c"))
    // ori rows are distinct, so the inner join closes each wedge at most once
    val tri = wedges.join(ori.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
    tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }
}
