package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density clustering over integer feature points — the corpus-curation
  * step after feature extraction: find the dense behavioral/statistical
  * modes and the outliers that are neither (candidate junk or candidate
  * gold, either way worth a look before training on them).
  */
object Clustering {

  /** Deterministic DBSCAN (Ester et al. 1996) over integer 2-D points in
    * the CHEBYSHEV metric, grid-blocked so candidate generation never goes
    * all-pairs: with cell side = eps, every point within Chebyshev eps of
    * p lies in the 3×3 cell block around p's cell, so the neighbor join is
    * (explode 9 cell offsets) ⋈ (cell equality) — each candidate pair
    * examined exactly once (the probe side's cell is unique) and the
    * shuffle is keyed by cell, not by point. Classic DBSCAN is
    * order-DEPENDENT in one place: a border point adjacent to two clusters
    * joins whichever was expanded first. This variant is a pure function
    * of the data — border points join the MINIMUM component id among their
    * core neighbors — so the full labeling hash-gates against a SQL oracle
    * (the md5-priority lesson, §8.7#12, applied to tie-breaking).
    *
    * Roles: a point is `core` iff its eps-neighborhood (self included,
    * coincident points counted individually) has ≥ minPts members;
    * `border` iff non-core with ≥ 1 core neighbor; `noise` otherwise.
    * Clusters are connected components of the core-core eps-adjacency
    * graph ([[Dedup.connectedComponents]] — min-label propagation, so the
    * cluster id is the component's minimum core id), extended to border
    * points by the min-component rule.
    *
    * Scale shape: one groupBy builds the points, one cell-keyed shuffle
    * join generates candidates (persisted — it feeds the count, the edge
    * list, and the border attach), CC runs rounds = core-graph diameter.
    * The intrinsic cost is Σ_cells |cell|·|3×3 block| — genuine neighbor
    * volume, not a planning artifact; at 100 TB the knob is eps (cell
    * granularity) and the dense-cell degeneracy is DBSCAN's own: a cell
    * with a million coincident points has a trillion genuine neighbor
    * pairs whatever the engine. minPts-counting stops early in that case
    * only with a specialized count-limited join, documented not built.
    *
    * @param points first three columns: (id, x, y) — id unique, x/y
    *               integer features
    * @return (id, x, y, role, cluster) — cluster is the component id for
    *         core/border rows, NULL for noise
    */
  /** The grid-blocked candidate join on its own (exposed for plan
    * assertions): each point probes its 3×3 cell block via an equi-join on
    * (cx, cy) — a hash-partitionable shuffle, never a cartesian — then the
    * exact Chebyshev filter. Each unordered pair appears in both
    * directions (ida, idb) and (idb, ida), which is what the neighbor
    * COUNT semantics need.
    */
  private[graft] def candidatePairs(points: DataFrame, eps: Long): DataFrame = {
    val Seq(idName, xName, yName) = points.columns.take(3).toSeq
    val pts = points.select(
      col(idName).as("id"), col(xName).cast("long").as("x"),
      col(yName).cast("long").as("y"))
    // floor division via pmod (exact for negative coordinates too — bare
    // `div` truncates toward zero, which would merge cells -1 and 0). The
    // pmod-adjusted numerator is exactly divisible by eps, so integer `div`
    // is exact at any magnitude — `/` would detour through double and lose
    // cell ids past 2^53
    def cellOf(c: String): org.apache.spark.sql.Column =
      expr(s"($c - pmod($c, ${eps}L)) div ${eps}L")
    val withCell = pts.select(col("id"), col("x"), col("y"),
      cellOf("x").as("cx"), cellOf("y").as("cy"))
    val offsets = Seq(-1L, 0L, 1L)
    val probes = withCell.select(col("id").as("ida"),
        col("x").as("xa"), col("y").as("ya"),
        explode(array(offsets.flatMap(dx => offsets.map(dy =>
          struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy")))): _*))
          .as("cell"))
      .select(col("ida"), col("xa"), col("ya"), col("cell.cx"), col("cell.cy"))
    probes
      .join(withCell.select(col("id").as("idb"), col("x").as("xb"),
        col("y").as("yb"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter(col("ida") =!= col("idb") &&
        greatest(abs(col("xa") - col("xb")), abs(col("ya") - col("yb"))) <= eps)
      .select(col("ida"), col("idb"))
  }

  def gridDbscan(points: DataFrame, eps: Long, minPts: Long): DataFrame = {
    require(eps >= 1, s"eps must be >= 1: $eps")
    require(minPts >= 1, s"minPts must be >= 1: $minPts")
    val Seq(idName, xName, yName) = points.columns.take(3).toSeq
    val pts = points.select(
      col(idName).as("id"), col(xName).cast("long").as("x"),
      col(yName).cast("long").as("y"))
    val pairs = candidatePairs(points, eps).persist()
    try {
      val ncnt = pts.join(
        pairs.groupBy(col("ida").as("id")).agg(count(lit(1)).as("nnbr")),
        Seq("id"), "left")
        .select(col("id"), col("x"), col("y"),
          (coalesce(col("nnbr"), lit(0L)) + 1L).as("n"))
      val core = ncnt.filter(col("n") >= minPts).select(col("id"))
      val coreEdges = pairs
        .filter(col("ida") < col("idb"))
        .join(core.withColumnRenamed("id", "ida"), Seq("ida"), "left_semi")
        .join(core.withColumnRenamed("id", "idb"), Seq("idb"), "left_semi")
        .select(col("ida"), col("idb"))
      // a spatial core graph is path-shaped, not clique-shaped: its diameter
      // is O(coordinate-span / eps), not the 1-2 of near-dup cliques. CC's
      // path-halving (engages from round 3) makes convergence log-diameter,
      // so 40 rounds covers spans to ~2^36 cells; the bound still scales
      // with log(span), not 1
      val comp = Dedup.connectedComponents(core, coreEdges, maxIters = 40)
        .select(col("id"), col("component"))
      val borderCluster = pairs
        .join(core.withColumnRenamed("id", "ida"), Seq("ida"), "left_anti")
        .join(comp.withColumnRenamed("id", "idb"), Seq("idb"))
        .groupBy(col("ida").as("id"))
        .agg(min(col("component")).as("bcluster"))
      pts
        .join(comp.withColumnRenamed("component", "ccluster"), Seq("id"), "left")
        .join(borderCluster, Seq("id"), "left")
        .select(col("id"), col("x"), col("y"),
          when(col("ccluster").isNotNull, lit("core"))
            .when(col("bcluster").isNotNull, lit("border"))
            .otherwise(lit("noise")).as("role"),
          coalesce(col("ccluster"), col("bcluster")).as("cluster"))
        // materialize before the persisted pair frame is released — the
        // plan reads `pairs` on three arms
        .localCheckpoint(true)
    } finally pairs.unpersist(blocking = false)
  }
}
