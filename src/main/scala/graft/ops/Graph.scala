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

  /** Fixed-iteration PageRank in SCALED INTEGER arithmetic — every operation
    * is integer floor-division/multiply/sum, so the result is bit-identical
    * on any engine, partitioning, or summation order (double-based PageRank
    * is NOT: per-group fp addition order wobbles the low bits, which is why
    * generic graph libraries can't hash-verify their ranks). Damping d =
    * dampNum/dampDen (default 17/20 = 0.85):
    *
    *   r⁰(v)   = ⌊scale / n⌋
    *   rᵏ⁺¹(v) = ⌊(dampDen − dampNum)·scale / (dampDen·n)⌋
    *           + ⌊dampNum · Σ_{u→v} ⌊rᵏ(u)/outdeg(u)⌋ / dampDen⌋
    *
    * Ranks are in fixed-point `scale` units (1e12 default: 12 significant
    * digits of rank mass, headroom to 2⁶³ for the Σ over a billion-edge
    * fan-in). Floors make total mass decay by a few units per iteration —
    * the deterministic variant's documented bias, O(n/scale) relative.
    *
    * Scale shape: one shuffle per iteration (contributions groupBy dst) plus
    * the initial degree aggregate; a fixed iteration count keeps the plan
    * finite and the output a pure function of (edges, iters) — no
    * convergence collect. Nodes and degrees come from the edge list
    * (isolated nodes have no inbound/outbound mass anyway). Input edges are
    * treated as UNDIRECTED (each edge feeds both directions), matching the
    * similarity/co-occurrence graphs this library produces.
    */
  def pageRankIntFixed(
      edges: DataFrame,
      iters: Int = 5,
      scale: Long = 1000000000000L,
      dampNum: Long = 17,
      dampDen: Long = 20
  ): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50]: $iters")
    require(dampNum > 0 && dampNum < dampDen, s"damping must be in (0,1): $dampNum/$dampDen")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val sym = edges
      .filter(col(uName).isNotNull && col(vName).isNotNull && col(uName) =!= col(vName))
      .select(least(col(uName), col(vName)).as("u"), greatest(col(uName), col(vName)).as("v"))
      .distinct()
      .select(explode(array(struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
      // every iteration joins this list — materialize once, like
      // [[Dedup.connectedComponents]] does
      .localCheckpoint()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint()
    val n = deg.count()
    require(n > 0, "pageRankIntFixed needs a non-empty edge list")
    val teleport = ((dampDen - dampNum) * scale) / (dampDen * n)
    var rank = deg.select(col("src").as("node"), lit(scale / n).as("rank"))
    for (_ <- 1 to iters) {
      // `div` is EXACT integer division (the `/` operator would detour
      // through double and round, and double→long casts truncate in Spark
      // but round in DuckDB — `div` here and `//` in the oracle are both
      // exact rational floors, so they agree unconditionally)
      val contribs = rank
        .join(deg, rank("node") === deg("src"))
        .select(col("src"), expr("rank div deg").as("c"))
        .join(sym, "src")
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      // left join: a node whose in-neighbors all rank 0 still gets teleport
      rank = deg.select(col("src").as("node"))
        .join(contribs.withColumnsRenamed(Map("dst" -> "node")), Seq("node"), "left")
        .withColumn("__pr_in", coalesce(col("in_mass"), lit(0L)))
        .select(col("node"),
          (lit(teleport) + expr(s"($dampNum * __pr_in) div $dampDen")).as("rank"))
    }
    rank
  }

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

  /** k-core: the maximal subgraph where every node has induced degree ≥ k
    * (Seidman 1983) — the standard "dense backbone" extraction. Classic
    * peeling: drop nodes with degree < k, recompute induced degrees,
    * repeat until stable. The fixed point is UNIQUE (independent of
    * removal order), which is what makes an iterative operator gateable
    * against an unrolled-rounds oracle: any two engines that both reach
    * convergence agree exactly. Each round is one degree aggregation and
    * two semi-joins; `localCheckpoint` per round keeps the plan
    * constant-size (the q58/q85 CC lesson). Throws if not converged in
    * `maxIters` — a silent partial peel would LOOK like a valid core.
    * Input contract matches [[triangleCounts]]: first two columns are
    * endpoints of canonical u < v edges. Output: (node, core_deg) for
    * surviving nodes — every core_deg is ≥ k by construction.
    */
  def kCore(edges: DataFrame, k: Int, maxIters: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    def degrees(e: DataFrame): DataFrame = e
      .select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("core_deg"))
    var cur = edges.select(col(uName).as("u"), col(vName).as("v")).localCheckpoint(true)
    var nEdges = cur.count()
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val keep = degrees(cur).filter(col("core_deg") >= k).select(col("node"))
      val next = cur
        .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
      val n = next.count()
      converged = n == nEdges
      cur = next
      nEdges = n
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(s"kCore(k=$k) did not converge in $maxIters rounds")
    degrees(cur)
  }

  /** k-hop reachability counts for a seed panel: |{v : dist(seed, v) ≤ k}|
    * per seed (seed included at distance 0) — the neighborhood-size /
    * influence-radius measure. Fixed-round frontier expansion: round i
    * joins the reached set against the adjacency list and unions+distincts
    * — k shuffles total, each bounded by (reached × avg-degree), with a
    * `localCheckpoint` per round keeping the plan constant-size (the CC /
    * kCore lesson). A FIXED k makes the operator a pure function of
    * (edges, seeds, k) — gateable against a k-times-unrolled oracle; no
    * convergence collect. Input contract matches [[triangleCounts]]:
    * first two columns are canonical u < v endpoints; edges are treated
    * as undirected.
    */
  def kHopCounts(edges: DataFrame, seeds: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in [1,8]: $k")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val sym = edges
      .select(col(uName).as("src"), col(vName).as("dst"))
      .unionAll(edges.select(col(vName).as("src"), col(uName).as("dst")))
      .localCheckpoint()
    val seedCol = seeds.columns.head
    var reached = seeds.select(col(seedCol).as("seed"), col(seedCol).as("node"))
      .localCheckpoint(true)
    for (_ <- 1 to k) {
      reached = reached
        .unionAll(reached
          .join(sym, reached("node") === sym("src"))
          .select(col("seed"), col("dst").as("node")))
        .distinct()
        .localCheckpoint(true)
    }
    reached.groupBy(col("seed")).agg(count(lit(1)).as(s"n_within_$k"))
  }

  /** [[pageRankIntFixed]] with INTEGER edge weights: each neighbor receives
    * mass proportional to its edge weight — contribution src→dst is
    * (rank·w) DIV Σw_out(src), every step an exact rational floor, so the
    * weighted centrality is hash-gateable like the unweighted one. Input
    * rows are (u, v, w); parallel (u,v) duplicates are SUMMED into one
    * undirected edge. Overflow headroom: rank ≤ scale (1e12 default) and
    * the per-edge product rank·w must fit a LONG — weights above ~1e6 need
    * a smaller scale (documented, not silently truncated: the multiply
    * would wrap, so the require below bounds it).
    */
  def pageRankWeightedIntFixed(
      edges: DataFrame,
      iters: Int = 5,
      scale: Long = 1000000000000L,
      dampNum: Long = 17,
      dampDen: Long = 20,
      maxWeight: Long = 1000000L
  ): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50]: $iters")
    require(dampNum > 0 && dampNum < dampDen, s"damping must be in (0,1): $dampNum/$dampDen")
    val Seq(uName, vName, wName) = edges.columns.take(3).toSeq
    val und = edges
      .filter(col(uName).isNotNull && col(vName).isNotNull && col(uName) =!= col(vName))
      .select(least(col(uName), col(vName)).as("u"),
        greatest(col(uName), col(vName)).as("v"), col(wName).cast("long").as("w"))
      .groupBy(col("u"), col("v")).agg(sum(col("w")).as("w"))
    val sym = und
      .select(explode(array(
        struct(col("u").as("src"), col("v").as("dst"), col("w")),
        struct(col("v").as("src"), col("u").as("dst"), col("w")))).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.w"))
      .localCheckpoint()
    val wBound = sym.agg(max(col("w"))).head().getLong(0)
    require(wBound <= maxWeight,
      s"edge weight $wBound exceeds the rank·w overflow bound $maxWeight — lower scale")
    val wout = sym.groupBy(col("src")).agg(sum(col("w")).as("wout")).localCheckpoint()
    val n = wout.count()
    require(n > 0, "pageRankWeightedIntFixed needs a non-empty edge list")
    val teleport = ((dampDen - dampNum) * scale) / (dampDen * n)
    var rank = wout.select(col("src").as("node"), lit(scale / n).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = rank
        .join(wout, rank("node") === wout("src"))
        .select(col("src"), col("rank"), col("wout"))
        .join(sym, "src")
        .select(col("dst"), expr("(rank * w) div wout").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      rank = wout.select(col("src").as("node"))
        .join(contribs.withColumnsRenamed(Map("dst" -> "node")), Seq("node"), "left")
        .withColumn("__pr_in", coalesce(col("in_mass"), lit(0L)))
        .select(col("node"),
          (lit(teleport) + expr(s"($dampNum * __pr_in) div $dampDen")).as("rank"))
    }
    rank
  }

  /** Multi-source shortest paths with non-negative INTEGER edge weights by
    * synchronous min-plus relaxation (Bellman–Ford rounds on the undirected
    * graph): dist⁰ = 0 at the sources, distʳ(v) = min(distʳ⁻¹(v),
    * min over edges (u,v) of distʳ⁻¹(u) + w). Integer weights keep every
    * distance exact, so the fixed point is engine-stable and an unrolled-
    * rounds SQL oracle matches cell-for-cell (the q103/q130 device for
    * making iterative graph operators hash-gateable). Runs to convergence
    * and REFUSES a mid-relaxation result: if the fixed point needs more
    * than `maxRounds` rounds the caller's oracle (unrolled to the same
    * bound) would silently disagree — fail loudly instead. Unreached nodes
    * are absent from the output (no ∞ sentinel). Each round is one
    * hash-join + one min-groupBy at full width; the frontier frame is
    * checkpointed per round (constant-depth plan, the CC lesson).
    */
  def shortestPathsInt(
      edges: DataFrame,
      sources: DataFrame,
      maxRounds: Int = 8
  ): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 32, s"maxRounds must be in [1,32]: $maxRounds")
    val Seq(uName, vName, wName) = edges.columns.take(3).toSeq
    val sym = edges
      .select(col(uName).as("src"), col(vName).as("dst"), col(wName).cast("long").as("w"))
      .unionAll(edges.select(col(vName).as("src"), col(uName).as("dst"),
        col(wName).cast("long").as("w")))
      .localCheckpoint()
    val seedCol = sources.columns.head
    var dist = sources.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    // convergence witness: distances only ever DECREASE and the node set
    // only ever GROWS under min-plus relaxation, so a round improved
    // something iff the (node count, Σdist) pair moved — one single-row
    // aggregate over the checkpointed frame per round instead of a
    // frame-vs-frame join+count (measured 8.3 s → 6.3 s at sf0.1)
    def witness(d: DataFrame): (Long, java.math.BigDecimal) = {
      val r = d.agg(count(lit(1)), sum(col("dist").cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    var w0 = witness(dist)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val relaxed = dist.join(sym, dist("node") === sym("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      val next = dist.unionAll(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
      val w1 = witness(next)
      dist = next
      converged = w1 == w0
      w0 = w1
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"shortestPathsInt did not reach its fixed point in $maxRounds rounds — " +
          "an unrolled-rounds oracle at this bound would disagree; raise maxRounds")
    dist
  }

  /** Link prediction by the resource-allocation index (Zhou, Lü &
    * Zhang 2009): for every NON-adjacent pair (u,w) with at least
    * `minCommonNeighbors` shared neighbors, score = Σ_{z ∈ N(u)∩N(w)}
    * 1/deg(z). The reciprocal is computed as EXACT fixed-point integer
    * division (`scale div deg`, 1e12 units) so the per-pair sum is
    * bit-identical under any summation order or partitioning — the same
    * determinism trick as [[pageRankIntFixed]]; Adamic-Adar's 1/ln(deg)
    * is deliberately avoided because libm `ln` low bits differ across
    * engines. Candidate pairs come from wedge enumeration at the shared
    * neighbor z, which is inherently C(deg(z), 2) per hub — unlike
    * triangle counting there is no orientation trick, every wedge IS a
    * candidate. The scale lever is `maxHubDegree`: super-hub wedges grow
    * quadratically while contributing ~zero RA mass (1/deg → 0), so hubs
    * above the cap are excluded as evidence — part of the operator's
    * SEMANTICS (the oracle must apply the same cap), not an
    * approximation knob. Three shuffles: degrees, wedge build on z,
    * candidate groupBy (u,w); the anti-join against the edge list removes
    * already-adjacent pairs. Output: (u, w, common_neighbors, ra_fixed)
    * with ra_fixed in 1e-12 units.
    */
  def linkPredictionRA(
      edges: DataFrame,
      minCommonNeighbors: Int = 2,
      maxHubDegree: Int = 1000,
      scale: Long = 1000000000000L
  ): DataFrame = {
    require(minCommonNeighbors >= 1, s"minCommonNeighbors must be >= 1: $minCommonNeighbors")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    // the edge frame feeds FOUR plan branches (degrees, both sides of the
    // wedge self-join via adj, and the final adjacency anti-join) — without
    // a checkpoint each branch replays the caller's full edge derivation
    // (for q131's co-supply graph: scan + join + self-join + distinct)
    val e = edges.select(col(uName).as("u"), col(vName).as("v")).localCheckpoint()
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val adj = e.select(col("u").as("z"), col("v").as("nb"))
      .unionAll(e.select(col("v").as("z"), col("u").as("nb")))
      // attach the hub degree once, BEFORE the wedge self-join, so the
      // fixed-point reciprocal rides along instead of re-joining degrees
      // onto the (much larger) wedge table
      .join(deg.withColumnRenamed("node", "z"), "z")
      .filter(col("deg") <= maxHubDegree)
      .withColumn("recip", expr(s"$scale div deg"))
    val cand = adj.as("a")
      .join(adj.as("b"), col("a.z") === col("b.z") && col("a.nb") < col("b.nb"))
      .select(col("a.nb").as("u"), col("b.nb").as("w"), col("a.recip").as("recip"))
      .groupBy(col("u"), col("w"))
      .agg(count(lit(1)).as("common_neighbors"), sum(col("recip")).as("ra_fixed"))
      .filter(col("common_neighbors") >= minCommonNeighbors)
    cand.join(e, cand("u") === e("u") && cand("w") === e("v"), "left_anti")
  }

  /** Degree assortativity (Newman 2002): Pearson correlation between the
    * endpoint degrees of every DIRECTED edge of an undirected graph — do
    * hubs link to hubs (r > 0) or to leaves (r < 0)? Because the directed
    * edge set is symmetric, Σx = Σy and Σx² = Σy², so Pearson's sqrt
    * denominator collapses to n·Σx² − (Σx)² and the whole statistic is
    * exact integer products (DECIMAL(38,0) so 100× the edges cannot
    * overflow) with ONE double division at the surface — an iteration-free,
    * hash-gateable graph moment. Cost: one aggregation for degrees, two
    * node-frame joins to attach them, one scalar aggregate. Input contract
    * matches [[triangleCounts]]: first two columns are endpoints of
    * already-canonical u < v edges. Output: (n_edges, assortativity);
    * assortativity is NULL for degree-regular graphs — the denominator is
    * 0 and Spark's Divide returns NULL on a zero divisor for EVERY numeric
    * type, doubles included (not IEEE NaN; Pearson is undefined when one
    * variable is constant, so NULL is the honest surface anyway).
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d0 = DecimalType(38, 0)
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val e = edges.select(col(uName).as("u"), col(vName).as("v"))
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val xy = sym
      .join(deg.select(col("node").as("u"), col("deg").as("dx")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dy")), "v")
    xy.agg(
        count(lit(1)).as("n2"),
        sum(col("dx").cast(d0)).as("sx"),
        sum((col("dx") * col("dx")).cast(d0)).as("sxx"),
        sum((col("dx") * col("dy")).cast(d0)).as("sxy"))
      .select(
        (col("n2") / 2).cast("long").as("n_edges"),
        ((col("n2").cast(d0) * col("sxy") - col("sx") * col("sx")).cast("double")
          / (col("n2").cast(d0) * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("assortativity"))
  }
}
