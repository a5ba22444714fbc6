package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Graph analytics over edge DataFrames — the operators a corpus pipeline
  * needs once pairwise relations exist (near-dup edges, co-occurrence,
  * citation/link graphs). Connected components lives in
  * [[Dedup.connectedComponents]] (it is the dedup-cascade step); here are the
  * non-iterative ones.
  */
object Graph {

  /** Loop-scoped shuffle sizing for the iterative operators — the
    * [[Dedup.connectedComponents]] device (ops/Dedup.scala), ported with a
    * MEASURED threshold revision. CC's win (4.4 s of a 9 s cascade) came
    * from graphs of a few thousand near-dup edges, where every round is
    * microseconds of real work under milliseconds of task scheduling; there
    * narrowing to ~1 task and disabling AQE's per-job re-planning is pure
    * profit. Re-measuring on the 241k-edge co-supply graph showed the
    * opposite: applying the same narrowing + AQE-off to mid-size graphs
    * made SSSP/k-core/k-hop 10–25% SLOWER (5.25→5.89 s, 2.36→2.90 s,
    * 2.81→3.68 s at sf0.1) — at that size the rounds have enough real work
    * that width and AQE's post-shuffle coalescing pay for themselves. So
    * the scope only narrows genuinely tiny loops (< 200k measured rows:
    * every round fits one task's worth of work) and leaves everything
    * else — including the 100 TB case — completely untouched; the round
    * joins are instead kept shuffle-free by [[hinted]] broadcasts, which
    * is where the mid-size win actually was. Conf is scoped to the loop
    * and restored in `finally`; every round's ACTION (localCheckpoint
    * materialization, witness count) runs inside the scope and picks the
    * narrow width up.
    */
  private[ops] def withRoundConf[T](
      sess: org.apache.spark.sql.SparkSession, nRows: Long)(body: => T): T = {
    if (nRows >= 200000L) body
    else {
      val shuffleKey = "spark.sql.shuffle.partitions"
      val aqeKey = "spark.sql.adaptive.enabled"
      val prevShuffle = sess.conf.get(shuffleKey)
      val prevAqe = sess.conf.get(aqeKey)
      val roundParts = Par.roundParts(sess, nRows)
      sess.conf.set(shuffleKey, roundParts.toString)
      sess.conf.set(aqeKey, "false")
      try body
      finally {
        sess.conf.set(shuffleKey, prevShuffle)
        sess.conf.set(aqeKey, prevAqe)
      }
    }
  }

  /** Broadcast the per-round small side iff its MEASURED row count is under
    * the hint bound. The iterative loops materialize every round, so the
    * frontier/keep-list size is a known number, not an estimate — a
    * measured hint beats AQE's runtime conversion here because AQE only
    * switches join strategy BETWEEN stages: the big side's shuffle files
    * are already written by the time it decides, while an explicit hint
    * never shuffles the edge table at all (and [[withRoundConf]] turns AQE
    * off for small graphs anyway). The bound is HEAP-DERIVED — formula
    * and derivation live once in [[graft.util.HeapBounds]] (round-9 found
    * the fixed-constant cliff at the 300× rung; round-10 hoisted the
    * three per-site copies). A billion-node graph still fails the bound
    * and falls back to the plain shuffle join, which is the correct
    * 100 TB plan. `graft.graph.bcastRows` pins it for regime-pinned
    * measurement.
    */
  private def BcastRows: Long =
    graft.util.HeapBounds.broadcastRowBound("graft.graph.bcastRows")
  private def hinted(df: DataFrame, rows: Long): DataFrame =
    if (rows <= BcastRows) broadcast(df) else df

  /** Checkpoint with the child's hash partitioning PRESERVED: Spark's
    * `localCheckpoint` copies the executed plan's outputPartitioning into
    * the resulting LogicalRDD, but under AQE the executed plan is an
    * AdaptiveSparkPlan that reports UnknownPartitioning at checkpoint-build
    * time — so the partitioning is silently lost and every downstream
    * operator that needed it re-exchanges (measured: this was the entire
    * per-round exchange cost of the round-6 coreness loop). Scoping AQE off
    * around just the checkpoint build keeps the one up-front repartition
    * visible to every later round. The narrow scope costs nothing: the
    * checkpointed plan is a single exchange AQE had nothing to improve.
    */
  private[ops] def ckptKeepPartitioning(chain: RoundChain, df: DataFrame): DataFrame = {
    val sess = df.sparkSession
    val k = "spark.sql.adaptive.enabled"
    val prev = sess.conf.get(k)
    sess.conf.set(k, "false")
    try chain.ckpt(df) finally sess.conf.set(k, prev)
  }

  private val obsId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Checkpoint with aggregate METRICS fused into the materialization job
    * via `observe()`: the convergence quantities a fixed-point loop reads
    * per round (row count, monotone sums) accumulate WHILE the checkpoint
    * materializes, deleting the separate per-round scan action — the CC
    * device (SURVEY §8.9#1) applied family-wide; on narrow small-graph
    * rounds that scan was a full extra job of pure scheduling overhead.
    * Metrics must be named (`.as("n")`) — read them from the returned map.
    */
  private[ops] def ckptObserved(
      chain: RoundChain, df: DataFrame, metrics: Seq[Column],
      keepPartitioning: Boolean = false): (DataFrame, Map[String, Any]) = {
    val obs = org.apache.spark.sql.Observation(
      s"graft_round_${obsId.incrementAndGet()}")
    val observed = df.observe(obs, metrics.head, metrics.tail: _*)
    val out =
      if (keepPartitioning) ckptKeepPartitioning(chain, observed)
      else chain.ckpt(observed)
    (out, obs.get)
  }

  /** Per-round checkpoint hygiene for fixed-point loops (the other half of
    * the CC device): every round's `localCheckpoint(eager)` pins its blocks
    * until the ContextCleaner happens to GC the dropped frame — on a large
    * driver heap that can be never, and N rounds of graph-sized frames
    * accumulate in the block manager (measured: repeated cascade runs in one
    * session degraded 10× from exactly this). `ckpt` eagerly materializes
    * the new round and then frees the PREVIOUS round's blocks — safe because
    * the new checkpoint fully consumed them — so at any moment at most one
    * round (plus the adjacency list) is pinned. The final round stays
    * pinned: its blocks ARE the result (a localCheckpoint cannot be
    * recomputed). `free` releases the adjacency list once the loop no
    * longer references it.
    */
  private[ops] final class RoundChain(sc: org.apache.spark.SparkContext) {
    private var liveIds: Set[Int] = Set.empty
    def ckpt(df: DataFrame): DataFrame = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val out = df.localCheckpoint(true)
      val added = sc.getPersistentRDDs.keySet.toSet -- before
      free()
      liveIds = added
      out
    }
    /** Detach the chain from its current round WITHOUT freeing it — used on
      * the final round, whose blocks back the returned frame. */
    def keep(): Unit = liveIds = Set.empty
    def free(): Unit = {
      sc.getPersistentRDDs.filter(kv => liveIds.contains(kv._1)).values
        .foreach(_.unpersist(blocking = false))
      liveIds = Set.empty
    }
  }

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
    prDiffusion(edges.filter(col(uName).isNotNull && col(vName).isNotNull
        && col(uName) =!= col(vName))
        .select(least(col(uName), col(vName)).as("u"),
          greatest(col(uName), col(vName)).as("v")).distinct(),
      seedFilter = None, iters, scale, dampNum, dampDen)
  }

  /** Shared integer-PageRank diffusion chain behind [[pageRankIntFixed]]
    * and [[personalizedPageRankInt]] — the round-7 EXCHANGE-FREE shape.
    * The adjacency is checkpointed ONCE, dst-partitioned with the
    * partitioning preserved ([[ckptKeepPartitioning]]); each iteration
    * broadcasts the node-sized (node, rank div deg) frame into a BHJ and
    * folds rank' = tele + ⌊dampNum·Σc / dampDen⌋ in one dst-keyed
    * aggregate that reuses the adjacency partitioning, then re-attaches
    * (deg, tele) by broadcasting the materialized degree table — zero
    * exchanges per iteration. The old per-iter LEFT JOIN for
    * teleport-only nodes is unnecessary on an UNDIRECTED graph: every
    * node has ≥ 1 in-neighbor, so the dst aggregate covers all nodes
    * (zero-rank in-neighbors still produce rows, summing to 0). The
    * whole `iters` chain is linear (each iteration references its
    * predecessor once) and lazy — broadcast builds nest and materialize
    * once each. Past [[BcastRows]] nodes the loop falls back to the
    * round-6 shuffle form, the correct >4M-node plan. Fixed points are
    * bit-identical by construction: the integer arithmetic is unchanged,
    * only the plan moved.
    */
  private def prDiffusion(canon: DataFrame, seedFilter: Option[DataFrame],
      iters: Int, scale: Long, dampNum: Long, dampDen: Long): DataFrame = {
    val sess = canon.sparkSession
    val adjChain = new RoundChain(sess.sparkContext)
    val exploded = canon
      .select(explode(array(struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
    // dst-partitioned from birth — ONE edge checkpoint total, same count
    // as the round-6 plan; width is the ambient conf (the iterations never
    // shuffle, so partition count only sets per-stage task count)
    val sym = ckptKeepPartitioning(adjChain, exploded.repartition(col("dst")))
    val degBase = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val deg = (seedFilter match {
      case Some(seeds) => degBase
        .join(seeds.withColumn("is_seed", lit(true)), Seq("src"), "left")
        .select(col("src"), col("deg"), coalesce(col("is_seed"), lit(false)).as("is_seed"))
      case None => degBase.withColumn("is_seed", lit(true))
    }).localCheckpoint()
    val n = deg.count()
    require(n > 0, "pageRank needs a non-empty edge list")
    val nTele = seedFilter match {
      case Some(_) =>
        val s = deg.filter(col("is_seed")).count()
        require(s > 0, "personalizedPageRankInt needs at least one seed present in the graph")
        s
      case None => n
    }
    val teleport = ((dampDen - dampNum) * scale) / (dampDen * nTele)
    val init0 = seedFilter match {
      case Some(_) => when(col("is_seed"), lit(scale / nTele)).otherwise(lit(0L))
      case None    => lit(scale / n)
    }
    val teleCol = when(col("is_seed"), lit(teleport)).otherwise(lit(0L))
    if (n <= BcastRows) {
      val degB = deg.select(col("src").as("dnode"), col("deg"), teleCol.as("tele"))
      var rank = deg.select(col("src").as("node"), init0.as("rank"), col("deg"))
      for (_ <- 1 to iters) {
        // `div` is EXACT integer division (the `/` operator would detour
        // through double and round, and double→long casts truncate in
        // Spark but round in DuckDB — `div` and `//` are both exact
        // rational floors, so they agree unconditionally)
        val cb = broadcast(rank.select(col("node").as("cnode"),
          expr("rank div deg").as("c")))
        rank = sym.join(cb, sym("src") === cb("cnode"))
          .groupBy(col("dst").as("node"))
          .agg(sum(col("c")).as("in_mass"))
          .join(broadcast(degB), col("node") === col("dnode"))
          .select(col("node"),
            (col("tele") + expr(s"($dampNum * in_mass) div $dampDen")).as("rank"),
            col("deg"))
      }
      rank.select(col("node"), col("rank"))
    } else {
      var rank = deg.select(col("src").as("node"), init0.as("rank"))
      for (_ <- 1 to iters) {
        val contribs = rank
          .join(deg.select(col("src"), col("deg")), rank("node") === col("src"))
          .select(col("src"), expr("rank div deg").as("c"))
          .join(sym, "src")
          .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
        // left join kept in the shuffle form: cheap insurance at this size
        rank = deg.select(col("src").as("node"), col("is_seed"))
          .join(contribs.withColumnsRenamed(Map("dst" -> "node")), Seq("node"), "left")
          .withColumn("__pr_in", coalesce(col("in_mass"), lit(0L)))
          .select(col("node"),
            (teleCol + expr(s"($dampNum * __pr_in) div $dampDen")).as("rank"))
      }
      rank
    }
  }

  /** DENSEST-SUBGRAPH peel trajectory (Charikar 2000 greedy, in the
    * parallel all-at-once form of Bahmani, Kumar & Vassilvitskii 2012):
    * each round removes EVERY node whose degree is at most the current
    * average (kept iff d·n > 2·m — an exact integer cross-multiplication,
    * no rational division to misround) and records the surviving
    * (n, m, density) snapshot. The maximum-density round is a
    * 2-approximation of the densest subgraph — the canonical "find the
    * spam cluster / core community" primitive at MapReduce scale. The
    * operator emits the FULL per-round trajectory (round, n_nodes,
    * n_edges, density) rather than an argmax row: every row gates
    * exactly (the argmax would need a cross-round rational compare in
    * the oracle), and the consumer reads the best round off the table.
    * A minimum-degree node always fails the strict keep test, so every
    * round removes at least one node and the loop terminates at the
    * empty graph; REFUSES past maxRounds. NOTE the round bound: the
    * O(log n) termination guarantee belongs to the (1+ε)-slack BKV
    * variant (keep iff d > 2(1+ε)·m/n); this exact-average ε=0 form is
    * Θ(n) rounds worst-case on path-like sparse graphs (each round can
    * peel only the degree-1 fringe), though it measures ≤ 10 rounds on
    * the heavy-tailed test graphs. On a legitimately path-shaped input
    * the refusal fires by design — raise maxRounds or accept the ε
    * slack. One degree aggregate + two semi joins per round, checkpoint
    * hygiene as everywhere ([[RoundChain]]/[[withRoundConf]]).
    *
    * BEHAVIOR NOTE (r7→r8): the loop bound was aligned to the repo-wide
    * `< maxRounds` convention, which runs exactly `maxRounds` peel rounds
    * where the earlier `<=` form ran one more; the default is bumped
    * 32→33 so any input that previously converged at the old default's
    * last round still converges at the new one.
    */
  def densestSubgraphPeel(edges: DataFrame, maxRounds: Int = 33): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 64, s"maxRounds must be in [1,64]: $maxRounds")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val sess = edges.sparkSession
    import sess.implicits._
    val chain = new RoundChain(sess.sparkContext)
    var cur = chain.ckpt(edges
      .filter(col(uName).isNotNull && col(vName).isNotNull && col(uName) =!= col(vName))
      .select(least(col(uName), col(vName)).as("u"),
        greatest(col(uName), col(vName)).as("v"))
      .distinct())
    val nEdges0 = cur.count()
    val traj = scala.collection.mutable.ListBuffer.empty[(Int, Long, Long)]
    withRoundConf(sess, nEdges0) {
      var round = 0
      var done = false
      // `<` not `<=`: exactly maxRounds peel rounds, matching both the other
      // operators' loop convention and the refusal message's bound
      while (!done && round < maxRounds) {
        val deg = cur.select(explode(array(col("u"), col("v"))).as("node"))
          .groupBy(col("node")).agg(count(lit(1)).as("d"))
        val st = deg.agg(count(lit(1)), coalesce(sum(col("d")), lit(0L))).head()
        val n = st.getLong(0)
        val m = st.getLong(1) / 2
        if (n == 0) done = true
        else {
          traj += ((round, n, m))
          val keep = deg.filter(col("d") * n > 2L * m).select(col("node"))
          cur = chain.ckpt(cur
            .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
            .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi"))
          round += 1
        }
      }
      if (!done)
        throw new IllegalStateException(
          s"densestSubgraphPeel did not empty the graph in $maxRounds rounds — " +
            "a rounds-unrolled oracle at this bound would disagree; raise maxRounds")
    }
    chain.free()
    traj.toSeq.toDF("round", "n_nodes", "n_edges")
      .withColumn("density",
        col("n_edges").cast("double") / col("n_nodes").cast("double"))
  }

  /** Exact RECTANGLE (4-cycle) census by the diagonal identity: every
    * 4-cycle u–a–w–b has exactly two diagonals (u,w) and (a,b), each seeing
    * the other two corners as common neighbors — so with λ(p) = common-
    * neighbor count of pair p, #C4 = Σ_p C(λ(p),2) / 2, all exact
    * integers. Rectangles are the next cycle census after triangles
    * (bipartite-ish co-occurrence structure that triangle counting is
    * blind to — two parts co-supplied with two other parts form a C4 and
    * no triangle). One wedge self-join keyed on the shared neighbor + one
    * (u,w) groupBy; wedge volume is Σ C(deg,2) — the same O(Σd²) any
    * exact common-neighbor computation pays (6.8M wedges on the sf0.1
    * co-supply graph, measured). There is no orientation trick for
    * wedges; the hub-cap lever from [[linkPredictionRA]] applies when a
    * capped census is acceptable — for the EXACT census it is not, so
    * callers own the Σd² bound. Output (one row): (n_wedges,
    * n_cocited_pairs, n_rectangles).
    */
  def rectangleCensus(edges: DataFrame): DataFrame = {
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val e = edges.select(col(uName).as("u"), col(vName).as("v"))
    val sym = e.select(col("u").as("z"), col("v").as("n"))
      .unionAll(e.select(col("v").as("z"), col("u").as("n")))
    val a = sym.select(col("z"), col("n").as("nu"))
    val b = sym.select(col("z"), col("n").as("nw"))
    val lam = a.join(b, Seq("z"))
      .filter(col("nu") < col("nw"))
      .groupBy(col("nu"), col("nw")).agg(count(lit(1)).as("lambda"))
    lam.agg(
        sum(col("lambda")).cast("long").as("n_wedges"),
        sum(when(col("lambda") >= 2, 1L).otherwise(0L)).cast("long").as("n_cocited_pairs"),
        sum(expr("lambda * (lambda - 1) div 2")).cast("long").as("__diag2"))
      .select(col("n_wedges"), col("n_cocited_pairs"),
        expr("__diag2 div 2").as("n_rectangles"))
  }

  /** RICH-CLUB coefficient (Zhou & Mondragón 2004) at a panel of degree
    * thresholds: φ(k) = 2·E_k / (N_k·(N_k−1)) where N_k counts nodes of
    * degree > k and E_k the edges with BOTH endpoints above — "do the hubs
    * preferentially wire to each other?", the structural question behind
    * hub-domination failure modes in similarity/link graphs. All moments
    * exact integers (the q218/q302 discipline), ONE double division at the
    * surface. Single pass: the degree table joins onto both edge
    * endpoints once; each threshold then reads the same frame (the
    * threshold panel is a literal explode — dictionary-sized, no per-k
    * scan of the edge list). Output: (k, n_nodes, n_edges, phi) per
    * threshold, rows with N_k < 2 reporting phi NULL (undefined, not 0).
    */
  def richClub(edges: DataFrame, thresholds: Seq[Int]): DataFrame = {
    require(thresholds.nonEmpty && thresholds.forall(_ >= 0), "thresholds must be >= 0")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val e = edges.select(col(uName).as("u"), col(vName).as("v"))
    val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      .select(least(col("du"), col("dv")).as("min_d"))
    val ks = explode(array(thresholds.map(k => lit(k)): _*)).as("k")
    val nNodes = deg.select(ks, col("d"))
      .filter(col("d") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_nodes"))
    val nEdges = withDeg.select(ks, col("min_d"))
      .filter(col("min_d") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_edges"))
    nNodes.join(nEdges, Seq("k"), "left")
      .select(col("k"), col("n_nodes"),
        coalesce(col("n_edges"), lit(0L)).as("n_edges"),
        when(col("n_nodes") >= 2,
          (lit(2L) * coalesce(col("n_edges"), lit(0L))).cast("double")
            / (col("n_nodes") * (col("n_nodes") - 1L)).cast("double"))
          .as("phi"))
  }

  /** k-TRUSS decomposition membership (Cohen 2008): iteratively delete
    * every edge supported by fewer than k−2 triangles until stable — the
    * edge-grained cousin of [[kCore]], and the standard "cohesive
    * subgraph" extractor that survives the star-spammer failure mode
    * k-core has (a star's hub is high-degree but zero-triangle). Each
    * round recomputes per-edge triangle support by the same degree-ordered
    * orientation as [[triangleCounts]] (wedge fanout capped at O(√m) per
    * source regardless of skew, each triangle found once and credited to
    * its three edges), filters, and repeats; the edge set only SHRINKS, so
    * an unchanged edge count certifies the fixpoint (equal count ⇒
    * identical set) and extra rounds are identity — the operator gates
    * against a rounds-unrolled oracle like [[coreness]]. REFUSES past
    * maxRounds (a mid-peel edge set looks like a valid truss). Peeling
    * converges in 3–5 rounds on the test graphs (measured); each round is
    * three shuffles (degrees, wedge build, support groupBy). Output: the
    * surviving canonical edges with their in-truss support,
    * (u, v, support), every support ≥ k−2 by construction.
    */
  def kTruss(edges: DataFrame, k: Int, maxRounds: Int = 12): DataFrame = {
    require(k >= 3, s"k must be >= 3: $k")
    require(maxRounds >= 1 && maxRounds <= 32, s"maxRounds must be in [1,32]: $maxRounds")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val sess = edges.sparkSession
    val chain = new RoundChain(sess.sparkContext)
    var cur = chain.ckpt(edges
      .filter(col(uName).isNotNull && col(vName).isNotNull && col(uName) =!= col(vName))
      .select(least(col(uName), col(vName)).as("u"),
        greatest(col(uName), col(vName)).as("v"))
      .distinct())
    var nEdges = cur.count()
    // ONE triangle enumeration (round-7): peeling only SHRINKS the edge
    // set, and every triangle of a subgraph is a triangle of the original
    // graph — so the degree-ordered-orientation wedge join (the operator's
    // dominant stage) runs exactly once, and each round's in-truss support
    // is "triangles whose three edges all survive": three measured-
    // broadcast semi joins over the materialized triangle list + one
    // explode/groupBy, instead of rebuilding degrees + orientation +
    // wedges + closure per round. Past [[BcastRows]] edges the semi joins
    // fall back to shuffles over the triangle list — still cheaper than a
    // wedge rebuild, whose volume bounds the triangle count from above.
    val triChain = new RoundChain(sess.sparkContext)
    val tri = triChain.ckpt {
      val e = cur
      val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      val ori = e
        .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
        .select(
          when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
            .otherwise(col("v")).as("src"),
          when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
            .otherwise(col("u")).as("dst"),
          when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("dv"))
            .otherwise(col("du")).as("dst_d"))
      val e1 = ori.select(col("src"), col("dst").as("b"), col("dst_d").as("bd"))
      val e2 = ori.select(col("src"), col("dst").as("c"), col("dst_d").as("cd"))
      val wedges = e1.join(e2, Seq("src"))
        .filter(struct(col("bd"), col("b")) < struct(col("cd"), col("c")))
      wedges
        .join(ori.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"))
        .select(
          least(col("src"), col("b")).as("u1"), greatest(col("src"), col("b")).as("v1"),
          least(col("src"), col("c")).as("u2"), greatest(col("src"), col("c")).as("v2"),
          least(col("b"), col("c")).as("u3"), greatest(col("b"), col("c")).as("v3"))
    }
    def support(e: DataFrame, rows: Long, firstRound: Boolean): DataFrame = {
      val alive =
        if (firstRound) tri // round 1: cur IS the enumeration's edge set
        else {
          val h = hinted(e, rows)
          tri
            .join(h.select(col("u").as("u1"), col("v").as("v1")), Seq("u1", "v1"), "left_semi")
            .join(h.select(col("u").as("u2"), col("v").as("v2")), Seq("u2", "v2"), "left_semi")
            .join(h.select(col("u").as("u3"), col("v").as("v3")), Seq("u3", "v3"), "left_semi")
        }
      val exploded = alive.select(explode(array(
          struct(col("u1").as("u"), col("v1").as("v")),
          struct(col("u2").as("u"), col("v2").as("v")),
          struct(col("u3").as("u"), col("v3").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
      // Round-9 measured (KTrussLab): the triangle list is UNPARTITIONED
      // w.r.t. edge keys, so each partial-agg task's hash table is keyed by
      // nearly the FULL surviving edge set — at the 100× rung that stage's
      // CPU grew 26× for 3.33× data (bytes exactly linear): the per-task
      // table (~24M keys × 32 tasks) left every probe missing LLC. Past a
      // heap-derived key bound, pre-partition the exploded edges by key:
      // the agg's exchange moves BELOW the partial aggregate (same exchange
      // count — EnsureRequirements adds none above it), per-task key space
      // shrinks by the partition count, and the trade is raw exploded rows
      // on the wire instead of partially-combined ones (the combine ratio
      // is ≤3 here — one row per triangle edge — so the byte cost is
      // bounded ×3 while the CPU cliff is ~26×). `graft.ktruss.supportAgg`
      // pins `plain`/`repart` for regime-pinned measurement.
      val perTaskKeyBound = Runtime.getRuntime.maxMemory() / 8L /
        (sess.conf.get("spark.sql.shuffle.partitions").toLong * 64L)
      val form = sys.props.getOrElse("graft.ktruss.supportAgg",
        if (rows > perTaskKeyBound) "repart" else "plain")
      val grouped = if (form == "repart") exploded.repartition(col("u"), col("v"))
        else exploded
      grouped.groupBy(col("u"), col("v")).agg(count(lit(1)).as("support"))
    }
    val supChain = new RoundChain(sess.sparkContext)
    withRoundConf(sess, nEdges) {
      var converged = false
      var it = 0
      var lastSupport: DataFrame = null
      while (!converged && it < maxRounds) {
        // checkpoint the round's support: the converged round's support
        // frame IS the final answer (computed on an edge set the filter
        // then leaves unchanged)
        val sup = supChain.ckpt(support(cur, nEdges, it == 0))
        val (next, m) = ckptObserved(chain, cur
          .join(sup.filter(col("support") >= k - 2), Seq("u", "v"), "left_semi"),
          Seq(count(lit(1)).as("n")))
        val n = m("n").asInstanceOf[Long]
        converged = n == nEdges
        cur = next
        nEdges = n
        lastSupport = sup
        it += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"kTruss(k=$k) did not converge in $maxRounds rounds — a " +
            "rounds-unrolled oracle at this bound would disagree; raise maxRounds")
      RoundTrace.record("ktruss", it)
      triChain.free()
      chain.keep()
      supChain.keep()
      cur.join(lastSupport, Seq("u", "v"))
    }
  }

  /** PERSONALIZED PageRank from a seed set, in the same scaled-integer
    * arithmetic as [[pageRankIntFixed]] — the seed-expansion primitive of
    * corpus curation (Gopher/DSIR-style: start from known-good domains or
    * documents, walk the link/similarity graph, harvest what the walk
    * concentrates mass on). Identical recurrence, except ALL teleport mass
    * returns to the seeds:
    *
    *   r⁰(v)   = ⌊scale / |S|⌋ · [v ∈ S]
    *   rᵏ⁺¹(v) = ⌊(dampDen−dampNum)·scale / (dampDen·|S|)⌋ · [v ∈ S]
    *           + ⌊dampNum · Σ_{u→v} ⌊rᵏ(u)/deg(u)⌋ / dampDen⌋
    *
    * Exact integer floors end to end, so the result hash-gates against an
    * iters-unrolled oracle like the global variant. Fixed iteration count;
    * nodes with zero mass after the last round are dropped (they are
    * exactly the nodes the truncated walk cannot reach). One shuffle per
    * iteration (contributions groupBy dst) — the seed membership flag
    * rides the degree table, no extra join.
    */
  def personalizedPageRankInt(
      edges: DataFrame,
      seeds: DataFrame,
      iters: Int = 5,
      scale: Long = 1000000000000L,
      dampNum: Long = 17,
      dampDen: Long = 20
  ): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in [1,50]: $iters")
    require(dampNum > 0 && dampNum < dampDen, s"damping must be in (0,1): $dampNum/$dampDen")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val seedCol = seeds.columns.head
    prDiffusion(edges.filter(col(uName).isNotNull && col(vName).isNotNull
        && col(uName) =!= col(vName))
        .select(least(col(uName), col(vName)).as("u"),
          greatest(col(uName), col(vName)).as("v")).distinct(),
      seedFilter = Some(seeds.select(col(seedCol).as("src")).distinct()),
      iters, scale, dampNum, dampDen)
      .filter(col("rank") > 0L)
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
    * constant-size (the q58/q85 CC lesson), round shuffles are sized from
    * the measured edge count and previous rounds' blocks freed eagerly
    * ([[withRoundConf]]/[[RoundChain]]). Throws if not converged in
    * `maxIters` — a silent partial peel would LOOK like a valid core.
    * Input contract matches [[triangleCounts]]: first two columns are
    * endpoints of canonical u < v edges. Output: (node, core_deg) for
    * surviving nodes — every core_deg is ≥ k by construction.
    */
  def kCore(edges: DataFrame, k: Int, maxIters: Int = 30): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val sess = edges.sparkSession
    val chain = new RoundChain(sess.sparkContext)
    // SYMMETRIC representation, dst-partitioned + preserved across every
    // round's checkpoint (round-7 device): the per-round degree groupBy
    // (dst) reuses the one up-front shuffle, the keep-list broadcasts, and
    // the two semi joins preserve the partitioning through the next
    // checkpoint — zero per-round exchanges. deg(node) = rows per dst is
    // exact because sym carries both directions.
    def degrees(e: DataFrame): DataFrame = e
      .groupBy(col("dst").as("node")).agg(count(lit(1)).as("core_deg"))
    var cur = ckptKeepPartitioning(chain, edges
      .select(col(uName).as("src"), col(vName).as("dst"))
      .unionAll(edges.select(col(vName).as("src"), col(uName).as("dst")))
      .repartition(col("dst")))
    var nEdges = cur.count()
    withRoundConf(sess, nEdges) {
      var converged = false
      var it = 0
      while (!converged && it < maxIters) {
        // keep-list ≤ node count ≤ current sym rows — a measured bound,
        // so the broadcast decision is safe, not an estimate
        val keep = hinted(
          degrees(cur).filter(col("core_deg") >= k).select(col("node")), nEdges)
        val (next, m) = ckptObserved(chain, cur
          .join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
          .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
          .select(col("src"), col("dst")),
          Seq(count(lit(1)).as("n")), keepPartitioning = true)
        val n = m("n").asInstanceOf[Long]
        converged = n == nEdges
        cur = next
        nEdges = n
        it += 1
      }
      if (!converged)
        throw new IllegalStateException(s"kCore(k=$k) did not converge in $maxIters rounds")
      RoundTrace.record("kcore", it)
      chain.keep()
      degrees(cur)
    }
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
    val sess = edges.sparkSession
    val adjChain = new RoundChain(sess.sparkContext)
    val seedCol = seeds.columns.head
    // self-loops make carry+expand ONE join (no Union to discard
    // partitioning); the loop arm covers graph nodes AND seed nodes, so a
    // seed absent from the graph still carries its own reached row (the
    // old union semantics) — then dst-partitioned + preserved so the
    // per-round distinct reuses the one up-front shuffle
    val sym0 = adjChain.ckpt(edges
      .select(col(uName).as("src"), col(vName).as("dst"))
      .unionAll(edges.select(col(vName).as("src"), col(uName).as("dst"))))
    val nEdges = sym0.count()
    val sym = ckptKeepPartitioning(adjChain, sym0
      .unionAll(sym0.select(col("dst"))
        .unionAll(seeds.select(col(seedCol).as("dst"))).distinct()
        .select(col("dst").as("src"), col("dst")))
      .repartition(col("dst")))
    val chain = new RoundChain(sess.sparkContext)
    var reached = chain.ckpt(
      seeds.select(col(seedCol).as("seed"), col(seedCol).as("node")))
    var nReached = reached.count()
    withRoundConf(sess, nEdges) {
      for (_ <- 1 to k) {
        // the reached set was just materialized, so its row count is exact —
        // broadcast it into the expansion join while it fits (the edge
        // table then never shuffles); past the bound this is the plain
        // shuffle join, the correct plan for huge frontiers
        val r = hinted(reached, nReached)
        val (nr, m) = ckptObserved(chain, r
          .join(sym, r("node") === sym("src"))
          .select(col("seed"), col("dst").as("node"))
          .distinct(),
          Seq(count(lit(1)).as("n")))
        reached = nr
        nReached = m("n").asInstanceOf[Long]
      }
    }
    // the final round is a LogicalRDD — nothing downstream reads the
    // adjacency list, so its blocks can go now instead of at GC time
    adjChain.free()
    chain.keep()
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
    val sess = edges.sparkSession
    val adjChain = new RoundChain(sess.sparkContext)
    // dst-partitioned + preserved (the prDiffusion round-7 shape): each
    // iteration broadcasts the node-sized (node, rank, wout) frame, the
    // per-edge contribution (rank·w) div wout computes edge-side, and the
    // dst aggregate reuses the one up-front shuffle — zero exchanges per
    // iteration; undirected ⇒ the aggregate covers every node, so no
    // teleport left join
    val sym = ckptKeepPartitioning(adjChain, und
      .select(explode(array(
        struct(col("u").as("src"), col("v").as("dst"), col("w")),
        struct(col("v").as("src"), col("u").as("dst"), col("w")))).as("e"))
      .select(col("e.src"), col("e.dst"), col("e.w"))
      .repartition(col("dst")))
    val wBound = sym.agg(max(col("w"))).head().getLong(0)
    require(wBound <= maxWeight,
      s"edge weight $wBound exceeds the rank·w overflow bound $maxWeight — lower scale")
    val wout = sym.groupBy(col("src")).agg(sum(col("w")).as("wout")).localCheckpoint()
    val n = wout.count()
    require(n > 0, "pageRankWeightedIntFixed needs a non-empty edge list")
    val teleport = ((dampDen - dampNum) * scale) / (dampDen * n)
    if (n <= BcastRows) {
      val woutB = wout.select(col("src").as("dnode"), col("wout"))
      var rank = wout.select(col("src").as("node"), lit(scale / n).as("rank"), col("wout"))
      for (_ <- 1 to iters) {
        val cb = broadcast(rank.select(col("node").as("cnode"),
          col("rank").as("crank"), col("wout").as("cwout")))
        rank = sym.join(cb, sym("src") === cb("cnode"))
          .select(col("dst"), expr("(crank * w) div cwout").as("c"))
          .groupBy(col("dst").as("node")).agg(sum(col("c")).as("in_mass"))
          .join(broadcast(woutB), col("node") === col("dnode"))
          .select(col("node"),
            (lit(teleport) + expr(s"($dampNum * in_mass) div $dampDen")).as("rank"),
            col("wout"))
      }
      rank.select(col("node"), col("rank"))
    } else {
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
    * hash-join + one min-groupBy; the frontier frame is checkpointed per
    * round (constant-depth plan, the CC lesson), round shuffles are sized
    * from the measured edge count and previous rounds' blocks freed
    * eagerly ([[withRoundConf]]/[[RoundChain]]).
    */
  def shortestPathsInt(
      edges: DataFrame,
      sources: DataFrame,
      maxRounds: Int = 8
  ): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 32, s"maxRounds must be in [1,32]: $maxRounds")
    val Seq(uName, vName, wName) = edges.columns.take(3).toSeq
    val sess = edges.sparkSession
    val adjChain = new RoundChain(sess.sparkContext)
    val sym0 = adjChain.ckpt(edges
      .select(col(uName).as("src"), col(vName).as("dst"), col(wName).cast("long").as("w"))
      .unionAll(edges.select(col(vName).as("src"), col(uName).as("dst"),
        col(wName).cast("long").as("w"))))
    val nEdges = sym0.count()
    // round-7 exchange-free round shape (the coreness device): the
    // adjacency is AUGMENTED with a weight-0 self-loop per node — so
    // min(dist, relax) is ONE relaxation over sym' (the self-loop arm
    // reproduces the carried distance exactly) instead of
    // union(dist, relax) whose Union discards partitioning and forces an
    // edge-sized exchange every round — then checkpointed dst-partitioned
    // with the partitioning PRESERVED ([[ckptKeepPartitioning]]). With the
    // distance frame broadcast (measured rows ≤ [[BcastRows]]) a round is
    // a BHJ + in-place min: zero exchanges. Past the bound the planner
    // falls back to the shuffle join — the >4M-frontier plan.
    val nParts = Par.roundParts(sess, nEdges)
    val chain = new RoundChain(sess.sparkContext)
    val seedCol = sources.columns.head
    // self-loops over edge endpoints ∪ SOURCES: a source absent from the
    // edge list has no sym row at all, so without its own self-loop its
    // (node, dist=0) row would vanish after round 1 — the old unionAll
    // form kept it implicitly, and kHopCounts unions its seeds the same
    // way (the isolated-seed row is part of the answer: dist 0 to itself)
    val sym = ckptKeepPartitioning(adjChain, sym0
      .unionAll(sym0.select(col("dst"))
        .unionAll(sources.select(col(seedCol).as("dst"))).distinct()
        .select(col("dst").as("src"), col("dst"), lit(0L).as("w")))
      .repartition(nParts, col("dst")))
    var dist = chain.ckpt(sources.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L)))
    // convergence witness: distances only ever DECREASE and the node set
    // only ever GROWS under min-plus relaxation, so a round improved
    // something iff the (node count, Σdist) pair moved — one single-row
    // aggregate over the checkpointed frame per round instead of a
    // frame-vs-frame join+count (measured 8.3 s → 6.3 s at sf0.1)
    def witness(d: DataFrame): (Long, java.math.BigDecimal) = {
      val r = d.agg(count(lit(1)), sum(col("dist").cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    withRoundConf(sess, nEdges) {
      var w0 = witness(dist)
      var converged = false
      var round = 0
      while (!converged && round < maxRounds) {
        // the distance table was just materialized — w0 carries its exact
        // row count, so the relaxation join broadcasts it while it fits
        // and the edge table never shuffles; huge graphs fail the bound
        // and keep the shuffle join
        val d = hinted(dist, w0._1)
        // witness FUSED into the checkpoint job (ckptObserved): one job
        // per round instead of materialize + a separate single-row scan
        val (next, m) = ckptObserved(chain,
          d.join(sym, d("node") === sym("src"))
            .select(col("dst"), (col("dist") + col("w")).as("reached"))
            .groupBy(col("dst").as("node")).agg(min(col("reached")).as("dist")),
          Seq(count(lit(1)).as("wn"),
            sum(col("dist").cast("decimal(38,0)")).as("ws")))
        val w1 = (m("wn").asInstanceOf[Long],
          m("ws").asInstanceOf[java.math.BigDecimal])
        dist = next
        converged = w1 == w0
        w0 = w1
        round += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"shortestPathsInt did not reach its fixed point in $maxRounds rounds — " +
            "an unrolled-rounds oracle at this bound would disagree; raise maxRounds")
      RoundTrace.record("sssp", round)
    }
    // the fixed point is a LogicalRDD — the adjacency list is no longer
    // referenced by anything downstream; free it now, keep only the result
    adjChain.free()
    chain.keep()
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

  /** Full core decomposition — the CORENESS number of every node (the
    * largest k such that the node survives in the k-core), not just one
    * k-core's membership — by the distributed h-index iteration of
    * Montresor, De Pellegrini & Miorandi (2011): c⁰(v) = deg(v),
    * cⁱ⁺¹(v) = h-index of {cⁱ(u) : u ∈ N(v)} (the largest h with ≥ h
    * neighbors at value ≥ h). Estimates only ever DECREASE and the unique
    * fixed point IS the core number, so the operator runs to convergence
    * and REFUSES a mid-iteration result (the kCore/shortestPathsInt
    * contract: an oracle unrolled to the same bound would silently
    * disagree). Coreness is the standard "how deep in the dense backbone"
    * node feature — one number per node, vs [[kCore]]'s single-k
    * membership test.
    *
    * Scale shape per round (the round-7 EXCHANGE-FREE plan, measured 2×
    * over the round-6 ranked form — 4.7–5.1 s vs 10.2–10.5 s at sf0.1,
    * fixed points bit-identical): the adjacency is checkpointed ONCE
    * pre-partitioned by dst with AQE scoped off around the checkpoint
    * ([[ckptKeepPartitioning]] — with AQE on, the adaptive plan reports
    * UnknownPartitioning at checkpoint-build time and the partitioning is
    * silently lost, re-inserting an Exchange above every round's window;
    * this was the actual round-6 bottleneck, measured 7 exchanges per
    * 4-step block vs 0 after the fix). Each chained step then broadcasts
    * the node-sized estimate frame (gated at [[BcastRows]] measured rows)
    * into a BHJ that PRESERVES the dst partitioning, and the h-index is
    * extracted per node with zero exchanges as
    * h = max(min(sorted_desc(votes)[i], i+1)) over a collect_list array —
    * a codegen'd zip_with, no partition-wide window sort. Past the
    * broadcast bound the loop falls back to the shuffle form (SMJ join +
    * per-node window rank), the correct plan once per-round real work
    * dwarfs stage overhead. Convergence is a single-row (count, Σc)
    * witness on the checkpointed round — Σc is strictly monotone under
    * any change. Input contract matches [[triangleCounts]]: canonical
    * u < v endpoints, undirected. Output: (node, coreness).
    */
  def coreness(edges: DataFrame, maxRounds: Int = 64,
               stepsPerCheckpoint: Int = 4): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 128, s"maxRounds must be in [1,128]: $maxRounds")
    require(stepsPerCheckpoint >= 1 && stepsPerCheckpoint <= 8,
      s"stepsPerCheckpoint must be in [1,8]: $stepsPerCheckpoint")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val sess = edges.sparkSession
    val adjChain = new RoundChain(sess.sparkContext)
    val sym0 = adjChain.ckpt(edges
      .select(col(uName).as("src"), col(vName).as("dst"))
      .unionAll(edges.select(col(vName).as("src"), col(uName).as("dst"))))
    val nEdges = sym0.count()
    // dst-partitioned adjacency, partitioning PRESERVED through the
    // checkpoint (AQE scoped off) — every exchange-free round below rides
    // this one up-front shuffle. Width follows the withRoundConf sizing so
    // small graphs keep narrow rounds.
    val nParts = Par.roundParts(sess, nEdges)
    val sym = ckptKeepPartitioning(adjChain, sym0.repartition(nParts, col("dst")))
    val chain = new RoundChain(sess.sparkContext)
    // degree via dst (not src): sym holds both directions, so the counts
    // are identical — but grouping by dst reuses the adjacency partitioning
    // and the init is exchange-free too
    var cur = chain.ckpt(sym.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("c")))
    def witness(d: DataFrame): (Long, java.math.BigDecimal) = {
      val r = d.agg(count(lit(1)), sum(col("c").cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    val wPerNode = W.partitionBy(col("dst")).orderBy(col("cval").desc)
    // one h-index refinement as a plan fragment; the loop CHAINS
    // `stepsPerCheckpoint` of these between checkpoints because the
    // h-index iteration converges in ~25-32 rounds on the test graphs and
    // per-round job overhead (not shuffle volume) dominates — 4 algorithm
    // rounds per materialized job quarters the job count at constant plan
    // depth. Σc is strictly monotone under ANY change, so an unchanged
    // witness across a multi-step block certifies every step inside it
    // was a no-op, i.e. the fixed point — extra steps past convergence
    // are identity by the same invariance that lets the oracle unroll a
    // LARGER round count than the graph needs.
    //
    // Exchange-free step (node frame fits BcastRows): BHJ keeps sym's dst
    // partitioning; groupBy(dst) and the array h-index run in the SAME
    // stage — the only per-step job is the broadcast build, which nests
    // linearly (each BroadcastExchange in the chained plan materializes
    // exactly once). Within whole-stage codegen the h-index is
    // max(min(v_desc[i], i+1)) over the node's own sorted vote array —
    // Σ d·log d total sort work instead of a partition-wide N·log N sort.
    def stepBcast(l: DataFrame): DataFrame =
      sym.join(broadcast(l), sym("src") === l("node"))
        .select(col("dst"), col("c").as("cval"))
        .groupBy(col("dst").as("node"))
        .agg(reverse(array_sort(collect_list(col("cval")))).as("vs"))
        .select(col("node"),
          array_max(zip_with(col("vs"),
            sequence(lit(1L), size(col("vs")).cast("long")),
            (v, i) => least(v, i))).as("c"))
    // shuffle fallback past the broadcast bound: SMJ vote join + per-node
    // window rank (the round-6 plan — measured best among the shuffle
    // forms; the capped-vote histogram rewrite was re-tested this round
    // under both shuffle and exchange-free regimes and LOST both times:
    // 22 s shuffle / 10 s exchange-free vs 10 s / 4.8 s, the extra
    // per-step exchange-or-broadcast outweighing the smaller window)
    def stepRanked(l: DataFrame): DataFrame =
      sym.join(l, sym("src") === l("node"))
        .select(col("dst"), col("c").as("cval"))
        .withColumn("rn", row_number().over(wPerNode))
        .groupBy(col("dst").as("node"))
        .agg(max(least(col("cval"), col("rn"))).as("c"))
    withRoundConf(sess, nEdges) {
      var w0 = witness(cur)
      var converged = false
      var rounds = 0
      while (!converged && rounds < maxRounds) {
        // the fold seed is the materialized round (measured broadcast
        // hint); chained steps broadcast internally in the exchange-free
        // form, while the shuffle fallback leaves them to the planner
        // (hinting every chained step measured as a loss there — each
        // broadcast build re-executes the unmaterialized chain prefix).
        val step: DataFrame => DataFrame =
          if (w0._1 <= BcastRows) stepBcast else stepRanked
        val (next, m) = ckptObserved(chain,
          (1 to stepsPerCheckpoint).foldLeft(hinted(cur, w0._1))((d, _) => step(d)),
          Seq(count(lit(1)).as("wn"),
            sum(col("c").cast("decimal(38,0)")).as("ws")))
        val w1 = (m("wn").asInstanceOf[Long],
          m("ws").asInstanceOf[java.math.BigDecimal])
        cur = next
        converged = w1 == w0
        w0 = w1
        rounds += stepsPerCheckpoint
      }
      if (!converged)
        throw new IllegalStateException(
          s"coreness did not reach its fixed point in $maxRounds rounds — " +
            "an unrolled-rounds oracle at this bound would disagree; raise maxRounds")
    }
    adjChain.free()
    chain.keep()
    cur.select(col("node"), col("c").as("coreness"))
  }

  /** Community detection by synchronous label propagation (Raghavan,
    * Albert & Kumara 2007), made DETERMINISTIC: every node starts with its
    * own id as label and each round adopts the most frequent label among
    * its neighbors, ties broken by MINIMUM label. The canonical async LPA
    * is order-dependent (its selling point is speed, not stability); the
    * synchronous fixed-round variant here is a pure function of
    * (edges, rounds) — the same device that makes [[pageRankIntFixed]] and
    * [[kCore]] hash-gateable against an unrolled-rounds SQL oracle. A fixed
    * round count also sidesteps synchronous LPA's known 2-cycle
    * oscillations (bipartite-ish regions flip forever, so "run to
    * convergence" is not even well-defined).
    *
    * Scale shape: per round, one broadcast-or-shuffle join attaching the
    * node-sized label frame to the adjacency list (the edge table never
    * shuffles while the label frame fits [[BcastRows]]) and one
    * (src, label) vote count whose partial aggregation combines map-side —
    * vote rows ≤ 2·|E| before combine, ≤ distinct (node, neighbor-label)
    * after. The arg-max per node is `max_by(label, (count, −label))`, a
    * single aggregate with no per-node window. Rounds are checkpointed and
    * previous rounds' blocks freed eagerly ([[RoundChain]]); round shuffles
    * are sized from the measured edge count ([[withRoundConf]]). Input
    * contract matches [[triangleCounts]]: first two columns are canonical
    * u < v endpoints, treated as undirected; with `weighted = true` a
    * third INTEGER column weights each neighbor's vote (exact sums, so
    * the winner stays engine-stable). Output: (node, community) for every
    * node with ≥ 1 edge.
    */
  def labelPropagation(edges: DataFrame, rounds: Int = 4,
                       weighted: Boolean = false): DataFrame = {
    require(rounds >= 1 && rounds <= 16, s"rounds must be in [1,16]: $rounds")
    val cols = edges.columns
    require(!weighted || cols.length >= 3,
      "weighted LPA needs a third (integer weight) column")
    val Seq(uName, vName) = cols.take(2).toSeq
    val sess = edges.sparkSession
    val adjChain = new RoundChain(sess.sparkContext)
    // weighted votes: a neighbor's label counts w times — INTEGER weights
    // keep the vote sums exact, so the winner (and with it the whole
    // fixed-round trajectory) stays engine-stable; unweighted is w = 1
    val wCol = if (weighted) col(cols(2)).cast("long") else lit(1L)
    // src-partitioned, partitioning preserved ([[ckptKeepPartitioning]]):
    // with the label frame broadcast, the per-round vote count groupBy
    // (src, label) and the arg-max groupBy (src) both reuse this one
    // up-front shuffle — zero exchanges per round (the round-7 coreness
    // device; HashPartitioning(src) satisfies the (src, label) clustering)
    val sym = ckptKeepPartitioning(adjChain, edges
      .select(col(uName).as("src"), col(vName).as("dst"), wCol.as("w"))
      .unionAll(edges.select(col(vName).as("src"), col(uName).as("dst"), wCol.as("w")))
      .repartition(col("src")))
    val nEdges = sym.count()
    val chain = new RoundChain(sess.sparkContext)
    var labels = chain.ckpt(sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")))
    // every node has >= 1 neighbor (labels came from the edge list), so the
    // node set — and with it this measured broadcast bound — is invariant
    // across rounds
    val nNodes = labels.count()
    withRoundConf(sess, nEdges) {
      for (_ <- 1 to rounds) {
        val l = hinted(labels, nNodes)
        val votes = sym.join(l, sym("dst") === l("node"))
          .groupBy(col("src"), col("label")).agg(sum(col("w")).as("c"))
        labels = chain.ckpt(votes
          .groupBy(col("src"))
          .agg(max_by(col("label"),
            struct(col("c"), (-col("label")).as("nl"))).as("label"))
          .select(col("src").as("node"), col("label")))
      }
    }
    adjChain.free()
    chain.keep()
    labels
  }

  /** Newman modularity of a node partition: Q = intra/m − Σ_c D_c²/(2m)²,
    * where m = |edges|, intra = edges inside a community and D_c = total
    * degree of community c — the standard "is this partition better than
    * the degree-preserving null model" score (Newman & Girvan 2004),
    * typically fed by [[labelPropagation]]. Both terms are EXACT integer
    * moments (counts and a Σ of squared degree sums in DECIMAL(38,0), so
    * 100× the edges cannot overflow) with ONE double division at the
    * surface — the [[degreeAssortativity]] / q218 determinism device, which
    * is what lets a quality score over an iterative algorithm's output be
    * hash-gated cell-for-cell. Cost: two node-frame joins to attach labels
    * to edge endpoints, one degree aggregation, two scalar aggregates
    * joined as broadcast 1-row frames (no cartesian risk). Input contracts:
    * `edges` first two columns canonical u < v endpoints; `labels` first
    * two columns (node, community). Output one row:
    * (n_communities, intra_edges, m, modularity).
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d0 = DecimalType(38, 0)
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val Seq(nName, lName) = labels.columns.take(2).toSeq
    val e = edges.select(col(uName).as("u"), col(vName).as("v"))
    val lab = labels.select(col(nName).as("node"), col(lName).as("label"))
    val intra = e
      .join(lab.select(col("node").as("u"), col("label").as("lu")), Seq("u"))
      .join(lab.select(col("node").as("v"), col("label").as("lv")), Seq("v"))
      .agg(
        count(lit(1)).as("m"),
        sum(when(col("lu") === col("lv"), 1L).otherwise(0L)).as("intra_edges"))
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val sums = deg.join(lab, Seq("node"))
      .groupBy(col("label")).agg(sum(col("deg")).as("dcsum"))
      .agg(
        count(lit(1)).as("n_communities"),
        sum(col("dcsum").cast(d0) * col("dcsum").cast(d0)).as("sum_d2"))
    intra.crossJoin(broadcast(sums)) // 1 row × 1 row
      .select(
        col("n_communities"),
        col("intra_edges"),
        col("m"),
        ((lit(4).cast(d0) * col("m").cast(d0) * col("intra_edges").cast(d0)
          - col("sum_d2")).cast("double")
          / (lit(4).cast(d0) * col("m").cast(d0) * col("m").cast(d0)).cast("double"))
          .as("modularity"))
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

  /** Truncated Katz centrality in EXACT integers (Katz 1953, attenuation
    * α = 1/2, horizon K): katz·2^K = Σ_{k=1..K} 2^(K−k) · walks_k(v),
    * where walks_k(v) = (Aᵏ·1)(v) counts length-k walks leaving v. The
    * dyadic attenuation makes every term — and the ranking — an exact
    * integer, so no float powers, no normalizing division, no libm; the
    * unrolled SQL oracle reproduces it digit-for-digit (the
    * pageRankIntFixed discipline without even the floor-division bias).
    * Horizon-K Katz is the standard "influence within K steps" centrality
    * between degree (K=1) and eigenvector (K→∞).
    *
    * Scale shape: K iterations of one measured-broadcast attach of the
    * node-sized walk frame onto the adjacency list + one partial-combined
    * groupBy — the edge table never shuffles while the frame fits
    * [[BcastRows]]. Overflow bound: walks_K ≤ maxDeg^K — K=4 at maxDeg
    * 10⁴ stays inside int64; callers pick K accordingly.
    */
  def katzCentrality(edges: DataFrame, horizon: Int = 4): DataFrame = {
    require(horizon >= 1 && horizon <= 8, s"horizon must be in [1,8]: $horizon")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val sess = edges.sparkSession
    val adjChain = new RoundChain(sess.sparkContext)
    // src-partitioned + preserved: each round's walk-count groupBy (src)
    // reuses this shuffle under the broadcast walk frame
    val sym = ckptKeepPartitioning(adjChain, edges
      .select(col(uName).as("src"), col(vName).as("dst"))
      .unionAll(edges.select(col(vName).as("src"), col(uName).as("dst")))
      .repartition(col("src")))
    sym.count()
    val wChain = new RoundChain(sess.sparkContext)
    val kChain = new RoundChain(sess.sparkContext)
    var walks = wChain.ckpt(sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("w")))
    val nNodes = walks.count()
    var katz = kChain.ckpt(walks
      .select(col("node"), (col("w") * lit(1L << (horizon - 1))).as("katz")))
    (2 to horizon).foreach { k =>
      walks = wChain.ckpt(sym
        .join(hinted(walks.select(col("node").as("jnode"), col("w")), nNodes),
          col("dst") === col("jnode"))
        .groupBy(col("src").as("node"))
        .agg(sum(col("w")).as("w")))
      // every node has degree ≥ 1, so walks_k covers every node and the
      // inner join loses no rows
      katz = kChain.ckpt(katz
        .join(walks.select(col("node").as("wnode"), col("w")), col("node") === col("wnode"))
        .select(col("node"),
          (col("katz") + col("w") * lit(1L << (horizon - k))).as("katz")))
    }
    adjChain.free()
    wChain.keep()
    kChain.keep()
    katz.join(walks.select(col("node").as("wnode"), col("w")), col("node") === col("wnode"))
      .select(col("node"), col("w").as(s"walks_$horizon"), col("katz").as("katz_scaled"))
  }

  /** Deterministic greedy MAXIMAL MATCHING by iterated local minima over a
    * fixed edge priority — [[maximalIndependentSet]] run on the implicit
    * LINE GRAPH without materializing it (Israeli & Itai 1986's parallel
    * matching, derandomized): every edge gets priority md5(u:v) and each
    * round an edge joins the matching iff its priority is the minimum
    * among ALL active edges sharing either endpoint; matched endpoints
    * deactivate every edge touching them. Equals the sequential greedy
    * matching in global priority order — a unique pure function of the
    * edge set, gateable against a round-unrolled oracle. The use: one-to-
    * one pair assignment (merge scheduling, resource pairing) where no
    * entity may appear twice.
    *
    * Scale shape per round: the incident-priority node minimum is ONE
    * union + groupBy over active edges (never the O(Σdeg²) line graph),
    * then two node-keyed joins pick winners and an anti-join deactivates;
    * the active set shrinks geometrically, rounds via [[RoundChain]] /
    * [[withRoundConf]]. Output: (u, v, round).
    */
  def greedyMatching(edges: DataFrame, maxRounds: Int = 40): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 128, s"maxRounds must be in [1,128]: $maxRounds")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val sess = edges.sparkSession
    val chain = new RoundChain(sess.sparkContext)
    val matchChain = new RoundChain(sess.sparkContext)
    var active = chain.ckpt(edges
      .select(col(uName).as("u"), col(vName).as("v"))
      .withColumn("pri", md5(concat_ws(":", col("u").cast("string"), col("v").cast("string")))))
    var nActive = active.count()
    val nEdges = nActive
    var matched = matchChain.ckpt(sess.emptyDataFrame
      .select(lit(0L).as("u"), lit(0L).as("v"), lit(0).as("round")).limit(0))
    withRoundConf(sess, nEdges) {
      var round = 0
      while (nActive > 0 && round < maxRounds) {
        round += 1
        val nodeMin = active.select(col("u").as("node"), col("pri"))
          .unionAll(active.select(col("v").as("node"), col("pri")))
          .groupBy(col("node")).agg(min(col("pri")).as("mp"))
        val nm = hinted(nodeMin, 2 * nActive)
        val nextMatched = matchChain.ckpt(matched.unionAll(active
          .join(nm.select(col("node").as("nu"), col("mp").as("mpu")), col("u") === col("nu"))
          .join(nm.select(col("node").as("nv"), col("mp").as("mpv")), col("v") === col("nv"))
          .filter(col("pri") === col("mpu") && col("pri") === col("mpv"))
          .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"),
            lit(round).as("round"))))
        val mRound = nextMatched.filter(col("round") === round)
        val taken = mRound.select(col("u").as("node"))
          .unionAll(mRound.select(col("v").as("node")))
        val tk = hinted(taken, nActive)
        val (nextActive, m) = ckptObserved(chain, active
          .join(tk.select(col("node").as("t1")), col("u") === col("t1"), "left_anti")
          .join(tk.select(col("node").as("t2")), col("v") === col("t2"), "left_anti"),
          Seq(count(lit(1)).as("n")))
        matched = nextMatched
        active = nextActive
        nActive = m("n").asInstanceOf[Long]
      }
      if (nActive > 0)
        throw new IllegalStateException(
          s"greedyMatching did not converge in $maxRounds rounds — " +
            "a round-unrolled oracle at this bound would disagree; raise maxRounds")
    }
    chain.free()
    matchChain.keep()
    matched
  }

  /** Weisfeiler–Lehman color refinement (Weisfeiler & Leman 1968; the
    * 1-WL test, also the theoretical ceiling of message-passing GNNs —
    * Xu et al. ICLR'19): every node starts colored by its DEGREE and each
    * round recolors to md5(own color || '|' || comma-joined SORTED
    * multiset of neighbor colors). After k rounds two nodes share a color
    * iff their k-hop neighborhood trees are isomorphic — the standard
    * structural fingerprint for graph dedup, role discovery, and GNN
    * feature hashing. Colors are md5 hex STRINGS, so the sort order and
    * the hash arithmetic are engine-neutral and the whole refinement
    * gates against a round-unrolled SQL oracle cell-for-cell.
    *
    * Scale shape per round: one measured-broadcast attach of the
    * node-sized color frame onto the adjacency list ([[hinted]] — the
    * edge table never shuffles while colors fit [[BcastRows]]), one
    * per-node sorted collect, one self-color join; rounds materialize
    * through [[RoundChain]] (each round references its predecessor twice
    * — self color + neighbor colors — so CHAINING would square the plan
    * per round: the coreness frontier lesson). The sorted neighbor-color
    * list is degree-bounded per node; super-hub concatenations are the
    * known 1-WL cost and stay row-local.
    */
  def wlColors(edges: DataFrame, rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds must be in [1,8]: $rounds")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val sess = edges.sparkSession
    val adjChain = new RoundChain(sess.sparkContext)
    // dst-partitioned + preserved; the per-round neighbor-signature groupBy
    // (dst) reuses this shuffle, and the self-color attach keeps the
    // aggregate side as the STREAM (colors broadcast) so the round is
    // exchange-free
    val sym = ckptKeepPartitioning(adjChain, edges
      .select(col(uName).as("src"), col(vName).as("dst"))
      .unionAll(edges.select(col(vName).as("src"), col(uName).as("dst")))
      .repartition(col("dst")))
    val nEdges = sym.count()
    val chain = new RoundChain(sess.sparkContext)
    var colors = chain.ckpt(sym.groupBy(col("dst").as("node"))
      .agg(md5(count(lit(1)).cast("string")).as("color")))
    val nNodes = colors.count()
    withRoundConf(sess, nEdges) {
      (1 to rounds).foreach { _ =>
        val nbr = sym
          .join(hinted(colors.select(col("node").as("cnode"), col("color").as("ncolor")),
            nNodes), col("src") === col("cnode"))
          .groupBy(col("dst").as("gnode"))
          .agg(concat_ws(",", sort_array(collect_list(col("ncolor")))).as("sig"))
        colors = chain.ckpt(nbr
          .join(hinted(colors, nNodes), col("gnode") === col("node"))
          .select(col("node"), md5(concat(col("color"), lit("|"), col("sig"))).as("color")))
      }
    }
    adjChain.free()
    chain.keep()
    colors
  }

  /** Deterministic "random" walks — the node2vec/DeepWalk corpus-generation
    * step (Perozzi et al. KDD'14, Grover & Leskovec KDD'16) made
    * hash-gateable: one walk starts at EVERY node and at step t moves from
    * node c to its sorted-neighbor array at index
    * md5(start:t:c) mod deg(c) — a pure function of (edges, steps), no RNG
    * state, so the full walk corpus is reproducible on any engine and
    * verifiable against a step-unrolled SQL oracle computing the same md5
    * arithmetic. (Uniform-at-random neighbor choice is exactly what the
    * embedding-training corpus needs; a content-derived hash IS a uniform
    * choice, just a replayable one.)
    *
    * Scale shape: the adjacency table (node → sorted neighbors) attaches to
    * the walk frontier by a measured-broadcast join per step ([[hinted]] —
    * the walk frame never shuffles while the adjacency fits); all `steps`
    * joins CHAIN in one linear plan (each step references its predecessor
    * once — contrast the coreness frontier lesson) carrying the path as an
    * array column, exploded once at the end. Output: (start_node, step,
    * node), step 0 = the start itself; every node has degree ≥ 1 by
    * construction (the node set comes from the edge list) so walks never
    * dead-end on an undirected graph.
    */
  def deterministicWalks(edges: DataFrame, steps: Int = 8): DataFrame = {
    require(steps >= 1 && steps <= 16, s"steps must be in [1,16]: $steps")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val sym = edges
      .select(col(uName).as("src"), col(vName).as("dst"))
      .unionAll(edges.select(col(vName).as("src"), col(uName).as("dst")))
    val adj = sym.groupBy(col("src").as("anode"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"),
        count(lit(1)).as("deg"))
      .localCheckpoint()
    // bound the broadcast by the PAYLOAD size, not the row count: each adj
    // row carries its full neighbor array, so broadcast bytes scale with
    // Σdeg = 2|E| (a 4M-node graph with 500M edges would pass a row-count
    // bound yet ship a multi-GB broadcast). Σdeg is exact off the
    // checkpointed frame; past the bound the walk frame shuffles instead —
    // the correct 100 TB plan
    val nCells = adj.agg(coalesce(sum(col("deg")), lit(0L))).head().getLong(0)
    var walks = adj.select(col("anode").as("start"),
      col("anode").as("cur"), array(col("anode")).as("path"))
    (1 to steps).foreach { t =>
      val idx = pmod(
        conv(substring(md5(concat_ws(":",
          col("start").cast("string"), lit(t.toString), col("cur").cast("string"))),
          1, 15), 16, 10).cast("long"),
        col("deg")).cast("int")
      walks = walks.join(hinted(adj, nCells), col("cur") === col("anode"))
        .select(col("start"),
          element_at(col("nbrs"), idx + 1).as("cur"),
          array_append(col("path"), element_at(col("nbrs"), idx + 1)).as("path"))
    }
    walks.select(col("start").as("start_node"),
        posexplode(col("path")).as(Seq("step", "node")))
  }

  /** Deterministic maximal independent set by iterated LOCAL MINIMA over a
    * fixed content-derived priority (the derandomized shape of Luby's MIS,
    * Luby SICOMP'86): every node gets priority md5(node) — a hex STRING, so
    * both engines compare it with plain lexicographic order and no
    * integer-width coordination — and each round every still-active node
    * whose priority is a strict minimum among its active neighbors joins
    * the MIS; the joined nodes and their neighborhoods deactivate. The
    * result is exactly the sequential greedy MIS in global priority order
    * (a node is picked iff no earlier-priority neighbor was picked — the
    * round schedule only parallelizes independent decisions), so the
    * output is a unique pure function of the edge set: hash-gateable
    * against a round-unrolled SQL oracle, no randomness anywhere. md5
    * ties would need adjacent equal digests (~2⁻¹²⁸) — ignored.
    *
    * Rounds are O(log n) w.h.p. for hash-uniform priorities; the loop
    * REFUSES past `maxRounds` (an unrolled oracle at a lower bound would
    * disagree). Scale shape per round: one broadcast-or-shuffle attach of
    * the node-sized active frame onto the adjacency list (the edge table
    * never shuffles while the active frame fits [[BcastRows]]), one
    * per-node min, one anti-join; the active set shrinks geometrically,
    * every round materializes through [[RoundChain]], shuffles sized by
    * [[withRoundConf]]. Output: (node, round) for MIS members, round =
    * the 1-based round the node entered.
    */
  def maximalIndependentSet(edges: DataFrame, maxRounds: Int = 40): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 128, s"maxRounds must be in [1,128]: $maxRounds")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val sess = edges.sparkSession
    val adjChain = new RoundChain(sess.sparkContext)
    // dst-partitioned + preserved: the per-round neighbor-minimum groupBy
    // (dst) reuses this shuffle under the broadcast active/winner frames
    val sym = ckptKeepPartitioning(adjChain, edges
      .select(col(uName).as("src"), col(vName).as("dst"))
      .unionAll(edges.select(col(vName).as("src"), col(uName).as("dst")))
      .repartition(col("dst")))
    val nEdges = sym.count()
    val activeChain = new RoundChain(sess.sparkContext)
    val misChain = new RoundChain(sess.sparkContext)
    var active = activeChain.ckpt(sym.select(col("src").as("node")).distinct()
      .withColumn("pri", md5(col("node").cast("string"))))
    var nActive = active.count()
    var misAcc = misChain.ckpt(
      sess.emptyDataFrame.select(lit(0L).as("node"), lit(0).as("round")).limit(0))
    withRoundConf(sess, nEdges) {
      var round = 0
      while (nActive > 0 && round < maxRounds) {
        round += 1
        val act = hinted(active, nActive)
        // min active-neighbor priority per active node: edges with BOTH
        // endpoints active contribute the src side's priority to the dst
        val nbrMin = sym
          .join(act.select(col("node").as("adst")), col("dst") === col("adst"), "left_semi")
          .join(act.select(col("node").as("asrc"), col("pri").as("spri")),
            col("src") === col("asrc"))
          .groupBy(col("dst").as("mnode")).agg(min(col("spri")).as("minp"))
        val nextMis = misChain.ckpt(misAcc.unionAll(active
          .join(nbrMin, col("node") === col("mnode"), "left")
          .filter(col("minp").isNull || col("pri") < col("minp"))
          .select(col("node").cast("long").as("node"), lit(round).as("round"))))
        // re-read this round's winners from the checkpoint — they feed two
        // consumers (removal + accumulator) and would otherwise recompute
        // the edge-sized nbrMin aggregate twice
        val misRound = nextMis.filter(col("round") === round).select(col("node"))
        val removed = misRound
          .unionAll(sym
            .join(hinted(misRound.select(col("node").as("wnode")), nActive),
              col("src") === col("wnode"))
            .select(col("dst").cast("long").as("node")))
          .distinct()
        val (nextActive, m) = ckptObserved(activeChain,
          active.join(removed.select(col("node").as("rnode")),
            col("node") === col("rnode"), "left_anti"),
          Seq(count(lit(1)).as("n")))
        misAcc = nextMis
        active = nextActive
        nActive = m("n").asInstanceOf[Long]
      }
      if (nActive > 0)
        throw new IllegalStateException(
          s"maximalIndependentSet did not converge in $maxRounds rounds — " +
            "a round-unrolled oracle at this bound would disagree; raise maxRounds")
    }
    adjChain.free()
    activeChain.free()
    misChain.keep()
    misAcc
  }

  /** Bounded-hop HARMONIC centrality for a seed panel, in exact LCM-scaled
    * integers: H_K(s) = Σ_{v : 1 ≤ d(s,v) ≤ K} lcm(1..K)/d(s,v) — the
    * classic closeness variant that handles disconnected graphs (unreached
    * nodes contribute 0, no ∞ arm), truncated at K hops so the operator is
    * a pure function of (edges, seeds, K) and gates against a K-times
    * unrolled oracle (the [[kHopCounts]] contract). Scaling by lcm(1..K)
    * (K=3 → 6: contributions 6, 3, 2) keeps every term an exact integer —
    * no 1/3 rounding for the engines to disagree on (the q218/q302 exact-
    * moments device). BFS with min-dist tracking: each round unions the
    * frontier expansion at dist+1 and takes MIN(dist) per (seed, node) —
    * in an unweighted graph a node's first-discovery round IS its
    * distance, and the min-aggregate makes re-expansion idempotent, so the
    * round body matches the oracle's unrolled CTE exactly. Scale shape:
    * K shuffles (the min-dist groupBy), the reached frame broadcast into
    * the adjacency join while its measured count fits ([[hinted]]) so the
    * edge table never shuffles; checkpoint per round ([[RoundChain]]).
    * Output: (seed, harmonic_lcm, n_within) — the scaled centrality and
    * the plain reach count it refines.
    */
  def harmonicCentralityInt(edges: DataFrame, seeds: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 6, s"k must be in [1,6]: $k")
    val lcmK: Long = (1 to k).foldLeft(1L)((a, b) => a / gcd(a, b) * b)
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val sess = edges.sparkSession
    val adjChain = new RoundChain(sess.sparkContext)
    // SSSP's round-7 shape: weight-0 self-loops make carry+expand ONE
    // relaxation over the augmented adjacency (no Union to discard
    // partitioning), checkpointed dst-partitioned + preserved so the
    // (seed, node) min groupBy reuses the one up-front shuffle
    // (HashPartitioning(dst) satisfies the (seed, dst) clustering)
    val sym0 = adjChain.ckpt(edges
      .select(col(uName).as("src"), col(vName).as("dst"))
      .unionAll(edges.select(col(vName).as("src"), col(uName).as("dst"))))
    val nEdges = sym0.count()
    val sym = ckptKeepPartitioning(adjChain, sym0
      .select(col("src"), col("dst"), lit(1L).as("w"))
      .unionAll(sym0.select(col("dst")).distinct()
        .select(col("dst").as("src"), col("dst"), lit(0L).as("w")))
      .repartition(col("dst")))
    val chain = new RoundChain(sess.sparkContext)
    val seedCol = seeds.columns.head
    var reached = chain.ckpt(seeds.select(
      col(seedCol).as("seed"), col(seedCol).as("node"), lit(0L).as("dist")))
    var nReached = reached.count()
    withRoundConf(sess, nEdges) {
      for (_ <- 1 to k) {
        val r = hinted(reached, nReached)
        val (nr, m) = ckptObserved(chain, r
          .join(sym, r("node") === sym("src"))
          .select(col("seed"), col("dst"), (col("dist") + col("w")).as("reached_dist"))
          .groupBy(col("seed"), col("dst").as("node"))
          .agg(min(col("reached_dist")).as("dist")),
          Seq(count(lit(1)).as("n")))
        reached = nr
        nReached = m("n").asInstanceOf[Long]
      }
    }
    adjChain.free()
    chain.keep()
    reached.filter(col("dist") >= 1L)
      .groupBy(col("seed"))
      .agg(sum(expr(s"$lcmK div dist")).cast("long").as("harmonic_lcm"),
        count(lit(1)).as("n_within"))
  }

  private def gcd(a: Long, b: Long): Long = if (b == 0L) a else gcd(b, a % b)

  /** Graph diameter LOWER BOUND by the classic double-sweep (Magnien,
    * Latapy & Habib 2009): BFS from a start node, then BFS again from the
    * farthest node found — the second eccentricity is a lower bound that
    * is exact on trees and empirically tight on real graphs, at the cost
    * of TWO BFS runs instead of the all-pairs O(n·m) exact diameter. Both
    * "pick a node" steps use the md5-string-priority device (§8.7#12):
    * the start is the node with the MINIMUM md5('dia:'||id) (uniform
    * enough, and a pure function of the data), and the farthest-node
    * tie-break is the same md5 minimum among the argmax-distance set — so
    * the whole trajectory (start, both eccentricities, the peripheral
    * pair) hash-gates against an unrolled-BFS oracle. BFS = [[
    * shortestPathsInt]] with unit weights (min-plus relaxation, measured-
    * broadcast frontier, refusal past maxRounds). The four driver-side
    * reads are single-row aggregates (start id, eccentricity ×2, argmax) —
    * the same bounded control-flow collects the convergence witnesses use.
    * Disconnected graphs: the sweep covers the start node's component
    * (n_reached reports its size); diameter of the whole graph is then
    * per-component by construction. Output (one row): (start_node,
    * ecc_start, peripheral_node, diameter_lb, far_node, n_reached).
    */
  def diameterSweep(edges: DataFrame, maxRounds: Int = 12): DataFrame = {
    require(maxRounds >= 1 && maxRounds <= 32, s"maxRounds must be in [1,32]: $maxRounds")
    val Seq(uName, vName) = edges.columns.take(2).toSeq
    val sess = edges.sparkSession
    import sess.implicits._
    // ONE symmetric adjacency shared by both sweeps (calling
    // shortestPathsInt twice would rebuild + re-checkpoint it per sweep —
    // measured ~1.5 s of the operator's 8 s at sf0.1)
    val adjChain = new RoundChain(sess.sparkContext)
    // weight-0 self-loops + dst-partitioned preserved checkpoint (the SSSP
    // round-7 shape): each BFS round is one broadcast-probe BHJ + an
    // in-place min — zero exchanges
    val sym0 = adjChain.ckpt(edges
      .select(col(uName).as("src"), col(vName).as("dst"))
      .unionAll(edges.select(col(vName).as("src"), col(uName).as("dst"))))
    val nEdges = sym0.count()
    val sym = ckptKeepPartitioning(adjChain, sym0
      .select(col("src"), col("dst"), lit(1L).as("w"))
      .unionAll(sym0.select(col("dst")).distinct()
        .select(col("dst").as("src"), col("dst"), lit(0L).as("w")))
      .repartition(col("dst")))
    def prio(c: org.apache.spark.sql.Column) =
      md5(concat(lit("dia:"), c.cast("string")))
    val start = sym.select(col("src").as("node")).distinct()
      .agg(min_by(col("node"), prio(col("node")))).as[Long].head()
    // unweighted BFS: a node's distance is final at first discovery, so
    // convergence is just "no new nodes this round" — a count witness, no
    // Σdist needed (min-plus generality is shortestPathsInt's job)
    def sweep(seed: Long): (Long, Long, Long) = {
      val chain = new RoundChain(sess.sparkContext)
      var dist = chain.ckpt(Seq((seed, 0L)).toDF("node", "dist"))
      var nReached = 1L
      withRoundConf(sess, nEdges) {
        var converged = false
        var round = 0
        while (!converged && round < maxRounds) {
          val d = hinted(dist, nReached)
          val (next, m) = ckptObserved(chain,
            d.join(sym, d("node") === sym("src"))
              .select(col("dst"), (col("dist") + col("w")).as("reached_dist"))
              .groupBy(col("dst").as("node")).agg(min(col("reached_dist")).as("dist")),
            Seq(count(lit(1)).as("n")))
          val n = m("n").asInstanceOf[Long]
          converged = n == nReached
          dist = next
          nReached = n
          round += 1
        }
        if (!converged)
          throw new IllegalStateException(
            s"diameterSweep BFS did not converge in $maxRounds rounds — " +
              "an unrolled-rounds oracle at this bound would disagree; raise maxRounds")
      }
      val ecc = dist.agg(max(col("dist"))).as[Long].head()
      val far = dist.filter(col("dist") === ecc)
        .agg(min_by(col("node"), prio(col("node")))).as[Long].head()
      chain.free()
      (ecc, far, nReached)
    }
    val (ecc1, s2, _) = sweep(start)
    val (ecc2, t, nReached) = sweep(s2)
    adjChain.free()
    Seq((start, ecc1, s2, ecc2, t, nReached)).toDF(
      "start_node", "ecc_start", "peripheral_node", "diameter_lb",
      "far_node", "n_reached")
  }
}
