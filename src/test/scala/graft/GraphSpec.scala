package graft

import org.apache.spark.sql.functions._

import graft.ops.Graph

class GraphSpec extends SparkTestBase {

  test("triangleCounts: K4, path, and disjoint triangles") {
    import spark.implicits._
    // K4 on 1-4: C(4,3) = 4 triangles, every node in C(3,2) = 3 of them
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val gotK4 = Graph.triangleCounts(k4.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotK4 == Set((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)), s"K4: $gotK4")

    // path 10-11-12-13: no triangles -> empty output
    val path = Seq((10L, 11L), (11L, 12L), (12L, 13L))
    assert(Graph.triangleCounts(path.toDF("u", "v")).count() == 0)

    // two disjoint triangles sharing no nodes: each node in exactly 1
    val two = Seq((1L, 2L), (2L, 3L), (3L, 1L), (7L, 8L), (8L, 9L), (9L, 7L))
    val gotTwo = Graph.triangleCounts(two.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotTwo == (1L to 3L).map((_, 1L)).toSet ++ Set(7L, 8L, 9L).map((_, 1L)))
  }

  test("triangleCounts normalizes direction, duplicates, and self-loops") {
    import spark.implicits._
    // one triangle fed as: reversed edge, duplicate edge, duplicate-reversed
    // edge, a self-loop, and a null endpoint — counts must not inflate
    val messy = Seq(
      (Some(1L), Some(2L)), (Some(2L), Some(1L)), (Some(2L), Some(3L)),
      (Some(2L), Some(3L)), (Some(3L), Some(1L)), (Some(2L), Some(2L)),
      (Some(1L), None)
    ).toDF("u", "v")
    val got = Graph.triangleCounts(messy)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L)), s"messy: $got")
  }

  test("pageRankIntFixed matches a hand-rolled integer reference on a small graph") {
    import spark.implicits._
    // star + tail: 1-2, 1-3, 1-4, 4-5 (undirected). Degrees: 1->3, 4->2,
    // 2,3,5 -> 1. Reference below mirrors the exact integer recurrence.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L))
    val adj = Map(
      1L -> Seq(2L, 3L, 4L), 2L -> Seq(1L), 3L -> Seq(1L),
      4L -> Seq(1L, 5L), 5L -> Seq(4L))
    val scale = 1000000000000L
    val n = adj.size
    val teleport = (3L * scale) / (20L * n)
    var r: Map[Long, Long] = adj.map { case (k, _) => k -> scale / n }
    for (_ <- 1 to 5) {
      val contrib = adj.map { case (k, out) => k -> r(k) / out.size }
      r = adj.map { case (k, _) =>
        val inMass = adj.collect { case (j, out) if out.contains(k) => contrib(j) }.sum
        k -> (teleport + (17L * inMass) / 20L)
      }
    }
    val got = Graph.pageRankIntFixed(edges.toDF("u", "v"), iters = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(got == r, s"got $got want $r")
    // hub outranks leaves; symmetric leaves tie exactly (integer math)
    assert(got(1L) > got(4L) && got(4L) > got(5L))
    assert(got(2L) == got(3L))
  }

  test("pageRankIntFixed is invariant under partitioning and edge direction") {
    import spark.implicits._
    val edges = (1L to 40L).flatMap(i => Seq((i, i % 40 + 1), (i, (i * 7) % 40 + 1)))
      .filter { case (a, b) => a != b }
    val base = Graph.pageRankIntFixed(edges.toDF("u", "v"), iters = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val flipped = Graph.pageRankIntFixed(
      edges.map { case (a, b) => (b, a) }.toDF("u", "v").repartition(13), iters = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(base == flipped, "integer ranks must be partitioning/direction invariant")
  }

  test("connectedComponents restores session confs on success AND failure") {
    import spark.implicits._
    import graft.ops.Dedup
    val shuffleKey = "spark.sql.shuffle.partitions"
    val aqeKey = "spark.sql.adaptive.enabled"
    val (s0, a0) = (spark.conf.get(shuffleKey), spark.conf.get(aqeKey))
    // success path: small graph → CC narrows both confs internally
    val nodes = (1L to 6L).toDF("id")
    val edges = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    Dedup.connectedComponents(nodes, edges).count()
    assert(spark.conf.get(shuffleKey) == s0 && spark.conf.get(aqeKey) == a0,
      "confs must be restored after a successful run")
    // failure path: a 12-node path has diameter 11 > maxIters=2 → the
    // non-convergence throw must still restore the confs
    val chain = (1L to 11L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      Dedup.connectedComponents((1L to 12L).toDF("id"), chain, maxIters = 2)
    }
    assert(spark.conf.get(shuffleKey) == s0 && spark.conf.get(aqeKey) == a0,
      "confs must be restored when CC throws")
  }

  test("degreeAssortativity: star is -1, 4-path is -0.5, cycle is NaN") {
    import spark.implicits._
    def row(edges: Seq[(Long, Long)]) =
      Graph.degreeAssortativity(edges.toDF("u", "v")).collect()(0)
    // star K1,3: every edge joins degree 3 to degree 1 → perfectly
    // disassortative; exact integer arithmetic must land on -1.0, not ≈
    assert(row(Seq((0L, 1L), (0L, 2L), (0L, 3L))).getDouble(1) == -1.0)
    // path 1-2-3-4: n2=6, Σx=10, Σx²=18, Σxy=16 → (96-100)/(108-100) = -0.5
    assert(row(Seq((1L, 2L), (2L, 3L), (3L, 4L))).getDouble(1) == -0.5)
    // cycle: degree-regular → denominator 0 → NULL (Spark's Divide returns
    // NULL on zero divisor for doubles too; Pearson is undefined here)
    assert(row(Seq((1L, 2L), (2L, 3L), (1L, 3L))).isNullAt(1))
  }

  test("kCore: pendant chain peels over multiple rounds; non-convergence throws") {
    import spark.implicits._
    // triangle {1,2,3} with a tail 3-4-5: the 2-core is exactly the
    // triangle, reached in 3 rounds (5 drops, then 4, then stable) — the
    // multi-round case that catches a peel that stops after one pass
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val got = Graph.kCore(edges, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    intercept[IllegalStateException] { Graph.kCore(edges, k = 2, maxIters = 2).count() }
    // k above the max degree: empty core, no throw (0 == 0 converges)
    assert(Graph.kCore(edges, k = 5).count() == 0)
  }

  test("kHopCounts: path, star, and disconnected seeds") {
    import spark.implicits._
    // path 1-2-3-4-5, seed 1: k=1 -> {1,2}, k=2 -> {1,2,3}, k=4 -> all 5
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val seed1 = Seq(1L).toDF("seed")
    def reach(edges: org.apache.spark.sql.DataFrame, seeds: org.apache.spark.sql.DataFrame, k: Int) =
      Graph.kHopCounts(edges, seeds, k).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(reach(path, seed1, 1) == Map(1L -> 2L))
    assert(reach(path, seed1, 2) == Map(1L -> 3L))
    assert(reach(path, seed1, 4) == Map(1L -> 5L))

    // star 0-(1..6): from the hub, 1 hop covers everything; from a leaf,
    // 1 hop reaches only the hub, 2 hops the whole star
    val star = (1L to 6L).map((0L, _)).toDF("u", "v")
    assert(reach(star, Seq(0L).toDF("seed"), 1) == Map(0L -> 7L))
    assert(reach(star, Seq(3L).toDF("seed"), 1) == Map(3L -> 2L))
    assert(reach(star, Seq(3L).toDF("seed"), 2) == Map(3L -> 7L))

    // a seed disconnected from the rest reaches only itself at any k
    val twoComp = Seq((1L, 2L), (8L, 9L)).toDF("u", "v")
    assert(reach(twoComp, Seq(1L, 8L).toDF("seed"), 3) == Map(1L -> 2L, 8L -> 2L))
  }

  test("linkPredictionRA: path, square, hub cap, and adjacency exclusion") {
    import spark.implicits._
    // path 1-2-3: only candidate pair is (1,3) via hub 2 (deg 2) ->
    // ra = 1e12 div 2 = 5e11, cn = 1
    val path = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val gotPath = Graph.linkPredictionRA(path, minCommonNeighbors = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(gotPath.toSeq == Seq((1L, 3L, 1L, 500000000000L)), s"path: ${gotPath.toSeq}")

    // square 1-2-3-4-1: diagonals (1,3) and (2,4), each with TWO deg-2
    // common neighbors -> cn = 2, ra = 2 * 5e11; the four square edges
    // themselves are adjacent pairs and must NOT appear
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val gotSq = Graph.linkPredictionRA(sq, minCommonNeighbors = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(gotSq == Set((1L, 3L, 2L, 1000000000000L), (2L, 4L, 2L, 1000000000000L)),
      s"square: $gotSq")

    // hub cap: star 0-(1..5) has every leaf pair as a candidate through
    // hub 0 (deg 5); capping maxHubDegree below 5 removes the hub as
    // evidence -> no candidates survive
    val star = (1L to 5L).map((0L, _)).toDF("u", "v")
    assert(Graph.linkPredictionRA(star, minCommonNeighbors = 1).count() == 10L)
    assert(Graph.linkPredictionRA(star, minCommonNeighbors = 1, maxHubDegree = 4).count() == 0L)

    // minCommonNeighbors filter: square diagonals have cn = 2, so a
    // threshold of 3 empties the output
    assert(Graph.linkPredictionRA(sq, minCommonNeighbors = 3).count() == 0L)
  }

  test("triangleCounts: hub node (degree skew) still counts exactly once each") {
    import spark.implicits._
    // hub 0 connected to 1..20, plus ring edges (i, i+1) for 1..19:
    // triangles are exactly (0, i, i+1) for i in 1..19 -> 19 triangles;
    // hub in all 19, node 1 and 20 in 1, middle nodes in 2
    val hub = (1L to 20L).map((0L, _)) ++ (1L until 20L).map(i => (i, i + 1))
    val got = Graph.triangleCounts(hub.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(0L) == 19L)
    assert(got(1L) == 1L && got(20L) == 1L)
    assert((2L until 20L).forall(got(_) == 2L), s"ring interior: $got")
  }

  test("coreness: cliques, pendants, and the bowtie all get their exact core numbers") {
    import spark.implicits._
    // K4 {1..4} + pendant 5 off node 1: clique coreness 3, pendant 1
    val k4p = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (1L, 5L))
    val got = Graph.coreness(k4p.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L), s"$got")
    // bowtie: two triangles sharing node 10 -> everyone coreness 2
    val bow = Seq((10L, 11L), (10L, 12L), (11L, 12L), (10L, 13L), (10L, 14L), (13L, 14L))
    val gotB = Graph.coreness(bow.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotB.values.toSet == Set(2L), s"$gotB")
    // long path: every node coreness 1 (slow-convergence shape for h-index)
    val path = (1L until 12L).map(i => (i, i + 1))
    val gotP = Graph.coreness(path.toDF("u", "v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotP.values.toSet == Set(1L), s"$gotP")
    // refusal contract: a bound below the needed rounds throws, never
    // returns a mid-iteration estimate
    intercept[IllegalStateException] {
      Graph.coreness(path.toDF("u", "v"), maxRounds = 1, stepsPerCheckpoint = 1).count()
    }
  }

  test("labelPropagation: two triangles bridged by one edge split into two communities") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} bridged by 3-4; hand-unrolled rounds:
    //   r1: 1->2 2->1 3->1 4->3 5->4 6->4
    //   r2: 1->1 2->1 3->1 4->4 5->3 6->3
    //   r3: 1->1 2->1 3->1 4->3 5->3 6->3   (stable from here)
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("u", "v")
    val got = Graph.labelPropagation(e, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L),
      s"communities: $got")
    // determinism probe: a second run is identical (no async order-dependence)
    val again = Graph.labelPropagation(e, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again == got)
  }

  test("weighted labelPropagation: a heavy edge outvotes a plural neighborhood") {
    import spark.implicits._
    // node 3 has two unit-weight neighbors in triangle {1,2,3} and one
    // weight-5 edge to 4: unweighted r1 sends 3 -> min(1,2,4) = 1; weighted
    // r1 sends 3 -> 4 (5 > 1+1 separate labels; votes are per-label sums)
    val we = Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L), (3L, 4L, 5L))
      .toDF("u", "v", "w")
    val r1w = Graph.labelPropagation(we, rounds = 1, weighted = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r1w(3L) == 4L, s"weighted round 1: $r1w")
    val r1u = Graph.labelPropagation(we.select(col("u"), col("v")), rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r1u(3L) == 1L, s"unweighted round 1: $r1u")
  }

  test("maximalIndependentSet: independent, maximal, and deterministic") {
    import spark.implicits._
    // bowtie (two triangles sharing node 3) + a pendant chain 7-8-9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 3L),
      (7L, 8L), (8L, 9L)).toDF("u", "v")
    val mis = Graph.maximalIndependentSet(edges)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val nodes = mis.map(_._1).toSet
    val sym = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 3L),
      (7L, 8L), (8L, 9L)).flatMap { case (a, b) => Seq((a, b), (b, a)) }
    // independence: no edge inside the set
    assert(!sym.exists(e => nodes.contains(e._1) && nodes.contains(e._2)), s"$nodes")
    // maximality: every non-member has a member neighbor
    val all = sym.map(_._1).toSet
    (all -- nodes).foreach { v =>
      assert(sym.exists(e => e._1 == v && nodes.contains(e._2)), s"node $v uncovered by $nodes")
    }
    // deterministic: a second run returns the identical (node, round) set
    val again = Graph.maximalIndependentSet(edges)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(mis.toSet == again.toSet)
  }

  test("katzCentrality: exact dyadic walk sums on a path") {
    import spark.implicits._
    // path 1-2-3: walks from 2: w1=2, w2=2 (2->1->2, 2->3->2), w3=4, w4=4... wait
    // compute: w1 = deg. w_k(v) = sum of neighbors' w_{k-1}.
    // nodes: 1,3 (deg 1), 2 (deg 2).
    // w1: 1->1, 2->2, 3->1
    // w2: w2(1)=w1(2)=2; w2(2)=w1(1)+w1(3)=2; w2(3)=2
    // w3: w3(1)=w2(2)=2; w3(2)=w2(1)+w2(3)=4; w3(3)=2
    // w4: w4(1)=w3(2)=4; w4(2)=w3(1)+w3(3)=4; w4(3)=4
    // katz*16(1) = 8*1+4*2+2*2+4 = 24; (2) = 8*2+4*2+2*4+4 = 36; (3) = 24
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val got = Graph.katzCentrality(edges, horizon = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(got == Seq((1L, 4L, 24L), (2L, 4L, 36L), (3L, 4L, 24L)), s"$got")
  }

  test("greedyMatching: a valid maximal matching, deterministic across runs") {
    import spark.implicits._
    // two triangles + a bridge: any maximal matching here has 2-3 edges
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 4L))
      .toDF("u", "v")
    val m = Graph.greedyMatching(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // matching: no node appears twice
    val nodes = m.toSeq.flatMap(e => Seq(e._1, e._2))
    assert(nodes.distinct.size == nodes.size, s"node reused: $m")
    // maximality: every unmatched edge touches a matched node
    val edgeSet = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 4L))
    val matchedNodes = nodes.toSet
    edgeSet.filterNot(m.contains).foreach { e =>
      assert(matchedNodes.contains(e._1) || matchedNodes.contains(e._2),
        s"edge $e unmatched but addable to $m")
    }
    val again = Graph.greedyMatching(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m == again)
  }

  test("wlColors: symmetric nodes share colors, structurally distinct nodes differ") {
    import spark.implicits._
    // path 1-2-3-4-5: ends {1,5} symmetric, {2,4} symmetric, center 3 alone
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val c = Graph.wlColors(path, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(c(1L) == c(5L) && c(2L) == c(4L), s"$c")
    assert(Set(c(1L), c(2L), c(3L)).size == 3, s"ends/mid/center must differ: $c")
    // triangle nodes are all equivalent; a triangle node differs from a path node
    val tri = Seq((10L, 11L), (11L, 12L), (12L, 10L)).toDF("u", "v")
    val ct = Graph.wlColors(tri, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(ct.values.toSet.size == 1, s"$ct")
    assert(!c.values.toSet.contains(ct(10L)), "triangle color must differ from path colors")
  }

  test("deterministicWalks: hops follow edges, start at step 0, replay identically") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val sym = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    val w = Graph.deterministicWalks(edges, steps = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // one walk per node, steps 0..6 each
    assert(w.length == 5 * 7, s"${w.length}")
    w.filter(_._2 == 0).foreach { case (s, _, n) => assert(s == n) }
    // every consecutive (step t -> t+1) pair is a real edge
    w.groupBy(_._1).values.foreach { walk =>
      walk.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, a), (_, _, b)) => assert(sym.contains((a, b)), s"$a->$b not an edge")
        case _ =>
      }
    }
    val again = Graph.deterministicWalks(edges, steps = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(w.sortBy(x => (x._1, x._2)).toSeq == again.sortBy(x => (x._1, x._2)).toSeq)
  }

  test("modularity: exact rational on the bridged-triangles partition") {
    import spark.implicits._
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("u", "v")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 3L), (5L, 3L), (6L, 3L))
      .toDF("node", "label")
    // m = 7, intra = 6, D_c = 7 each -> Q = (4*7*6 - 98) / (4*49) = 70/196
    val r = Graph.modularity(e, labels).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L && r.getLong(2) == 7L, s"$r")
    assert(r.getDouble(3) == 70.0 / 196.0, s"Q = ${r.getDouble(3)}")
    // one-community partition: Q = intra/m - 1 = 0 - ... = (4*7*7 - 196)/196 = 0
    val one = Seq(1L, 2L, 3L, 4L, 5L, 6L).map((_, 9L)).toDF("node", "label")
    assert(Graph.modularity(e, one).head().getDouble(3) == 0.0)
  }

  test("harmonicCentralityInt: exact LCM-scaled sums on a path, truncation, disconnection") {
    import spark.implicits._
    // path 1-2-3-4-5 plus an isolated edge 8-9; seeds 1, 3, 8
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L)).toDF("u", "v")
    val seeds = Seq(1L, 3L, 8L).toDF("seed")
    val rows = Graph.harmonicCentralityInt(e, seeds, k = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // seed 1: d(2)=1, d(3)=2, d(4)=3 -> 6 + 3 + 2 = 11 over 3 nodes (5 is 4 hops: truncated)
    assert(rows(1L) == (11L, 3L), s"seed 1: ${rows(1L)}")
    // seed 3 (center): d=1 to 2,4; d=2 to 1,5 -> 6+6+3+3 = 18 over 4 nodes
    assert(rows(3L) == (18L, 4L), s"seed 3: ${rows(3L)}")
    // seed 8: only 9 at d=1 -> 6; the other component contributes nothing
    assert(rows(8L) == (6L, 1L), s"seed 8: ${rows(8L)}")
  }

  test("densestSubgraphPeel: the trajectory isolates K4 from its pendant tail") {
    import spark.implicits._
    // K4 on 1-4 plus a pendant path 4-5-6. Round 0: n=6, m=8, avg deg 8/3
    // -> keep d > 2.67 = the K4 corners; round 1: K4 is 3-regular with
    // 3*4 = 2*6 (NOT strictly greater) -> everyone peels, graph empties.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("u", "v")
    val got = Graph.densestSubgraphPeel(e)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0, 6L, 8L, 8.0 / 6.0), (1, 4L, 6L, 1.5)), s"${got.toSeq}")
    // the max-density row is round 1 = exactly K4 (here the greedy is exact)
    assert(got.maxBy(_._4)._1 == 1)
  }

  test("shortestPathsInt: distances, and an isolated source keeps its dist-0 row") {
    import spark.implicits._
    // path 1-2-3 (weights 5, 7) plus node 99 absent from the edge list
    // entirely: its (99, 0) row must survive the rounds — the self-loop
    // arm unions the seeds exactly so an isolated source is not dropped
    // after round 1 (r8 advice fix)
    val e = Seq((1L, 2L, 5L), (2L, 3L, 7L)).toDF("u", "v", "w")
    val seeds = Seq(1L, 99L).toDF("node")
    val got = Graph.shortestPathsInt(e, seeds, maxRounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 0L, 2L -> 5L, 3L -> 12L, 99L -> 0L), s"$got")
  }

  test("rectangleCensus: square, K4, and a triangle with no rectangles") {
    import spark.implicits._
    // a plain square 1-2-3-4-1: exactly one 4-cycle
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val r1 = Graph.rectangleCensus(sq).head()
    assert(r1.getLong(2) == 1L, s"square: $r1")
    // K4: 3 distinct 4-cycles (one per perfect matching of diagonals)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    val r2 = Graph.rectangleCensus(k4).head()
    assert(r2.getLong(2) == 3L, s"K4: $r2")
    // a triangle has wedges but no rectangles
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val r3 = Graph.rectangleCensus(tri).head()
    assert(r3.getLong(0) == 3L && r3.getLong(2) == 0L, s"triangle: $r3")
  }

  test("richClub: exact phi on a hub clique with pendant leaves") {
    import spark.implicits._
    // triangle of hubs 1-2-3, each hub with 2 pendant leaves -> hub degree
    // 4, leaf degree 1. At k=1: N=3 hubs, E=3 hub-hub edges, phi = 6/6 = 1
    // (a perfect rich club); at k=0: N=9, E=9, phi = 18/72 = 0.25
    val hubs = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val leaves = for { h <- 1L to 3L; i <- 0L to 1L } yield (h, 10L * h + i)
    val e = (hubs ++ leaves).toDF("u", "v")
    val got = Graph.richClub(e, thresholds = Seq(0, 1, 4))
      .collect().map(r => (r.getInt(0),
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
    assert(got(0) == (9L, 9L, 0.25), s"k=0: ${got(0)}")
    assert(got(1) == (3L, 3L, 1.0), s"k=1: ${got(1)}")
    // k=4: no node has degree > 4 -> the threshold row vanishes entirely
    assert(!got.contains(4), s"$got")
  }

  test("kTruss: K4 survives at k=4, pendants drop at k=3, shared-edge cascade empties") {
    import spark.implicits._
    // K4: every edge sits in exactly 2 triangles -> the whole graph is a
    // 4-truss, all 6 edges survive with support 2
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    val got4 = Graph.kTruss(k4, k = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got4.size == 6 && got4.values.forall(_ == 2L), s"$got4")
    // triangle 1-2-3 with pendant 3-9: k=3 keeps the triangle (support 1
    // each), drops the pendant (support 0)
    val tp = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 9L)).toDF("u", "v")
    val got3 = Graph.kTruss(tp, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got3 == Set((1L, 2L), (2L, 3L), (1L, 3L)), s"$got3")
    // two triangles sharing edge 2-3: at k=4 the four rim edges (support 1)
    // peel in round 1, then the shared edge (now support 0) peels in round
    // 2 — the cascade must run to the EMPTY fixpoint, not stop mid-peel
    val two = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    assert(Graph.kTruss(two, k = 4).count() == 0)
  }

  test("kTruss: repart support-agg form is output-identical to plain") {
    // round-9: past a heap-derived key bound the support aggregation
    // pre-partitions exploded triangle edges (the 26x-CPU fix, SURVEY
    // 8.10#8). The bound never fires at test scale, so pin the alternate
    // plan's correctness explicitly: same survivors, same supports, on a
    // graph that takes a multi-round cascade to converge.
    import spark.implicits._
    val e = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)) ++ // K4
      Seq((4L, 5L), (4L, 6L), (5L, 6L), (5L, 7L), (6L, 7L))                     // two tris
      ).toDF("u", "v")
    def run(form: String): Map[(Long, Long), Long] = {
      sys.props("graft.ktruss.supportAgg") = form
      try Graph.kTruss(e, k = 4)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      finally { sys.props.remove("graft.ktruss.supportAgg"); () }
    }
    val plain = run("plain")
    val repart = run("repart")
    assert(plain.nonEmpty && plain == repart,
      s"support-agg forms diverged: plain=$plain repart=$repart")
  }

  test("personalizedPageRankInt: exact integer trajectory on a path from one seed") {
    import spark.implicits._
    // path 1-2-3, seed {1}, 2 iterations, default scale/damping (17/20)
    val e = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val got = Graph.personalizedPageRankInt(e, Seq(1L).toDF("seed"), iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // teleport = 3e12/20 = 1.5e11 (seed only)
    // it1: r(1) = 1.5e11; r(2) = (17 * 1e12) div 20 = 8.5e11; r(3) = 0
    // it2: in(1) = 8.5e11 div 2 = 4.25e11 -> r(1) = 1.5e11 + (17*4.25e11) div 20
    //      in(2) = 1.5e11             -> r(2) = (17*1.5e11) div 20
    //      in(3) = 4.25e11            -> r(3) = (17*4.25e11) div 20
    assert(got == Map(
      1L -> 511250000000L, 2L -> 127500000000L, 3L -> 361250000000L), s"$got")
    // a seed absent from the graph is refused
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRankInt(e, Seq(99L).toDF("seed"), iters = 1)
    }
  }

  test("diameterSweep: exact on a path, tight on a star, deterministic") {
    import spark.implicits._
    // path 1-2-3-4-5: double sweep is EXACT on trees -> diameter 4
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val r = Graph.diameterSweep(path).head()
    assert(r.getLong(3) == 4L, s"path diameter_lb: $r")
    assert(r.getLong(5) == 5L, s"path n_reached: $r")
    // the second sweep starts at an endpoint (1 or 5) and ends at the other
    assert(Set(1L, 5L).contains(r.getLong(2)) && Set(1L, 5L).contains(r.getLong(4)))
    // star: center 10, leaves 11..15 -> diameter 2 (leaf to leaf)
    val star = (11L to 15L).map((10L, _)).toDF("u", "v")
    val rs = Graph.diameterSweep(star).head()
    assert(rs.getLong(3) == 2L && rs.getLong(5) == 6L, s"star: $rs")
    // replay: identical trajectory
    val again = Graph.diameterSweep(path).head()
    assert(r.toSeq == again.toSeq)
  }
}
