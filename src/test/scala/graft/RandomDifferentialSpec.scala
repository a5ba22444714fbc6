package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Graph, Relational}

/** Seeded randomized differentials: each operator with a nontrivial
  * candidate/rewrite scheme is checked for EXACT equality against its
  * brute-force reference on generated inputs that vary the regimes a fixed
  * corpus cannot — thresholds at fp-hostile values, tiny and large vocabs,
  * empty/duplicate/adjacent/degenerate shapes. Seeds are fixed: failures
  * reproduce.
  */
class RandomDifferentialSpec extends SparkTestBase {

  test("prefix-filter join ≡ all-pairs scan across vocab sizes and thresholds") {
    import spark.implicits._
    for ((vocab, thr, seed) <- Seq((8, 0.5, 1), (40, 0.7, 2), (500, 0.85, 3), (25, 0.9, 4))) {
      val rnd = new scala.util.Random(seed)
      val docs = (0 until 120).map { i =>
        val n = rnd.nextInt(30)
        val toks = Seq.fill(n)(s"w${rnd.nextInt(vocab)}")
        (i.toLong, toks.mkString(" "))
      } :+ ((120L, "")) :+ ((121L, "   ")) // empty docs → the 1.0 pair arm
      val df = docs.toDF("doc_id", "text")
      val exact = Dedup
        .jaccardPairs(df, "doc_id", "text", thr, maxId = Long.MaxValue)
        .collect().map(_.toSeq).toSet
      val pfx = Dedup
        .prefixFilterJaccardPairs(df, "doc_id", "text", thr)
        .collect().map(_.toSeq).toSet
      assert(pfx == exact,
        s"vocab=$vocab thr=$thr seed=$seed: missed=${(exact -- pfx).size} extra=${(pfx -- exact).size}")
    }
  }

  test("binned range joins ≡ direct non-equi joins across widths and shapes") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val iv = (0 until 150).map { i =>
      val lo = rnd.nextInt(1000).toLong
      // mix: empty (hi == lo), unit, typical, and very long intervals
      val len = rnd.nextInt(4) match {
        case 0 => 0L
        case 1 => 1L
        case 2 => rnd.nextInt(40).toLong
        case _ => 400L + rnd.nextInt(200).toLong
      }
      (i.toLong, lo, lo + len)
    }.toDF("iv_id", "lo", "hi")
    val pts = (0 until 400).map(i => (i.toLong, rnd.nextInt(1200).toLong - 100L))
      .toDF("pt_id", "p")
    for (width <- Seq(1L, 7L, 64L, 1000L)) {
      val binned = Relational
        .pointInRangeJoin(pts, col("p"), iv, col("lo"), col("hi"), width)
        .select(col("iv_id"), col("pt_id"))
      val direct = pts.join(iv, col("p") >= col("lo") && col("p") < col("hi"))
        .select(col("iv_id"), col("pt_id"))
      assert(binned.exceptAll(direct).unionAll(direct.exceptAll(binned)).count() == 0,
        s"point-in-range width=$width diverged")
    }
    val ivB = (0 until 150).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (i.toLong, lo, lo + rnd.nextInt(120).toLong)
    }.toDF("kb", "lb", "hb")
    for (width <- Seq(1L, 13L, 128L)) {
      val binned = Relational
        .intervalOverlapJoin(iv, col("lo"), col("hi"), ivB, col("lb"), col("hb"), width)
        .select(col("iv_id"), col("kb"))
      // the naive predicate alone would also match EMPTY intervals lying
      // strictly inside a non-empty one ([5,5) "overlaps" [0,9) under
      // lo₁<hi₂ ∧ lo₂<hi₁) — the operator treats [x,x) as the empty set,
      // so the reference must too (this differential caught exactly that)
      val direct = iv.filter(col("hi") > col("lo"))
        .join(ivB.filter(col("hb") > col("lb")),
          col("lo") < col("hb") && col("lb") < col("hi"))
        .select(col("iv_id"), col("kb"))
      assert(binned.exceptAll(direct).unionAll(direct.exceptAll(binned)).count() == 0,
        s"interval-overlap width=$width diverged (duplicates count as divergence)")
    }
  }

  test("triangleCounts ≡ brute-force enumeration on random graphs") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val edges = (for {
        u <- 0 until n; v <- (u + 1) until n if rnd.nextDouble() < 0.15
      } yield (u.toLong, v.toLong)).toSeq
      val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
      val brute = (for {
        a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
        if adj.getOrElse(a, Set()).contains(b) &&
          adj.getOrElse(b, Set()).contains(c) &&
          adj.getOrElse(a, Set()).contains(c)
      } yield Seq(a, b, c)).flatten
        .groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
      val got = Graph.triangleCounts(edges.toDF("u", "v"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == brute, s"seed=$seed: got=$got want=$brute")
    }
  }

  test("pageRankIntFixed ≡ integer reference on random graphs") {
    import spark.implicits._
    for (seed <- 1 to 2) {
      val rnd = new scala.util.Random(seed * 11)
      val n = 25
      val edges = (for {
        u <- 0 until n; v <- (u + 1) until n if rnd.nextDouble() < 0.2
      } yield (u.toLong, v.toLong)).toSeq
      val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).distinct.sorted }
      val scale = 1000000000000L
      val nn = adj.size
      val teleport = (3L * scale) / (20L * nn)
      var r: Map[Long, Long] = adj.map { case (k, _) => k -> scale / nn }
      for (_ <- 1 to 4) {
        val contrib = adj.map { case (k, out) => k -> r(k) / out.size }
        r = adj.map { case (k, _) =>
          val in = adj.collect { case (j, out) if out.contains(k) => contrib(j) }.sum
          k -> (teleport + (17L * in) / 20L)
        }
      }
      val got = Graph.pageRankIntFixed(edges.toDF("u", "v"), iters = 4)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
      assert(got == r, s"seed=$seed diverged")
    }
  }

  test("skyline2D ≡ NOT-EXISTS brute force across point layouts") {
    import spark.implicits._
    // regimes: dense grid (heavy x-ties), sparse wide range, collinear
    // (everything on one line), and near-degenerate (single x bucket)
    for ((n, xRange, yRange, seed) <- Seq(
        (200, 10, 10, 21), (300, 100000, 50, 22), (150, 1, 40, 23),
        (250, 40, 100000, 24))) {
      val rnd = new scala.util.Random(seed)
      val df = (1 to n).map(i =>
        (i.toLong, rnd.nextInt(xRange).toLong, rnd.nextInt(yRange).toLong))
        .toDF("id", "x", "y")
      val brute = df.as("a").join(df.as("b"),
          col("b.x") <= col("a.x") && col("b.y") >= col("a.y") &&
            (col("b.x") < col("a.x") || col("b.y") > col("a.y")), "left_anti")
        .select("a.id").as[Long].collect().toSet
      val got = Relational.skyline2D(df, "x", "y")
        .select("id").as[Long].collect().toSet
      assert(got == brute, s"seed=$seed: extra=${got -- brute} missing=${brute -- got}")
    }
  }

  test("multiset jaccard ≡ per-token-count brute force across vocab sizes and thresholds") {
    import spark.implicits._
    for ((vocab, thr, seed) <- Seq((3, 0.3, 11), (12, 0.5, 12), (60, 0.7, 13))) {
      val rnd = new scala.util.Random(seed)
      // small vocabs force heavy multiplicities — the regime where multiset
      // and set Jaccard diverge hardest
      val docs = (0 until 80).map { i =>
        val n = 1 + rnd.nextInt(25)
        (i.toLong, Seq.fill(n)(s"w${rnd.nextInt(vocab)}").mkString(" "))
      } :+ ((80L, "")) :+ ((81L, "  "))
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.multisetJaccardPairs(df, "doc_id", "text", thr, maxId = Long.MaxValue)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      // brute force from token multiplicity maps
      val counts = docs.map { case (id, s) =>
        id -> s.trim.split("\\s+").filter(_.nonEmpty).groupBy(identity).view.mapValues(_.length).toMap
      }.toMap
      val want = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        ca = counts(a); cb = counts(b)
        inter = (ca.keySet ++ cb.keySet).toSeq
          .map(t => math.min(ca.getOrElse(t, 0), cb.getOrElse(t, 0))).sum
        union = ca.values.sum + cb.values.sum - inter
        wj = if (union == 0) 1.0 else inter.toDouble / union.toDouble
        if wj >= thr
      } yield ((a, b), wj)).toMap
      assert(got == want,
        s"vocab=$vocab thr=$thr: missed=${(want.keySet -- got.keySet).size} " +
          s"extra=${(got.keySet -- want.keySet).size}")
    }
  }

  test("panel-dots expression ≡ one graft_long_dot per panel vector") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val dims = 16
    val panel = IndexedSeq.fill(5)(IndexedSeq.fill(dims)(rnd.nextLong() % 1000))
    val rows = (0 until 200).map(i => (i.toLong, Seq.fill(dims)(rnd.nextLong() % 1000)))
    val df = rows.toDF("id", "iv")
    val got = df.select(col("id"),
        call_function("graft_panel_dots", col("iv"), typedlit(panel)).as("dots"))
      .as[(Long, Seq[Long])].collect().toMap
    val single = panel.indices.map { j =>
      j -> df.select(col("id"),
          call_function("graft_long_dot", col("iv"), typedlit(panel(j))).as("d"))
        .as[(Long, Long)].collect().toMap
    }.toMap
    rows.foreach { case (id, _) =>
      panel.indices.foreach { j =>
        assert(got(id)(j) == single(j)(id), s"row $id panel $j diverges")
      }
    }
    // dim mismatch → NULL, mirroring graft_long_dot's contract
    val bad = Seq((0L, Seq(1L, 2L))).toDF("id", "iv")
      .select(call_function("graft_panel_dots", col("iv"), typedlit(panel)).as("dots"))
      .collect()
    assert(bad(0).isNullAt(0), "mismatched dims must yield NULL")
  }

  test("editDistance1Pairs ≡ quadratic levenshtein join across alphabets and lengths") {
    import spark.implicits._
    for ((alpha, minLen, maxLen, seed) <- Seq((2, 1, 4, 31), (4, 5, 9, 32), (10, 2, 6, 33))) {
      val rnd = new scala.util.Random(seed)
      val strs = (1 to 100).map { i =>
        val len = minLen + rnd.nextInt(maxLen - minLen + 1)
        (i.toLong, (1 to len).map(_ => ('a' + rnd.nextInt(alpha)).toChar).mkString)
      }
      val df = strs.toDF("id", "s")
      val brute = df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
        .filter(levenshtein(col("a.s"), col("b.s")) <= 1)
        .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
      val got = Dedup.editDistance1Pairs(df, "id", "s")
        .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
      assert(got == brute, s"seed=$seed: extra=${got -- brute} missing=${brute -- got}")
    }
  }

  test("gridDbscan ≡ in-memory reference DBSCAN across densities and parameters") {
    import spark.implicits._
    for ((n, span, eps, minPts, seed) <- Seq(
      (60, 8, 1L, 4L, 11),    // dense blob: mostly core
      (80, 40, 2L, 5L, 12),   // sparse: mixed roles
      (50, 100, 3L, 3L, 13),  // very sparse: mostly noise
      (70, 12, 1L, 20L, 14))) // minPts too high: all noise
    {
      val rnd = new scala.util.Random(seed)
      val pts = (0 until n).map(i =>
        (i.toLong, rnd.nextInt(span).toLong, rnd.nextInt(span).toLong))
      // in-memory reference: direct definition, no grid, no CC machinery
      val byId = pts.map(p => p._1 -> p).toMap
      def cheb(a: (Long, Long, Long), b: (Long, Long, Long)) =
        math.max(math.abs(a._2 - b._2), math.abs(a._3 - b._3))
      val nbrs = pts.map(p =>
        p._1 -> pts.filter(q => q._1 != p._1 && cheb(p, q) <= eps).map(_._1)).toMap
      val core = pts.filter(p => nbrs(p._1).size + 1 >= minPts).map(_._1).toSet
      // cluster = min core id reachable through core-core eps-adjacency
      val comp = scala.collection.mutable.Map[Long, Long](core.map(c => c -> c).toSeq: _*)
      var changed = true
      while (changed) {
        changed = false
        for (c <- core; d <- nbrs(c) if core(d)) {
          val m = math.min(comp(c), comp(d))
          if (comp(c) != m) { comp(c) = m; changed = true }
          if (comp(d) != m) { comp(d) = m; changed = true }
        }
      }
      val want = pts.map { p =>
        if (core(p._1)) (p._1, "core", comp(p._1))
        else {
          val coreNbrs = nbrs(p._1).filter(core)
          if (coreNbrs.nonEmpty) (p._1, "border", coreNbrs.map(comp).min)
          else (p._1, "noise", -1L)
        }
      }.toSet
      val got = graft.ops.Clustering.gridDbscan(pts.toDF("id", "x", "y"), eps, minPts)
        .collect().map(r => (r.getLong(0), r.getString(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
      assert(got == want,
        s"seed=$seed eps=$eps minPts=$minPts: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("kTruss ≡ in-memory peel reference across densities and k") {
    import spark.implicits._
    for ((n, m, k, seed) <- Seq((20, 60, 3, 31), (30, 120, 4, 32), (25, 200, 5, 33),
      (40, 80, 4, 34))) {
      val rnd = new scala.util.Random(seed)
      val edges0 = (0 until m).map { _ =>
        val u = rnd.nextInt(n).toLong; val v = rnd.nextInt(n).toLong
        (math.min(u, v), math.max(u, v))
      }.filter(e => e._1 != e._2).distinct
      // in-memory peel: recompute per-edge triangle support, drop < k-2,
      // repeat to fixpoint
      def supports(es: Set[(Long, Long)]): Map[(Long, Long), Int] = {
        val adj = es.toSeq.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
          .view.mapValues(_.map(_._2).toSet).toMap
        es.toSeq.map { case (u, v) =>
          (u, v) -> (adj(u) & adj(v)).size
        }.toMap
      }
      var cur = edges0.toSet
      var stable = false
      while (!stable) {
        val sup = supports(cur)
        val next = cur.filter(e => sup(e) >= k - 2)
        stable = next == cur
        cur = next
      }
      val want = supports(cur).map { case (e, s) => (e._1, e._2, s.toLong) }.toSet
      val got = graft.ops.Graph.kTruss(edges0.toDF("u", "v"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"seed=$seed k=$k: extra=${got -- want} missing=${want -- got}")
    }
  }

  test("personalizedPageRankInt ≡ in-memory integer iteration") {
    import spark.implicits._
    for ((n, m, iters, seed) <- Seq((15, 30, 3, 41), (25, 60, 5, 42))) {
      val rnd = new scala.util.Random(seed)
      val edges0 = (0 until m).map { _ =>
        val u = rnd.nextInt(n).toLong; val v = rnd.nextInt(n).toLong
        (math.min(u, v), math.max(u, v))
      }.filter(e => e._1 != e._2).distinct
      val adj = edges0.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2)).toMap
      val nodes = adj.keySet.toSeq.sorted
      val seedSet = nodes.filter(_ < 5).toSet
      if (seedSet.nonEmpty) {
        val scale = 1000000000000L
        val teleport = (3L * scale) / (20L * seedSet.size)
        var rank = nodes.map(v =>
          v -> (if (seedSet(v)) scale / seedSet.size else 0L)).toMap
        for (_ <- 1 to iters) {
          val contrib = nodes.map(v => v -> rank(v) / adj(v).size).toMap
          rank = nodes.map { v =>
            val in = adj(v).map(contrib).sum
            v -> ((if (seedSet(v)) teleport else 0L) + (17L * in) / 20L)
          }.toMap
        }
        val want = rank.filter(_._2 > 0L).map { case (v, r) => (v, r) }.toSet
        val got = graft.ops.Graph.personalizedPageRankInt(
            edges0.toDF("u", "v"), seedSet.toSeq.toDF("seed"), iters)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == want, s"seed=$seed: extra=${got -- want} missing=${want -- got}")
      }
    }
  }

  test("diameterSweep ≡ in-memory double sweep with the same md5 choices") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    for ((n, m, seed) <- Seq((20, 25, 51), (40, 50, 52), (30, 200, 53))) {
      val rnd = new scala.util.Random(seed)
      val edges0 = (0 until m).map { _ =>
        val u = rnd.nextInt(n).toLong; val v = rnd.nextInt(n).toLong
        (math.min(u, v), math.max(u, v))
      }.filter(e => e._1 != e._2).distinct
      val adj = edges0.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      def bfs(s: Long): Map[Long, Long] = {
        var dist = Map(s -> 0L); var frontier = Set(s); var d = 0L
        while (frontier.nonEmpty) {
          d += 1
          val next = frontier.flatMap(adj(_)) -- dist.keySet
          dist ++= next.map(_ -> d); frontier = next
        }
        dist
      }
      def prio(v: Long) = md5hex(s"dia:$v")
      val start = adj.keySet.minBy(prio)
      def sweep(s: Long): (Long, Long, Long) = {
        val dist = bfs(s)
        val ecc = dist.values.max
        val far = dist.filter(_._2 == ecc).keys.minBy(prio)
        (ecc, far, dist.size.toLong)
      }
      val (ecc1, s2, _) = sweep(start)
      val (ecc2, t, nReached) = sweep(s2)
      val got = graft.ops.Graph.diameterSweep(edges0.toDF("u", "v"), maxRounds = 32).head()
      assert(got.toSeq == Seq(start, ecc1, s2, ecc2, t, nReached),
        s"seed=$seed: got ${got.toSeq}, want ${Seq(start, ecc1, s2, ecc2, t, nReached)}")
    }
  }

  test("harmonicCentralityInt ≡ in-memory BFS reference across graph shapes") {
    import spark.implicits._
    for ((n, m, k, seed) <- Seq((30, 40, 3, 21), (50, 60, 2, 22), (40, 200, 4, 23))) {
      val rnd = new scala.util.Random(seed)
      val edges = (0 until m).map { _ =>
        val u = rnd.nextInt(n).toLong; val v = rnd.nextInt(n).toLong
        (math.min(u, v), math.max(u, v))
      }.filter(e => e._1 != e._2).distinct
      val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val lcm = (1 to k).foldLeft(1L)((a, b) => a / BigInt(a).gcd(b).toLong * b)
      val nodes = adj.keySet
      val seeds = nodes.filter(_ < 10)
      val want = seeds.flatMap { s =>
        // BFS to depth k
        var dist = Map(s -> 0L)
        var frontier = Set(s)
        for (d <- 1 to k) {
          val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
          dist ++= next.map(_ -> d.toLong)
          frontier = next
        }
        val within = dist.filter(_._2 >= 1)
        if (within.isEmpty) None
        else Some((s, within.values.map(lcm / _).sum, within.size.toLong))
      }
      val got = graft.ops.Graph.harmonicCentralityInt(
          edges.toDF("u", "v"), seeds.toSeq.toDF("seed"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want.toSet,
        s"seed=$seed k=$k: extra=${got -- want} missing=${want -- got}")
    }
  }
}
