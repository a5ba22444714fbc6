package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational

class RelationalSpec extends SparkTestBase {

  test("salted equi-join matches plain join exactly") {
    val li = Tables(spark, sf(), "lineitem")
    val o = Tables(spark, sf(), "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    val salted = Relational.saltedEquiJoin(li, o, "l_orderkey", saltFactor = 7)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    val diff = plain.join(salted.withColumnRenamed("n", "n2"), Seq("o_orderstatus"))
      .filter(col("n") =!= col("n2"))
    assert(plain.count() == salted.count())
    assert(diff.count() == 0)
  }

  test("salted join spreads a hot key over multiple partitions") {
    import spark.implicits._
    // one pathological key with 10k rows
    val left = (1 to 10000).map(i => (1L, i)).toDF("k", "v")
    val right = Seq((1L, "hot"), (2L, "cold")).toDF("k", "name")
    val joined = Relational.saltedEquiJoin(left, right, "k", saltFactor = 8)
    assert(joined.count() == 10000)
    // the salt column spread rows across sub-keys before the join
    val salts = left.withColumn(
      "_salt", pmod(hash(col("k"), monotonically_increasing_id()), lit(8)))
      .groupBy("_salt").count().count()
    assert(salts == 8, "expected the hot key to split into all 8 salt buckets")
  }

  test("bloom semi join matches exact semi join") {
    val li = Tables(spark, sf(), "lineitem")
    val dim = Tables(spark, sf(), "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val exact = li.join(dim.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi")
    val bloom = graft.ops.Sketches.bloomSemiJoin(li, "l_orderkey", dim, "o_orderkey")
    assert(bloom.count() == exact.count())
    assert(bloom.select("l_orderkey").except(exact.select("l_orderkey")).count() == 0)
  }

  test("bloom prefilter never drops true matches and prunes most non-matches") {
    val li = Tables(spark, sf(), "lineitem")
    // tiny dim: 10 order keys
    val dim = Tables(spark, sf(), "orders").limit(10).select(col("o_orderkey"))
    val pruned = graft.ops.Sketches.bloomPrefilter(li, col("l_orderkey"), dim, col("o_orderkey"))
    val trueMatches = li.join(dim.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi").count()
    val prunedCount = pruned.count()
    assert(prunedCount >= trueMatches, "bloom must have no false negatives")
    assert(prunedCount < li.count() / 10, s"bloom should prune most rows, kept $prunedCount")
  }

  test("salted join rejects right/full outer join types") {
    import spark.implicits._
    val l = Seq((1L, "a")).toDF("k", "v")
    val r = Seq((1L, "b")).toDF("k", "w")
    val e = intercept[IllegalArgumentException] {
      Relational.saltedEquiJoin(l, r, "k", 4, joinType = "right")
    }
    assert(e.getMessage.contains("saltedEquiJoin supports"))
  }

  test("bin join drops values outside all bins") {
    import spark.implicits._
    val facts = Seq(0.5, 1.5, 99.0).toDF("v")
    val out = Relational.binJoin(facts, col("v"), Seq(("lo", 0.0, 1.0), ("hi", 1.0, 2.0)))
    assert(out.count() == 2)
    assert(out.filter(col("bin_name") === "lo").count() == 1)
  }

  test("pointInRangeJoin: boundary semantics and equality with the direct range join") {
    import spark.implicits._
    // intervals: [10,20) spanning several width-3 bins; [20,25) adjacent;
    // [30,30) empty (drops); [0,100) long (covers everything)
    val iv = Seq((1L, 10L, 20L), (2L, 20L, 25L), (3L, 30L, 30L), (4L, 0L, 100L))
      .toDF("iv_id", "lo", "hi")
    // points: 9 (below 1), 10 (lo INcluded), 19, 20 (hi of 1 EXcluded, lo of
    // 2 included), 24, 25, 99, 100 (hi of 4 excluded), negative -1
    val pts = Seq(9L, 10L, 19L, 20L, 24L, 25L, 99L, 100L, -1L).toDF("p")
    val got = Relational
      .pointInRangeJoin(pts, col("p"), iv, col("lo"), col("hi"), binWidth = 3L)
      .select(col("iv_id"), col("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Set(
      (1L, 10L), (1L, 19L),
      (2L, 20L), (2L, 24L),
      (4L, 9L), (4L, 10L), (4L, 19L), (4L, 20L), (4L, 24L), (4L, 25L), (4L, 99L))
    assert(got == want, s"binned range join mismatch: $got")

    // differential on real data: the binned rewrite must equal Spark's own
    // non-equi (nested-loop) plan, duplicates included
    val ivR = Tables(spark, sf(), "orders")
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_orderdate").cast("timestamp").cast("long").as("lo"))
      .withColumn("hi", col("lo") + lit(45L * 86400L))
    val ptsR = Tables(spark, sf(), "lineitem")
      .select(col("l_orderkey"), col("l_shipdate").cast("timestamp").cast("long").as("p"))
    val binned = Relational
      .pointInRangeJoin(ptsR, col("p"), ivR, col("lo"), col("hi"), binWidth = 10L * 86400L)
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
    val direct = ptsR
      .join(ivR, col("p") >= col("lo") && col("p") < col("hi"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n2"))
    assert(binned.count() == direct.count())
    assert(binned.join(direct, Seq("o_orderkey"))
      .filter(col("n") =!= col("n2")).count() == 0)
  }

  test("intervalOverlapJoin: adjacency excluded, multi-bin pairs emitted once") {
    import spark.implicits._
    // A1 [10,20) overlaps B1 [15,40) across several width-3 bins (must emit
    // ONCE despite sharing bins 5 and 6); A2 [20,25) is ADJACENT to B2
    // [25,30) (half-open: no overlap); A3 [0,100) covers everything
    val a = Seq((1L, 10L, 20L), (2L, 20L, 25L), (3L, 0L, 100L)).toDF("ka", "la", "ha")
    val b = Seq((10L, 15L, 40L), (11L, 25L, 30L)).toDF("kb", "lb", "hb")
    val got = Relational
      .intervalOverlapJoin(a, col("la"), col("ha"), b, col("lb"), col("hb"), binWidth = 3L)
      .select(col("ka"), col("kb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // toSeq (not toSet): a duplicate emission would show here. A2 overlaps
    // B1 (20 < 40 ∧ 15 < 25) but NOT the adjacent B2 (half-open).
    assert(got.sorted == Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L)), s"got $got")

    // differential vs the directly-stated overlap join on real data
    val ivA = Tables(spark, sf(), "orders").filter(col("o_orderkey") % 40 === 0)
      .select(col("o_orderkey").as("ka"),
        col("o_orderdate").cast("timestamp").cast("long").as("la"))
      .withColumn("ha", col("la") + lit(45L * 86400L))
    val ivB = Tables(spark, sf(), "orders").filter(col("o_orderkey") % 30 === 0)
      .select(col("o_orderkey").as("kb"),
        col("o_orderdate").cast("timestamp").cast("long").as("lb"))
      .withColumn("hb", col("lb") + lit(10L * 86400L))
    val binned = Relational
      .intervalOverlapJoin(ivA, col("la"), col("ha"), ivB, col("lb"), col("hb"),
        binWidth = 14L * 86400L)
      .select(col("ka"), col("kb"))
    val direct = ivA.join(ivB, col("la") < col("hb") && col("lb") < col("ha"))
      .select(col("ka"), col("kb"))
    assert(binned.count() == direct.count())
    assert(binned.exceptAll(direct).count() == 0 && direct.exceptAll(binned).count() == 0)
  }

  test("zOrderValue: hand-computed interleave and round-trip bit extraction") {
    import spark.implicits._
    // a = 0b101 (5), b = 0b011 (3): z bit 2i from a, 2i+1 from b ->
    // z = a0 + 2*b0 + 4*a1 + 8*b1 + 16*a2 = 1 + 2 + 0 + 8 + 16 = 27
    val got = Seq((5L, 3L)).toDF("a", "b")
      .select(Relational.zOrderValue(col("a"), col("b"), 8).as("z"))
      .collect()(0).getLong(0)
    assert(got == 27L, s"interleave(5,3) = $got, want 27")
    // round trip: de-interleaving recovers both inputs for arbitrary pairs
    val pairs = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (12345L, 54321L), (1L, 65534L))
    val z = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        Relational.zOrderValue(col("a"), col("b"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((a, b, zv) <- z) {
      val aBack = (0 until 16).map(i => ((zv >> (2 * i)) & 1L) << i).sum
      val bBack = (0 until 16).map(i => ((zv >> (2 * i + 1)) & 1L) << i).sum
      assert(aBack == a && bBack == b, s"round trip failed for ($a,$b): z=$zv")
    }
  }

  test("z-order layout prunes files on BOTH dimensions; single-column sort cannot") {
    import spark.implicits._
    // 64k rows over a 4096×4096 domain, cut into 64 equal files per layout.
    // min/max pruning for an equality filter touches every file whose
    // [min,max] straddles the probe value. Sorting by `a` alone leaves every
    // file's b-range at full width — a filter on b touches ALL files;
    // z-order gives both dimensions ~sqrt locality.
    val n = 65536
    val nFiles = 64
    val rows = (0 until n)
      .map(i => ((i * 2654435761L) % 4096, (i * 40503L + 17) % 4096))
      .toDF("a", "b")
    def fileRanges(ord: org.apache.spark.sql.Column) = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(ord, col("a"), col("b"))
      rows
        .withColumn("rn", row_number().over(w))
        .withColumn("file", ((col("rn") - 1) * nFiles / n).cast("int"))
        .groupBy(col("file"))
        .agg(min(col("a")).as("a_lo"), max(col("a")).as("a_hi"),
          min(col("b")).as("b_lo"), max(col("b")).as("b_hi"))
        .collect()
    }
    val probes = (0 until 32).map(_ * 128L + 64L)
    def touched(ranges: Array[org.apache.spark.sql.Row], lo: String, hi: String): Int =
      probes.map(v => ranges.count(r =>
        r.getAs[Long](lo) <= v && v <= r.getAs[Long](hi))).sum
    val byA = fileRanges(col("a"))
    val byZ = fileRanges(Relational.zOrderValue(col("a"), col("b"), 12))
    val (aFilterOnB, zFilterOnB) = (touched(byA, "b_lo", "b_hi"), touched(byZ, "b_lo", "b_hi"))
    val (aFilterOnA, zFilterOnA) = (touched(byA, "a_lo", "a_hi"), touched(byZ, "a_lo", "a_hi"))
    // single-dim layout: b-filters scan ~everything (each file's observed
    // b-range spans nearly the full domain; sampling can clip the extremes)
    assert(aFilterOnB * 10 >= nFiles * probes.size * 9,
      s"a-sort should barely prune on b: $aFilterOnB of ${nFiles * probes.size}")
    // z-order: b-filters touch a small fraction; a-filters stay bounded too
    assert(zFilterOnB * 4 < aFilterOnB,
      s"z-order should prune b-filters >=4x: z=$zFilterOnB vs a-sort=$aFilterOnB")
    assert(zFilterOnA * 4 < nFiles * probes.size,
      s"z-order should also prune a-filters >=4x: $zFilterOnA")
    assert(aFilterOnA < zFilterOnA,
      "sanity: the single-dim sort is still the best possible for its own column")
  }

  test("exactQuantilesByKey: bucketed prefix-sum matches the rank definition on a hot key") {
    import spark.implicits._
    // ONE key, 10k skewed values (the case the per-key window serialized):
    // the bucketed cumulative counts must reproduce min{v : rank(v) >= ceil(p*n)}.
    // Threshold forced to 0 so this covers the BUCKETED path explicitly
    // (the size-based path choice would otherwise route 10k pairs to the
    // window form and leave the scale path untested).
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(10000)(math.pow(rnd.nextDouble(), 4) * 1000.0)
    val df = vals.map(("k", _)).toDF("k", "v")
    val got = withQuantilePathThreshold("0") {
      Relational.exactQuantilesByKey(df, "k", "v", Seq(0.5, 0.9, 1.0)).collect()(0)
    }
    val sorted = vals.sorted
    def rankQ(p: Double) = sorted(math.ceil(p * sorted.size).toInt - 1)
    assert(got.getDouble(1) == rankQ(0.5))
    assert(got.getDouble(2) == rankQ(0.9))
    assert(got.getDouble(3) == rankQ(1.0))
  }

  private def withQuantilePathThreshold[A](v: String)(body: => A): A = {
    val key = "spark.graft.quantiles.windowPathMaxPairs"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, v)
    try body
    finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("exactQuantilesByKey: window and bucketed paths agree exactly") {
    import spark.implicits._
    // differential gate for the size-based path choice: same skewed multi-key
    // input through both forms must match cell-for-cell (both use the exact
    // integer pick predicate, so equality is ==, not approx)
    val rnd = new scala.util.Random(23)
    val df = (1 to 5000).map { i =>
      (s"k${i % 7}", math.floor(math.pow(rnd.nextDouble(), 3) * 500.0))
    }.toDF("k", "v")
    val ps = Seq(0.25, 0.5, 0.9, 1.0)
    val win = withQuantilePathThreshold(Long.MaxValue.toString) {
      Relational.exactQuantilesByKey(df, "k", "v", ps).orderBy(col("k")).collect().toSeq
    }
    val bkt = withQuantilePathThreshold("0") {
      Relational.exactQuantilesByKey(df, "k", "v", ps).orderBy(col("k")).collect().toSeq
    }
    assert(win == bkt, s"paths disagree:\n window=$win\n bucket=$bkt")
  }

  test("equiDepthHistogram: bins hold the exact rank ranges") {
    import spark.implicits._
    // 100 distinct values 1..100 in one key: 4 bins of exactly 25, with
    // boundary values landing upper-inclusive
    val df = (1 to 100).map(i => ("k", i.toDouble)).toDF("k", "v")
    val got = Relational.equiDepthHistogram(df, "k", "v", bins = 4)
      .orderBy(col("bin"))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1, 25L, 1.0, 25.0), (2, 25L, 26.0, 50.0),
      (3, 25L, 51.0, 75.0), (4, 25L, 76.0, 100.0)))
  }

  test("exactQuantilesByKey: duplicates and all-equal keys survive bucketing") {
    import spark.implicits._
    // key "a": heavy duplicates around a bucket boundary; key "b": hi == lo
    val df = (Seq.fill(50)(("a", 1.0)) ++ Seq.fill(50)(("a", 2.0)) ++
      Seq.fill(30)(("b", 5.0))).toDF("k", "v")
    val got = Relational.exactQuantilesByKey(df, "k", "v", Seq(0.5, 1.0))
      .orderBy(col("k"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // a: cc(1.0)=50 >= ceil(0.5*100)=50 -> p50=1.0; p100=2.0. b: single value.
    assert(got.toSeq == Seq(("a", 1.0, 2.0), ("b", 5.0, 5.0)))
  }

  test("weightedQuantilesByKey: equals the unit-weight form on weight-expanded rows") {
    import spark.implicits._
    // random (value, weight) pairs per key; expanding each row `w` times and
    // running with weight=1 must give identical quantiles (the weighting is
    // exactly multiplicity). Both arms use the integer pick predicate, so
    // equality is exact, not approximate.
    val rnd = new scala.util.Random(11)
    val rows = for (k <- Seq("a", "b"); _ <- 1 to 400)
      yield (k, (rnd.nextInt(1000) + 1).toLong, (rnd.nextInt(9) + 1).toLong)
    val df = rows.toDF("k", "v", "w")
    val expanded = df
      .withColumn("w", explode(sequence(lit(1L), col("w"))))
      .withColumn("w", lit(1L))
    val wq = Relational.weightedQuantilesByKey(df, "k", "v", "w", Seq(0.25, 0.5, 0.9))
    val uq = Relational.weightedQuantilesByKey(expanded, "k", "v", "w", Seq(0.25, 0.5, 0.9))
    assert(wq.orderBy(col("k")).collect().toSeq == uq.orderBy(col("k")).collect().toSeq)
  }

  test("weightedQuantilesByKey: hand case — zero/NULL weights excluded, rank math exact") {
    import spark.implicits._
    // values 10,20,30,40 with weights 1,2,3,4 (total 10): cumw 1,3,6,10.
    // p50 -> 100·cumw >= 50·10 ⇒ cumw >= 5 ⇒ v=30; p90 ⇒ cumw >= 9 ⇒ v=40.
    // The zero- and NULL-weight rows with huge values must not shift ranks.
    val df = Seq(("k", 10L, Some(1L)), ("k", 20L, Some(2L)), ("k", 30L, Some(3L)),
      ("k", 40L, Some(4L)), ("k", 999L, Some(0L)), ("k", 998L, None))
      .toDF("k", "v", "w")
    val got = Relational.weightedQuantilesByKey(df, "k", "v", "w", Seq(0.5, 0.9))
      .collect()(0)
    assert((got.getLong(1), got.getLong(2)) == (30L, 40L))
  }

  test("intervalCoverage: touching merges, nesting collapses, gaps split islands") {
    import spark.implicits._
    // key a: [0,10] ∪ [2,3] (nested) ∪ [10,15] (touching) -> one island,
    // covered 15; then [20,25] after a gap -> second island, covered 5.
    // key b: zero-length [7,7] alone -> one island of covered 0.
    val df = Seq(
      ("a", 0L, 10L, 1L), ("a", 2L, 3L, 2L), ("a", 10L, 15L, 3L), ("a", 20L, 25L, 4L),
      ("b", 7L, 7L, 5L)
    ).toDF("k", "s", "e", "id")
    val got = Relational.intervalCoverage(df, col("k"), col("s"), col("e"), col("id"))
      .orderBy(col("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 2L, 4L, 20L), ("b", 1L, 1L, 0L)))
  }

  test("intervalCoverage: covered equals the distinct-unit-cell union on random spans") {
    import spark.implicits._
    // differential oracle: a closed [s,e] covers unit cells s..e-1, so the
    // per-key distinct cell count IS the union length the sweep must report
    val rnd = new scala.util.Random(23)
    val rows = for (k <- Seq("x", "y", "z"); i <- 1 to 200) yield {
      val s = rnd.nextInt(500).toLong
      (k, s, s + 1 + rnd.nextInt(40).toLong, i.toLong)
    }
    val df = rows.toDF("k", "s", "e", "id")
    val got = Relational.intervalCoverage(df, col("k"), col("s"), col("e"), col("id"))
      .select(col("k"), col("covered"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = df
      .select(col("k"), explode(sequence(col("s"), col("e") - 1)).as("cell"))
      .distinct()
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("applyCdc: latest-wins upsert, delete, insert, untouched passthrough") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      // key 1: deleted at v5, then re-upserted at v6 -> survives as a2
      (1L, "dead", 5L, "D"), (1L, "a2", 6L, "U"),
      // key 2: two updates, v2 is latest -> b3
      (2L, "b2", 1L, "U"), (2L, "b3", 2L, "U"),
      // key 3: deleted
      (3L, "gone", 1L, "D"),
      // key 4: fresh insert; an 'I' on existing key 2 at an OLD version
      // must lose to the newer 'U'
      (4L, "d", 1L, "I"), (2L, "stale", 0L, "I")
    ).toDF("k", "v", "ver", "op")
    val got = Relational.applyCdc(base, changes, Seq("k"), "ver", "op")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "a2", 2L -> "b3", 4L -> "d"), s"cdc: $got")
    // missing payload column fails fast, not at execution
    intercept[IllegalArgumentException] {
      Relational.applyCdc(base, changes.drop("v"), Seq("k"), "ver", "op")
    }
  }

  test("rrfFuse: fixed-point reciprocal sums and per-item list counts") {
    import spark.implicits._
    def recip(rank: Long): Long = 1000000000000L / (60L + rank)
    val ra = Seq(("x", 1L), ("y", 2L), ("z", 3L)).toDF("item", "rank")
    val rb = Seq(("y", 1L), ("z", 2L)).toDF("item", "rank") // x unranked in B
    val got = Relational.rrfFuse(Seq(ra, rb), Seq("item"), "rank")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "x" -> ((1L, recip(1))),
      "y" -> ((2L, recip(2) + recip(1))),
      "z" -> ((2L, recip(3) + recip(2)))), s"rrf: $got")
  }

  test("globalNtile: equals the window ntile on skewed, tied, and tiny inputs") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // heavy ties (80% of rows share v=5) exercise the equal-values-share-a-
    // bucket invariant; the id tie-break makes the total order unique
    val skewed = ((1 to 400).map(i => (5L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 17, 1000L + i))).toDF("v", "id")
    for ((df, k) <- Seq((skewed, 4), (skewed, 7),
        ((1 to 3).map(i => (i.toLong, i.toLong)).toDF("v", "id"), 5))) { // n < k
      val want = df.withColumn("t",
        ntile(k).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "t").as[(Long, Int)].collect().toMap
      val got = Relational.globalNtile(df, "v", "id", k, "t")
        .select("id", "t").as[(Long, Int)].collect().toMap
      assert(got == want, s"k=$k: distributed ntile diverged from window ntile")
    }
  }

  test("globalNtile: plan has no unpartitioned window over the input rows") {
    val per = Tables(spark, sf(), "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    val plan = Relational.globalNtile(per, "n", "o_custkey", 4, "t")
      .queryExecution.executedPlan.toString
    // the one window over the DATA rows (the rank pass) must be partitioned
    // by the bucket column — B parallel sort groups; and no ntile window
    // (the single-reducer form this operator exists to avoid) anywhere
    assert("windowspecdefinition\\(__gn_b#\\d+,".r.findFirstIn(plan).isDefined,
      s"expected the row_number window partitioned by __gn_b:\n$plan")
    assert(!plan.toLowerCase.contains("ntile"), "naive ntile window leaked into the plan")
  }

  test("globalRank: equals the window row_number on skewed and tied inputs") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val skewed = ((1 to 300).map(i => (7L, i.toLong)) ++
      (1 to 80).map(i => (i.toLong % 13, 2000L + i))).toDF("v", "id")
    val want = skewed.withColumn("r",
      row_number().over(Window.orderBy(col("v"), col("id"))))
      .select("id", "r").as[(Long, Int)].collect().toMap
    val got = Relational.globalRank(skewed, "v", "id", "r")
      .select("id", "r").as[(Long, Long)].collect().map { case (i, r) => (i, r.toInt) }.toMap
    assert(got == want, "distributed global rank diverged from the window row_number")
  }

  test("skyline2D: equals the NOT-EXISTS brute force incl. ties and duplicates") {
    import spark.implicits._
    // seeded layout with duplicate points, x-ties with different y, and a
    // dominated cluster — every dominance channel exercised
    val rnd = new scala.util.Random(7)
    val pts = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(40) * 5).toLong, rnd.nextInt(30).toLong)) ++
      Seq((1001L, 10L, 25L), (1002L, 10L, 25L)) // exact duplicate point
    val df = pts.toDF("id", "x", "y")
    val brute = df.as("a").join(df.as("b"),
        col("b.x") <= col("a.x") && col("b.y") >= col("a.y") &&
          (col("b.x") < col("a.x") || col("b.y") > col("a.y")), "left_anti")
      .select("a.id").as[Long].collect().toSet
    val got = Relational.skyline2D(df, "x", "y").select("id").as[Long].collect().toSet
    assert(got == brute, s"skyline diverged: extra=${got -- brute} missing=${brute -- got}")
    // duplicates of a frontier point both survive
    assert(got.contains(1001L) == got.contains(1002L))
  }

  test("linearInterpolate: interior lines, boundary neighbors, all-null stays null") {
    import spark.implicits._
    val df = Seq(
      ("a", 0L, Some(100L)), ("a", 1L, None), ("a", 2L, None), ("a", 3L, None),
      ("a", 4L, Some(300L)), // interior gap: 150, 200, 250
      ("b", 0L, None), ("b", 1L, Some(10L)), ("b", 2L, None), // boundaries: 10, -, 10
      ("c", 0L, None), ("c", 1L, None) // no observations at all
    ).toDF("k", "p", "v")
    val got = Relational.linearInterpolate(df, Seq(col("k")), "p", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(("a", 1L)) == Some(150.0) && got(("a", 2L)) == Some(200.0) &&
      got(("a", 3L)) == Some(250.0), s"interior: $got")
    assert(got(("b", 0L)) == Some(10.0) && got(("b", 2L)) == Some(10.0), s"boundary: $got")
    assert(got(("c", 0L)).isEmpty && got(("c", 1L)).isEmpty, s"all-null: $got")
  }

  test("meanShiftSplit: finds the obvious level shift with exact means") {
    import spark.implicits._
    val df = (Seq.fill(3)(1L) ++ Seq.fill(3)(101L)).zipWithIndex
      .map { case (v, i) => ("s", i.toLong, v) }.toDF("k", "pos", "v")
    val r = Relational.meanShiftSplit(df, "k", Seq(col("pos")), "v").collect().head
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getInt(byName("split_pos")) == 3)
    assert(r.getDouble(byName("mean_before")) == 1.0)
    assert(r.getDouble(byName("mean_after")) == 101.0)
    assert(r.getDouble(byName("shift_score")) == 100.0)
  }

  test("snapshotDiff: presence from membership, NULL-safe change compare") {
    import spark.implicits._
    val prev = Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)), (4L, None))
      .toDF("k", "v")
    val curr = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, None), (5L, None))
      .toDF("k", "v")
    val got = Relational.snapshotDiff(prev, curr, Seq("k"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // k=4: removed even though its value is NULL (membership, not nullness);
    // k=5: added with NULL value; k=2/3: NULL vs value is "changed";
    // k=1: identical → unchanged
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"), s"diff: $got")
  }

  test("fingerprint: invariant to row order and partitioning, sensitive to edits") {
    import spark.implicits._
    val rows = (1 to 50).map(i => (i % 3, s"row-$i"))
    // surface is all-BIGINT (hi/lo pairs) — no DecimalType reaches the gate
    def fp(df: org.apache.spark.sql.DataFrame) = {
      val out = graft.ops.Sketches.fingerprint(df, Seq(col("_1")), col("_2"))
      assert(out.schema.fields.forall(
        !_.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]),
        s"fingerprint surfaced a DecimalType: ${out.schema.simpleString}")
      out.collect().map(r => r.getInt(0) ->
        (1 to 7).map(r.getLong).toList).toMap
    }
    val a = fp(rows.toDF.repartition(7))
    val b = fp(scala.util.Random.shuffle(rows).toDF.repartition(2))
    assert(a == b, "fingerprint must not depend on order/partitioning")
    val c = fp(rows.updated(10, (rows(10)._1, "tampered")).toDF)
    assert(a != c, "a changed row must change the fingerprint")
  }

  test("globalPrefixSum: matches the single-window form, both frames, with rank") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.{Window => W}
    // duplicate values across bucket boundaries; unique (val, tie) pairs
    val rnd = new scala.util.Random(31)
    val df = (1 to 2000).map(i => (rnd.nextInt(40) - 20, s"t$i", rnd.nextInt(100).toLong))
      .toDF("v", "tie", "m")
    for (incl <- Seq(true, false)) {
      val got = Relational.globalPrefixSum(df, "v", "tie", "m", "cum",
          includeCurrent = incl, rankCol = Some("rk"))
        .select(col("v"), col("tie"), col("m"), col("cum"), col("rk"))
        .collect().map(r => (r.getInt(0), r.getString(1)) -> (r.getLong(3), r.getLong(4)))
        .toMap
      val w = W.orderBy(col("v"), col("tie"))
      val want = df
        .withColumn("cum", coalesce(sum(col("m")).over(
          w.rowsBetween(W.unboundedPreceding, if (incl) 0 else -1)), lit(0L)))
        .withColumn("rk", row_number().over(w).cast("long"))
        .collect().map(r => (r.getInt(0), r.getString(1)) -> (r.getLong(3), r.getLong(4)))
        .toMap
      assert(got == want, s"includeCurrent=$incl mismatch")
    }
  }

  test("greedyCoverage: greedy order, tie-break, and exhaustion") {
    import spark.implicits._
    // universe {1..9}: doc 10 covers {1,2,3,4}, doc 20 {4,5,6}, doc 30
    // {5,6,7,8}, doc 40 {9}, doc 50 {1,2} (never best). Greedy: 10 (gain 4),
    // then 30 (gain 4 of {5,6,7,8}), then tie 20 vs 40 broken... 20 has
    // gain 0 after 30; 40 gain 1 -> picks 40; round 4 exhausts.
    val pairs = Seq(
      10 -> Seq(1, 2, 3, 4), 20 -> Seq(4, 5, 6), 30 -> Seq(5, 6, 7, 8),
      40 -> Seq(9), 50 -> Seq(1, 2)
    ).flatMap { case (id, its) => its.map(i => (id.toLong, i)) }.toDF("id", "item")
    val got = Relational.greedyCoverage(pairs, "id", "item", rounds = 5)
      .orderBy(col("round"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1, 10L, 4L), (2, 30L, 4L), (3, 40L, 1L)), got.toSeq)
    // tie-break: two ids with equal first-round gain -> smaller id wins
    val tied = Seq(7L -> "a", 7L -> "b", 3L -> "c", 3L -> "d").toDF("id", "item")
    val first = Relational.greedyCoverage(tied, "id", "item", rounds = 1)
      .collect()(0)
    assert((first.getLong(1), first.getLong(2)) == (3L, 2L))
  }

  test("surfaceHiLo: exact split of wide decimals, reconstructible") {
    import spark.implicits._
    // values straddle 2^53, 2^63, and 10^18 boundaries; 0 and exact multiples
    val vals = Seq("0", "1", "999999999999999999", "1000000000000000000",
      "9223372036854775807", "18446744073709551615", "12345678901234567890123456")
    val df = vals.toDF("s").selectExpr("CAST(s AS DECIMAL(38,0)) AS x")
    val out = graft.ops.Sketches.surfaceHiLo(df, "x")
    assert(out.schema.fieldNames.toSet == Set("x_hi", "x_lo"))
    assert(out.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.LongType))
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = vals.map(BigInt(_)).map(v =>
      ((v / BigInt(10).pow(18)).toLong, (v % BigInt(10).pow(18)).toLong)).toSet
    assert(got == want, s"got $got want $want")
  }
}
