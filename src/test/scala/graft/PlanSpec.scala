package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions.{concat, lit, when}

/** Physical-plan assertions: the gate queries must not only return the right
  * rows, they must run the plan a 1000-executor cluster needs. Each check
  * pins a scale property that a future refactor could silently regress
  * (pushdown lost to an opaque expression, a broadcast falling back to
  * shuffle, partial aggregation disabled, a sort where TakeOrdered suffices).
  */
class PlanSpec extends SparkTestBase {

  private def plan(df: DataFrame): String = {
    val qe: QueryExecution = df.queryExecution
    qe.executedPlan.toString()
  }

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf())

  test("q06 selective scan: predicates reach the parquet reader, projection is pruned") {
    val p = plan(q("q06_revenue_slice"))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("LessThan(l_quantity"), p)
    // only the 3 referenced columns are read, not lineitem's 11
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double>"), p)
  }

  test("q02 dim join is broadcast, not shuffled") {
    val p = plan(q("q02_brand_revenue"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q01 aggregation is partial+final (map-side combine before the shuffle)") {
    val p = plan(q("q01_pricing_summary"))
    assert(p.contains("partial_sum"), p)
    assert(p.contains("partial_count"), p)
  }

  test("q12 global top-k plans TakeOrderedAndProject, never a full sort") {
    val p = plan(q("q12_top_orders"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q04 semi join stays a semi join through optimization") {
    val p = plan(q("q04_semi_join"))
    assert(p.contains("LeftSemi"), p)
  }

  test("whole-stage codegen wraps the scan-project-filter pipeline of q16") {
    // AQE finalizes the physical plan lazily — collect() THIS frame (count()
    // would plan a different aggregate query) so the adaptive plan is final
    // and codegen stages are visible in its string form
    val df = q("q16_unit_conversion")
    df.collect()
    val p = plan(df)
    // codegen stages render as "*(n) Operator" in the plan string
    assert(p.contains("*(1)") || p.contains("*(2)"), p)
  }

  test("q64 salted join scatters: join keys include the salt column") {
    val p = plan(q("q64_salted_join"))
    assert(p.contains("_salt"), p)
  }

  test("q46 packing window is shard-partitioned, not a global single-reducer sort") {
    val p = plan(q("q46_context_packing"))
    // windowspecdefinition(shard, doc_id ASC ...) — the partition expression
    // present means each prefix sum runs on its own reducer
    assert(p.contains("windowspecdefinition(shard"), p)
  }

  test("q57 contamination has no unbounded aggregation buffer") {
    val p = plan(q("q57_contamination"))
    // the semi-join form: no per-gram collect_set of doc ids (whose buffer
    // grows with document frequency), no object-hash aggregate at all
    assert(!p.contains("collect_set"), p)
    assert(!p.contains("ObjectHashAggregate"), p)
    assert(p.contains("LeftSemi"), p)
  }

  test("q99 binned range join plans NO nested-loop join (the direct form does)") {
    import org.apache.spark.sql.functions.col
    val p = plan(q("q99_range_join"))
    // the whole point of the bin rewrite: the range predicate rides an
    // equi-join as a residual, never a BroadcastNestedLoop/cartesian
    assert(!p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("CartesianProduct"), p)
    // control: the same join stated directly IS a nested loop — proving the
    // assertion above is load-bearing, not vacuous
    val iv = Tables(spark, sf(), "orders")
      .select(col("o_orderkey"), col("o_orderdate").cast("timestamp").cast("long").as("lo"))
    val pts = Tables(spark, sf(), "lineitem")
      .select(col("l_shipdate").cast("timestamp").cast("long").as("p"))
    val direct = pts.join(iv, col("p") >= col("lo") && col("p") < col("lo") + 86400L * 30)
    assert(plan(direct).contains("BroadcastNestedLoop"), plan(direct))
  }

  test("q100/q103 graph queries: no cartesian products, partial aggregation on") {
    for (name <- Seq("q100_triangle_count", "q103_pagerank")) {
      val p = plan(q(name))
      assert(!p.contains("CartesianProduct"), s"$name: $p")
      assert(!p.contains("BroadcastNestedLoop"), s"$name: $p")
      // degree/contribution rollups must map-side combine before shuffling
      assert(p.contains("HashAggregate"), s"$name: $p")
    }
  }

  test("AQE splits a skewed join partition at runtime (the no-salt skew path)") {
    import spark.implicits._
    // q64's salting handles skew the planner can see coming; AQE's skew join
    // handles the skew nobody predicted. Pin low thresholds so a synthetic
    // hot key triggers the runtime split, and force sort-merge so the skew
    // machinery (not broadcast) is what absorbs it.
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = spark.range(0, 120000).select(
        when($"id" < 100000, 0L).otherwise($"id").as("k"),
        concat(lit("payload-payload-payload-"), $"id").as("pay"))
      val right = spark.range(0, 1000).select($"id".as("k"), lit("dim").as("d"))
      val j = left.join(right, "k")
      // materialize J'S OWN QueryExecution (count() would plan a separate
      // aggregate query and leave this one un-finalized: isFinalPlan=false)
      assert(j.collect().length == 100000) // only the hot key matches the dims
      val p = j.queryExecution.executedPlan.toString()
      assert(p.contains("isFinalPlan=true"), p)
      assert(p.contains("skew=true"), p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q238 snowflake: every dim joins broadcast, p_type reaches the scan") {
    val p = plan(q("q238_market_share"))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("EqualTo(p_type,ECONOMY)"), p)
  }

  test("q233 simhash banding plans equi-joins only, no nested-loop pair scan") {
    val p = plan(q("q233_simhash_neardup"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q242 bigram counts combine map-side before the shuffle") {
    val p = plan(q("q242_bigram_lm"))
    assert(p.contains("partial_count") || p.contains("partial_sum") ||
      p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("gridDbscan candidate join is an equi-join on cells, never a cartesian") {
    import spark.implicits._
    val pts = (0L until 100L).map(i => (i, i % 17, i % 13)).toDF("id", "x", "y")
    val p = plan(graft.ops.Clustering.candidatePairs(pts, eps = 2L))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q337 rich-club: the threshold panel is an explode, no join at all") {
    val p = plan(q("q337_rich_club"))
    // the panel rides as a literal explode per row; the only joins are the
    // degree attaches and the final nNodes-by-nEdges threshold-key attach
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q261 aHash banding pairs on equi-joins, never a pixel-level pair scan") {
    val p = plan(q("q261_ahash_neardup"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q268 maxsim: the panel rides as a literal — NO join at all before aggregation") {
    val p = plan(q("q268_maxsim_retrieval"))
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    // per-slot max and per-doc sum both combine map-side
    assert(p.contains("partial_max") || p.contains("partial_sum"), p)
  }

  test("q257 merkle manifest is two hash aggregates, no window, no sort-by-all") {
    val p = plan(q("q257_merkle_manifest"))
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q269 TA merge: refinement join is a semi join on candidate terms") {
    val p = plan(q("q269_shard_topk_merge"))
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
