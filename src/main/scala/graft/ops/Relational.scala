package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators beyond the reference's own surface
  * (SURVEY §2.3-2.5 notes the reference has zero joins/aggs/windows; §7.5 adds
  * them as extension operators). Everything is declarative DataFrame API so
  * Catalyst owns pushdown/pruning/reorder; scale notes on each op.
  */
object Relational {

  /** Top-k rows per group. One shuffle on `partitionCols`; `row_number` (not
    * rank) with a total order — callers MUST include a unique tie-breaker in
    * `orderBy` for deterministic output. At scale, skewed groups are bounded
    * by k after the window filter; AQE handles partition skew.
    */
  def topKPerGroup(
      df: DataFrame,
      partitionCols: Seq[Column],
      orderBy: Seq[Column],
      k: Int,
      rankCol: String = "rn"
  ): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderBy: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** [[topKPerGroup]] through the NATIVE physical operator
    * ([[graft.plans.TopKPerGroupExec]]): a bounded per-group heap in one
    * un-sorted pass instead of sorting every partition row for the window.
    * Identical results given the same total-order contract (include a unique
    * tie-breaker in `orderBy`); the rewrite is keyed to this method's marker
    * alias, so ordinary window queries elsewhere are untouched. Prefer this
    * form when groups are large and k is small — the window form remains the
    * spill-safe fallback when (groups-per-partition × k) itself is huge.
    */
  def topKPerGroupNative(
      df: DataFrame,
      partitionCols: Seq[Column],
      orderBy: Seq[Column],
      k: Int,
      rankCol: String = "rn"
  ): DataFrame = {
    graft.plans.GraftPlans.install(df.sparkSession)
    val marker = graft.plans.GraftPlans.RankMarker
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderBy: _*)
    df.withColumn(marker, row_number().over(w))
      .filter(col(marker) <= k)
      .withColumnRenamed(marker, rankCol)
  }

  /** Exact per-key discrete quantiles WITHOUT a per-group value buffer:
    * collapse to distinct (key, value) pairs with counts, cumulative-count
    * them in one sort-based window pass, and pick for each p the smallest
    * value whose cumulative count reaches ceil(p·n). Spark's built-in
    * `percentile` aggregate holds every group value in its aggregation
    * buffer — a driver-of-OOM at corpus scale for hot keys; this form's
    * memory is bounded by the window's streaming sort regardless of group
    * size, at two shuffles of the COLLAPSED pair table. Result column for
    * p is named `p<100p>` (p50, p90, ...) — ps must stay distinct after that
    * rounding (enforced below). Keys whose measures are ALL NULL drop out of
    * the output entirely (the NULL filter precedes the grouping), where the
    * built-in `percentile` would emit a NULL row — callers needing those
    * keys should left-join this result back to the distinct key set.
    */
  def exactQuantilesByKey(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      ps: Seq[Double]
  ): DataFrame =
    quantilesCore(df, keyCol, valCol, ps, weight = None,
      // rank pick: smallest value whose cumulative count reaches ceil(p·n)
      pick = (p, cc, n) => cc >= ceil(lit(p) * n))

  /** Exact per-key WEIGHTED quantiles — [[exactQuantilesByKey]] with an
    * integer weight column replacing the per-value counts in the cumulative
    * sum (PPS medians, token-weighted percentiles, ...). The pick predicate
    * stays pure integer arithmetic (`100·cumw ≥ round(100p)·total`), so the
    * result is bit-exact at any scale — no `ceil(p·n)` double rounding even
    * when totals pass 2^53; the price is ps must land on whole percents.
    * NULL or non-positive weights drop the row (a zero-weight value can
    * never be picked; negative weights would corrupt every rank after it).
    */
  def weightedQuantilesByKey(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      weightCol: String,
      ps: Seq[Double]
  ): DataFrame = {
    require(ps.forall(p => math.abs(p * 100 - math.round(p * 100)) < 1e-9),
      s"weighted quantiles must be whole percents: $ps")
    quantilesCore(df, keyCol, valCol, ps,
      weight = Some(col(weightCol)),
      pick = (p, cc, n) => cc * 100L >= lit(math.round(p * 100)) * n)
  }

  private def quantilesCore(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      ps: Seq[Double],
      weight: Option[Column],
      pick: (Double, Column, Column) => Column
  ): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), s"quantiles must be in (0,1]: $ps")
    // result columns are named from round(p·100), so ps that collide after
    // rounding (e.g. 0.995 and 1.0 → both "p100") would silently produce
    // duplicate column names and break any downstream select-by-name
    require(ps.map(p => math.round(p * 100)).distinct.size == ps.size,
      s"quantile names p<round(100p)> must be distinct, got $ps")
    // prefixed internals: a user value column named e.g. "n" would otherwise
    // be silently replaced by the group total and corrupt every quantile
    val (c, cc, n, bkt, off) = ("__gq_c", "__gq_cc", "__gq_n", "__gq_b", "__gq_o")
    // NULL measures are excluded, matching the built-in percentile/quantile
    // aggregates (counted, they would shift every rank; they also sort on
    // opposite ends in Spark vs DuckDB)
    val rows0 = df.filter(col(valCol).isNotNull)
    val rows = weight.fold(rows0)(w => rows0.filter(w.isNotNull && w > 0))
    // PATH CHOICE BY INPUT SIZE (three tiers). The bucketed prefix-sum
    // machinery below pays ~3 extra shuffles + 2 broadcast builds of FIXED
    // overhead — the right trade when some key's collapsed pair count is
    // huge (single-reducer sort ceiling), pure tax when the pair table is
    // small (it turned a 0.32 s window-form query into 1.70 s at sf0.1).
    //
    //  tier 1 — input provably small (Catalyst sizeInBytes of the scan ≤
    //    `spark.graft.quantiles.windowPathMaxInputBytes`, default 256 MB:
    //    the collapsed pairs can't exceed the input rows): ONE linear plan —
    //    collapse, per-key ordered window — no checkpoint, no sizing job.
    //  tier 2 — big input but the COLLAPSED pair table is small (exact
    //    count of the materialized checkpoint ≤
    //    `spark.graft.quantiles.windowPathMaxPairs`, default 1e6): same
    //    window form over the checkpoint (worst single sort group = the
    //    threshold, bounded seconds at any input scale).
    //  tier 3 — otherwise: the bucketed prefix-sum form.
    // The tier-2 count reads already-materialized checkpoint blocks, not
    // the input; tier 1 skips even that job.
    val maxWindowPairs = df.sparkSession.conf
      .get("spark.graft.quantiles.windowPathMaxPairs", "1000000").toLong
    val maxInputBytes = df.sparkSession.conf
      .get("spark.graft.quantiles.windowPathMaxInputBytes", (256L << 20).toString).toLong
    val g0 = rows
      .groupBy(col(keyCol), col(valCol))
      .agg(weight.fold(count(lit(1)))(w => sum(w.cast("long"))).as(c))
    def windowForm(src: DataFrame): DataFrame = {
      val wCum = Window.partitionBy(col(keyCol)).orderBy(col(valCol))
      val wTot = Window.partitionBy(col(keyCol))
      // (key, value) is unique after the collapse, so the RANGE default
      // frame of the ordered sum has no tie groups to worry about
      src.withColumn(n, sum(col(c)).over(wTot))
        .withColumn(cc, sum(col(c)).over(wCum))
    }
    val smallInput = maxWindowPairs > 0 &&
      rows.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(maxInputBytes)
    val cum = if (smallInput) {
      windowForm(g0)
    } else {
      val g = g0.localCheckpoint()
      if (g.count() <= maxWindowPairs) {
        windowForm(g)
      } else {
      // Cumulative counts as a BUCKETED PREFIX SUM, not a per-key window: a
      // plain `Window.partitionBy(key).orderBy(value)` funnels each key's
      // whole collapsed pair table through ONE sort partition — for few hot
      // keys that is a single-reducer sort no matter how many executors exist.
      // Instead: (1) bucket values by range inside each key (monotone double
      // bucketing — floor((v−lo)/w) with w>0 is nondecreasing in v and a pure
      // function of v, so equal values share a bucket and bucket order is
      // value order; the RESULT arithmetic stays exact integer counts, the
      // doubles only route rows); (2) per-(key,bucket) subtotals — a tiny
      // frame — give each bucket its prefix offset via a window over buckets;
      // (3) the in-bucket cumulative sum runs as a window over (key, bucket):
      // keys×buckets parallel sort groups instead of one group per key.
      val nBuckets = df.sparkSession.sessionState.conf.numShufflePartitions
      val bounds = g.groupBy(col(keyCol)).agg(
        min(col(valCol)).as("__gq_lo"), max(col(valCol)).as("__gq_hi"))
      val vD = col(valCol).cast("double")
      val loD = col("__gq_lo").cast("double")
      val hiD = col("__gq_hi").cast("double")
      val bucketed = g
        .join(broadcast(bounds), keyCol)
        .withColumn(bkt,
          // non-numeric measures cast to NULL → every row lands in bucket 0,
          // which is exactly the pre-bucketing one-group-per-key behavior
          when(vD.isNull || hiD.isNull || loD.isNull || hiD === loD, lit(0))
            .otherwise(least(lit(nBuckets - 1),
              floor((vD - loD) / ((hiD - loD) / nBuckets)).cast("int"))))
      val subtotals = bucketed.groupBy(col(keyCol), col(bkt))
        .agg(sum(col(c)).as("__gq_sub"))
      val wOff = Window.partitionBy(col(keyCol)).orderBy(col(bkt))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wTot = Window.partitionBy(col(keyCol))
      // keys × buckets rows: window cost is trivial, and it yields both the
      // per-bucket prefix offset and the per-key total in one pass
      val offsets = subtotals
        .withColumn(off, coalesce(sum(col("__gq_sub")).over(wOff), lit(0L)))
        .withColumn(n, sum(col("__gq_sub")).over(wTot))
        .select(col(keyCol), col(bkt), col(off), col(n))
      val wInBucket = Window.partitionBy(col(keyCol), col(bkt)).orderBy(col(valCol))
      bucketed
        .join(broadcast(offsets), Seq(keyCol, bkt))
        .withColumn(cc, col(off) + sum(col(c)).over(wInBucket))
      }
    }
    cum
      .groupBy(col(keyCol))
      .agg(
        min(when(pick(ps.head, col(cc), col(n)), col(valCol)))
          .as(s"p${math.round(ps.head * 100)}"),
        ps.tail.map(p =>
          min(when(pick(p, col(cc), col(n)), col(valCol)))
            .as(s"p${math.round(p * 100)}")): _*)
  }

  /** Per-key equi-depth (equal-count) histogram WITHOUT a global sort: the
    * classic `ntile` form funnels every row of a key through one ordered
    * window partition, which is the same single-reducer ceiling
    * [[exactQuantilesByKey]] avoids — so the boundaries come from it
    * instead (exact quantiles at 1/n .. (n−1)/n), and rows are assigned by
    * comparing against the broadcast boundary frame: one row-local pass, no
    * ordered shuffle of the data. Bin b (1-based) holds rows with
    * boundary(b−1) < v ≤ boundary(b) — upper-inclusive, matching the
    * quantile definition (min v with cc ≥ ceil(p·n)), so bin populations
    * are exactly the rank ranges and every bin of a key with enough
    * distinct values holds ~n_rows/bins. Ties share a bin by construction.
    * Output: key, bin, n_rows, lo, hi (observed value range per bin).
    */
  def equiDepthHistogram(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      bins: Int
  ): DataFrame = {
    require(bins >= 2 && bins <= 100, s"bins must be in [2,100]: $bins")
    require(100 % bins == 0, s"bins must divide 100 so boundary names stay distinct: $bins")
    val ps = (1 until bins).map(_.toDouble / bins)
    val bb = exactQuantilesByKey(df, keyCol, valCol, ps)
    val bCols = ps.map(p => col(s"p${math.round(p * 100)}"))
    val rows = df.filter(col(valCol).isNotNull).select(col(keyCol), col(valCol))
    // bin = 1 + count of boundaries strictly below v — a codegen'd when-sum
    // over bins−1 broadcast columns, row-local after the broadcast join
    val binExpr = bCols.map(b => when(col(valCol) > b, 1).otherwise(0))
      .reduce(_ + _) + lit(1)
    rows
      .join(broadcast(bb), keyCol)
      .withColumn("bin", binExpr)
      .groupBy(col(keyCol), col("bin"))
      .agg(count(lit(1)).as("n_rows"), min(col(valCol)).as("lo"), max(col(valCol)).as("hi"))
  }

  /** Robust per-key outlier statistics via the median absolute deviation:
    * per key, med = exact median of `valCol`, mad = exact median of
    * |v − med|, and the count of rows with |v − med| > k·mad. Both medians
    * go through [[exactQuantilesByKey]] (distinct-pair collapse + cumulative
    * counts) — NO per-group value buffer, so hot keys can't OOM an executor
    * the way the built-in `percentile` aggregate can. The per-key stats
    * frame is group-count sized → broadcast onto the raw rows for the final
    * single-pass count. Three shuffles total, each over collapsed or
    * group-sized frames; NULL measures are excluded throughout (matching
    * the quantile contract).
    */
  def madOutliers(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      k: Double = 3.0
  ): DataFrame = {
    require(k > 0, s"outlier multiplier must be positive: $k")
    val rows = df.filter(col(valCol).isNotNull).select(col(keyCol), col(valCol))
    // med/stats are key-sized frames whose PLANS contain a full quantile
    // machinery each — without the checkpoint, the second quantile pass and
    // the final rollup re-execute the first pass once per branch of their
    // own plans (measured: the MAD pass ran 4.7 s vs 1.7 s for the median
    // pass on identical input volume, purely from lineage replay)
    val med = exactQuantilesByKey(rows, keyCol, valCol, Seq(0.5))
      .withColumnRenamed("p50", "med")
      .localCheckpoint(true)
    val dev = rows
      .join(broadcast(med), keyCol)
      .withColumn("__mad_dev", abs(col(valCol) - col("med")))
    val mad = exactQuantilesByKey(dev, keyCol, "__mad_dev", Seq(0.5))
      .withColumnRenamed("p50", "mad")
    val stats = med.join(mad, keyCol).localCheckpoint(true)
    rows
      .join(broadcast(stats), keyCol)
      .groupBy(col(keyCol))
      .agg(
        min(col("med")).as("med"),
        min(col("mad")).as("mad"),
        count(when(abs(col(valCol) - col("med")) > lit(k) * col("mad"), lit(1)))
          .as("n_outliers"))
  }

  /** Missingness-pattern profile: one row per NULL/non-NULL combination
    * of `cols` with its count — the data-quality fingerprint that tells
    * correlated missingness (sensor A and B always NULL together) from
    * independent gaps, which per-column null rates cannot. Single pass,
    * one shuffle of ≤ 2^|cols| partial rows per task (map-side combine
    * collapses to the pattern count before anything ships); the initial
    * select prunes the scan to exactly the profiled columns.
    */
  def nullPatternProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "nullPatternProfile needs at least one column")
    require(cols.size <= 20, s"2^${cols.size} patterns — cap the column set at 20")
    val flagged = df.select(cols.map(c => col(c).isNull.as(s"${c}_null")): _*)
    flagged
      .groupBy(cols.map(c => col(s"${c}_null")): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009): combine
    * several rankings of the same items into one score,
    * Σ_lists 1/(k + rank), with the reciprocal in EXACT fixed-point
    * integer division (1e-12 units) so the cross-list sum is
    * bit-identical under any summation order — the same determinism
    * device as [[Graph.linkPredictionRA]]. Items missing from a list
    * contribute nothing for it (the standard convention); `n_lists`
    * surfaces how many lists ranked each item so callers can tell a
    * consensus item from a single-list spike. Each input must carry
    * `keyCols` (item identity — INCLUDE the group/query column when
    * fusing per-group rankings) and `rankCol` (1-based). Ranking
    * construction is the caller's job, and the scale contract lives
    * there: build ranks with windows PARTITIONED by the group column
    * (or bounded top-N shortlists), never one global row_number. This
    * op itself is one union + one groupBy — no window, no sort.
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      keyCols: Seq[String],
      rankCol: String,
      k: Int = 60,
      scale: Long = 1000000000000L
  ): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 0, s"k must be >= 0: $k")
    val slim = rankings.map(r =>
      r.select((keyCols.map(col) :+ expr(s"$scale div ($k + $rankCol)").as("__rrf_recip")): _*))
    slim.reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_lists"), sum(col("__rrf_recip")).as("rrf_fixed"))
  }

  /** CDC/MERGE apply WITHOUT a transactional table format: fold a
    * change feed (whole-row payloads + version + op) into a base
    * snapshot. Latest-version-wins per key; op 'D' deletes the key,
    * anything else upserts its payload (an 'I' on an existing key and a
    * 'U' on a missing one both resolve to the payload — upsert
    * semantics, the standard untyped-MERGE behavior). `changes` must
    * carry every base column plus `versionCol`/`opCol`; `versionCol`
    * must be UNIQUE per key (pass a compound struct expression as a
    * derived column if the natural version ties) — a tie would make
    * latest-wins nondeterministic, which no partitioning trick can fix.
    *
    * Scale shape: the window sorts only the CHANGE FEED partitioned by
    * key (a delta, typically orders of magnitude under the base), and
    * the base pays one anti-join shuffle on its key — it is never
    * sorted, never windowed. AQE broadcasts the anti-join's right side
    * when the touched-key set is small, which is the common CDC case.
    */
  def applyCdc(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      opCol: String
  ): DataFrame = {
    require(keyCols.nonEmpty, "applyCdc needs at least one key column")
    val missing = (base.columns.toSet + versionCol + opCol) -- changes.columns.toSet
    require(missing.isEmpty, s"changes is missing columns: $missing")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol).desc)
    val latest = changes
      .withColumn("__cdc_rn", row_number().over(w))
      .filter(col("__cdc_rn") === 1)
    val survivors = latest
      .filter(upper(col(opCol)) =!= "D")
      .select(base.columns.map(col).toSeq: _*)
    base
      .join(latest.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(survivors)
  }

  /** Point-in-interval range join WITHOUT a nested-loop: Spark plans a pure
    * range predicate (no equi-key) as BroadcastNestedLoopJoin — O(points ×
    * intervals) work and an executor-OOM broadcast when neither side is
    * small. Standard bin rewrite instead (the Databricks "range join
    * optimization" shape): slice the domain into fixed-width bins, explode
    * each interval onto every bin it covers, tag each point with its single
    * containing bin, EQUI-join on the bin id, then apply the exact
    * `lo ≤ p < hi` residual. Each (point, interval) match shares exactly one
    * bin — the point's — so the join emits no duplicates and needs no
    * distinct. Cost: shuffle on bin ids ∝ points + intervals×(span/width),
    * never points×intervals.
    *
    * Domain is integral (cast timestamps to epoch seconds first): the
    * last covered bin is floor((hi−1)/w), which needs unit granularity.
    * Intervals are half-open [lo, hi); empty ones (hi ≤ lo) drop out, as
    * they match nothing. Pick `binWidth` near the TYPICAL interval span:
    * too wide puts many points per bin behind the residual filter, too
    * narrow explodes long intervals onto many bins (a p99-span cap plus a
    * second pass for outlier-long intervals is the production refinement).
    * The output carries all columns of both inputs — align names upstream;
    * inputs must not share lineage (self-joins need aliased plans).
    */
  def pointInRangeJoin(
      points: DataFrame,
      pointExpr: Column,
      intervals: DataFrame,
      loExpr: Column,
      hiExpr: Column,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    // floor over doubles: exact for |domain| < 2^53 (epoch seconds ≈ 2^31),
    // and correct for negative values where integer division truncates up
    def bin(c: Column): Column = floor(c.cast("double") / lit(binWidth.toDouble)).cast("long")
    val iv = intervals
      .filter(hiExpr > loExpr)
      // sequence() with start > stop generates DESCENDING values — the
      // hi > lo guard above is what makes this range well-formed
      .withColumn("__rj_bin", explode(sequence(bin(loExpr), bin(hiExpr - lit(1)))))
    points
      .withColumn("__rj_bin", bin(pointExpr))
      .join(iv, Seq("__rj_bin"))
      .filter(pointExpr >= loExpr && pointExpr < hiExpr)
      .drop("__rj_bin")
  }

  /** Expand an aggregated (key, date, metrics…) frame to each key's FULL
    * contiguous daily grid — gap days appear with NULL metrics (time-series
    * resampling step 1; compose with [[forwardFill]] for step 2). Per-key
    * span comes from one aggregate; the grid is `sequence(lo, hi)` exploded
    * (row-local) and LEFT-joined back on (key, date) — one shuffle, sized by
    * keys × span-days, never keys². Callers with unbounded spans should
    * clamp [lo, hi] upstream (a single immortal key otherwise generates
    * decades of grid rows).
    */
  def fillDateGrid(df: DataFrame, keyCol: String, dateCol: String): DataFrame = {
    val span = df
      .groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("__gf_lo"), max(col(dateCol)).as("__gf_hi"))
    span
      .select(col(keyCol), explode(sequence(col("__gf_lo"), col("__gf_hi"))).as(dateCol))
      .join(df, Seq(keyCol, dateCol), "left")
  }

  /** Forward fill (last-observation-carried-forward): replace NULLs in
    * `fillCols` with the latest non-NULL value per partition in `order`.
    * One streaming window pass — the stacked `last(ignoreNulls)` calls share
    * a window spec, so Catalyst collapses them into a single Window operator
    * (one sort-shuffle total). Leading NULLs (no prior observation) stay
    * NULL. `order` must be a total order for deterministic fills.
    */
  def forwardFill(
      df: DataFrame,
      partitionCols: Seq[Column],
      order: Seq[Column],
      fillCols: Seq[String]
  ): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(df)((d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Linear interpolation of NULL gaps: each NULL in `valueCol` is replaced
    * by the straight line between the nearest non-NULL observations on
    * either side along integral `posCol` (prev + (next−prev)·(t−tp)/(tn−tp));
    * a boundary NULL (one side missing) takes the available neighbor, a row
    * with neither stays NULL. The bracketing observations come from two
    * `last/first(ignoreNulls)` window passes sharing the partition sort, and
    * the arithmetic is one division of exact integers — bit-deterministic
    * cross-engine (the q143 single-division rule). `posCol` must be unique
    * per partition.
    */
  def linearInterpolate(
      df: DataFrame,
      partitionCols: Seq[Column],
      posCol: String,
      valueCol: String
  ): DataFrame = {
    val wb = Window.partitionBy(partitionCols: _*).orderBy(col(posCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wf = Window.partitionBy(partitionCols: _*).orderBy(col(posCol))
      .rowsBetween(1, Window.unboundedFollowing)
    val obs = when(col(valueCol).isNotNull,
      struct(col(posCol).cast("long").as("p"), col(valueCol).cast("long").as("v")))
    df
      .withColumn("__li_prev", last(obs, ignoreNulls = true).over(wb))
      .withColumn("__li_next", first(obs, ignoreNulls = true).over(wf))
      .withColumn(valueCol + "_interp",
        when(col(valueCol).isNotNull, col(valueCol).cast("double"))
          .when(col("__li_prev").isNull && col("__li_next").isNull, lit(null))
          .when(col("__li_prev").isNull, col("__li_next.v").cast("double"))
          .when(col("__li_next").isNull, col("__li_prev.v").cast("double"))
          .otherwise(col("__li_prev.v").cast("double") +
            ((col("__li_next.v") - col("__li_prev.v")) *
              (col(posCol).cast("long") - col("__li_prev.p"))).cast("double") /
              (col("__li_next.p") - col("__li_prev.p")).cast("double")))
      .drop("__li_prev", "__li_next")
  }

  /** Exact single change-point (largest mean shift) per key: over the
    * (orderCols)-sorted integral series, the split i maximizing
    * |mean(x₁..xᵢ) − mean(xᵢ₊₁..xₙ)|. The score's numerator and denominator
    * stay exact integers (|Sᵢ·(n−i) − (S−Sᵢ)·i| over i·(n−i) — prefix sums
    * only, no float accumulation); the one division to DOUBLE is correctly
    * rounded from the same integers on any engine, so the (score desc, i)
    * argmax is engine-stable. Three windows share the per-key sort.
    */
  def meanShiftSplit(
      df: DataFrame,
      keyCol: String,
      order: Seq[Column],
      valueCol: String
  ): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col(keyCol))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val scored = df
      .withColumn("__ms_i", row_number().over(w))
      .withColumn("__ms_s", sum(dec(col(valueCol))).over(run))
      .withColumn("__ms_n", count(lit(1)).over(all))
      .withColumn("__ms_t", sum(dec(col(valueCol))).over(all))
      .filter(col("__ms_i") < col("__ms_n"))
      .withColumn("__ms_p", abs(col("__ms_s") * dec(col("__ms_n") - col("__ms_i"))
        - (col("__ms_t") - col("__ms_s")) * dec(col("__ms_i"))))
      .withColumn("__ms_q", dec(col("__ms_i")) * dec(col("__ms_n") - col("__ms_i")))
      .withColumn("shift_score",
        col("__ms_p").cast("double") / col("__ms_q").cast("double"))
    scored
      .withColumn("__ms_r", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("shift_score").desc, col("__ms_i"))))
      .filter(col("__ms_r") === 1)
      .withColumn("mean_before",
        col("__ms_s").cast("double") / col("__ms_i").cast("double"))
      .withColumn("mean_after",
        (col("__ms_t") - col("__ms_s")).cast("double")
          / (col("__ms_n") - col("__ms_i")).cast("double"))
      .withColumn("split_pos", col("__ms_i"))
      .withColumn("n_obs", col("__ms_n"))
      .drop("__ms_i", "__ms_s", "__ms_n", "__ms_t", "__ms_p", "__ms_q", "__ms_r")
  }

  /** Snapshot diff — the table-versioning primitive behind CDC backfills and
    * data-regression checks: full-outer join two versions on the business
    * key and classify every row as added / removed / changed / unchanged
    * (changed = any compare column differs, null-safe). One shuffle on the
    * key; compare columns should be exact-typed (integer cents, not raw
    * doubles) so "changed" is engine-stable. Output keeps the key, the
    * change type, and old/new values of each compare column.
    */
  def snapshotDiff(
      prev: DataFrame,
      curr: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]
  ): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty, "need key and compare columns")
    // presence flags come from join-side membership sentinels, not value
    // nullness — a legitimately-NULL compare column must not read as absent
    val p = prev.select((keyCols ++ compareCols).map(col): _*)
      .toDF(keyCols ++ compareCols.map("old_" + _): _*)
      .withColumn("__sd_p", lit(1))
    val c = curr.select((keyCols ++ compareCols).map(col): _*)
      .toDF(keyCols ++ compareCols.map("new_" + _): _*)
      .withColumn("__sd_c", lit(1))
    val j = p.join(c, keyCols, "full_outer")
    val anyDiff = compareCols
      .map(cc => !(col("old_" + cc) <=> col("new_" + cc)))
      .reduce(_ || _)
    j.withColumn("change_type",
        when(col("__sd_p").isNull, lit("added"))
          .when(col("__sd_c").isNull, lit("removed"))
          .when(anyDiff, lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("__sd_p", "__sd_c")
  }

  /** Column profile — the data-quality report every ingest pipeline runs
    * first: per column, row/null/distinct counts and min/max (as strings, so
    * heterogeneous column types stack into one frame). ONE aggregation pass
    * computes every column's stats simultaneously (a per-column loop would
    * rescan the table N times); the only shuffle is the final aggregate.
    * `count_distinct` is exact — swap `approx_count_distinct` in at corpus
    * scale if the per-column distinct state (one HLL vs exact hash set per
    * column) matters more than exactness.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into (column, stats) — stack is row-local
    val stacked = cols.map(c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n_rows"),
        (col(s"__n_$c") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"), col(s"__mx_$c").as("max_value")))
    wide.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }

  /** Interval × interval OVERLAP join via the same bin rewrite as
    * [[pointInRangeJoin]] — the SCD2/validity-window companion. Both sides
    * explode onto their covered bins and equi-join on the bin id; the exact
    * `lo₁ < hi₂ ∧ lo₂ < hi₁` residual runs per bin. Overlapping intervals
    * share EVERY bin their intersection covers, so duplicates are
    * eliminated for free by bin OWNERSHIP instead of a distinct shuffle:
    * a pair is emitted only from the first bin both intervals inhabit,
    * `max(bin(lo₁), bin(lo₂))` — one integer equality, no second pass
    * (overlap guarantees that bin is inside both: lo₂ < hi₁ ⇒ bin(lo₂) ≤
    * bin(hi₁−1), and symmetrically). Intervals are half-open and EMPTY ones
    * ([x,x)) match nothing — note the naive `lo₁<hi₂ ∧ lo₂<hi₁` predicate
    * alone would match an empty interval lying strictly inside a non-empty
    * one; this operator follows empty-set algebra instead. Same binWidth
    * guidance and column-collision caveats as [[pointInRangeJoin]].
    */
  def intervalOverlapJoin(
      left: DataFrame,
      lo1: Column,
      hi1: Column,
      right: DataFrame,
      lo2: Column,
      hi2: Column,
      binWidth: Long
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    def bin(c: Column): Column = floor(c.cast("double") / lit(binWidth.toDouble)).cast("long")
    def expand(df: DataFrame, lo: Column, hi: Column): DataFrame = df
      .filter(hi > lo)
      .withColumn("__oj_bin", explode(sequence(bin(lo), bin(hi - lit(1)))))
    expand(left, lo1, hi1)
      .join(expand(right, lo2, hi2), Seq("__oj_bin"))
      .filter(lo1 < hi2 && lo2 < hi1)
      // ownership: the intersection's first bin — emitted exactly once
      .filter(col("__oj_bin") === greatest(bin(lo1), bin(lo2)))
      .drop("__oj_bin")
  }

  /** Merged-interval coverage (interval union) per key: collapse CLOSED
    * integer intervals [start, end] into maximal overlapping runs
    * ("islands") with one running-max-end window, and report per key the
    * island count, member count, and total covered length — the sweep-line
    * rewrite of "how much distinct time/space do these spans cover" that
    * replaces an O(n²) overlap self-join with one partitioned sort.
    * Touching intervals ([1,5] and [5,9]) merge: a new island starts only
    * when start exceeds the running max end STRICTLY. Both windows share
    * the (key, start, tie) sort, so Catalyst plans ONE shuffle + sort; no
    * task ever holds more than a streamed frame of one key. `tieCol` must
    * make (start, tie) unique per key for deterministic island numbering
    * (the aggregate is order-insensitive, but determinism keeps the
    * operator gateable). Inputs with end < start are kept as zero-length
    * contributors of their start point (callers should filter upstream if
    * they mean something else).
    */
  def intervalCoverage(
      df: DataFrame,
      keyCol: Column,
      startCol: Column,
      endCol: Column,
      tieCol: Column
  ): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(startCol, tieCol)
    val prevEnd = max(endCol).over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    df
      .withColumn("__ic_new",
        when(startCol > coalesce(prevEnd, lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("__ic_isl",
        sum(col("__ic_new")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(keyCol, col("__ic_isl"))
      .agg(min(startCol).as("__ic_s"), max(endCol).as("__ic_e"),
        count(lit(1)).as("__ic_n"))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_islands"), sum(col("__ic_n")).as("n_intervals"),
        sum(col("__ic_e") - col("__ic_s")).as("covered"))
  }

  /** Morton (Z-order) value: interleave the low `bits` bits of two
    * non-negative integer columns — the lakehouse multi-dimensional
    * clustering primitive. Sorting/range-partitioning a table by this value
    * gives BOTH dimensions locality, so per-file min/max ranges stay narrow
    * on both columns and a selective filter on EITHER prunes row groups —
    * single-column sorting leaves the second dimension's per-file range at
    * full width (pruning surface measured in `RelationalSpec`). Pure integer
    * bit arithmetic (32 codegen'd terms at bits=16), bit-exact on any
    * engine.
    */
  def zOrderValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31]: $bits")
    (0 until bits).map { i =>
      shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Deterministic weighted (Poisson/PPS-style) sampling: keep a row iff its
    * id-derived uniform u ∈ [0,1) is below `min(1, weight)`. The uniform is
    * the last 8 hex digits of md5(id-as-string) over 2³² — exactly
    * recomputable in any engine with md5 (the q25/q26 cross-engine hash
    * trick), so the sampled set is a pure function of (ids, weights):
    * reproducible across runs, engines, and partitionings, and row-local
    * (no shuffle, no RNG state). The per-row expected keep-rate is the
    * weight — the corpus-mixture resampling step that turns q73-style
    * mixture weights into an actual training corpus.
    */
  def deterministicWeightedSample(df: DataFrame, idCol: Column, weightCol: Column): DataFrame = {
    val u = conv(substring(md5(idCol.cast("string")), 25, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    df.filter(u < least(lit(1.0), weightCol))
  }

  /** Running per-key DISTINCT count — the window shape Spark (and ANSI SQL)
    * won't express directly (`COUNT(DISTINCT) OVER (... ORDER BY ...)` is
    * rejected) and the naive workaround (`size(collect_set() over w)`)
    * buffers the whole set per row. Classic two-window rewrite instead:
    * flag each (key, value)'s FIRST occurrence in the total order
    * (row_number over (key, value)), then running-sum the flags per key.
    * Two sort-shuffles, zero per-row set state — both windows stream.
    * `order` must include a unique tie-breaker for determinism.
    */
  def runningDistinct(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column,
      order: Seq[Column],
      resultCol: String = "running_distinct"
  ): DataFrame = {
    val firstW = Window.partitionBy(keyCol, valueCol).orderBy(order: _*)
    val runW = Window.partitionBy(keyCol).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__rd_first", when(row_number().over(firstW) === 1, 1L).otherwise(0L))
      .withColumn(resultCol, sum(col("__rd_first")).over(runW))
      .drop("__rd_first")
  }

  /** Gap-based sessionization: a new session starts when the time since the
    * previous event of the same key exceeds `gap`. Two windows over ONE
    * shuffle (same partitioning/ordering → single sort), classic
    * lag→flag→cumulative-sum. Output: input plus `session_id` (0-based per
    * key). Streaming twin: `ops.streaming.Sessionize` (session_window).
    */
  def sessionize(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      gapSeconds: Long,
      sessionCol: String = "session_id",
      // equal-timestamp rows otherwise have ARBITRARY lag order, which can
      // flip which of the tied rows closes the previous session — pass a
      // unique tie-break (event id) whenever per-session MEMBERSHIP (not
      // just per-key counts) is surfaced
      tieBreak: Seq[Column] = Nil
  ): DataFrame = {
    val byKeyTime = Window.partitionBy(keyCol).orderBy(tsCol +: tieBreak: _*)
    val prevTs = lag(tsCol, 1).over(byKeyTime)
    // exact integer microsecond comparison — a double epoch-seconds diff would
    // disagree with the oracle at the gap boundary on sub-second timestamps.
    // `>=` matches Structured Streaming's session_window semantics (an event
    // at exactly prev+gap starts a NEW session), keeping the batch and
    // streaming operators boundary-identical.
    val isNew = when(
      prevTs.isNull || unix_micros(tsCol) - unix_micros(prevTs) >= gapSeconds * 1000000L,
      lit(1)
    ).otherwise(lit(0))
    df.withColumn("_new_sess", isNew)
      .withColumn(
        sessionCol,
        sum(col("_new_sess")).over(
          byKeyTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1
      )
      .drop("_new_sess")
  }

  /** Bin (range) join against a small in-memory range dimension: value ∈
    * [lo, hi). Broadcast non-equi join — each probe row tests B bins, fine for
    * config-sized B at any fact scale (no shuffle of the fact side).
    */
  def binJoin(
      facts: DataFrame,
      valueCol: Column,
      bins: Seq[(String, Double, Double)]
  ): DataFrame = {
    val spark = facts.sparkSession
    import spark.implicits._
    val binDf = bins.toDF("bin_name", "bin_lo", "bin_hi")
    facts.join(
      broadcast(binDf),
      valueCol >= col("bin_lo") && valueCol < col("bin_hi"),
      "inner"
    )
  }

  /** Skew-safe equi-join: salt the skewed (left) side into `saltFactor`
    * sub-keys and replicate the right side once per salt, so a hot key's rows
    * spread over `saltFactor` reducers instead of one straggler task.
    *
    * This is the manual form for when AQE's skew-join split (enabled in the
    * session factory) can't kick in — e.g. a skewed aggregation feeding a
    * join, or a non-AQE environment. Right side grows ×saltFactor: use for
    * moderate-size right tables (or broadcast tiny ones and skip salting
    * entirely — broadcast joins can't skew).
    */
  def saltedEquiJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      saltFactor: Int,
      joinType: String = "inner"
  ): DataFrame = {
    // right/full outer would emit each unmatched right row saltFactor times
    // (the right side is replicated per salt) — reject rather than corrupt.
    require(
      Set("inner", "left", "left_outer", "left_semi", "leftsemi", "left_anti", "leftanti")
        .contains(joinType.toLowerCase),
      s"saltedEquiJoin supports inner/left/semi/anti joins, not $joinType")
    val salted = left.withColumn(
      "_salt",
      pmod(hash(col(keyCol), monotonically_increasing_id()), lit(saltFactor))
    )
    val replicated = right
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      .join(replicated, Seq(keyCol, "_salt"), joinType)
      .drop("_salt")
  }

  /** As-of join: for each left row, the single most recent right row of the
    * same key with `rightTs <= leftTs` (backward direction, the common case).
    *
    * Implementation: union-and-window, the scalable sort-merge form — tag both
    * sides, union, ONE shuffle on the key, one ordered pass carrying the last
    * seen right row forward (`last(..., ignoreNulls)` over an unbounded-
    * preceding window), then keep left rows. No per-key collect, no broadcast
    * of the big side, no O(L×R) non-equi join — this survives 100× data.
    *
    * Ordering within equal timestamps puts the right row first (side tag 0)
    * so a right row at exactly leftTs matches.
    *
    * @param leftValCols  columns of `left` to carry through (all output)
    * @param rightValCols columns of `right` to attach (nullable when no match)
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightValCols: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns
    // carry the right row as ONE struct so its fields stay consistent even
    // when individual right columns are NULL.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightValCols.map(c => right.schema(c)))

    val lShaped = left.select(
      (leftCols.map(col) ++ Seq(
        lit(null).cast(rStructType).as("_rrow"),
        lit(1).as("_side"),
        col(leftTsCol).as("_ts"),
        col(keyCol).as("_key"))): _*
    )
    // a NULL right timestamp would sort nulls-first and masquerade as the
    // "most recent" row for every early left row — drop such rows up front
    val rightClean = right.filter(col(rightTsCol).isNotNull)
    val rShaped = rightClean.select(
      (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++ Seq(
        struct(rightValCols.map(col): _*).as("_rrow"),
        lit(0).as("_side"),
        col(rightTsCol).as("_ts"),
        col(keyCol).as("_key"))): _*
    )

    val unioned = lShaped.unionByName(rShaped)
    // one partitioning, one sort: right rows sort before left at equal ts.
    val w = Window
      .partitionBy(col("_key"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        (leftCols.map(col) ++
          rightValCols.map(c => col(s"_asof.$c").as(c))): _*
      )
  }

  /** Range-bucket id for the global-rank machinery: ((v−lo)·B) DIV (hi−lo+1),
    * nondecreasing in v and a pure function of v, so equal values share a
    * bucket and bucket order is value order. Computed in DECIMAL(38,0): in
    * pure LONG arithmetic (v−lo)·B overflows once the value span exceeds
    * ~Long.Max/B (e.g. full-range 64-bit hashes bucketed 32 ways), silently
    * yielding negative bucket ids and wrong ranks. The decimal product is
    * ≤ 2^64·B ≪ 10^38 and the DIV quotient is < B, so the INT cast is safe;
    * the cost is one decimal mul/div per row, only inside this device.
    */
  private def rangeBucket(valCol: String, lo: String, hi: String, nBuckets: Int): Column =
    expr(
      s"CAST(((CAST(CAST($valCol AS BIGINT) AS DECIMAL(38,0)) - $lo) * $nBuckets)" +
        s" DIV (CAST($hi AS DECIMAL(38,0)) - $lo + 1) AS INT)")

  /** Exact global NTILE(k) WITHOUT the single-reducer unpartitioned window:
    * `ntile(k) over (order by value, tie)` funnels the whole frame through
    * ONE sort partition, so ranks come from a bucketed two-pass prefix sum
    * instead (the [[exactQuantilesByKey]] device, keyless): (1) range-bucket
    * the LONG sort value with integer arithmetic — ((v−lo)·B) DIV (hi−lo+1)
    * is nondecreasing in v and a pure function of v, so equal values share a
    * bucket and bucket order is value order; (2) per-bucket counts (a B-row
    * frame) give each bucket its global rank offset and the total n via a
    * window over the AGGREGATE; (3) row_number inside each bucket + offset
    * is the exact global rank — B parallel sort groups instead of one. The
    * tile index then follows the SQL-standard distribution (the first
    * n mod k tiles get ⌈n/k⌉ rows) computed with integer DIV only, so the
    * result is bit-identical to `ntile(k)` over the (value, tie) total
    * order on any engine.
    *
    * `valCol` must be integral (LONG-castable) and `(valCol, tieCol)` must
    * be unique for a deterministic order. NULL values are excluded — a
    * quantile score for NULL is meaningless; filter or impute upstream.
    * Degenerate all-equal-values input lands in one bucket (same caveat as
    * [[exactQuantilesByKey]]'s range bucketing).
    */
  def globalNtile(
      df: DataFrame,
      valCol: String,
      tieCol: String,
      k: Int,
      outCol: String = "tile"
  ): DataFrame = {
    require(k >= 1, s"ntile k must be >= 1: $k")
    val (b, cnt, off, rnk, n) = ("__gn_b", "__gn_c", "__gn_off", "__gn_rnk", "__gn_n")
    val rows = df.filter(col(valCol).isNotNull)
    val nBuckets = df.sparkSession.sessionState.conf.numShufflePartitions
    val bounds = rows.agg(
      min(col(valCol).cast("long")).as("__gn_lo"),
      max(col(valCol).cast("long")).as("__gn_hi"))
    // bucketed feeds TWO consumers (the offsets aggregate and the final
    // rank join); without a checkpoint each replays the full input lineage
    // — and since callers chain globalNtile (one call per metric), the
    // replays compound geometrically: 3 chained calls on a shared frame
    // measured 2.7 s at sf0.1 pre-checkpoint, ~1 s after
    val bucketed = rows
      .crossJoin(broadcast(bounds))
      .withColumn(b, rangeBucket(valCol, "__gn_lo", "__gn_hi", nBuckets))
      .drop("__gn_lo", "__gn_hi")
      .localCheckpoint()
    val offsets = bucketed.groupBy(col(b)).agg(count(lit(1)).as(cnt))
      .withColumn(off, coalesce(
        sum(col(cnt)).over(
          Window.orderBy(col(b)).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn(n, sum(col(cnt)).over(Window.partitionBy(lit(1))))
      .select(col(b), col(off), col(n))
    bucketed
      .join(broadcast(offsets), b)
      .withColumn(rnk, col(off) + row_number().over(
        Window.partitionBy(col(b)).orderBy(col(valCol).cast("long"), col(tieCol))))
      // SQL-standard ntile fill: sz = n DIV k, the first big = n % k tiles
      // take sz+1 rows; greatest(sz,1) guards the (n < k) case where the
      // ELSE branch is unreachable but still type-checked
      .withColumn(outCol, expr(
        s"""CAST(CASE
           |  WHEN $rnk <= ($n % $k) * (($n DIV $k) + 1)
           |    THEN ($rnk - 1) DIV (($n DIV $k) + 1) + 1
           |  ELSE ($n % $k)
           |    + ($rnk - 1 - ($n % $k) * (($n DIV $k) + 1)) DIV greatest($n DIV $k, 1L)
           |    + 1
           |END AS INT)""".stripMargin))
      .drop(b, off, rnk, n)
  }

  /** Exact GLOBAL row_number over the (valCol, tieCol) ascending total order
    * without a single-reducer window — the first half of [[globalNtile]]'s
    * device exposed on its own: range-bucket on the value, per-bucket
    * count offsets via a window over the nBuckets-row bucket table, global
    * rank = offset + within-bucket row_number. Any "rank the whole
    * population" consumer (Spearman ranks, percentile assignment, global
    * deciling beyond ntile) composes on this. Same caveats as globalNtile:
    * integral valCol, (valCol, tieCol) unique, NULL values excluded.
    */
  def globalRank(
      df: DataFrame,
      valCol: String,
      tieCol: String,
      outCol: String = "rank"
  ): DataFrame = {
    val (b, cnt, off) = ("__gr_b", "__gr_c", "__gr_off")
    val rows = df.filter(col(valCol).isNotNull)
    val nBuckets = df.sparkSession.sessionState.conf.numShufflePartitions
    val bounds = rows.agg(
      min(col(valCol).cast("long")).as("__gr_lo"),
      max(col(valCol).cast("long")).as("__gr_hi"))
    val bucketed = rows
      .crossJoin(broadcast(bounds))
      .withColumn(b, rangeBucket(valCol, "__gr_lo", "__gr_hi", nBuckets))
      .drop("__gr_lo", "__gr_hi")
      .localCheckpoint() // two consumers: offsets aggregate + rank join
    val offsets = bucketed.groupBy(col(b)).agg(count(lit(1)).as(cnt))
      .withColumn(off, coalesce(
        sum(col(cnt)).over(
          Window.orderBy(col(b)).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(b), col(off))
    bucketed
      .join(broadcast(offsets), b)
      .withColumn(outCol, col(off) + row_number().over(
        Window.partitionBy(col(b)).orderBy(col(valCol).cast("long"), col(tieCol))))
      .drop(b, off)
  }

  /** Exact GLOBAL running sum of `measureCol` over the (valCol, tieCol)
    * ascending total order — [[globalRank]]'s device with a measure instead
    * of a row count: range-bucket on the value, per-bucket measure subtotals
    * give each bucket its prefix offset via a window over the nBuckets-row
    * bucket table, in-bucket running sum + offset = the global prefix sum.
    * No single-reducer ordered window anywhere, so the frame may grow with
    * the fact table (vocabulary ranks under Heaps' law, distinct-score AUC
    * prefixes) without serializing.
    *
    * `includeCurrent = false` gives the STRICT prefix (sum over rows
    * strictly before this one in the total order). `rankCol`, when set,
    * also emits the global row_number over the same order from the same
    * shuffles — callers needing both (coverage curves) pay one device, not
    * two. Same caveats as [[globalRank]]: integral valCol, (valCol, tieCol)
    * unique, NULL values excluded; `measureCol` must be LONG-safe (sums
    * wider than 2^63 need the decimal accumulator + surfaceHiLo treatment).
    */
  def globalPrefixSum(
      df: DataFrame,
      valCol: String,
      tieCol: String,
      measureCol: String,
      cumCol: String,
      includeCurrent: Boolean = true,
      rankCol: Option[String] = None
  ): DataFrame = {
    val (b, off, roff) = ("__gp_b", "__gp_off", "__gp_roff")
    val rows = df.filter(col(valCol).isNotNull)
    val nBuckets = df.sparkSession.sessionState.conf.numShufflePartitions
    val bounds = rows.agg(
      min(col(valCol).cast("long")).as("__gp_lo"),
      max(col(valCol).cast("long")).as("__gp_hi"))
    val bucketed = rows
      .crossJoin(broadcast(bounds))
      .withColumn(b, rangeBucket(valCol, "__gp_lo", "__gp_hi", nBuckets))
      .drop("__gp_lo", "__gp_hi")
      .localCheckpoint() // two consumers: offsets aggregate + final join
    val wBefore = Window.orderBy(col(b)).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col(b))
      .agg(sum(col(measureCol).cast("long")).as("__gp_sub"),
        count(lit(1)).as("__gp_cnt"))
      .withColumn(off, coalesce(sum(col("__gp_sub")).over(wBefore), lit(0L)))
      .withColumn(roff, coalesce(sum(col("__gp_cnt")).over(wBefore), lit(0L)))
      .select(col(b), col(off), col(roff))
    val w = Window.partitionBy(col(b))
      .orderBy(col(valCol).cast("long"), col(tieCol))
    val frame = w.rowsBetween(Window.unboundedPreceding, if (includeCurrent) 0 else -1)
    val withCum = bucketed
      .join(broadcast(offsets), b)
      .withColumn(cumCol,
        col(off) + coalesce(sum(col(measureCol).cast("long")).over(frame), lit(0L)))
    rankCol.fold(withCum)(rc =>
      withCum.withColumn(rc, col(roff) + row_number().over(w)))
      .drop(b, off, roff)
  }

  /** Greedy maximum-coverage selection — the classic submodular data-
    * selection baseline (1 − 1/e guarantee): over (id, item) membership
    * pairs, pick `rounds` ids, each round the id covering the most
    * NOT-YET-COVERED items (ties → smallest id; an exhausted round — no id
    * with positive gain — contributes no row, and later rounds stay empty).
    * The corpus-subset selection move: "which K documents cover the most
    * vocabulary/n-grams/entities".
    *
    * Scale shape per round: one anti-join of the membership table against
    * the covered-item table (grows monotonically, bounded by the item
    * universe), one count aggregate, two scalar-sized argmax aggregates,
    * one broadcast of the single pick. The Scala loop iterates ROUNDS (a
    * constant); per-round frames are checkpointed so lineage doesn't
    * compound.
    */
  def greedyCoverage(
      pairs: DataFrame,
      idCol: String,
      itemCol: String,
      rounds: Int
  ): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val base = pairs
      .select(col(idCol).as("__gc_id"), col(itemCol).as("__gc_it"))
      .filter(col("__gc_it").isNotNull)
      .distinct()
      .localCheckpoint() // every round's gain scan reads it
    var covered = base.select(col("__gc_it")).limit(0).localCheckpoint()
    val picks = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (r <- 1 to rounds) {
      val gains = base.join(covered, Seq("__gc_it"), "left_anti")
        .groupBy(col("__gc_id")).agg(count(lit(1)).as("gain"))
        .localCheckpoint() // two consumers: the max scalar + the argmax filter
      val mx = gains.agg(max(col("gain")).as("mx"))
      val best = gains.join(broadcast(mx), col("gain") === col("mx"))
        .agg(min(col("__gc_id")).as("pick"), max(col("gain")).as("bg"))
        .where(col("pick").isNotNull)
        .localCheckpoint() // two consumers: the pick row + the coverage update
      picks += best.select(lit(r).as("round"), col("pick").as("picked_id"),
        col("bg").as("gain"))
      covered = covered
        .unionByName(base.join(broadcast(best), col("__gc_id") === col("pick"))
          .select(col("__gc_it")))
        .distinct()
        .localCheckpoint()
    }
    picks.reduce(_ unionByName _)
  }

  /** Exact 2-D skyline (Pareto frontier): rows not dominated by any other —
    * q dominates p iff q minimizes `xCol` no worse AND maximizes `yCol` no
    * worse, strictly better in at least one. Duplicate (x, y) points carry no
    * strict edge, so all copies survive (the SQL `NOT EXISTS` semantics).
    *
    * Distributed form of the classic sort-scan: a row is dominated through
    * the strictly-smaller-x channel iff max(y) over x' < x reaches its y,
    * and through the equal-x channel iff some equal-x row has larger y. The
    * global "max y over strictly smaller x" decomposes exactly like
    * [[globalNtile]]'s rank: range-bucket on x (monotone, so earlier bucket
    * ⇒ strictly smaller x), per-bucket running max via a range-frame window
    * (range, not rows — equal x must not feed the strict channel), plus a
    * prefix-max over the nBuckets-row bucket table joined back broadcast.
    * No global single-partition window anywhere; the only full-width
    * shuffles are the bucket window and the equal-x groupBy.
    *
    * `xCol`/`yCol` must be LONG-castable; NULL in either drops the row
    * (dominance is undefined on NULL).
    */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val (b, pfx, wmax, xmax) = ("__sk_b", "__sk_pfx", "__sk_wmax", "__sk_xmax")
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val nBuckets = df.sparkSession.sessionState.conf.numShufflePartitions
    val bounds = rows.agg(
      min(col(xCol).cast("long")).as("__sk_lo"),
      max(col(xCol).cast("long")).as("__sk_hi"))
    // two consumers (bucket maxima + final window) — checkpoint the bucketed
    // frame so the scan lineage runs once (the globalNtile lesson)
    val bucketed = rows
      .crossJoin(broadcast(bounds))
      .withColumn(b, rangeBucket(xCol, "__sk_lo", "__sk_hi", nBuckets))
      .drop("__sk_lo", "__sk_hi")
      .localCheckpoint()
    // prefix-max of per-bucket y maxima over STRICTLY earlier buckets; the
    // window runs over an nBuckets-row frame only
    val prefixes = bucketed.groupBy(col(b))
      .agg(max(col(yCol).cast("long")).as("__sk_bm"))
      .withColumn(pfx, max(col("__sk_bm")).over(
        Window.orderBy(col(b)).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(b), col(pfx))
    val wSmaller = Window.partitionBy(col(b)).orderBy(col(xCol).cast("long"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEqualX = Window.partitionBy(col(xCol).cast("long"))
    bucketed
      .join(broadcast(prefixes), Seq(b))
      .withColumn(wmax, greatest(
        coalesce(max(col(yCol).cast("long")).over(wSmaller), lit(Long.MinValue)),
        coalesce(col(pfx), lit(Long.MinValue))))
      .withColumn(xmax, max(col(yCol).cast("long")).over(wEqualX))
      .filter(col(wmax) < col(yCol).cast("long") &&
        col(xmax) === col(yCol).cast("long"))
      .drop(b, pfx, wmax, xmax)
  }

  /** EXACT isotonic regression (PAVA) over bucket-aggregated rates — the
    * probability-calibration fit (score bucket → monotone nondecreasing
    * hit rate, Zadrozny & Elkan KDD'02's isotonic arm). Instead of the
    * sequential pool-adjacent-violators sweep — order-dependent and
    * unparallelizable — this computes the CLOSED FORM of the weighted L2
    * isotonic fit (Barlow et al. 1972):
    *
    *   fit(i) = max_{j ≤ i} min_{k ≥ i} mean(y over buckets j..k)
    *
    * which is embarrassingly parallel over the O(B³) (i, j, k) triples of
    * the BUCKET dictionary — B is dictionary-sized (a score histogram),
    * never corpus-sized, so the cube is thousands of rows while the
    * corpus-sized work remains one exact-integer groupBy. Interval means
    * come from integer prefix sums (one double division per interval —
    * deterministic IEEE, no sum-order wobble), min/max over doubles are
    * order-free, so the fit is engine-stable and hash-gateable.
    *
    * Input: one row per observation with an integer-ish bucket column and
    * a 0/1 hit column. Output per bucket: n, hits, rate_raw, rate_iso
    * (the monotone calibrated rate).
    */
  def isotonicRates(df: DataFrame, bucketCol: String, hitCol: String): DataFrame = {
    val b = df
      .filter(col(bucketCol).isNotNull)
      .groupBy(col(bucketCol).cast("long").as("bucket"))
      .agg(sum(col(hitCol).cast("long")).as("hits"), count(lit(1)).as("n"))
      .localCheckpoint() // dictionary-sized; feeds prefix, intervals, and output
    val pre = b
      .withColumn("cy", sum(col("hits")).over(
        Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cw", sum(col("n")).over(
        Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("bucket"), col("cy"), col("cw"),
        (col("cy") - col("hits")).as("py"), (col("cw") - col("n")).as("pw"))
    // interval means over the dictionary cross-square (j ≤ k)
    val iv = pre.select(col("bucket").as("bj"), col("py"), col("pw"))
      .join(broadcast(pre.select(col("bucket").as("bk"), col("cy"), col("cw"))),
        col("bj") <= col("bk"))
      .select(col("bj"), col("bk"),
        ((col("cy") - col("py")).cast("double") /
          (col("cw") - col("pw")).cast("double")).as("m"))
    val fit = iv
      .join(broadcast(b.select(col("bucket").as("bi"))),
        col("bj") <= col("bi") && col("bk") >= col("bi"))
      .groupBy(col("bi"), col("bj")).agg(min(col("m")).as("inner"))
      .groupBy(col("bi")).agg(max(col("inner")).as("rate_iso"))
    b.join(fit, col("bucket") === col("bi"))
      .select(col("bucket"), col("n"), col("hits"),
        (col("hits").cast("double") / col("n").cast("double")).as("rate_raw"),
        col("rate_iso"))
  }
}
