package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log analytics over an append-only `(user, ts, type)` stream — the
  * telemetry/product-analytics companions to the entregas batch pipeline
  * (reference reads one CSV of delivery events per country,
  * `notebooks/ETL_Entregas_Base.ipynb:477-480`; these are the query shapes a
  * generalized event table needs at fleet scale).
  *
  * All three operators are pure DataFrame compositions: every grouping keys
  * on (a derivative of) the user id, so at 100 TB they shuffle once per
  * logical step on a key whose per-group size is bounded by one user's
  * activity — never by corpus size.
  */
object Events {

  /** Rolling W-day distinct active users per day (the DAU/WAU/MAU shape).
    * `COUNT(DISTINCT) OVER (RANGE 6 PRECEDING)` is illegal SQL, and the
    * collect_set-window workaround buffers a user set per day — this is the
    * explode rewrite instead: each distinct (user, day) CONTRIBUTES to the W
    * target days [day, day+W−1] via a row-local sequence, then one distinct
    * aggregation per target day. Linear in user-days × W, no per-row set
    * state; output days are clamped to the observed [min, max] span (leading
    * days would otherwise report partial windows).
    */
  def rollingActiveUsers(
      events: DataFrame,
      userCol: Column,
      tsCol: Column,
      windowDays: Int
  ): DataFrame = {
    require(windowDays >= 1 && windowDays <= 366, s"windowDays must be in [1,366]: $windowDays")
    val ud = events.select(userCol.as("user_id"), to_date(tsCol).as("day")).distinct()
    val span = ud.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    ud.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), windowDays - 1))).as("day"))
      .join(broadcast(span), col("day").between(col("lo"), col("hi")))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  /** Cohort-retention matrix: users are cohorted by their first active DAY;
    * output is one row per (cohort_day, day_offset) with the number of
    * cohort members active that many days after their first day.
    *
    * Shape: (1) collapse the raw log to distinct (user, day) — the only
    * corpus-sized shuffle, and it is also the aggregation that makes
    * `count(*)` below equal `count(distinct user)`; (2) a per-user window
    * min attaches the cohort day with ONE shuffle on user_id (a join
    * against a separate min-aggregate would shuffle twice and replay the
    * activity subtree); (3) the final groupBy is calendar²-sized.
    * Per-user window group size is bounded by active days per user — a
    * calendar bound, not a data bound.
    */
  def retentionCohorts(events: DataFrame, userCol: Column, tsCol: Column): DataFrame = {
    val activity = events.select(userCol.as("user_id"), to_date(tsCol).as("day")).distinct()
    val byUser = Window.partitionBy(col("user_id"))
    activity
      .withColumn("cohort_day", min(col("day")).over(byUser))
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Windowed event dedup: within each (user, type, fixed time bucket) keep
    * only the FIRST event (earliest ts, event id as the total-order
    * tie-breaker) — the standard at-least-once-telemetry collapse. The
    * bucket identity is the epoch-microsecond bucket START computed with
    * pure integer ops (`us - us % N`) — no float division anywhere, so the
    * grouping is exact at any timestamp magnitude and identical to the
    * DuckDB oracle's `//` bucketing. One shuffle; per-group size is one
    * user's events in one bucket.
    */
  def dedupeEvents(
      events: DataFrame,
      userCol: Column,
      typeCol: Column,
      tsCol: Column,
      idCol: Column,
      bucketSeconds: Long
  ): DataFrame = {
    val us = unix_micros(tsCol)
    val bucket = us - pmod(us, lit(bucketSeconds * 1000000L))
    val w = Window.partitionBy(userCol, typeCol, bucket).orderBy(tsCol, idCol)
    events
      .withColumn("__ed_rn", row_number().over(w))
      .filter(col("__ed_rn") === 1)
      .drop("__ed_rn")
  }

  /** First-order transition counts of the per-user event sequence (the
    * Markov-chain view of session flow): for consecutive events of the same
    * user in (ts, id) total order, count each (prev_type → next_type) pair.
    * One shuffle on user_id (group size = one user's history), then a
    * types²-sized rollup.
    */
  def transitionCounts(
      events: DataFrame,
      userCol: Column,
      typeCol: Column,
      tsCol: Column,
      idCol: Column
  ): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("eid"))
    events
      .select(userCol.as("user_id"), typeCol.as("next_type"), tsCol.as("ts"), idCol.as("eid"))
      .withColumn("prev_type", lag(col("next_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Strict sequential funnel: for ordered steps s1..sn, a user counts at
    * level i iff they performed s1 then (strictly later) s2 … then si.
    * Output: one row per step — (step "<i>_<name>", n_users).
    *
    * Each level is the conditional min-timestamp of the next step AFTER the
    * previous level's timestamp: a filter + join + min-aggregate per level,
    * all keyed on user_id, each intermediate at most distinct-user sized.
    * Levels are localCheckpointed so level i's (tiny) frame feeds both its
    * own count and level i+1 without replaying the whole chain per branch.
    */
  def funnel(
      events: DataFrame,
      userCol: Column,
      typeCol: Column,
      tsCol: Column,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(userCol.as("user_id"), typeCol.as("etype"), tsCol.as("ts"))
    var level = base
      .filter(col("etype") === steps.head)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t"))
      .localCheckpoint()
    var out = level.agg(count(lit(1)).as("n_users"))
      .select(lit(s"1_${steps.head}").as("step"), col("n_users"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      level = base
        .filter(col("etype") === st)
        .join(level, "user_id")
        .filter(col("ts") > col("t"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("t"))
        .localCheckpoint()
      out = out.unionAll(
        level.agg(count(lit(1)).as("n_users"))
          .select(lit(s"${i + 1}_$st").as("step"), col("n_users")))
    }
    out
  }

  /** EXACT matrix profile over each user's daily activity series (the UCR
    * time-series motif primitive, Yeh et al. ICDM'16): for every user, the
    * pair of non-overlapping `window`-day subsequences of their
    * events-per-day series with minimum squared L2 distance — "this user's
    * most repeated weekly pattern". Distances are exact integers on exact
    * counts, argmin ties break (dist, i, j) lexicographically, so the
    * motif pair is a pure function of the data and hash-gates against a
    * pair-expanded SQL oracle. The trivial-match exclusion zone
    * (j ≥ i + exclusion) is the standard half-window rule.
    *
    * Scale shape: the series length is CALENDAR-bounded (≈ the corpus's
    * day span), so the per-user O(span²·window) pair scan is a constant
    * ×|users| — the corpus-sized work is one (user, day) count; everything
    * after groups per user. Spark-side the pair expansion is two chained
    * sequence-explodes (empty sequences drop users whose span can't fit
    * two windows) and the distance an integer fold — no joins at all
    * after the daily aggregate.
    */
  def matrixProfileDaily(events: DataFrame, userCol: Column, tsCol: Column,
                         window: Int = 7, exclusion: Int = 4): DataFrame = {
    require(window >= 2 && window <= 64, s"window must be in [2,64]: $window")
    require(exclusion >= 1, s"exclusion must be positive: $exclusion")
    val ev = events.select(userCol.as("user_id"), to_date(tsCol).as("day"))
    val bounds = ev.agg(min(col("day")).as("d0"),
      datediff(max(col("day")), min(col("day"))).as("sp"))
    val daily = ev.crossJoin(broadcast(bounds))
      .select(col("user_id"), datediff(col("day"), col("d0")).as("di"), col("sp"))
      .groupBy(col("user_id"), col("sp"), col("di")).agg(count(lit(1)).as("c"))
    val series = daily
      .groupBy(col("user_id"), col("sp"))
      .agg(map_from_entries(collect_list(struct(col("di"), col("c")))).as("m"))
      .select(col("user_id"),
        transform(sequence(lit(0), col("sp")),
          d => coalesce(element_at(col("m"), d), lit(0L))).as("cnts"),
        (col("sp") + 1).as("len"))
    val pairs = series
      .select(col("user_id"), col("cnts"),
        explode(when(col("len") >= window + exclusion,
          sequence(lit(0), col("len") - window)).otherwise(array().cast("array<int>")))
          .as("i"), col("len"))
      .select(col("user_id"), col("cnts"), col("i"),
        explode(when(col("i") + exclusion <= col("len") - window,
          sequence(col("i") + exclusion, col("len") - window))
          .otherwise(array().cast("array<int>"))).as("j"))
      .withColumn("dist", aggregate(sequence(lit(0), lit(window - 1)), lit(0L),
        (acc, t) => {
          val d = element_at(col("cnts"), col("i") + t + 1) -
            element_at(col("cnts"), col("j") + t + 1)
          acc + d * d
        }))
    pairs.groupBy(col("user_id"))
      .agg(min_by(struct(col("i"), col("j"), col("dist")),
        struct(col("dist"), col("i"), col("j"))).as("m"))
      .select(col("user_id"), col("m.i").as("motif_a"), col("m.j").as("motif_b"),
        col("m.dist").as("d2"))
  }

  /** EXACT Dynamic Time Warping self-drift (Sakoe–Chiba '78 applied as a
    * distribution-shift probe): per user, the L1 DTW distance between the
    * FIRST and SECOND halves of their activity series — `frames` PAA
    * frames of `frameDays`-day exact event counts, split half/half. DTW
    * absorbs phase shifts that a pointwise L1 would misread as drift
    * (a user whose Tuesday spike moved to Wednesday warps to cost ~0),
    * which is exactly why it, not Euclidean, is the standard series
    * distance. Costs are |Σcount − Σcount| integers, so the full DP table
    * is exact and the unrolled anti-diagonal oracle matches
    * digit-for-digit.
    *
    * Scale shape: the corpus-sized work is one (user, frame) count; the
    * DP is (frames/2)² cells UNROLLED AS COLUMNS over the per-user pivot
    * row — no joins, no explosion, whole-stage codegen keeps all 25 cells
    * in one projection chain. Frames are calendar-bounded constants, so
    * the per-user cost is O(1) at any corpus size.
    */
  def dtwHalfDrift(events: DataFrame, userCol: Column, tsCol: Column,
                   frameDays: Int = 3, frames: Int = 10): DataFrame = {
    require(frames >= 4 && frames % 2 == 0, s"frames must be even >= 4: $frames")
    require(frameDays >= 1, s"frameDays must be positive: $frameDays")
    val half = frames / 2
    val ev = events.select(userCol.as("user_id"), to_date(tsCol).as("day"))
    val b = ev.agg(min(col("day")).as("d0"))
    val paa = ev.crossJoin(broadcast(b))
      .select(col("user_id"), datediff(col("day"), col("d0")).as("di"))
      .filter(col("di").between(0, frameDays * frames - 1))
      .select(col("user_id"), expr(s"di DIV $frameDays").as("w"))
      .groupBy(col("user_id"), col("w")).agg(count(lit(1)).as("c"))
    val aggs = (0 until frames).map(k =>
      sum(when(col("w") === k, col("c")).otherwise(0L)).as(s"f$k"))
    var df = ev.select(col("user_id")).distinct()
      .join(paa, Seq("user_id"), "left")
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
    def cost(i: Int, j: Int) = abs(col(s"f${i - 1}") - col(s"f${half + j - 1}"))
    // anti-diagonal order: every cell's three predecessors are already
    // materialized columns when the cell is defined
    for (d <- 2 to 2 * half; i <- 1 to half; j = d - i; if j >= 1 && j <= half) {
      val c = cost(i, j)
      val v =
        if (i == 1 && j == 1) c
        else if (i == 1) c + col(s"d_1_${j - 1}")
        else if (j == 1) c + col(s"d_${i - 1}_1")
        else c + least(col(s"d_${i - 1}_$j"), col(s"d_${i}_${j - 1}"),
          col(s"d_${i - 1}_${j - 1}"))
      df = df.withColumn(s"d_${i}_$j", v)
    }
    df.select(col("user_id"), col(s"d_${half}_$half").as("dtw"))
  }
}
