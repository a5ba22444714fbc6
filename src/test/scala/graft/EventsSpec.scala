package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Events, Relational}

class EventsSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("retentionCohorts: cohort day is each user's first day; counts are distinct users") {
    import spark.implicits._
    val ev = Seq(
      // user 1: active day 1 (twice) and day 3
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 23:59:59")),
      (1L, ts("2024-01-03 00:00:00")),
      // user 2: same cohort as user 1, active day 1 only
      (2L, ts("2024-01-01 05:00:00")),
      // user 3: later cohort, active its day 0 and day 1
      (3L, ts("2024-01-02 12:00:00")), (3L, ts("2024-01-03 12:00:00"))
    ).toDF("user_id", "ts")
    val got = Events.retentionCohorts(ev, col("user_id"), col("ts"))
      .orderBy(col("cohort_day"), col("day_offset"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0L, 2L), // users 1+2 on their first day
      ("2024-01-01", 2L, 1L), // user 1 back two days later
      ("2024-01-02", 0L, 1L),
      ("2024-01-02", 1L, 1L)
    ))
  }

  test("dedupeEvents keeps the earliest event per (user, type, bucket)") {
    import spark.implicits._
    val ev = Seq(
      // same user/type, 3 events inside one 5-min bucket → keep earliest id 10
      (10L, 1L, "click", ts("2024-01-01 00:00:30")),
      (11L, 1L, "click", ts("2024-01-01 00:01:30")),
      (12L, 1L, "click", ts("2024-01-01 00:04:59")),
      // same user/type but next bucket → kept
      (13L, 1L, "click", ts("2024-01-01 00:05:00")),
      // same bucket, different type → kept
      (14L, 1L, "view", ts("2024-01-01 00:00:45")),
      // same bucket+type, different user → kept
      (15L, 2L, "click", ts("2024-01-01 00:02:00")),
      // identical ts as id 10: event_id tie-break keeps 10, drops 16
      (16L, 1L, "click", ts("2024-01-01 00:00:30"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val kept = Events
      .dedupeEvents(ev, col("user_id"), col("event_type"), col("ts"), col("event_id"), 300)
      .select("event_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(10L, 13L, 14L, 15L))
  }

  test("funnel counts strictly-ordered step sequences") {
    import spark.implicits._
    val ev = Seq(
      // user 1 completes view → click → purchase in order
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 00:10:00")),
      (1L, "purchase", ts("2024-01-01 00:20:00")),
      // user 2: clicked BEFORE viewing, never re-clicked → stops at level 1
      (2L, "click", ts("2024-01-01 00:00:00")),
      (2L, "view", ts("2024-01-01 00:05:00")),
      (2L, "purchase", ts("2024-01-01 00:10:00")),
      // user 3: view then click, no purchase → level 2
      (3L, "view", ts("2024-01-01 00:00:00")),
      (3L, "click", ts("2024-01-01 00:01:00")),
      // user 4: purchase only → not even level 1
      (4L, "purchase", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Events
      .funnel(ev, col("user_id"), col("event_type"), col("ts"), Seq("view", "click", "purchase"))
      .orderBy(col("step"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("1_view", 3L), ("2_click", 2L), ("3_purchase", 1L)))
  }

  test("funnel: same-timestamp next step does NOT count (strict ordering)") {
    import spark.implicits._
    val ev = Seq(
      (1L, "view", ts("2024-01-01 00:00:00")),
      (1L, "click", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Events
      .funnel(ev, col("user_id"), col("event_type"), col("ts"), Seq("view", "click"))
      .orderBy(col("step"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("1_view", 1L), ("2_click", 0L)))
  }

  test("dupGramStats: duplicated-gram fraction against a hand-computed corpus") {
    import spark.implicits._
    val docs = Seq(
      // docs 1 and 2 share the gram "a b c"; doc 1 has one extra distinct gram
      (1L, "a b c d"), // grams: "a b c", "b c d"
      (2L, "x a b c"), // grams: "x a b", "a b c"
      (3L, "p q r"), // one gram, unshared
      (4L, "too short") // < 3 tokens → no grams → absent from output
    ).toDF("doc_id", "text")
    val got = Dedup.dupGramStats(docs, col("doc_id"), col("text"), n = 3)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 0.5),
      (2L, 2L, 1L, 0.5),
      (3L, 1L, 0L, 0.0)
    ))
  }

  test("dupGramStats counts within-doc repeats once (distinct grams per doc)") {
    import spark.implicits._
    // "a b a b a b" has 3-grams [a b a, b a b, a b a, b a b] → 2 distinct,
    // none shared with any other doc
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val got = Dedup.dupGramStats(docs, col("doc_id"), col("text"), n = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((2L, 0L)))
  }

  test("madOutliers matches hand-computed median/MAD and outlier count") {
    import spark.implicits._
    // key "a": values 1..5 plus a wild 100 → med of {1,2,3,4,5,100}: cumulative
    // count reaches ceil(0.5·6)=3 at value 3. |v-3| = {2,1,0,1,2,97} → mad = 1
    // (cc reaches 3 at 1). Outliers: |v-3| > 3·1 → only 100.
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 5.0), ("a", 100.0),
      ("b", 7.0), ("b", 7.0)).toDF("k", "v")
    val got = Relational.madOutliers(df, "k", "v", k = 3.0)
      .orderBy(col("k"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq(("a", 3.0, 1.0, 1L), ("b", 7.0, 0.0, 0L)))
  }

  test("runningDistinct counts each (key,value) once at first occurrence") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 00:00:00")),
      (2L, 1L, "b", ts("2024-01-01 00:01:00")),
      (3L, 1L, "a", ts("2024-01-01 00:02:00")), // repeat: count stays 2
      (4L, 1L, "c", ts("2024-01-01 00:03:00")),
      (5L, 2L, "a", ts("2024-01-01 00:00:30")) // other key independent
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Relational
      .runningDistinct(ev, col("user_id"), col("event_type"), Seq(col("ts"), col("event_id")))
      .select("event_id", "running_distinct").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 3L), (5L, 1L)))
  }

  test("rollingActiveUsers: window membership, dedup within window, span clamp") {
    import spark.implicits._
    // user 1 active day 1 (twice: must count once) and day 3; user 2 active
    // day 5 only. 3-day windows. Span = [day1, day5].
    val ev = Seq(
      (1L, ts("2024-01-01 08:00:00")), (1L, ts("2024-01-01 20:00:00")),
      (1L, ts("2024-01-03 12:00:00")),
      (2L, ts("2024-01-05 09:00:00"))
    ).toDF("user_id", "ts")
    val got = graft.ops.Events
      .rollingActiveUsers(ev, col("user_id"), col("ts"), windowDays = 3)
      .orderBy(col("day"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    // day1: u1. day2: u1 (from day1). day3: u1 (days 1+3, once). day4: u1.
    // day5: u1 (from day3) + u2. Days 6-7 clamped away (beyond max day).
    assert(got.toSeq == Seq(
      ("2024-01-01", 1L), ("2024-01-02", 1L), ("2024-01-03", 1L),
      ("2024-01-04", 1L), ("2024-01-05", 2L)), s"got ${got.toSeq}")
  }

  test("fillDateGrid + forwardFill: gaps appear, fills carry, leading nulls stay") {
    import spark.implicits._
    import java.sql.Date
    // key "a": observations on day 1 and day 4 (gap of 2 days, filled from
    // day 1's value); key "b": FIRST day's metric is NULL (leading null must
    // survive the fill), then a value on day 2
    val daily = Seq(
      ("a", Date.valueOf("2024-03-01"), Some(10.0)),
      ("a", Date.valueOf("2024-03-04"), Some(40.0)),
      ("b", Date.valueOf("2024-03-02"), None),
      ("b", Date.valueOf("2024-03-03"), Some(7.0))
    ).toDF("k", "day", "m")
    val grid = Relational.fillDateGrid(daily, "k", "day")
    assert(grid.count() == 6, "a: 4 grid days, b: 2 grid days")
    val filled = Relational
      .forwardFill(grid, Seq(col("k")), Seq(col("day")), Seq("m"))
      .orderBy(col("k"), col("day"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(filled.toSeq == Seq(
      ("a", "2024-03-01", Some(10.0)),
      ("a", "2024-03-02", Some(10.0)), // gap day materialized, filled
      ("a", "2024-03-03", Some(10.0)),
      ("a", "2024-03-04", Some(40.0)), // real observation overrides carry
      ("b", "2024-03-02", None),       // leading null: nothing to carry
      ("b", "2024-03-03", Some(7.0))
    ), s"got ${filled.toSeq}")
  }

  test("transitionCounts: consecutive same-user pairs in (ts,id) order") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "a", ts("2024-01-01 00:00:00")),
      (2L, 1L, "b", ts("2024-01-01 00:01:00")),
      (3L, 1L, "a", ts("2024-01-01 00:02:00")), // a->b, b->a
      (4L, 2L, "a", ts("2024-01-01 00:00:00")),
      (5L, 2L, "a", ts("2024-01-01 00:00:00")) // tie: id order -> a->a once
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = graft.ops.Events
      .transitionCounts(ev, col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .orderBy(col("prev_type"), col("next_type"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "a", 1L), ("a", "b", 1L), ("b", "a", 1L)))
  }

  test("deterministicWeightedSample: weight 1 keeps all, 0 keeps none, stable subset") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, "x")).toDF("id", "tag")
    assert(Relational.deterministicWeightedSample(df, col("id"), lit(1.0)).count() == 1000)
    assert(Relational.deterministicWeightedSample(df, col("id"), lit(0.0)).count() == 0)
    val half1 = Relational.deterministicWeightedSample(df, col("id"), lit(0.5))
      .select("id").as[Long].collect().toSet
    val half2 = Relational.deterministicWeightedSample(df.repartition(7), col("id"), lit(0.5))
      .select("id").as[Long].collect().toSet
    assert(half1 == half2, "sample must be partitioning-independent")
    // md5-uniform: expect ~500 at weight 0.5, binomial 3-sigma band
    assert(math.abs(half1.size - 500) < 50, s"got ${half1.size}")
  }

  test("madOutliers ignores NULL measures") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)), ("a", None))
      .toDF("k", "v")
    val got = Relational.madOutliers(df, "k", "v")
      .collect().map(r => (r.getDouble(1), r.getLong(3)))
    assert(got.toSeq == Seq((2.0, 0L)))
  }

  test("dtwHalfDrift: identical halves warp to 0; anti-phase halves pay the DP cost") {
    import spark.implicits._
    // frames=4 x frameDays=1 => halves are 2-frame series over days 0..3.
    // user 1: (3,1) vs (3,1)  -> DTW 0 (identical)
    // user 2: (2,0) vs (0,2)  -> d11=2 d12=2 d21=4 d22=|0-2|+min(2,4,2)=4
    // user 3: no events inside the window -> (0,0) vs (0,0) -> 0
    val rows =
      Seq.fill(3)((1L, ts("2024-01-01 10:00:00"))) ++
        Seq((1L, ts("2024-01-02 10:00:00"))) ++
        Seq.fill(3)((1L, ts("2024-01-03 10:00:00"))) ++
        Seq((1L, ts("2024-01-04 10:00:00"))) ++
        Seq.fill(2)((2L, ts("2024-01-01 12:00:00"))) ++
        Seq.fill(2)((2L, ts("2024-01-04 12:00:00"))) ++
        Seq((3L, ts("2024-01-20 00:00:00")))
    val got = Events.dtwHalfDrift(rows.toDF("user_id", "ts"),
        col("user_id"), col("ts"), frameDays = 1, frames = 4)
      .orderBy(col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 0L), (2L, 4L), (3L, 0L)))
  }
}
