package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventAnalytics

class EventAnalyticsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def ts(min: Long) = java.sql.Timestamp.from(
    java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(min * 60))

  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.map { case (id, user, min, tpe, v) => (id, ts(min), user, tpe, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("funnel requires strict step ordering and sums exact lags") {
    val events = ev(
      // u1 converts fully: view@0, click@10, purchase@30
      (1L, 1L, 0L, "view", 1.0), (2L, 1L, 10L, "click", 1.0),
      (3L, 1L, 30L, "purchase", 1.0),
      // u2 clicks BEFORE viewing — reaches view only
      (4L, 2L, 5L, "click", 1.0), (5L, 2L, 8L, "view", 1.0),
      // u3 views then clicks, never purchases
      (6L, 3L, 0L, "view", 1.0), (7L, 3L, 50L, "click", 1.0),
      // u4 purchases with no view at all — reaches nothing
      (8L, 4L, 1L, "purchase", 1.0))
    val out = EventAnalytics.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("step").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      === Seq((1L, "view", 3L, 0L),
        (2L, "click", 2L, (10L + 50L) * 60000000L), // u1 +10min, u3 +50min
        (3L, "purchase", 1L, 20L * 60000000L)))     // u1 +20min after click
  }

  test("funnel picks the EARLIEST qualifying event per step") {
    val events = ev(
      (1L, 1L, 0L, "view", 1.0),
      (2L, 1L, 20L, "click", 1.0), (3L, 1L, 40L, "click", 1.0))
    val out = EventAnalytics.funnel(events, Seq("view", "click"))
      .orderBy("step").collect()
    // lag counts to the first click (20 min), not the later one
    assert(out(1).getLong(3) === 20L * 60000000L)
  }

  test("retentionCohorts buckets activity by whole periods from first sight") {
    val day = 24 * 60L
    val events = ev(
      // u1: cohort day 0, active day 0, day 3 (offset 0) and day 8 (offset 1)
      (1L, 1L, 0L, "view", 1.0), (2L, 1L, 3 * day, "view", 1.0),
      (3L, 1L, 8 * day, "view", 1.0),
      // two same-day events count once per (user, day)
      (4L, 1L, 8 * day + 30, "click", 1.0),
      // u2: cohort day 7, active day 7 only
      (5L, 2L, 7 * day, "view", 1.0))
    val out = EventAnalytics.retentionCohorts(events, bucketDays = 7)
      .orderBy("cohort_day", "offset_periods").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      === Seq(("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L),
        ("2024-01-08", 0L, 1L)))
  }

  test("madAnomalies flags only beyond-3-MAD values, exact interpolated medians") {
    val events = ev(
      // code "a": [0,10,20,30,40,200] → med 25, devs [25,15,5,5,15,175],
      // MAD 15 → only the 200 exceeds 3·MAD = 45
      (1L, 1L, 0L, "a", 0.0), (2L, 1L, 1L, "a", 10.0), (3L, 1L, 2L, "a", 20.0),
      (4L, 1L, 3L, "a", 30.0), (5L, 1L, 4L, "a", 40.0), (6L, 1L, 5L, "a", 200.0),
      // code "b": constant except one — MAD 0, so ANY deviation flags
      (7L, 2L, 0L, "b", 1.0), (8L, 2L, 1L, "b", 1.0), (9L, 2L, 2L, "b", 1.0),
      (10L, 2L, 3L, "b", 100.0))
    val out = EventAnalytics.madAnomalies(events, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      .toSet
    assert(out === Set(("a", 6L, 175000000L, 15000000L),
      ("b", 10L, 99000000L, 0L)))
    // the sketch path must agree on this tiny input (accuracy 10000 is
    // exact for < 10000 rows per group)
    val approx = EventAnalytics.madAnomalies(events, k = 3, approx = true)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(approx === Set(("a", 6L), ("b", 10L)))
  }

  test("linearTrend recovers an exact slope from integer moment sums") {
    val events = ev(
      // code a: value climbs exactly 1.00/hour → slope 100 cents/hour
      (1L, 1L, 0L, "a", 1.0), (2L, 1L, 60L, "a", 2.0), (3L, 1L, 120L, "a", 3.0),
      // code b: flat → slope 0
      (4L, 2L, 0L, "b", 5.0), (5L, 2L, 60L, "b", 5.0), (6L, 2L, 120L, "b", 5.0))
    val out = EventAnalytics.linearTrend(events)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(out("a") === ((3L, 600L, 6L, 100.0)))
    assert(out("b") === ((3L, 0L, 6L, 0.0)))
  }

  test("scd2 collapses runs, keeps re-assertions out, flags the open row") {
    val events = ev(
      (1L, 1L, 0L, "a", 1.0),
      (2L, 1L, 10L, "a", 1.0),  // same value — not a change
      (3L, 1L, 20L, "a", 2.0),  // change → closes the 1.0 row
      (4L, 1L, 30L, "a", 2.0),
      (5L, 2L, 5L, "a", 9.0))
    val out = EventAnalytics.scd2(events)
      .orderBy("user_id", "valid_from_us").collect()
    assert(out.length === 3)
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000L
    val r1 = out(0)
    assert(r1.getLong(1) === base && r1.getLong(2) === base + 20L * 60000000L &&
      r1.getDouble(3) === 1.0 && !r1.getBoolean(4))
    val r2 = out(1)
    assert(r2.getLong(1) === base + 20L * 60000000L && r2.isNullAt(2) &&
      r2.getDouble(3) === 2.0 && r2.getBoolean(4))
    val r3 = out(2)
    assert(r3.getLong(0) === 2L && r3.getBoolean(4))
  }

  test("scd2 plans both windows over a single exchange") {
    val events = ev((1L, 1L, 0L, "a", 1.0), (2L, 1L, 10L, "a", 2.0))
    val plan = EventAnalytics.scd2(events).queryExecution.executedPlan.toString
    // the change-filter preserves (user_id) partitioning and (ts, event_id)
    // order, so the lead window must not add a second shuffle
    assert("Exchange".r.findAllIn(plan).size === 1, plan)
  }
}
