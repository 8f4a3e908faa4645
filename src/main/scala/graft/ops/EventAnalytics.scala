package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over the event stream: ordered funnels,
  * cohort retention and slowly-changing-dimension (SCD2) history — the
  * standard "what do users do over time" query family a warehouse built on
  * the reference's event feed would run next (the reference stops at rollups
  * and sequences; these are the composition of its D1/A2 primitives into the
  * canonical analytics shapes).
  *
  * All outputs are integer-exact (epoch-µs arithmetic, counts) so the DuckDB
  * oracles hash-match bit-for-bit; no float aggregation anywhere.
  *
  * Scale notes (100 TB): every operator shuffles only on `user_id` — the
  * natural max-cardinality key — with map-side-combinable aggregates; the
  * funnel's per-step joins are user-keyed equi-joins between monotonically
  * SHRINKING relations (step k's reachers ⊆ step k-1's), so AQE picks
  * broadcast for the late, small steps on real funnels. No global windows,
  * no driver-side iteration: the step list is a query parameter (a tiny
  * driver-side fixture, like sampling weights), never data-derived.
  */
object EventAnalytics {

  private val DayUs = 86400000000L

  /** Strictly-ordered funnel: for each user the earliest event chain
    * s₁ < s₂ < … < sₙ (event of step k strictly after the user's step-k-1
    * time), per-step reach counts and total conversion lag.
    *
    * Returns one row per step: (step, step_name, n_users, total_lag_us)
    * where total_lag_us sums (tₖ − tₖ₋₁) over converting users (0 for the
    * first step). A user who fires step 2 before ever firing step 1 does
    * NOT count as reaching step 2 — that ordering is the whole point of a
    * funnel and what a bare per-type count gets wrong. */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val us = unix_micros(col("ts"))
    // earliest step-1 event per user: one map-side-combinable min aggregate
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(us).as("t"))
      .withColumn("lag_us", lit(0L))
    // fold the remaining steps: reachers of step k = users with a step-k
    // event strictly after their step-(k-1) time. The min over qualifying
    // events and the carried t_prev ride the same aggregate.
    val reached = steps.tail.scanLeft(first) { (prev, step) =>
      events.filter(col("event_type") === step)
        .join(prev.select(col("user_id"), col("t").as("t_prev")), "user_id")
        .filter(us > col("t_prev"))
        .groupBy(col("user_id"))
        .agg(min(us).as("t"), min(col("t_prev")).as("t_prev"))
        .select(col("user_id"), col("t"), (col("t") - col("t_prev")).as("lag_us"))
    }
    reached.zipWithIndex.map { case (r, i) =>
      r.agg(count(lit(1)).as("n_users"), sum(col("lag_us")).as("total_lag_us"))
        .select(lit(i + 1L).as("step"), lit(steps(i)).as("step_name"),
          col("n_users"), coalesce(col("total_lag_us"), lit(0L)).as("total_lag_us"))
    }.reduce(_ union _)
  }

  /** Cohort retention: users grouped by first-seen day (their cohort),
    * counted once per (cohort, whole-`bucketDays`-period offset) they were
    * active in. Returns (cohort_day, offset_periods, n_users), offset 0 =
    * the cohort period itself.
    *
    * Day indices are integer epoch-µs divisions — no timezone or calendar
    * arithmetic to diverge between engines. Two user-keyed shuffles (cohort
    * min; join-back) plus the final small aggregate; the (user, day)
    * activity relation is pre-shrunk by a distinct BEFORE the join so the
    * join input is bounded by active-user-days, not raw events. */
  def retentionCohorts(events: DataFrame, bucketDays: Int = 7): DataFrame = {
    // integer `div`, not `/`: Spark's `/` on longs is IEEE double division,
    // and a day-boundary µs value one ulp below the true quotient would
    // truncate to the previous day where the oracle's integer `//` doesn't
    val dd = expr(s"unix_micros(ts) div $DayUs").as("dd")
    val activity = events.select(col("user_id"), dd).distinct()
    val cohort = activity.groupBy(col("user_id")).agg(min(col("dd")).as("cohort_dd"))
    activity.join(cohort, "user_id")
      .select(col("cohort_dd"),
        expr(s"(dd - cohort_dd) div ${bucketDays.toLong}").as("offset_periods"),
        col("user_id"))
      .distinct()
      .groupBy(col("cohort_dd"), col("offset_periods"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(timestamp_micros(col("cohort_dd") * DayUs), "yyyy-MM-dd")
          .as("cohort_day"),
        col("offset_periods"), col("n_users"))
  }

  /** Per-group closed-form linear trend (least-squares slope of value over
    * time): the "is this metric drifting" read-out, computed from exact
    * integer sums — x is whole hours since the GLOBAL earliest event (a
    * 1-row broadcast anchor, the [[Recent]] pattern), y is cent-quantized
    * value, and slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) with numerator and
    * denominator both exact int64 (n ≤ 2·10⁷ rows/group before nΣxy
    * approaches 2⁶³ at these ranges); the single IEEE division at the end
    * is bit-identical across engines on identical operands — the same
    * determinism contract as spanCoverage's coverage ratio.
    *
    * One map-side-combinable aggregate per group after the anchor join;
    * no windows, no per-group sorts. */
  def linearTrend(events: DataFrame): DataFrame = {
    val us = unix_micros(col("ts"))
    val anchor = events.agg(min(us).as("min_us"))
    events
      .crossJoin(broadcast(anchor))
      .select(col("event_type").as("code"),
        expr("(unix_micros(ts) - min_us) div 3600000000").as("x"),
        floor(col("value") * 100).cast("long").as("y"))
      .groupBy(col("code"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("code"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("den"))
      // den = 0 (single row, or every x in one hour bucket) has no defined
      // slope: emit NULL on both engines rather than the engine-dependent
      // NaN/Inf/NULL a 0/0 division produces (DuckDB's behavior depends on
      // its ieee_floating_point_ops setting — a latent oracle mismatch).
      .withColumn("slope_cents_per_hour",
        when(col("den") === 0, lit(null).cast("double"))
          .otherwise(col("num").cast("double") / col("den").cast("double")))
  }

  /** Robust (median/MAD) outlier detection per event type: flag events
    * whose |value − median| exceeds `k` × the median-absolute-deviation of
    * their type — the robust z-score that a mean/stddev rule gets wrong on
    * heavy-tailed metrics (the outliers inflate the stddev that is supposed
    * to catch them; the median and MAD are breakdown-point-0.5 immune).
    *
    * Everything is computed on floor(value·1e6) longs with FLOORED medians,
    * so the threshold compare is pure int64 — the percentile interpolation
    * itself is exact IEEE (midpoint of two ≪2⁵² longs), making the floor
    * deterministic across engines; no float boundary row can flip.
    *
    * Two passes by necessity (the deviation needs the median first); both
    * per-type relations are broadcast back. `approx = true` swaps the exact
    * percentile for the mergeable `percentile_approx` sketch — the 100 TB
    * path, same trade as TextStats' corpus-relative quality gate: exact
    * percentile buffers each group's values in one aggregation buffer,
    * which is fine per event-type here but not for high-cardinality
    * grouping; the sketch is map-side-combinable. */
  def madAnomalies(events: DataFrame, k: Int = 3,
                   approx: Boolean = false): DataFrame = {
    def med(c: org.apache.spark.sql.Column) =
      if (approx) percentile_approx(c, lit(0.5), lit(10000)).cast("double")
      else percentile(c, lit(0.5))
    val e = events.select(col("event_type").as("code"), col("event_id"),
      col("value"), floor(col("value") * 1000000).cast("long").as("qv"))
    val medians = e.groupBy(col("code"))
      .agg(floor(med(col("qv"))).cast("long").as("med_q"))
    val dev = e.join(broadcast(medians), "code")
      .withColumn("dev", abs(col("qv") - col("med_q")))
    val mads = dev.groupBy(col("code"))
      .agg(floor(med(col("dev"))).cast("long").as("mad_q"))
    dev.join(broadcast(mads), "code")
      .filter(col("dev") > lit(k.toLong) * col("mad_q"))
      .select(col("code"), col("event_id"), col("value"),
        col("dev").as("dev_q"), col("mad_q"))
  }

  /** SCD2 (type-2 slowly-changing-dimension) history of a per-user metric:
    * consecutive equal values collapse into one validity row with
    * [valid_from, valid_to) bounds; the open row per user is `is_current`.
    * The batch form of a CDC merge — what turns an event stream into a
    * point-in-time-joinable dimension (pairs with [[AsofJoin]] for the
    * "attribute as of the order date" lookup).
    *
    * One shuffle: both windows partition by user_id with the same
    * (ts, event_id) order, and the change-filter between them preserves
    * partitioning AND sort order, so Catalyst plans a single exchange+sort
    * feeding both Window operators. */
  def scd2(events: DataFrame, metric: String = "value"): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .select(col("user_id"), col("ts"), col("event_id"), col(metric))
      .withColumn("prev", lag(col(metric), 1).over(w))
      // null-safe inequality: the first row per user (prev null) opens the
      // history; an event re-asserting the current value is not a change
      .filter(!(col("prev") <=> col(metric)))
      .select(col("user_id"),
        unix_micros(col("ts")).as("valid_from_us"),
        lead(unix_micros(col("ts")), 1).over(w).as("valid_to_us"),
        col(metric),
        lead(unix_micros(col("ts")), 1).over(w).isNull.as("is_current"))
  }
}
