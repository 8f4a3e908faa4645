package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bin-bucketed interval×point joins — the scalable plan for the range
  * predicate `start ≤ ts < end` within a key, which Spark would otherwise
  * execute as a broadcast-nested-loop (driver-bound) or a per-key theta
  * join (quadratic in events-per-key for hot keys).
  *
  * The reference's event pipeline has per-key ORDER-based matching (as-of);
  * this adds the WINDOW-based form — "all events inside this interval" —
  * the attribution/audit primitive. Beyond-reference, same family as
  * [[AsofJoin]].
  */
object IntervalJoin {

  /** General interval×point join: emit every (interval row × point row)
    * pair sharing `key` with `start_us ≤ us < end_us`.
    *
    * Contract: `intervals` carries (key, start_us, end_us, carry…),
    * `points` (key, us, carry…); carry column names must be disjoint.
    * Point timestamps are epoch-µs (non-negative); interval bounds may
    * extend below zero (the residual predicate keeps correctness — binning
    * only ever over-covers, never misses, because trunc-div equals
    * floor-div on the non-negative point side).
    *
    * Scale shape: each interval explodes into its ⌈len/binUs⌉ covered
    * time bins; each point computes its single bin — then the pair space
    * is ONE equi-join on (key, bin) plus a residual filter. No duplicate
    * pairs by construction (a point lies in exactly one bin, and an
    * interval covers that bin at most once), so no distinct is needed.
    * Pick binUs ≈ the typical interval length: fan-out stays O(1) per
    * interval and bucket population stays events-per-(key, binUs-slice),
    * never events-per-key. */
  def joinPoints(intervals: DataFrame, points: DataFrame,
                 binUs: Long): DataFrame = {
    require(binUs > 0, "binUs must be positive")
    val iv = intervals.filter(col("end_us") > col("start_us"))
      .withColumn("__b", explode(sequence(
        expr(s"start_us div $binUs"), expr(s"(end_us - 1) div $binUs"))))
    val pt = points.withColumn("__b", expr(s"us div $binUs"))
    iv.join(pt, Seq("key", "__b"))
      .filter(col("us") >= col("start_us") && col("us") < col("end_us"))
      .drop("__b")
  }

  /** Attribution-window join over the events table: for every purchase,
    * the count / cent-exact value total / latest timestamp of the SAME
    * user's events in the `windowMinutes` before it (window-start
    * inclusive, purchase instant exclusive — so the purchase itself never
    * matches). The as-of join answers "which event came last before";
    * this answers "what happened in the window" — the standard
    * conversion-attribution shape. Purchases with an empty window emit no
    * row. Money stays exact: `value` is 2-decimal, so
    * CAST(round(value·100)) is the integer cent amount in both engines
    * and the sum is order-independent.
    *
    * binUs = the window length, so each purchase interval spans ≤ 2 bins
    * (fan-out exactly 2 rows per purchase) and the join is equi on
    * (user, bin). */
  def attributionWindow(events: DataFrame,
                        windowMinutes: Int = 30): DataFrame = {
    val winUs = windowMinutes * 60L * 1000000L
    val pts = events.select(col("user_id").as("key"),
      unix_micros(col("ts")).as("us"), col("event_id"),
      expr("CAST(round(value * 100) AS BIGINT)").as("__cents"))
    val ivs = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("key"),
        (unix_micros(col("ts")) - winUs).as("start_us"),
        unix_micros(col("ts")).as("end_us"))
    joinPoints(ivs, pts, binUs = winUs)
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__cents")).as("cents_total"),
        max(col("us")).as("last_us"))
  }
}
