package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-bucketed rollups + modal-code aggregation (SURVEY.md §2.4 A2-A6, J1,
  * W2-W3), as ONE parameterized implementation — the reference duplicates this
  * plan six times across hour/day/bucket × stream/snapshot paths
  * (prediction/preprocessing/spark.py:598-920 vs 939-1256).
  *
  * Modal code: the reference computes `groupBy(key, code).count()` then ranks
  * with `row_number() over (partitionBy key orderBy count desc, code
  * asc_nulls_last) == 1` and left-joins back (spark.py:620-645 et al.) — a
  * 3-shuffle plan. `modalCode` here collapses the rank+join into a single
  * `min_by` hash aggregate with the SAME deterministic tie-break
  * (count desc, code asc): 2 shuffles, map-side combinable, no sort, no join.
  * The literal rank formulation is kept as `modalCodeRanked` for parity tests.
  *
  * Scale notes: groupBy on (bucket, code) then (bucket) partial-aggregates
  * before both shuffles, so 100 TB in ≈ |buckets × codes| rows shuffled.
  * No global windows on the rollup path. The count-based bucketing (A4) is
  * inherently a global ordering — the reference bounds it with a preceding
  * `limit(hours*12)` (spark.py:817,1167); we keep that bound mandatory.
  */
object Rollup {

  /** Default aggregate list shape of the reference's rollups (A2/A3):
    * min/max event time, avg over each metric, pinned-first (min) over the
    * per-location constants, row count. `first()` in the reference
    * (spark.py:612-615) is order-dependent; we pin with `min` so results are
    * deterministic and oracle-checkable (SURVEY.md §7.4.2). */
  def aggList(avgCols: Seq[String], pinnedCols: Seq[String]): Seq[Column] =
    Seq(
      min(col("event_timestamp")).as("window_start"),
      max(col("event_timestamp")).as("window_end"),
      count(lit(1)).as("n_rows")) ++
    avgCols.map(c => avg(col(c)).as(s"avg_$c")) ++
    pinnedCols.map(c => min(col(c)).as(s"first_$c"))

  /** Modal value of `code` per `key`, deterministic ties (count desc, code
    * asc). Single-pass shape: two hash aggregates, zero windows/joins. */
  def modalCode(df: DataFrame, key: Column, keyName: String,
                code: Column = col("code")): DataFrame =
    df.groupBy(key.as(keyName), code.as("__code"))
      .agg(count(lit(1)).as("__cnt"))
      .groupBy(col(keyName))
      .agg(
        min_by(col("__code"), struct((-col("__cnt")).as("n"), col("__code"))).as("modal_code"),
        max(col("__cnt")).as("modal_count"))

  /** The reference's literal 3-step modal plan (A5+A6): freq → rank-1.
    * Kept for parity/property tests against `modalCode`. */
  def modalCodeRanked(df: DataFrame, key: Column, keyName: String,
                      code: Column = col("code")): DataFrame = {
    val freq = df.groupBy(key.as(keyName), code.as("__code")).agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col(keyName))
      .orderBy(col("__cnt").desc, col("__code").asc_nulls_last)
    freq.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyName), col("__code").as("modal_code"), col("__cnt").as("modal_count"))
  }

  /** A2/A3 generic rollup: metrics aggregated per bucket key, left-joined
    * with the modal code (J1 — tiny right side, Catalyst auto-broadcasts). */
  def rollup(obs: DataFrame, key: Column, keyName: String,
             avgCols: Seq[String], pinnedCols: Seq[String] = Nil,
             code: Column = col("code")): DataFrame = {
    val aggs = aggList(avgCols, pinnedCols)
    val aggregated = obs.groupBy(key.as(keyName)).agg(aggs.head, aggs.tail: _*)
    aggregated
      .join(modalCode(obs, key, keyName, code), Seq(keyName), "left")
      .orderBy(col(keyName))
  }

  /** Hourly rollup (A2): bucket by hour-of-day of the event time. */
  def hourly(obs: DataFrame, avgCols: Seq[String], pinnedCols: Seq[String] = Nil): DataFrame =
    rollup(obs, hour(col("event_timestamp")), "hour", avgCols, pinnedCols)

  /** Daily rollup (A3): bucket by calendar day. `to_date` (not the reference's
    * date_format string key, spark.py:712) so partition pruning applies. */
  def daily(obs: DataFrame, avgCols: Seq[String], pinnedCols: Seq[String] = Nil): DataFrame =
    rollup(obs, to_date(col("event_timestamp")), "day", avgCols, pinnedCols)

  /** A4 + W3: count-based bucketing over the most recent `maxRows` rows.
    * The global row-number window is single-partition by construction; the
    * mandatory `maxRows` limit (reference: hours*12, spark.py:817) keeps it
    * bounded regardless of input scale — the limit itself is pushed into a
    * TakeOrderedAndProject, so only `maxRows` rows ever reach the window. */
  def bucketed(obs: DataFrame, step: Int, maxRows: Int,
               ordering: Seq[Column], avgCols: Seq[String],
               pinnedCols: Seq[String] = Nil): DataFrame = {
    require(maxRows > 0 && step > 0, "bucketed rollup requires positive bounds")
    val recent = Recent.latestN(obs, maxRows, ordering)
    val w = Window.orderBy(ordering: _*)
    val indexed = recent
      .withColumn("__idx", row_number().over(w))
      .withColumn("__bucket", floor((col("__idx") - 1) / step))
    rollup(indexed, col("__bucket"), "bucket", avgCols, pinnedCols)
  }
}
