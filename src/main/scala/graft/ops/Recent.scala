package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Location predicates, look-back anchoring and top-k (SURVEY.md §2.2
  * P8-P11, §2.4 A1, §2.7 O1-O5).
  *
  * The reference anchors look-back windows on `datetime.now()` server time
  * (prediction/preprocessing/spark.py:588-589, 940-942) — nondeterministic and
  * untestable. Here the anchor is either passed explicitly or derived from the
  * data maximum (spark.py:548-551 does this for the generic branch), so every
  * query is reproducible.
  */
object Recent {

  /** P8: case-insensitive location match, null-safe (spark.py:476-483). */
  def locationPredicate(key: String): Column =
    lower(col("location")) <=> lit(key.toLowerCase)

  /** P9: all observations on one calendar day. Uses a date literal comparison
    * (to_date), not string formatting, so the predicate can prune partitions. */
  def onDay(obs: DataFrame, day: String): DataFrame =
    obs.filter(to_date(col("event_timestamp")) === to_date(lit(day)))

  /** P10: closed day-range filter. */
  def dayRange(obs: DataFrame, startDay: String, endDay: String): DataFrame =
    obs.filter(to_date(col("event_timestamp"))
      .between(to_date(lit(startDay)), to_date(lit(endDay))))

  /** A1: the data-derived anchor — max event time (one tiny agg job). */
  def anchorMax(obs: DataFrame): DataFrame =
    obs.agg(max(col("event_timestamp")).as("anchor"))

  /** P11 + O3, fully distributed: rows within `hours` before the data max.
    * Computed in one plan (scalar-subquery-style cross join of the 1-row
    * anchor) instead of the reference's collect-then-refilter round trip. */
  def recentHours(obs: DataFrame, hours: Int): DataFrame = {
    val anchor = anchorMax(obs)
    obs.crossJoin(broadcast(anchor))
      .filter(col("event_timestamp") >= col("anchor") - expr(s"INTERVAL $hours HOURS"))
      .drop("anchor")
  }

  /** O1/O2: latest `n` rows under `ordering` (TakeOrderedAndProject — no full
    * sort at scale, each partition keeps its local top-n). */
  def latestN(obs: DataFrame, n: Int, ordering: Seq[Column]): DataFrame =
    obs.orderBy(ordering: _*).limit(n)

  /** O5: top-k groups by an aggregated metric, deterministic tie-break on key. */
  def topKByAvg(obs: DataFrame, key: String, metric: String, k: Int): DataFrame =
    obs.groupBy(col(key))
      .agg(avg(col(metric)).as(s"avg_$metric"), count(lit(1)).as("n_rows"))
      .orderBy(col(s"avg_$metric").desc, col(key))
      .limit(k)

  /** The flagship endpoint's dispatch (GET /weather/recent_with_step,
    * prediction/preprocessing/spark.py:587-1256): (24,1) → hourly rollup;
    * (168,24) → daily rollup; anything else → count-based buckets over the
    * last hours·12 rows with step·12 rows per bucket (the reference's
    * 5-minute-cadence unit conversion, spark.py:808-810). One dispatcher
    * over the three shared Rollup plans — the reference duplicates each
    * branch for its hot and cold paths. */
  def recentWithStep(obs: DataFrame, hours: Int, step: Int,
                     avgCols: Seq[String]): DataFrame = (hours, step) match {
    case (24, 1)   => Rollup.hourly(obs, avgCols)
    case (168, 24) => Rollup.daily(obs, avgCols)
    case _ =>
      Rollup.bucketed(obs, step = step * 12, maxRows = hours * 12,
        ordering = Seq(col("event_timestamp").desc, col("event_id").desc),
        avgCols = avgCols)
  }
}
