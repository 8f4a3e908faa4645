package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-1 dedup / latest-per-key (SURVEY.md §2.3, D1/D2).
  *
  * Reference: `row_number() over (partitionBy location orderBy event_ts desc,
  * kafka_ts desc) == 1` (prediction/preprocessing/spark.py:256-267) and the
  * 2-key variant keeping max kafka_timestamp per (location, event_timestamp)
  * (getSample.py:129-136).
  *
  * Scale notes: a rank-1 window shuffles once on the partition keys and sorts
  * within partitions — fine when keys are numerous (the 100 TB case: millions
  * of locations/users). For low-cardinality keys with huge fan-in we also
  * provide `latestByMaxBy`, which uses `max_by(struct(*), orderKey)` — a
  * hash-aggregate with map-side partial combine, so the shuffle carries one
  * row per key per input partition instead of every row. Prefer it whenever
  * the full row (not its rank) is all you need.
  */
object Latest {

  /** D1/D2 generic: keep the first row per `keys` under `ordering`. */
  def keepFirst(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** D1: latest observation per location (ties by kafka ts, then event_id if
    * present — the adapter adds one so results are fully deterministic). */
  def latestPerLocation(obs: DataFrame): DataFrame = {
    val tieBreak =
      if (obs.columns.contains("event_id"))
        Seq(col("event_timestamp").desc, col("kafka_timestamp").desc, col("event_id").desc)
      else Seq(col("event_timestamp").desc, col("kafka_timestamp").desc)
    keepFirst(obs, Seq("location"), tieBreak)
  }

  /** D2: dedupe per (location, event_timestamp), keeping max kafka_timestamp. */
  def dedupePerLocationTime(obs: DataFrame): DataFrame =
    keepFirst(obs, Seq("location", "event_timestamp"), Seq(col("kafka_timestamp").desc))

  /** Shuffle-light alternative to D1: map-side-combinable `max_by`. The
    * orderKey must totally order rows within a key for determinism. */
  def latestByMaxBy(obs: DataFrame, key: String, orderKey: Column): DataFrame = {
    val payload = struct(obs.columns.map(col): _*)
    obs.groupBy(col(key))
      .agg(max_by(payload, orderKey).as("__row"))
      .select(col("__row.*"))
  }
}
