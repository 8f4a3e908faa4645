package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding-window sequence datasets and sessionization for model training
  * (SURVEY.md §2.6
  * W4/W5; reference: prediction/preprocessing/getSample.py:150-214).
  *
  * Per (location) ordered by event time: a length-L history window
  * (`collect_list(struct(...)) over rowsBetween(-(L-1), 0)`), lead targets
  * for steps 1..F, and a completeness filter (full window AND furthest
  * target present).
  *
  * Scale notes: the window partitions by location — max-cardinality key, no
  * global windows. Each output row carries an L-row array; at 100 TB the
  * dominant cost is the shuffle for the per-location sort, which is
  * unavoidable for sequence assembly and parallelizes across locations.
  */
object Sequences {

  /** W4+W5: full sequence dataset with array-of-struct history and targets.
    * `features` are the struct fields collected per step. */
  def build(obs: DataFrame, seqLen: Int, forecastLen: Int,
            features: Seq[String]): DataFrame = {
    val order = Seq(col("event_timestamp").asc, col("event_id").asc)
    val w = Window.partitionBy(col("location")).orderBy(order: _*)
    val frame = w.rowsBetween(-(seqLen - 1), Window.currentRow)
    val step = struct((col("event_timestamp") +: features.map(col)): _*)
    val targets = (1 to forecastLen).map(i => lead(step, i).over(w))
    obs
      .withColumn("sequence", collect_list(step).over(frame))
      .withColumn("target_sequence", array(targets: _*))
      .filter(size(col("sequence")) === seqLen &&
        element_at(col("target_sequence"), forecastLen).isNotNull)
      .select(
        col("location"),
        element_at(col("sequence"), 1).getField("event_timestamp").as("start_timestamp"),
        col("event_timestamp").as("end_timestamp"),
        col("sequence"),
        element_at(col("target_sequence"), 1).as("target"),
        col("target_sequence"))
  }

  /** Flattened (fully SQL-expressible) view of the same window machinery:
    * rolling aggregate features over the last `seqLen` rows plus scalar lead
    * targets — the oracle-checkable core of sequence assembly.
    *
    * The rolling mean is computed from an integer-quantized sum
    * (floor(value·1e6) summed as long): sliding-window float aggregation is
    * engine-specific in its summation order (segment trees vs
    * running-subtract), so a raw `avg().over(frame)` differs in the last
    * bit between engines and breaks hash-compared oracles. Integer sums are
    * exact, so both engines agree bit-for-bit. */
  def flatFeatures(obs: DataFrame, seqLen: Int, leads: Int,
                   metric: String = "value"): DataFrame = {
    val order = Seq(col("event_timestamp").asc, col("event_id").asc)
    val w = Window.partitionBy(col("location")).orderBy(order: _*)
    val frame = w.rowsBetween(-(seqLen - 1), Window.currentRow)
    val leadCols = (1 to leads).map(i => lead(col(metric), i).over(w).as(s"t$i"))
    // floor(qsum / n) / 1e6 rather than round(qsum / (n·1e6), 4): with
    // 2-decimal inputs the mean lands exactly on .00005 boundaries where
    // Spark's HALF_UP and other engines' rounding disagree; floor is the
    // same IEEE op everywhere.
    val qsum = sum(floor(col(metric) * lit(1000000.0)).cast("long")).over(frame)
    obs.select(
        Seq(col("location"), col("event_id"),
          unix_micros(col("event_timestamp")).as("event_us"),
          count(lit(1)).over(frame).as("n_window"),
          (floor(qsum / lit(seqLen.toDouble)) / lit(1000000.0)).as(s"avg_$metric"),
          min(col(metric)).over(frame).as(s"min_$metric"),
          max(col(metric)).over(frame).as(s"max_$metric")) ++ leadCols: _*)
      .filter(col("n_window") === seqLen && col(s"t$leads").isNotNull)
  }

  /** Event-time sessionization: per key, events closer than `gapMinutes`
    * merge into one session (`session_window` — window end = last event +
    * gap, end-exclusive). The batch form of the streaming session
    * aggregation; one shuffle on the key. */
  def sessionize(obs: DataFrame, gapMinutes: Int): DataFrame =
    obs.groupBy(col("location"),
        session_window(col("event_timestamp"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("location"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"))
}
