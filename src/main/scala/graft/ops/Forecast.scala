package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic autoregressive forecasting (the data-side of the
  * reference's LSTM inference path, SURVEY.md §2.12): per-location linear
  * drift over the last `lookback` observations, rolled forward `steps`
  * fixed-cadence steps, then the A9-shaped hourly aggregation of the
  * forecast rows (prediction/preprocessing/spark.py:1443-1496).
  *
  * Two forecasting seams:
  *  - [[Forecast.linear]] — the closed-form drift forecast as a pure Spark
  *    plan (no driver loop — the reference iterates 576 model calls on the
  *    driver, spark.py:1498-1555; here the roll-forward is an
  *    `explode(sequence(...))` projection, fully distributed);
  *  - [[Forecast.rollForward]] — the generic model-in-the-loop seam: a
  *    [[StepScorer]] (where a real trained model plugs in) applied
  *    autoregressively per location, with each prediction appended to the
  *    sliding window exactly like the reference's loop — but executed
  *    inside `flatMapGroups`, so the state per key is bounded (`lookback`
  *    doubles) and the 576-step loop runs data-parallel on executors
  *    instead of serially on the driver.
  */
object Forecast {

  /** One autoregressive model step: next value from the trailing window
    * (oldest → newest, always exactly `lookback` long). Implementations
    * must be deterministic and Serializable — they ship to executors. */
  trait StepScorer extends Serializable {
    def next(window: Seq[Double]): Double
  }

  /** Default scorer: continue the window's average drift. On an exactly
    * linear series this reproduces [[linear]]'s closed form step-for-step
    * (asserted in ForecastScorerSpec). */
  object LinearDriftScorer extends StepScorer {
    def next(w: Seq[Double]): Double =
      w.last + (w.last - w.head) / (w.size - 1).toDouble
  }

  /** Model-in-the-loop autoregressive forecast: per location, the last
    * `lookback` observations seed a sliding window; `scorer.next` predicts
    * step i, the prediction is appended and the window advances (reference
    * parity: spark.py:1498-1555). Locations with fewer than `lookback`
    * rows are skipped. One shuffle on location; per-group state is
    * `lookback` doubles regardless of corpus size. */
  def rollForward(obs: DataFrame, lookback: Int, steps: Int,
                  scorer: StepScorer, stepMinutes: Int = 5,
                  metric: String = "value"): DataFrame = {
    // lookback = 1 gives a degenerate window: drift scorers divide by
    // (size - 1) and would silently emit NaN/Infinity — fail fast instead.
    require(lookback >= 2, s"lookback must be >= 2 (got $lookback)")
    val spark = obs.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("location"))
      .orderBy(col("event_timestamp").desc, col("event_id").desc)
    obs
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= lookback)
      .select(col("location").cast("string"), col("__rn"),
        col(metric).cast("double"), unix_micros(col("event_timestamp")))
      .as[(String, Int, Double, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (loc, rows) =>
        val newestFirst = rows.toIndexedSeq.sortBy(_._2)
        if (newestFirst.size < lookback) Iterator.empty
        else {
          val tsLastUs = newestFirst.head._4
          var window = newestFirst.reverseIterator.map(_._3).toVector
          val stepUs = stepMinutes * 60000000L
          (1 to steps).iterator.map { i =>
            val pred = scorer.next(window)
            window = window.tail :+ pred
            (loc, i.toLong, tsLastUs + i * stepUs, pred)
          }
        }
      }
      .toDF("location", "step", "pred_us", "pred")
  }

  /** Per-location linear forecast: slope from (last - first)/(lookback-1)
    * over the `lookback` most recent rows; step i predicts
    * value_last + slope·i at ts_last + i·stepMinutes. Locations with fewer
    * than `lookback` observations are skipped (incomplete window). */
  def linear(obs: DataFrame, lookback: Int, steps: Int,
             stepMinutes: Int = 5, metric: String = "value"): DataFrame = {
    require(lookback >= 2, s"lookback must be >= 2 (got $lookback)")
    val w = Window.partitionBy(col("location"))
      .orderBy(col("event_timestamp").desc, col("event_id").desc)
    val windowed = obs
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= lookback)
    val perLoc = windowed.groupBy(col("location")).agg(
      min_by(col(metric), col("__rn")).as("v_last"),
      min_by(col("event_timestamp"), col("__rn")).as("ts_last"),
      max_by(col(metric), col("__rn")).as("v_first"),
      count(lit(1)).as("n"))
    perLoc
      .filter(col("n") === lookback)
      .withColumn("slope",
        (col("v_last") - col("v_first")) / lit((lookback - 1).toDouble))
      .select(col("location"), col("ts_last"), col("v_last"), col("slope"),
        explode(sequence(lit(1), lit(steps))).as("step"))
      .select(
        col("location"), col("step").cast("long").as("step"),
        unix_micros(col("ts_last") +
          expr(s"make_interval(0, 0, 0, 0, 0, $stepMinutes, 0)") * col("step")).as("pred_us"),
        (col("v_last") + col("slope") * col("step")).as("pred"))
  }

  /** A9: hourly aggregation of forecast rows — average prediction and step
    * count per (location, forecast hour). */
  def hourlyRollup(forecast: DataFrame): DataFrame =
    forecast
      .groupBy(col("location"),
        hour(timestamp_micros(col("pred_us"))).as("pred_hour"))
      .agg(round(avg(col("pred")), 4).as("avg_pred"), count(lit(1)).as("n_steps"))
}
