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
  * The model is a pluggable scorer; a linear-drift stand-in keeps the
  * whole pipeline a pure Spark plan (no driver loop — the reference iterates
  * 576 model calls on the driver, spark.py:1498-1555; here the roll-forward
  * is an `explode(sequence(...))` projection, fully distributed).
  */
object Forecast {

  /** Per-location linear forecast: slope from (last - first)/(lookback-1)
    * over the `lookback` most recent rows; step i predicts
    * value_last + slope·i at ts_last + i·stepMinutes. Locations with fewer
    * than `lookback` observations are skipped (incomplete window). */
  def linear(obs: DataFrame, lookback: Int, steps: Int,
             stepMinutes: Int = 5, metric: String = "value"): DataFrame = {
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
