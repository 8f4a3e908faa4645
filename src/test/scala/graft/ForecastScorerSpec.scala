package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Forecast

/** The model-in-the-loop seam: rollForward must reproduce the closed-form
  * linear plan when the scorer is linear drift on a linear series, and any
  * other StepScorer must slot in without touching the plan shape. */
class ForecastScorerSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // Two locations with exactly linear series (slopes 2.0 and -1.5), 5-minute
  // cadence, 6 observations each — lookback 4 leaves headroom.
  private def obs = (0 until 6).flatMap { i =>
    val ts = new Timestamp(1700000000000L + i * 300000L)
    Seq(("a", ts, i.toLong, 10.0 + 2.0 * i), ("b", ts, 100L + i, 50.0 - 1.5 * i))
  }.toDF("location", "event_timestamp", "event_id", "value")

  test("rollForward with LinearDriftScorer matches the closed-form linear forecast") {
    val closed = Forecast.linear(obs, lookback = 4, steps = 5)
      .orderBy("location", "step").collect()
    val rolled = Forecast.rollForward(obs, lookback = 4, steps = 5,
        Forecast.LinearDriftScorer)
      .orderBy("location", "step").collect()
    assert(rolled.length === closed.length && rolled.nonEmpty)
    closed.zip(rolled).foreach { case (c, r) =>
      assert(c.getString(0) === r.getString(0))
      assert(c.getLong(1) === r.getLong(1))
      assert(c.getLong(2) === r.getLong(2), "prediction timestamps must agree")
      assert(math.abs(c.getDouble(3) - r.getDouble(3)) < 1e-9,
        s"step ${c.getLong(1)} of ${c.getString(0)}: closed ${c.getDouble(3)} vs rolled ${r.getDouble(3)}")
    }
  }

  test("a second scorer plugs into the same seam (autoregressive window advances)") {
    // Mean-reverting scorer: predict the window mean. On a linear series the
    // predictions must flatten toward the running mean — and each step must
    // see the PREVIOUS prediction in its window (autoregression), which a
    // fixed-window implementation would fail.
    object MeanScorer extends Forecast.StepScorer {
      def next(w: Seq[Double]): Double = w.sum / w.size
    }
    val out = Forecast.rollForward(obs, lookback = 4, steps = 3, MeanScorer)
      .filter(col("location") === "a").orderBy("step")
      .collect().map(_.getDouble(3))
    // window seeds with 14,16,18,20 → p1 = 17; window 16,18,20,17 → p2 = 17.75;
    // window 18,20,17,17.75 → p3 = 18.1875.
    assert(math.abs(out(0) - 17.0) < 1e-9)
    assert(math.abs(out(1) - 17.75) < 1e-9)
    assert(math.abs(out(2) - 18.1875) < 1e-9)
  }

  test("locations with fewer than lookback observations are skipped") {
    val short = obs.filter(col("location") =!= "a" || col("event_id") < 3)
    val out = Forecast.rollForward(short, lookback = 4, steps = 2,
      Forecast.LinearDriftScorer)
    assert(out.select("location").distinct().collect().map(_.getString(0)).toSet === Set("b"))
  }
}
