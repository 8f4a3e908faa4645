package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Parse
import graft.ops.{DayStats, Forecast, Latest, Rollup, Sequences}

/** End-to-end run over a weather-shaped fixture mirroring the reference's
  * corpus cardinalities (SURVEY.md §5.5: many locations, 5-minute cadence,
  * weathercodes {3,80,95}) — the full REST-equivalent pipeline from raw
  * Kafka-shaped JSON to every endpoint's answer, checked by invariants. */
class WeatherEndToEndSpec extends AnyFunSuite with SparkFixture {

  private val nLoc = 12
  private val nSteps = 60 // 5 hours of 5-min observations per location

  private lazy val parsed = {
    val rows = new java.util.ArrayList[Row]()
    for (l <- 0 until nLoc; i <- 0 until nSteps) {
      val ts = java.time.Instant.parse("2024-06-01T06:00:00Z").plusSeconds(i * 300L)
      val code = Seq(3, 80, 95)((l + i) % 3)
      val temp = 20.0 + l + 0.1 * i
      rows.add(Row(s"loc$l",
        s"""{"location_name":"loc$l","time":"$ts","temperature":"$temp","weathercode":"$code"}""",
        java.sql.Timestamp.from(ts.plusSeconds(30))))
    }
    val kafkaShaped = spark.createDataFrame(rows, StructType(Seq(
      StructField("key", StringType), StructField("value", StringType),
      StructField("kafka_timestamp", TimestampType))))
    Parse.analyzable(Parse.fromJsonValue(kafkaShaped)).cache()
  }

  test("GET /weather — latest snapshot has one row per location, at the data max") {
    val latest = Latest.latestPerLocation(parsed).collect()
    assert(latest.length === nLoc)
    latest.foreach { r =>
      assert(r.getAs[java.sql.Timestamp]("event_timestamp")
        === java.sql.Timestamp.from(java.time.Instant.parse("2024-06-01T06:00:00Z")
          .plusSeconds((nSteps - 1) * 300L)))
    }
  }

  test("GET /weather/recent_with_step — hourly rollup covers all hours, modal code deterministic") {
    val roll = Rollup.hourly(
      parsed.withColumn("code", col("weathercode")), avgCols = Seq("temperature"))
      .collect()
    assert(roll.map(_.getAs[Int]("hour")).toSeq.sorted === Seq(6, 7, 8, 9, 10))
    assert(roll.map(_.getAs[Long]("n_rows")).sum === nLoc.toLong * nSteps)
    // Codes rotate uniformly within every hour: 12 obs/loc/hour × 12 loc =
    // 144 rows/hour over 3 codes → 48 each; deterministic tie-break → code 3.
    roll.foreach(r => assert(r.getAs[Int]("modal_code") === 3))
  }

  test("GET /weather/average_day + days — day stats agree with construction") {
    val days = DayStats.distinctDays(parsed).collect()
    assert(days.map(_.getAs[java.sql.Date]("day").toString).toSeq === Seq("2024-06-01"))
    val avg0 = DayStats.dayAverage(
      parsed.filter(col("location") === "loc0"), Seq("temperature")).head()
    assert(avg0.getAs[Long]("n_rows") === nSteps.toLong)
    // mean of 20.0 + 0.1·i over i=0..59 = 20 + 0.1·29.5 = 22.95
    assert(math.abs(avg0.getAs[Double]("avg_temperature") - 22.95) < 1e-9)
  }

  test("recent_with_step dispatch matches the reference's branch semantics") {
    import graft.ops.Recent
    val obs = parsed.select(col("location"), col("event_timestamp"),
      unix_micros(col("event_timestamp")).as("event_id"),
      col("temperature").as("value"), col("weathercode").cast("string").as("code"))
    // (24,1) → hour buckets; (168,24) → day buckets; generic → count buckets.
    assert(Recent.recentWithStep(obs, 24, 1, Seq("value")).columns.contains("hour"))
    assert(Recent.recentWithStep(obs, 168, 24, Seq("value")).columns.contains("day"))
    val buckets = Recent.recentWithStep(obs, 2, 1, Seq("value"))
    assert(buckets.columns.contains("bucket"))
    // 2h × 12 = 24 most recent rows in 12-row buckets → exactly 2 buckets.
    assert(buckets.count() === 2)
    assert(buckets.agg(sum(col("n_rows"))).head().getLong(0) === 24L)
  }

  test("getSample + predict — sequences align and forecast extends the drift") {
    val obs = parsed.select(col("location"), col("event_timestamp"),
      unix_micros(col("event_timestamp")).as("event_id"),
      col("temperature").as("value"), col("weathercode").cast("string").as("code"))
    val seqs = Sequences.build(obs, seqLen = 24, forecastLen = 1, features = Seq("value"))
    // per location: anchors 23..58 (59 needs lead 1 → 58) = 36 rows
    assert(seqs.count() === nLoc.toLong * (nSteps - 24))
    val fc = Forecast.linear(obs, lookback = 24, steps = 12)
    assert(fc.count() === nLoc.toLong * 12)
    // temperature rises 0.1 per step → slope 0.1; step i adds 0.1·i.
    val f0 = fc.filter(col("location") === "loc0" && col("step") === 12).head()
    val lastTemp = 20.0 + 0.1 * (nSteps - 1)
    assert(math.abs(f0.getAs[Double]("pred") - (lastTemp + 1.2)) < 1e-9)
  }
}
