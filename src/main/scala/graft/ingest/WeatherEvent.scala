package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed view of the parsed observation table (SURVEY.md §1.4: `DataFrame`
  * for the relational core, `Dataset[WeatherEvent]` where compile-time
  * safety pays — sequence assembly, forecast input, per-record business
  * logic). Field names/types mirror the P1-P6 projection exactly. */
case class WeatherEvent(
    key: String,
    location: String,
    event_timestamp: java.sql.Timestamp,
    kafka_timestamp: java.sql.Timestamp,
    temperature: Option[Double],
    windspeed: Option[Double],
    winddirection: Option[Double],
    humidity: Option[Double],
    rain: Option[Double],
    visibility: Option[Double],
    pressure: Option[Double],
    precipitation: Option[Double],
    latitude: Option[Double],
    longitude: Option[Double],
    weathercode: Option[Int],
    interval: Option[Int],
    is_day: Option[Int])

object WeatherEvent {
  /** Parsed frame (Parse.fromKafka / fromJsonValue output) → typed Dataset.
    * Extra columns (payload map, error_message) are dropped by the encoder
    * projection. */
  def typed(parsed: DataFrame): Dataset[WeatherEvent] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed.drop("payload", "error_message", "event_time_raw").as[WeatherEvent]
  }
}
