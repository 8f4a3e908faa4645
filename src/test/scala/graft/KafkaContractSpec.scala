package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Parse

/** Pins the `format("kafka")` swap-in contract: Parse.fromKafka must accept
  * the EXACT row shape the Spark Kafka connector emits (all seven columns,
  * binary key/value) and produce the typed observation schema from it. The
  * sandbox has no broker, so the frame is constructed literally with the
  * connector's documented schema — if the connector shape or our consumption
  * of it drifts, this fails before any deployment does. */
class KafkaContractSpec extends AnyFunSuite with SparkFixture {

  private def wireRow(key: String, json: String, ts: String): Row =
    Row(key.getBytes("UTF-8"), json.getBytes("UTF-8"), "weather", 0,
      42L, Timestamp.valueOf(ts), 0)

  test("fromKafka consumes the connector wire schema end-to-end") {
    val frame = spark.createDataFrame(
      java.util.List.of(
        wireRow("hanoi",
          """{"location_name":"hanoi","time":"2024-03-05T12:00:00Z","temperature":"21.5","weathercode":"3"}""",
          "2024-03-05 12:00:05"),
        wireRow("hue",
          """{"message":"lỗi khi gọi api"}""",
          "2024-03-05 12:00:06")),
      Parse.KafkaSourceSchema)
    val parsed = Parse.fromKafka(frame).collect()
    assert(parsed.length === 1) // error row dropped by the parse chain
    val r = parsed.head
    assert(r.getAs[String]("location") === "hanoi")
    assert(r.getAs[Double]("temperature") === 21.5)
    assert(r.getAs[Int]("weathercode") === 3)
    assert(r.getAs[Timestamp]("event_timestamp") ===
      Timestamp.valueOf("2024-03-05 12:00:00"))
  }

  test("fromKafka falls back to broker metadata when the payload lacks key fields") {
    val frame = spark.createDataFrame(
      java.util.List.of(
        wireRow("danang", """{"temperature":"18.0"}""", "2024-03-05 12:30:00")),
      Parse.KafkaSourceSchema)
    val r = Parse.fromKafka(frame).head()
    // location ← kafka key; event time ← broker ingest timestamp.
    assert(r.getAs[String]("location") === "danang")
    assert(r.getAs[Timestamp]("event_timestamp") ===
      Timestamp.valueOf("2024-03-05 12:30:00"))
  }
}
