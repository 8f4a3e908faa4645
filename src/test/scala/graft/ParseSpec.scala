package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Parse

class ParseSpec extends AnyFunSuite with SparkFixture {
  import java.sql.Timestamp

  private val kafkaTs = Timestamp.valueOf("2024-06-01 10:00:00")

  private def parseRaw(raw: String): Timestamp = {
    val df = spark.createDataFrame(
      java.util.List.of(Row(raw, kafkaTs)),
      StructType(Seq(StructField("raw", StringType), StructField("kts", TimestampType))))
    df.select(Parse.resolveEventTime(col("raw"), col("kts")).as("ts"))
      .head().getTimestamp(0)
  }

  test("resolveEventTime parses ISO-8601 with T and Z") {
    assert(parseRaw("2024-03-05T12:34:56Z") === Timestamp.valueOf("2024-03-05 12:34:56"))
  }

  test("resolveEventTime parses space-separated seconds format") {
    assert(parseRaw("2024-03-05 12:34:56") === Timestamp.valueOf("2024-03-05 12:34:56"))
  }

  test("resolveEventTime parses minute-precision format") {
    assert(parseRaw("2024-03-05 12:34") === Timestamp.valueOf("2024-03-05 12:34:00"))
  }

  test("resolveEventTime falls back to the kafka timestamp on garbage") {
    assert(parseRaw("not-a-time") === kafkaTs)
  }

  test("typed Dataset[WeatherEvent] view round-trips the parsed projection") {
    val rows = java.util.List.of(
      Row("locA", """{"location_name":"locA","time":"2024-03-05T12:00:00Z","temperature":"21.5","weathercode":"3"}""", kafkaTs))
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("key", StringType), StructField("value", StringType),
      StructField("kafka_timestamp", TimestampType))))
    val ds = graft.ingest.WeatherEvent.typed(Parse.fromJsonValue(df))
    val e = ds.head()
    assert(e.location === "locA")
    assert(e.temperature === Some(21.5))
    assert(e.weathercode === Some(3))
    assert(e.humidity === None)
  }

  test("corrupt JSON degrades gracefully: key/kafka-ts fallbacks, null metrics") {
    val rows = java.util.List.of(
      Row("locX", """not json at all""", kafkaTs),
      Row("locY", """{"temperature":"NaNope","time":"garbage"}""", kafkaTs))
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("key", StringType), StructField("value", StringType),
      StructField("kafka_timestamp", TimestampType))))
    val parsed = Parse.fromJsonValue(df).orderBy("key").collect()
    assert(parsed.length === 2)
    // Unparseable value → payload null → location falls back to the key,
    // event time to the broker timestamp (P4/P5 coalesce chains).
    assert(parsed(0).getAs[String]("location") === "locX")
    assert(parsed(0).getAs[java.sql.Timestamp]("event_timestamp") === kafkaTs)
    // Untypable metric string → null double, not a crash (schema-on-read).
    assert(parsed(1).isNullAt(parsed(1).fieldIndex("temperature")))
    assert(parsed(1).getAs[java.sql.Timestamp]("event_timestamp") === kafkaTs)
  }

  test("fromJsonValue projects typed metrics and drops error rows") {
    val rows = java.util.List.of(
      Row("locA", """{"location_name":"locA","time":"2024-03-05T12:00:00Z","temperature":"21.5","weathercode":"3"}""", kafkaTs),
      Row("locB", """{"location_name":"locB","time":"2024-03-05T12:00:00Z","temperature":"9.0","message":"lỗi khi gọi api"}""", kafkaTs))
    val df = spark.createDataFrame(rows, StructType(Seq(
      StructField("key", StringType), StructField("value", StringType),
      StructField("kafka_timestamp", TimestampType))))
    val parsed = Parse.fromJsonValue(df)
    assert(parsed.count() === 1)
    val r = parsed.head()
    assert(r.getAs[String]("location") === "locA")
    assert(r.getAs[Double]("temperature") === 21.5)
    assert(r.getAs[Int]("weathercode") === 3)
  }
}
