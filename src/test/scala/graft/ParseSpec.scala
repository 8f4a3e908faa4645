package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Parse

class ParseSpec extends AnyFunSuite with SparkFixture {
  import java.sql.Timestamp
  import spark.implicits._

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

  test("coerceScalar reproduces the reference's bool→int→float→string heuristic") {
    // Table-driven parity with spark.py:301-319: (input, expected kind,
    // expected value rendered as a string for one-column comparison).
    val cases = Seq(
      ("true", "bool", "true"), ("  False ", "bool", "false"),
      ("42", "long", "42"), ("-7", "long", "-7"), ("+3", "long", "3"),
      ("3.14", "double", "3.14"), (".5", "double", "0.5"),
      ("2.0", "long", "2"),          // integral float demotes to int
      ("-8.000", "long", "-8"),
      ("abc", "string", "abc"), ("  padded  ", "string", "padded"),
      ("1e5", "string", "1e5"),      // int() rejects scientific notation
      ("inf", "string", "inf"),      // and infinities (no dot → int path)
      ("1.2.3", "string", "1.2.3"),  // float() rejects → falls to string
      ("", "null", null), (null, "null", null))
    val df = cases.map(_._1).toDF("raw")
      .select(col("raw"), Parse.coerceScalar(col("raw")).as("v"))
      .select(col("v.kind").as("kind"),
        coalesce(col("v.bool_v").cast("string"), col("v.long_v").cast("string"),
          col("v.double_v").cast("string"), col("v.str_v")).as("rendered"))
      .collect()
    cases.zip(df).foreach { case ((in, kind, rendered), row) =>
      assert(row.getString(0) === kind, s"kind of <$in>")
      assert(Option(row.getString(1)) === Option(rendered), s"value of <$in>")
    }
  }

  test("normalizePayload drops blacklisted keys and null-coercing values") {
    val df = Seq(
      Map("temp" -> "21.5", "ok" -> "TRUE", "Message" -> "boom",
          "ERROR" -> "x", "error_message" -> "y", "blank" -> "  ", "note" -> "fine"))
      .toDF("payload")
      .select(Parse.normalizePayload(col("payload")).as("p"))
    val m = df.select(map_keys(col("p"))).head().getSeq[String](0).toSet
    assert(m === Set("temp", "ok", "note"))
    val kinds = df.select(col("p.temp.kind"), col("p.ok.kind"), col("p.note.kind")).head()
    assert(kinds.getString(0) === "double")
    assert(kinds.getString(1) === "bool")
    assert(kinds.getString(2) === "string")
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
