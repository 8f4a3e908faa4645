package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Rollup

case class Obs(location: String, event_timestamp: java.sql.Timestamp,
               event_id: Long, code: String, value: Double)

class StreamingSpec extends AnyFunSuite with SparkFixture {

  private def ts(minute: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("memory-sink stream materializes incrementally; batch rollup sees late rows on re-query") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Obs]
    val query = input.toDF().writeStream
      .format("memory").queryName("obs_stream_test").outputMode("append").start()

    input.addData(Obs("a", ts(0), 1, "x", 1.0), Obs("a", ts(1), 2, "x", 3.0))
    query.processAllAvailable()
    val t1 = spark.table("obs_stream_test")
    assert(t1.count() === 2)
    val roll1 = Rollup.hourly(t1, avgCols = Seq("value")).collect()
    assert(roll1.head.getAs[Double]("avg_value") === 2.0)

    // Late-arriving row: appears on the NEXT query over the same table —
    // the reference's recompute-on-read semantics (SURVEY.md §2.10).
    input.addData(Obs("b", ts(2), 3, "y", 8.0))
    query.processAllAvailable()
    val roll2 = Rollup.hourly(spark.table("obs_stream_test"), avgCols = Seq("value")).collect()
    assert(roll2.head.getAs[Double]("avg_value") === 4.0)
    assert(roll2.head.getAs[Long]("n_rows") === 3L)
    query.stop()
  }

  test("hot/cold path: memory table when materialized, batch fallback when not") {
    import spark.implicits._
    val cold = Seq(Obs("cold", ts(0), 1, "x", 1.0)).toDF()
    // cold: the table does not exist yet
    val before = graft.serve.Paths.hotOrCold(spark, "no_such_table_yet", cold)
    assert(before.head().getAs[String]("location") === "cold")
    // hot: once a stream materializes the name, it wins
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Obs]
    val query = input.toDF().writeStream
      .format("memory").queryName("hotcold_table").outputMode("append").start()
    input.addData(Obs("hot", ts(1), 2, "y", 2.0))
    query.processAllAvailable()
    val after = graft.serve.Paths.hotOrCold(spark, "hotcold_table", cold)
    assert(after.head().getAs[String]("location") === "hot")
    query.stop()
  }

  test("streaming dropDuplicatesWithinWatermark removes replayed events") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Obs]
    val deduped = input.toDF()
      .withWatermark("event_timestamp", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val query = deduped.writeStream.format("memory")
      .queryName("stream_dedup").outputMode("append").start()
    input.addData(Obs("a", ts(0), 1, "x", 1.0), Obs("a", ts(1), 2, "x", 2.0))
    query.processAllAvailable()
    // replay event 1 (at-least-once delivery) within the watermark window
    input.addData(Obs("a", ts(0), 1, "x", 1.0))
    query.processAllAvailable()
    assert(spark.table("stream_dedup").count() === 2)
    query.stop()
  }

  test("modal code of the streamed table breaks ties deterministically") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Obs]
    val query = input.toDF().writeStream
      .format("memory").queryName("obs_stream_modal").outputMode("append").start()
    input.addData(
      Obs("a", ts(0), 1, "z", 1.0), Obs("a", ts(1), 2, "z", 1.0),
      Obs("a", ts(2), 3, "y", 1.0), Obs("a", ts(3), 4, "y", 1.0))
    query.processAllAvailable()
    val modal = Rollup.modalCode(spark.table("obs_stream_modal"),
      hour(col("event_timestamp")), "hour").collect()
    assert(modal.head.getAs[String]("modal_code") === "y") // tie → code asc
    query.stop()
  }
}
