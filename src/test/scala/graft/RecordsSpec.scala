package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.serve.Records

class RecordsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("record shaping drops nulls and blacklisted payload keys") {
    val df = Seq(("locA", Some(21.5), """{"a":"1","message":"boom"}"""),
        ("locB", None: Option[Double], """{"b":"2"}"""))
      .toDF("location", "temperature", "raw")
      .withColumn("payload",
        from_json(col("raw"), graft.ingest.Parse.PayloadSchema))
      .drop("raw")
    val records = Records.toJsonRecords(df).collect().sorted
    assert(records(0) === """{"location":"locA","temperature":21.5,"payload":{"a":"1"}}""")
    assert(records(1) === """{"location":"locB","payload":{"b":"2"}}""")
  }
}
