package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

class SkewSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("salted two-stage aggregation equals the direct aggregation") {
    // one hot key ("hot" = 90% of rows) plus a tail
    val rows = (0 until 900).map(i => ("hot", i.toDouble)) ++
      (0 until 100).map(i => (s"k${i % 10}", i.toDouble))
    val df = rows.toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("total"), max(col("v")).as("mx"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAggregate(df, Seq("k"), salts = 16,
        "n" -> (count(lit(1)), sum(col("n"))),
        "total" -> (sum(col("v")), sum(col("total"))),
        "mx" -> (max(col("v")), max(col("mx"))))
      .select("k", "n", "total", "mx")
      .orderBy("k").collect().toSeq
    assert(salted === direct)
  }

  test("partial stage actually fans a hot key across salts") {
    val df = (0 until 1000).map(i => ("hot", i)).toDF("k", "v")
    val partialGroups = df.withColumn("__salt",
        pmod(hash(df.columns.map(col): _*), lit(16)))
      .groupBy("k", "__salt").count().count()
    assert(partialGroups > 1)
  }
}
