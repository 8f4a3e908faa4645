package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LongArrayDot

class LongArrayDotSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val df = Seq(
    (Array(1L, 2L, 3L), Array(4L, 5L, 6L)),
    (Array(-2L, 0L, 7L), Array(3L, 9L, -1L)),
    (Array.empty[Long], Array.empty[Long]))
    .toDF("a", "b")

  test("native dot matches the higher-order-function form") {
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val rows = df.select(LongArrayDot.dot(col("a"), col("b")).as("native"), hof.as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(rows.map(_.getLong(0)).toSeq === Seq(32L, -13L, 0L))
  }

  test("null array yields null (nullIntolerant)") {
    val withNull = Seq((Some(Array(1L)), None: Option[Array[Long]]))
      .toDF("a", "b")
    assert(withNull.select(LongArrayDot.dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("expression participates in whole-stage codegen") {
    // repartition blocks ConvertToLocalRelation from pre-evaluating the
    // projection at optimize time, so the real codegen path is exercised.
    val planned = df.repartition(2)
      .select(LongArrayDot.dot(col("a"), col("b")).as("d"))
    // Execute first: with AQE the codegen stages appear in the final plan,
    // rendered as a "*(n)" prefix on codegen'd operators.
    assert(planned.collect().map(_.getLong(0)).sorted.toSeq === Seq(-13L, 0L, 32L))
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[long_array_dot.*"),
      s"expected a codegen'd (*-prefixed) Project with long_array_dot in:\n$plan")
  }
}
