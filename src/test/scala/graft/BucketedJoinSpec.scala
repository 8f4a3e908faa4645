package graft

import org.scalatest.funsuite.AnyFunSuite

/** 100 TB design check: bucketing co-locates both join sides so the join
  * plans WITHOUT a shuffle exchange (SURVEY.md §7.2 step 8 scale notes —
  * "co-located joins via bucketing"). This is the mechanism a repeated
  * fact-fact join at scale relies on. */
class BucketedJoinSpec extends AnyFunSuite with SparkFixture {

  test("join between tables bucketed on the key plans without an exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS bk_orders")
    spark.sql("DROP TABLE IF EXISTS bk_items")
    (1 to 1000).map(i => (i.toLong, s"o$i")).toDF("k", "o")
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("bk_orders")
    (1 to 3000).map(i => ((i % 1000 + 1).toLong, i * 1.5)).toDF("k", "v")
      .write.bucketBy(8, "k").sortBy("k").saveAsTable("bk_items")

    val joined = spark.table("bk_orders").join(spark.table("bk_items"), "k")
    assert(joined.count() === 3000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
  }
}
