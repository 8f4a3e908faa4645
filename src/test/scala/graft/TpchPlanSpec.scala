package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Plan pins for the TPC-H-shape additions — "correct" is not enough for
  * these, the PLAN is the claim (SURVEY relational table): Q6's filters
  * must reach the parquet scan, Q8's five dimension legs must all
  * broadcast, Q22's NOT-EXISTS must plan as a true anti join. A Catalyst
  * or source-option change that silently degrades one of these keeps the
  * oracle green while losing the 100 TB story; this spec makes it loud.
  */
class TpchPlanSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val q = Registry.all.find(_.name == name)
      .getOrElse(fail(s"$name not in registry"))
    q.fn(spark, dir).queryExecution.executedPlan.toString
  }

  test("q6: all three predicates push into the parquet scan") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("q6_revenue_delta")
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters: ["))
      .mkString("\n")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(c), s"$c not pushed to the scan:\n$pushed")
  }

  test("q8: every dimension leg broadcasts; the fact table never sort-merges against a dimension") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("q8_market_share")
    val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    // part, supplier-nation, customer-region legs at minimum (orders ⋈
    // lineitem is fact-on-fact and may shuffle — that one is keyed)
    assert(bhj >= 3, s"expected >= 3 broadcast joins, saw $bhj:\n$plan")
    val smjOnDim = plan.linesIterator.exists(l =>
      l.contains("SortMergeJoin") &&
        (l.contains("p_partkey") || l.contains("s_suppkey") ||
          l.contains("n_nationkey") || l.contains("r_regionkey")))
    assert(!smjOnDim, s"a dimension leg sort-merged:\n$plan")
  }

  test("q22: the no-recent-orders predicate plans as an anti join on the pruned orders side") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("q22_idle_customers")
    assert(plan.contains("LeftAnti"), s"no anti join in:\n$plan")
    // the recency filter must prune orders BEFORE the anti join's build
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters: ["))
      .mkString("\n")
    assert(pushed.contains("o_orderdate"),
      s"recency predicate not pushed into the orders scan:\n$pushed")
  }

  test("q21: both correlation legs plan as keyed semi/anti joins — never cartesian or nested-loop") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("q21_suppliers_waiting")
    // the EXISTS leg must be a LeftSemi and the NOT-EXISTS a LeftAnti,
    // each keyed on l_orderkey (hash or sort-merge — AQE picks by size);
    // the supplier-inequality / lateness predicates ride as residuals
    assert(plan.contains("LeftSemi"), s"no semi join in:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti join in:\n$plan")
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!plan.contains(bad), s"$bad in q21's plan:\n$plan")
  }

  test("q5_local: the cross-dimension nation equality rides in the broadcast join, never a non-key shuffle") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("q5_local_supplier_volume")
    // the supplier leg must broadcast; no exchange may hash-partition on
    // a nationkey (the cross-dimension predicate is a join residual)
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    val nationShuffle = plan.linesIterator.exists(l =>
      l.contains("Exchange hashpartitioning") && l.contains("nationkey"))
    assert(!nationShuffle, s"a nationkey shuffle appeared:\n$plan")
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!plan.contains(bad), s"$bad in q5_local's plan:\n$plan")
  }

  test("q12: the year window pushes into the lineitem scan; the join stays keyed") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("q12_priority_shipping")
    // at 100 TB the shipdate window is the partition-pruning predicate —
    // it must reach the parquet scan, not evaluate post-join
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters: ["))
      .mkString("\n")
    assert(pushed.contains("l_shipdate"),
      s"shipdate window not pushed into the lineitem scan:\n$pushed")
    // the lateness predicate is a residual on the keyed orderkey join —
    // a theta-join plan (cartesian / nested-loop) would be the scale killer
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!plan.contains(bad), s"$bad in q12's plan:\n$plan")
  }

  test("q16: the supplier blacklist NOT IN plans as a broadcast anti join; no cartesian") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("q16_parts_supplier_cnt")
    assert(plan.contains("LeftAnti"), s"no anti join in:\n$plan")
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!plan.contains(bad), s"$bad in q16's plan:\n$plan")
  }
}
