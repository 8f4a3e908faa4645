package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Plan pins for the sketch family — like TpchPlanSpec, the PLAN is the
  * claim here, not just the oracle result: each sketch query's 100 TB
  * story is "the corpus is scanned exactly N times and everything after
  * the per-partition partial cut is sketch-sized". A Catalyst change
  * that silently added a second corpus scan (a lost reuse, a
  * de-optimized self-join) or dropped the map-side partial would keep
  * the oracle green while losing exactly that story — these pins make
  * it loud.
  */
class SketchPlanSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val q = Registry.all.find(_.name == name)
      .getOrElse(fail(s"$name not in registry"))
    q.fn(spark, dir).queryExecution.executedPlan.toString
  }

  // Bounded pins (ADVICE r17 + review r18): the 100 TB claim is "no
  // EXTRA corpus scan", so the ceiling is <= N (an exact == would fail
  // cosmetically when AQE exchange reuse collapses a scan line), but a
  // >= 1 floor stays — a plan with ZERO parquet scans means the query
  // stopped touching the corpus (or the plan-string format changed),
  // which must fail loudly, not pass as "no extra scans".
  private def scans(plan: String): Int =
    plan.linesIterator.count(_.contains("Scan parquet"))

  test("sketch_kmv_sliding: ONE corpus scan; the sliding union is a window over sketch rows") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("sketch_kmv_sliding")
    assert(scans(plan) >= 1 && scans(plan) <= 1,
      s"expected exactly one live corpus scan (>= 1 proves the query still\n" +
        s"touches the corpus; <= 1 is the no-extra-scan claim):\n$plan")
    // the range-frame union must plan as a Window over the aggregated
    // (sketch-sized) relation, and the bounded bottom-k partial must cut
    // BEFORE its exchange (two ObjectHashAggregate = partial + final)
    assert(plan.contains("Window"), s"no window operator in:\n$plan")
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"bottom-k partial/final pair missing — the distinct exchange would " +
        s"carry uncut rows:\n$plan")
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!plan.contains(bad), s"$bad in the sliding plan:\n$plan")
  }

  test("sketch_kmv_overlap_sliding: corpus-scan ceiling of the self-joined daily store; windows + pair join over sketch rows only") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("sketch_kmv_overlap_sliding")
    // the daily-sketch subtree appears on BOTH sides of the same-day pair
    // self-join, so the ceiling is 2 (exchange reuse may collapse it to
    // 1); anything above means the window or the estimator re-touched
    // the corpus
    assert(scans(plan) >= 1 && scans(plan) <= 2,
      s"expected 1-2 live corpus scans:\n$plan")
    assert(plan.contains("Window"), s"no window operator in:\n$plan")
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"bottom-k partial/final pair missing:\n$plan")
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!plan.contains(bad), s"$bad in the sliding-overlap plan:\n$plan")
  }

  test("sketch_kmv_distinct: ONE corpus scan with the null guard pushed to it; partial bottom-k before the exchange") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("sketch_kmv_distinct")
    assert(scans(plan) >= 1 && scans(plan) <= 1,
      s"expected exactly one live corpus scan:\n$plan")
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters: ["))
      .mkString("\n")
    assert(pushed.contains("IsNotNull"),
      s"NULL-key guard not pushed into the scan:\n$pushed")
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"bottom-k partial/final pair missing:\n$plan")
  }

  test("sketch_topk_heavy: two corpus scans (one per half), bounded pair cut before each exchange, one group-keyed merge join") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("sketch_topk_heavy")
    // one scan per half-corpus summary and NOTHING else: the single-pass
    // mgSummary (bounded top-(k+1) pair aggregator) must not re-scan for
    // a threshold join-back — the shape that collapsed 6 scans to 2
    assert(scans(plan) >= 1 && scans(plan) <= 2,
      s"expected 1-2 live corpus scans:\n$plan")
    // the bounded pair aggregator must partial-cut before its exchange
    // (partial/final ObjectHashAggregate per half = 4 lines)
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 4,
      s"bounded top-(k+1) partial/final pairs missing:\n$plan")
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!plan.contains(bad), s"$bad in the heavy-hitters plan:\n$plan")
  }

  test("sketch_cms_sliding: group-keyed range join (no nested loop), bounded scan fan-out, partial cell counts") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("sketch_cms_sliding")
    // the static plan re-states the daily-cells aggregate in each branch
    // (days/cells/estimate-days/store legs + probes = 5) — identical
    // subtrees whose exchanges AQE reuses at runtime; the pin guards
    // against a NEW corpus leg sneaking in, not the branch count
    assert(scans(plan) >= 1 && scans(plan) <= 5,
      s"expected 1-5 live corpus scans:\n$plan")
    // the trailing-day window must plan as an equi-join on the group key
    // with the day range as a residual — a date-range nested loop over
    // the cells relation would be the scale killer
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!plan.contains(bad), s"$bad in the sliding-CMS plan:\n$plan")
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"partial/final cell aggregation missing:\n$plan")
  }

  test("sketch_quantiles_sliding: ONE corpus scan; the sliding union is a window over packed sketch rows") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("sketch_quantiles_sliding")
    assert(scans(plan) >= 1 && scans(plan) <= 1,
      s"expected exactly one live corpus scan (daily packed sketches feed " +
        s"every window):\n$plan")
    assert(plan.contains("Window"), s"no window operator in:\n$plan")
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"bottom-k partial/final pair missing:\n$plan")
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!plan.contains(bad), s"$bad in the sliding-quantiles plan:\n$plan")
  }

  test("sketch_topk_sliding: bounded scan fan-out, no nested-loop range join, bounded pair cuts") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("sketch_topk_sliding")
    // daily-summary branches (candidates / days / errs legs) + the merge
    // prune re-statement = 4 static scans; AQE reuses the identical
    // daily-count exchanges at runtime — the pin guards a NEW corpus leg
    assert(scans(plan) >= 1 && scans(plan) <= 4,
      s"expected 1-4 live corpus scans:\n$plan")
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!plan.contains(bad), s"$bad in the trending-keys plan:\n$plan")
    // daily prune + merge prune both ride the bounded pair aggregator,
    // partial-cut before their exchanges
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 4,
      s"bounded pair partial/final cuts missing:\n$plan")
  }

  test("sketch_topk_refined: MG + CMS composition stays equi-joined, no cartesian, bounded cuts") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("sketch_topk_refined")
    // MG summary + CMS cell build + the probe leg (MG candidates) = 3
    assert(scans(plan) >= 1 && scans(plan) <= 3,
      s"expected 1-3 live corpus scans:\n$plan")
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!plan.contains(bad), s"$bad in the refined plan:\n$plan")
    assert(plan.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2,
      s"bounded pair partial/final cut missing:\n$plan")
  }

  test("sketch_cms_freq: three corpus scans (two halves + probes), partial cell counts, no cartesian") {
    assume(new java.io.File(dir).isDirectory)
    val plan = planOf("sketch_cms_freq")
    // two half-corpus builds + the probe-set DISTINCT — and nothing more
    // (a fourth scan would mean a build leg lost its reuse)
    assert(scans(plan) >= 1 && scans(plan) <= 3,
      s"expected 1-3 live corpus scans:\n$plan")
    // cell counts must partial-aggregate map-side (HashAggregate pairs
    // around the exchange) — the only corpus-shaped work combines to
    // <= d*w cells per group before shuffling
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"partial/final cell aggregation missing:\n$plan")
    for (bad <- Seq("CartesianProduct", "BroadcastNestedLoopJoin"))
      assert(!plan.contains(bad), s"$bad in the CMS plan:\n$plan")
  }
}
