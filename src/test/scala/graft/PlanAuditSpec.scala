package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Registry-wide PLAN tripwires (planning only — no execution): the
  * anti-patterns that would silently creep in with a future edit and only
  * surface as a 100 TB incident, asserted red-build-on-introduction:
  *
  *  - `CartesianProduct`: an unkeyed join that lost its equi-condition
  *    (or a broadcast hint that stopped applying) plans as a full
  *    cartesian — correct output, corpus² cost. Today every cross-shape
  *    in the registry is a BroadcastNestedLoopJoin against a 1-row or
  *    K-row relation (anchors, stats, centroids, fixtures), which is the
  *    allowed form; a plain CartesianProduct is never intended.
  *  - `rand(`: any nondeterministic expression would break the oracle
  *    hash-compare only intermittently — far worse than deterministically.
  *    All sampling/shuffling in the registry is seeded-hash based.
  */
class PlanAuditSpec extends AnyFunSuite with SparkFixture {

  test("no registry plan contains a CartesianProduct or rand()") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory, s"$dir not present")
    val offenders = Registry.all.flatMap { q =>
      try {
        val plan = q.fn(spark, dir).queryExecution.executedPlan.toString
        val bad = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "rand(" -> plan.contains("rand(")).collect { case (tag, true) => tag }
        if (bad.nonEmpty) Some(s"${q.name}: ${bad.mkString(", ")}") else None
      } catch {
        // execution-path failures are RegistrySmokeSpec's job; a query that
        // cannot even plan will fail there with a better message
        case _: Throwable => None
      }
    }
    assert(offenders.isEmpty,
      s"${offenders.size} plans contain anti-patterns:\n" + offenders.mkString("\n"))
  }
}
