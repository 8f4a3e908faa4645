package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Registry

/** Driver-contract invariants: unique names, oracle keys ⊆ query keys, and
  * the flagship smoke query returning rows on the smallest scale factor —
  * exactly what the driver's t1 check runs. */
class RegistrySpec extends AnyFunSuite with SparkFixture {

  test("query names are unique and every oracle key has a query") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size >= 40)
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
