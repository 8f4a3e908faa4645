package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("registered long_array_dot is callable from SQL") {
    // Register on the shared session's registry — the same tuples the
    // GraftExtensions session hook injects at build time (a second
    // SparkSession cannot be built in this JVM without stopping the
    // shared context).
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    val out = spark.sql(
      "SELECT long_array_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .head().getLong(0)
    assert(out === 32L)
  }

  test("the extensions hook applies without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // builds and injects the tuples
  }
}
