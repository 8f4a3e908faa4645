package graft

import org.scalatest.funsuite.AnyFunSuite


/** Runs EVERY registry query against a corpus of schema-identical EMPTY
  * tables: a new partition, tenant, or date range with no data yet is an
  * everyday input at 100 TB, and "empty in ⇒ empty out" must hold — not a
  * driver-side head() on nothing, a null aggregate NPE, or a require()
  * tripping. The one deliberate empty-input guard in the engine
  * (connectedComponents' early return before its sum-based convergence
  * probe) exists precisely for this class of input; this spec pins the
  * whole surface.
  */
class EmptyCorpusSpec extends AnyFunSuite with SparkFixture {

  test("every registry query degrades to empty output on an empty corpus") {
    val src = "/root/testdata/sf0.001"
    assume(new java.io.File(src).isDirectory, s"$src not present")
    // under target/ (not /tmp): mode=overwrite makes reruns reuse the same
    // path instead of accumulating per-run temp directories
    val dir = "target/empty_corpus"
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = runRegistry(dir)
    assert(failures.isEmpty,
      s"${failures.size} queries crash on an empty corpus:\n" + failures.mkString("\n"))
  }
}
