package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (JVM-forked by sbt). */
object SparkTest {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // typed-Aggregator groups (BoundedTopK*/BoundedCollect/ModalAgg) keep
      // BOUNDED buffers, so the ObjectHashAggregate 128-distinct-key sort
      // fallback only re-introduces the corpus-wide sort the aggregators
      // exist to avoid (measured: brute hardNegatives 44.4 s -> 13.8 s at
      // 100x when the map stays hash). 64k keys x k-pair buffers is MBs.
      // BLAST RADIUS (session-wide, ADVICE r16): this raises the
      // ObjectHashAggregate sort-fallback for EVERY typed aggregate in the
      // session, not just the bounded BoundedTopK*/ModalAgg buffers it
      // exists for. A future aggregator with UNBOUNDED per-group state
      // (collect_list/percentile-style) over >64k groups per partition
      // would lose the 128-key memory safety valve — keep new typed
      // aggregates k-bounded, or scope this per-query via withSQLConf.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkFixture {
  lazy val spark: SparkSession = SparkTest.session

  /** Run EVERY registry query against `dir` through a noop sink (so all
    * output columns materialize — a bare count() would let Catalyst prune
    * the subtrees under test), returning "name: first error line" per
    * failure. Shared by RegistrySmokeSpec (sf0.001 data) and
    * EmptyCorpusSpec (empty tables) so the two tripwires drive queries
    * identically and cannot drift. */
  protected def runRegistry(dir: String): Seq[String] =
    graft.queries.Registry.all.flatMap { q =>
      try {
        q.fn(spark, dir).write.format("noop").mode("overwrite").save()
        None
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          Some(s"${q.name}: ${msg.linesIterator.nextOption().getOrElse("")}")
      }
    }
}
