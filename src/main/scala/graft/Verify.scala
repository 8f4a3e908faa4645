package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Some driver generations of events.parquet carry INT64
      // TIMESTAMP(NANOS); set at build time so any code path (not just
      // Tables.events) can read them. Harmless for µs lineage. See Tables.scala.
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Same targeted-iteration filter as Bench: comma-separated query names.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val failures = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          failures(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        }
        // Same per-query hygiene as Bench: operators persist/localCheckpoint
        // intermediates (Dedup signatures, the CC loop's checkpoints); without
        // an explicit RDD-level unpersist those blocks accumulate across all
        // 60+ queries of a verify run, and broadcast blocks are reaped by
        // neither call (only ContextCleaner after driver GC — see
        // BlockHygiene). Cost: the blocking unpersist + broadcast destroy add
        // a few ms per query (~1-2 s over a full 68-query verify run) —
        // honest per-query isolation is worth that; correctness output is
        // unaffected either way.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        org.apache.spark.graft.BlockHygiene.destroyBroadcasts(spark.sparkContext)
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Failure manifest: a query with no output dir silently VANISHES from
    // the driver's correctness report (round 9 lost 25 queries to a
    // testdata schema drift with no visible trace). Name them durably.
    Files.writeString(Paths.get(s"$outDir/_failures.json"),
      failures.map { case (k, v) =>
        s"${q(k)}: ${q(v.linesIterator.nextOption().getOrElse(""))}" }
        .mkString("{", ",", "}"))
    if (failures.nonEmpty) {
      System.err.println(s"[verify] ${failures.size} queries FAILED: " +
        failures.keys.mkString(", "))
    }
    spark.stop()
  }
}
