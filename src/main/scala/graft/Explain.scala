package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: dumps `explain("formatted")` of every registered
  * query to <outDir>/<name>.txt for shuffle/broadcast/pushdown review.
  * Usage: runMain graft.Explain <sfDir> <outDir>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
