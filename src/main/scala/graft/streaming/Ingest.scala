package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.Tables

/** Structured Streaming ingest (SURVEY.md §2.10, S2→S3→S4): stream →
  * stateless parse/normalize → append-mode memory sink → interactive
  * queries against the materialized table. Mirrors the reference's split
  * (prediction/preprocessing/spark.py:279-297): the stream itself is
  * stateless; all aggregation happens on the materialized table at query
  * time, so late data simply appears on the next query.
  *
  * The test/verify path streams the driver's events parquet with an
  * AvailableNow trigger — the same code shape as the Kafka path
  * (`readStream.format("kafka")`), which only swaps the source; scale-wise
  * the memory sink is replaced by a table/Delta sink (SURVEY.md §2.10 note),
  * keeping this module's contract (a named queryable table) unchanged.
  */
object Ingest {

  private val counter = new AtomicLong(0)

  /** File-stream a parquet table that may be laid out either as a single
    * file `dir/<table>.parquet` (the driver's testdata layout) or as a
    * Spark-written DIRECTORY of part files under that name. The file
    * stream source requires a directory basePath (a bare file path fails
    * with STREAM_FAILED), so the single-file layout streams the parent
    * dir with a glob filter pinned to the one file; the directory layout
    * streams the directory itself — the glob-filter form there would
    * silently match ZERO part files and stream nothing (the r15 ADVICE
    * failure mode this helper closes). Callers still assert nonzero
    * output, so a future third layout fails loudly, not silently. */
  def streamParquet(spark: SparkSession, dir: String,
                    table: String): DataFrame = {
    val path = s"$dir/$table.parquet"
    val schema = spark.read.parquet(path).schema
    if (new java.io.File(path).isDirectory)
      spark.readStream.schema(schema).parquet(path)
    else
      spark.readStream.schema(schema)
        .option("pathGlobFilter", s"$table.parquet").parquet(dir)
  }

  /** Stage each DataFrame as ONE parquet file under `dir` with strictly
    * increasing modification times and open the directory as a file
    * stream that processes exactly one file per micro-batch
    * (`maxFilesPerTrigger=1`, oldest-first — the file source's initial
    * listing order).
    *
    * Why this exists: an event-time watermark computed at the end of
    * micro-batch N only APPLIES from batch N+1, and whether Spark
    * appends a trailing NO-DATA batch at AvailableNow termination (which
    * would apply the final watermark) turned out to be
    * environment-sensitive — measured BOTH ways on this Spark: a bare
    * spark-shell one-file replay emits zero sessions even for sessions
    * far below the final watermark (no flush batch), while the repo's
    * forked test/runMain JVMs do run one. An emission set that depends
    * on that is not oracle-checkable. Staging the corpus as file 0 and
    * a 1-row watermark-driver relation AT THE CORPUS MAX event time as
    * file 1 makes the set invariant: the wm from the corpus batch
    * applies while batch 2 runs, finalizing every window at or below
    * it — and if a trailing no-data batch does run, its wm is identical
    * (the driver row adds no later event time), so it adds nothing.
    * This is the bounded-replay equivalent of the production shape,
    * where the watermark advances naturally with arriving batches and
    * no staging is needed. Only the verification surface stages (and
    * the coalesce(1) there is sf-bounded); a deployed stream reads
    * Kafka/file arrivals directly.
    *
    * Pinned eviction semantics this helper exposes (measured on this
    * Spark, boundary cases included): wm_us = (max_event_us/1000 −
    * delay_ms)·1000 (the tracker truncates event times to MILLISECONDS
    * before subtracting the delay) and a session/window emits iff
    * end_us <= wm_us (inclusive at exact equality). Oracles that replay
    * a staged stream must use exactly this arithmetic. */
  /** Recursive local delete for staging/store scratch under target/ —
    * the ONE copy of the helper every staged-replay call site used to
    * inline (review r18). Local-FS only by design: scratch lives under
    * target/; the sketch STORE listing, which must work on HDFS/S3,
    * walks via the Hadoop FS API instead
    * ([[StreamOps.sketchStoreRead]]). */
  def deleteRecursively(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(path))
  }

  def stageOrderedFiles(spark: SparkSession, stages: Seq[DataFrame],
                        dir: String): DataFrame = {
    val root = new java.io.File(dir)
    deleteRecursively(dir) // stale extra files would add phantom micro-batches
    root.mkdirs()
    val base = System.currentTimeMillis() - 3600L * 1000
    stages.zipWithIndex.foreach { case (df, i) =>
      val stage = new java.io.File(root, s"_stage$i")
      df.coalesce(1).write.mode("overwrite").parquet(stage.getPath)
      val part = stage.listFiles
        .filter(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).head
      val dst = new java.io.File(root, f"$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(base + i * 10000L) // mtime order = stage order
      deleteRecursively(stage.getPath)
    }
    val schema = spark.read.parquet(s"$dir/0000.parquet").schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
  }

  /** Stream `dir`/events.parquet into a fresh named in-memory table and
    * block until the AvailableNow trigger drains. Returns the normalized
    * (µs-timestamp) view of the materialized table. */
  def materializeEvents(spark: SparkSession, dir: String): DataFrame = {
    val name = s"graft_events_stream_${counter.incrementAndGet()}"
    val query = streamParquet(spark, dir, "events")
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    Tables.normalizeEventTs(spark.table(name))
  }
}
