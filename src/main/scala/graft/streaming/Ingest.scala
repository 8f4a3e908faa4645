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

  /** Stream `dir`/events.parquet into a fresh named in-memory table and
    * block until the AvailableNow trigger drains. Returns the normalized
    * (µs-timestamp) view of the materialized table. */
  def materializeEvents(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val name = s"graft_events_stream_${counter.incrementAndGet()}"
    val schema = spark.read.parquet(path).schema
    // The file stream source requires a directory: point it at the sf dir
    // and glob-filter to the events file (other tables are ignored).
    val query = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
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
