package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Ingest, StreamOps}

/** Pins the MEASURED watermark-eviction semantics the `stream_sessionize`
  * oracle arithmetic depends on (see `Ingest.stageOrderedFiles` scaladoc):
  *
  *   1. the staged two-file replay (corpus + 1-row driver at the corpus
  *      max) flushes exactly the sessions with end_us <= wm_us — and that
  *      set is INVARIANT to whether the runtime appends a trailing
  *      no-data batch at AvailableNow termination (measured both ways:
  *      a bare spark-shell replay runs none, this forked test JVM runs
  *      one; because the driver row carries the corpus max, the trailing
  *      batch's watermark equals the driver batch's and adds nothing);
  *   2. the tracker truncates event times to MILLISECONDS before
  *      subtracting the delay: wm_us = (max_us / 1000 − delay_ms) · 1000;
  *   3. eviction is INCLUSIVE at exact equality (end == wm → emitted).
  *
  * If a Spark upgrade changes any of these, the oracle's
  * `((max(us) // 1000) - delay_ms) * 1000` + `end <= wm` replay silently
  * diverges from the engine — this spec makes that loud.
  */
class StagedReplaySpec extends AnyFunSuite with SparkFixture {

  private def ts(s: String, micros: Int = 0): Timestamp = {
    val t = Timestamp.valueOf(s)
    t.setNanos(micros * 1000)
    t
  }

  private val gapMin = 30
  private val delay = "30 minutes"

  /** Run sessionizeStream over stageOrderedFiles(corpus, driver) and
    * return the emitted (location, end_us) pairs. */
  private def replay(name: String, corpus: Seq[(String, Timestamp)],
                     driver: Seq[(String, Timestamp)]): Set[(String, Long)] = {
    import spark.implicits._
    val stages = Seq(corpus.toDF("location", "event_timestamp"),
      driver.toDF("location", "event_timestamp"))
    val in = Ingest.stageOrderedFiles(spark, stages,
      s"target/staged_replay_$name")
    val q = StreamOps.sessionizeStream(in, gapMin, delay)
      .writeStream.format("memory").queryName(s"staged_$name")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(s"staged_$name").collect()
      .map(r => (r.getString(0), r.getAs[Long]("session_end_us"))).toSet
  }

  test("staged replay flushes below-wm sessions; boundary end == wm is INCLUSIVE") {
    // wm driver b at 11:20:00.000000 → wm = 10:50:00.000000 exactly;
    // a's session end = 10:20 + 30min = 10:50:00.000000 == wm → emitted;
    // c's 08:30 end is clearly below; b's own session stays open.
    val out = replay("boundary",
      Seq(("a", ts("2024-01-01 10:00:00")), ("a", ts("2024-01-01 10:20:00")),
        ("c", ts("2024-01-01 08:00:00")), ("b", ts("2024-01-01 11:20:00"))),
      Seq(("~wm", ts("2024-01-01 11:20:00"))))
    val usOf = (s: String) => Timestamp.valueOf(s).getTime * 1000L
    assert(out === Set(
      ("a", usOf("2024-01-01 10:50:00")),
      ("c", usOf("2024-01-01 08:30:00"))))
  }

  test("watermark truncates event time to MILLISECONDS before the delay") {
    // max event 11:20:00.000789 → truncated wm = 10:50:00.000000; a's
    // session end 10:50:00.000500 sits BETWEEN the truncated and raw-µs
    // watermarks — held iff the tracker truncates (it does).
    val out = replay("truncation",
      Seq(("a", ts("2024-01-01 10:00:00")),
        ("a", ts("2024-01-01 10:20:00", micros = 500)),
        ("c", ts("2024-01-01 08:00:00")),
        ("b", ts("2024-01-01 11:20:00", micros = 789))),
      Seq(("~wm", ts("2024-01-01 11:20:00", micros = 789))))
    assert(out.map(_._1) === Set("c"))
  }

  test("empty corpus + empty driver degrades to empty output") {
    val out = replay("empty", Nil, Nil)
    assert(out.isEmpty)
  }
}
