package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sequences

class SequencesSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def obs(n: Int) = (0 until n).map { i =>
    ("u", java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
      .plusSeconds(i * 300L)), i.toLong, i.toDouble, "c")
  }.toDF("location", "event_timestamp", "event_id", "value", "code")

  test("build emits only complete windows with aligned targets") {
    val out = Sequences.build(obs(30), seqLen = 24, forecastLen = 3,
      features = Seq("value", "code")).orderBy("end_timestamp").collect()
    // anchors 23..26 have 24-row history AND target at +3 (29 is the last row)
    assert(out.length === 4)
    val first = out.head
    val seq = first.getSeq[org.apache.spark.sql.Row](first.fieldIndex("sequence"))
    assert(seq.length === 24)
    assert(seq.head.getAs[Double]("value") === 0.0)
    assert(seq.last.getAs[Double]("value") === 23.0)
    val target = first.getStruct(first.fieldIndex("target"))
    assert(target.getAs[Double]("value") === 24.0) // lead 1 of anchor 23
    val ts = first.getSeq[org.apache.spark.sql.Row](first.fieldIndex("target_sequence"))
    assert(ts.map(_.getAs[Double]("value")) === Seq(24.0, 25.0, 26.0))
  }

  test("flatFeatures window aggregates and leads are exact") {
    val out = Sequences.flatFeatures(obs(30), seqLen = 24, leads = 3)
      .orderBy("event_id").collect()
    assert(out.length === 4)
    val r = out.head // anchor event 23: window = values 0..23
    assert(r.getAs[Long]("n_window") === 24L)
    assert(r.getAs[Double]("min_value") === 0.0)
    assert(r.getAs[Double]("max_value") === 23.0)
    assert(r.getAs[Double]("avg_value") === 11.5)
    assert((r.getAs[Double]("t1"), r.getAs[Double]("t2"), r.getAs[Double]("t3"))
      === ((24.0, 25.0, 26.0)))
  }
}
