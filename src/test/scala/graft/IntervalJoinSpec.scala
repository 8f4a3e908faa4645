package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IntervalJoin

class IntervalJoinSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("joinPoints matches exactly the in-range pairs, no duplicates") {
    // bin width 10: interval A [5, 25) spans bins 0,1,2 — the point at 5
    // (edge-inclusive), 24 (last in), 25 (end-exclusive, out), 4 (out)
    val intervals = Seq(("k1", "A", 5L, 25L), ("k1", "B", 100L, 110L),
      ("k2", "C", 5L, 25L)).toDF("key", "iid", "start_us", "end_us")
    val points = Seq(("k1", 5L, "p1"), ("k1", 24L, "p2"), ("k1", 25L, "p3"),
      ("k1", 4L, "p4"), ("k1", 105L, "p5"), ("k2", 24L, "p6"))
      .toDF("key", "us", "pid")
    val out = IntervalJoin.joinPoints(intervals, points, binUs = 10L)
      .select(col("iid"), col("pid")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(out.sorted.toSeq === Seq(("A", "p1"), ("A", "p2"), ("B", "p5"),
      ("C", "p6")))
    assert(out.length === out.distinct.length, "bins must not duplicate pairs")
  }

  test("empty and inverted intervals emit nothing") {
    val intervals = Seq(("k", "Z", 30L, 30L), ("k", "Y", 50L, 40L))
      .toDF("key", "iid", "start_us", "end_us")
    val points = Seq(("k", 30L, "p"), ("k", 45L, "q")).toDF("key", "us", "pid")
    assert(IntervalJoin.joinPoints(intervals, points, 10L).count() === 0L)
  }

  test("joinPoints equals the naive theta join on random data (any bin width)") {
    val rnd = new scala.util.Random(42)
    val intervals = (0 until 80).map { i =>
      val s = rnd.nextInt(1000).toLong
      (s"k${rnd.nextInt(5)}", i.toLong, s, s + rnd.nextInt(60))
    }.toDF("key", "iid", "start_us", "end_us")
    val points = (0 until 300).map { i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1100).toLong, i.toLong)
    }.toDF("key", "us", "pid")
    val naive = intervals.join(points, "key")
      .filter(col("us") >= col("start_us") && col("us") < col("end_us"))
      .select(col("iid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    for (bin <- Seq(1L, 7L, 64L, 1000L)) {
      val binned = IntervalJoin.joinPoints(intervals, points, bin)
        .select(col("iid"), col("pid")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(binned.length === binned.distinct.length, s"dup pairs at bin $bin")
      assert(binned.sorted.toSeq === naive, s"mismatch at bin $bin")
    }
  }

  test("attributionWindow aggregates the pre-purchase window, cent-exact") {
    // user 7: purchase at 3600 s; window [1800 s, 3600 s) catches e2 (at
    // 1800 s, inclusive) and e3; e1 (before) and e4 (at the purchase
    // instant) are out. The purchase itself is out (end-exclusive).
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      (1L, ts(100L), 7L, "view", 1.10, ""),
      (2L, ts(1800L), 7L, "click", 2.25, ""),
      (3L, ts(3000L), 7L, "view", 0.01, ""),
      (4L, ts(3600L), 7L, "error", 9.99, ""),
      (5L, ts(3600L), 7L, "purchase", 50.00, ""),
      (6L, ts(3000L), 8L, "view", 4.00, "")   // other user: out
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = IntervalJoin.attributionWindow(ev, windowMinutes = 30).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("purchase_id") === 5L)
    assert(r.getAs[Long]("n_events") === 2L)
    assert(r.getAs[Long]("cents_total") === 226L)   // 2.25 + 0.01
    assert(r.getAs[Long]("last_us") === 3000L * 1000000L)
  }
}
