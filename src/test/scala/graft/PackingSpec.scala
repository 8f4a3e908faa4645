package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Packing, Sampling}

class PackingSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val docs = (0L until 200L)
    .map(i => (i, Seq.fill((i % 7 + 1).toInt)("tok").mkString(" ")))
    .toDF("doc_id", "text")

  private def packed(df: org.apache.spark.sql.DataFrame) =
    Packing.packSequences(df, budget = 10L)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("packSequences equals a local scan of the (hash, id)-ordered stream") {
    val out = packed(docs)
    val stream = docs.select(col("doc_id"),
        Sampling.hashKey(col("doc_id")).as("hk"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy { case (id, hk, _) => (hk, id) }
    var start = 0L
    stream.foreach { case (id, _, n) =>
      assert(out(id) === ((n, start / 10, start % 10)),
        s"doc $id: expected start $start")
      start += n
    }
  }

  test("packSequences output is independent of input partitioning") {
    val one = packed(docs.repartition(1))
    val many = packed(docs.repartition(13))
    assert(one === many)
  }

  test("a doc never starts past the budget boundary it spans") {
    packed(docs).values.foreach { case (_, _, off) =>
      assert(off >= 0 && off < 10)
    }
  }
}
