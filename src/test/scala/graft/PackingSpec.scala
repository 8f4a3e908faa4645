package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
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

  test("property: pack-boundary arithmetic is a gapless exclusive cumsum") {
    // Random corpora whose docs regularly EXCEED the budget (up to 3×), so
    // budget-spanning is exercised, not incidental. Fixed-seed generator
    // loop, same rationale as PropertiesSpec (no scalatest-scalacheck
    // bridge offline).
    val corpusGen = for {
      budget <- Gen.choose(4L, 12L)
      sizes <- Gen.nonEmptyListOf(Gen.choose(1, (budget * 3).toInt))
    } yield (budget, sizes)
    val cases = (0 until 4).flatMap(i =>
      corpusGen.apply(Gen.Parameters.default.withSize(30), Seed(7L + i)))
    cases.foreach { case (budget, sizes) =>
      val df = sizes.zipWithIndex
        .map { case (n, id) => (id.toLong, Seq.fill(n)("tok").mkString(" ")) }
        .toDF("doc_id", "text")
      val rows = Packing.packSequences(df, budget)
        .withColumn("hk", Sampling.hashKey(col("doc_id")))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getAs[Long]("hk")))
        .sortBy { case (id, _, _, _, hk) => (hk, id) }
      // continuity: each doc starts exactly where the previous one ends —
      // start reconstructed from (pack_id, pack_offset), so a doc spanning
      // packs must carry __start % budget, never a reset offset
      var expectedStart = 0L
      rows.foreach { case (id, n, packId, off, _) =>
        assert(packId * budget + off === expectedStart,
          s"doc $id (budget $budget): start ${packId * budget + off} != $expectedStart")
        assert(off >= 0 && off < budget)
        expectedStart += n
      }
      // total-token identity: the stream is gapless end to end
      val (_, lastN, lastPack, lastOff, _) = rows.last
      assert(lastPack * budget + lastOff + lastN === sizes.map(_.toLong).sum)
    }
  }

  test("property: packManifest tiles every non-terminal pack to exactly the budget") {
    val corpusGen = for {
      budget <- Gen.choose(4L, 12L)
      sizes <- Gen.nonEmptyListOf(Gen.choose(0, (budget * 3).toInt))
    } yield (budget, sizes)
    val cases = (0 until 4).flatMap(i =>
      corpusGen.apply(Gen.Parameters.default.withSize(30), Seed(41L + i)))
    cases.foreach { case (budget, sizes) =>
      val df = sizes.zipWithIndex
        .map { case (n, id) => (id.toLong, Seq.fill(n)("tok").mkString(" ")) }
        .toDF("doc_id", "text")
      val slices = Packing.packManifest(df, budget).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      // NOTE "" splits to one empty token, so n_tokens ≥ 1 here; the
      // zero-token guard is still exercised by construction (filter > 0).
      val total = slices.map(_._5).sum
      val totalTokens = Packing.packSequences(df, budget)
        .agg(sum(col("n_tokens"))).head.getLong(0)
      assert(total === totalTokens, "slice lengths must tile the token stream")
      val maxPack = slices.map(_._1).max
      // every non-terminal pack is filled to exactly the budget, with
      // contiguous non-overlapping slices
      slices.groupBy(_._1).foreach { case (pack, ss) =>
        val inOrder = ss.sortBy(_._4)
        if (pack < maxPack)
          assert(inOrder.map(_._5).sum === budget,
            s"pack $pack (budget $budget) must be exactly full")
        var cursor = 0L
        inOrder.foreach { case (_, _, _, packOff, len) =>
          assert(packOff === cursor, s"pack $pack: slice at $packOff != $cursor")
          assert(len > 0)
          cursor += len
        }
      }
      // per-doc identity: slices reassemble each document contiguously
      slices.groupBy(_._2).foreach { case (_, ss) =>
        val inOrder = ss.sortBy(_._3)
        var cursor = 0L
        inOrder.foreach { case (_, _, docOff, _, len) =>
          assert(docOff === cursor)
          cursor += len
        }
      }
      // consistency with packSequences: each doc's FIRST slice is its
      // (pack_id, pack_offset) row there
      val packedRows = Packing.packSequences(df, budget).collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
      slices.groupBy(_._2).foreach { case (id, ss) =>
        val first = ss.minBy(_._3)
        assert((first._1, first._4) === packedRows(id))
      }
    }
  }
}
