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

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

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

  test("lengthBucketBatches groups length-neighbors; stats price the padding") {
    // lengths 10..80, all distinct → rank order == length order
    val docs = (1L to 8L)
      .map(i => (i, Seq.fill(i.toInt * 10)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Packing.lengthBucketBatches(docs, batchSize = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert((1L to 8L).forall(i => out(i)._1 === i * 10), "token sizing")
    assert((1L to 8L).forall(i => out(i)._2 === (i - 1) / 3), "length-major batches")
    assert((1L to 8L).forall(i => out(i)._3 === (i - 1) % 3), "dense positions")
    val stats = Packing.lengthBatchStats(docs, batchSize = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // batch 0: 10+20+30 pad to 30 → 90−60 = 30; batch 2 is terminal (2 docs)
    assert(stats(0L) === ((3L, 30L, 60L, 30L)))
    assert(stats(1L) === ((3L, 60L, 150L, 30L)))
    assert(stats(2L) === ((2L, 80L, 150L, 10L)))
    // assignment is partitioning-invariant (the two-level rank contract)
    val re = Packing.lengthBucketBatches(docs.repartition(7), batchSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(re === out.map { case (id, (_, b, p)) => (id, b, p) }.toSet)
  }

  test("lengthBucketBatches: a single hot length splits across hash buckets, zero pad") {
    val docs = (1L to 7L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val stats = Packing.lengthBatchStats(docs, batchSize = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    // 7 equal-length docs → batches of 3,3,1 — all padding-free
    assert(stats === Set((0L, 3L, 0L), (1L, 3L, 0L), (2L, 1L, 0L)))
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

  test("epochOrder is a dense permutation matching a local seeded sort") {
    val out = Packing.epochOrder(docs, epoch = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.values.toSeq.sorted === (0L until 200L))
    val expected = (0L until 200L)
      .sortBy(id => (md5Hex(s"e3:$id"), id))
      .zipWithIndex.map { case (id, pos) => id -> pos.toLong }.toMap
    assert(out === expected)
  }

  test("epochOrder is partitioning-invariant and epoch-sensitive") {
    val one = Packing.epochOrder(docs.repartition(1), epoch = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Packing.epochOrder(docs.repartition(13), epoch = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === many)
    val other = Packing.epochOrder(docs, epoch = 6).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one !== other, "different epochs must yield different orders")
    assert(other.values.toSeq.sorted === (0L until 200L))
  }

  // Distinct tokens (t<doc>_<pos>) so chunk-TEXT assertions can catch a
  // wrong slice, not just a wrong length.
  private val chunkDocs = (0L until 60L)
    .map(i => (i, (0 until (i % 11 + 1).toInt).map(j => s"t${i}_$j").mkString(" ")))
    .toDF("doc_id", "text")

  test("chunkSliding covers every token and reaches every doc's end") {
    val texts = chunkDocs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val chunks = Packing.chunkSliding(chunkDocs, chunkTokens = 4, stride = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val toks = texts(id)
      val inOrder = cs.sortBy(_._2)
      // ids dense from 0; starts advance by exactly the stride
      assert(inOrder.map(_._2) === (0L until inOrder.length.toLong))
      inOrder.foreach { case (_, cid, start, n, text) =>
        assert(start === cid * 2)
        assert(n === math.min(4L, toks.length - start))
        assert(text === toks.slice(start.toInt, start.toInt + 4).mkString(" "))
      }
      // the final window reaches the document's last token, and no window
      // starts at or past the end
      val (_, _, lastStart, lastN, _) = inOrder.last
      assert(lastStart + lastN === toks.length.toLong)
      assert(lastStart < toks.length.toLong)
    }
    // exactly one chunk for docs at or under the window size
    texts.filter(_._2.length <= 4).keys.foreach { id =>
      assert(chunks.count(_._1 == id) === 1)
    }
  }

  test("chunkSliding with stride == chunkTokens partitions the token stream") {
    val texts = chunkDocs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    Packing.chunkSliding(chunkDocs, chunkTokens = 3, stride = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(4)))
      .groupBy(_._1).foreach { case (id, cs) =>
        val rebuilt = cs.sortBy(_._2).map(_._3).mkString(" ")
        assert(rebuilt === texts(id).mkString(" "),
          s"doc $id: non-overlapping chunks must reassemble the text")
      }
  }

  test("curriculumInterleave: dense per-stratum positions, 3:1 schedule") {
    val mix = Seq(
      (0L, "a"), (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (5L, "a"),
      (6L, "b"), (7L, "b"), (8L, "zz")   // zz absent from weights -> dropped
    ).toDF("doc_id", "stratum")
    val out = graft.ops.Packing.curriculumInterleave(
        mix, Map("a" -> 3.0, "b" -> 1.0), epoch = 1, stratumCol = "stratum")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 8, "stratum zz must be dropped")
    // positions are a dense 0..n-1 permutation per stratum
    assert(out.filter(_._2 == "a").map(_._3).sorted.toSeq === (0L to 5L))
    assert(out.filter(_._2 == "b").map(_._3).sorted.toSeq === (0L to 1L))
    // ppm: a=750000, b=250000; priority = pos*1e6 DIV ppm
    for ((_, s, pos, pr) <- out) {
      val ppm = if (s == "a") 750000L else 250000L
      assert(pr === pos * 1000000L / ppm)
    }
    // the schedule interleaves ~3 a's per b regardless of which doc landed
    // on which position: stratum sequence in (priority, stratum, pos) order
    val sched = out.sortBy(t => (t._4, t._2, t._3)).map(_._2).toSeq
    assert(sched === Seq("a", "b", "a", "a", "a", "b", "a", "a"))
  }

  test("curriculumInterleave epochs reshuffle within strata, not the schedule") {
    val mix = (0L until 40L).map(i => (i, if (i < 30) "a" else "b"))
      .toDF("doc_id", "stratum")
    def run(e: Int) = graft.ops.Packing.curriculumInterleave(
        mix, Map("a" -> 3.0, "b" -> 1.0), epoch = e, stratumCol = "stratum")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val e1 = run(1); val e2 = run(2)
    // same (stratum, pos) slots both epochs…
    assert(e1.map(t => (t._2, t._3)).sorted.toSeq ===
      e2.map(t => (t._2, t._3)).sorted.toSeq)
    // …but documents occupy different slots
    assert(e1.toSet !== e2.toSet, "epoch must reshuffle the assignment")
  }
}
