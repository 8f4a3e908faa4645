package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextStats

class TextStatsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // Qualities are driven by unique-token ratio and length; "the" is the
  // only stopword in play. Longer, more varied docs score higher.
  private val docs = Seq(
    (1L, "the the the the"),                                   // low: all stop, no variety
    (2L, "alpha beta gamma delta epsilon zeta eta theta"),     // high: all unique
    (3L, "alpha alpha alpha alpha beta beta beta beta"),       // mid
    (4L, "the quick brown fox jumps over lazy dogs daily")     // high-ish
  ).toDF("doc_id", "text")

  test("qualityPercentileFilter keeps exactly the docs at or above the corpus percentile") {
    val scored = TextStats.qualityScore(docs, Seq("the"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    // Reference: interpolating median over the four quality values.
    val sorted = scored.values.toSeq.sorted
    val median = (sorted(1) + sorted(2)) / 2.0
    val expected = scored.filter(_._2 >= median).keySet
    val kept = TextStats.qualityPercentileFilter(docs, Seq("the"), 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === expected)
    assert(!kept.contains(1L)) // the all-stopword doc is always below median
  }

  test("the approx percentile path is a consistent quality cut containing the exact cut") {
    // percentile_approx returns an ACTUAL corpus value (no interpolation),
    // so its threshold sits at or below the exact interpolated one — the
    // kept set can only grow, and both paths must cut cleanly by quality
    // (every kept doc at least as good as every dropped doc).
    val scored = TextStats.qualityScore(docs, Seq("the"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    val exact = TextStats.qualityPercentileFilter(docs, Seq("the"), 0.75)
      .select("doc_id").as[Long].collect().toSet
    val approx = TextStats.qualityPercentileFilter(docs, Seq("the"), 0.75,
        exact = false)
      .select("doc_id").as[Long].collect().toSet
    assert(exact.subsetOf(approx))
    val dropped = scored.keySet -- approx
    if (approx.nonEmpty && dropped.nonEmpty)
      assert(approx.map(scored).min >= dropped.map(scored).max)
  }

  test("docKeyword picks max-tf, then min-df, then lexicographic term") {
    val docs = Seq(
      (0L, "spark spark rare the the a"),   // tf: spark 2, rare 1 → spark
      (1L, "rare spark"),                    // tf tie → df decides: rare df 2, spark df 3...
      (2L, "spark zz zz"),                   // zz tf 2 beats spark
      (3L, "common common spark spark")      // tf tie 2-2 → df: spark 3 < common...
    ).toDF("doc_id", "text")
    val out = graft.ops.TextStats.docKeyword(docs, Seq("the", "a")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Long]("df"))).toMap
    // corpus df: spark 4, rare 2, zz 1, common 1
    assert(out(0L) === (("spark", 2L, 4L)))
    // doc 1: tf tie (1, 1) → smaller df wins: rare (df 2) over spark (df 4)
    assert(out(1L) === (("rare", 1L, 2L)))
    assert(out(2L) === (("zz", 2L, 1L)))
    // doc 3: tf tie (2, 2) → common df 1 < spark df 4
    assert(out(3L) === (("common", 2L, 1L)))
    // stopwords never win
    assert(!out.values.exists(_._1 == "the"))
  }

  test("bpeTrain learns the hand-derivable merge sequence and stops when pairs run out") {
    // words: low x3, lower x2. Traced by hand:
    //  r1: (l,o)=5 ties (o,w)=5 -> l asc wins -> "lo"/5
    //  r2: (lo,w)=5 -> "low"/5
    //  r3: (low,e)=2 ties (e,r)=2 -> "e" < "low" -> "er"/2
    //  r4: (low,er)=2 -> "lower"/2
    //  r5: no pairs left -> early stop despite numMerges=6
    val docs = Seq((0L, "low low low lower lower")).toDF("doc_id", "text")
    val out = graft.ops.TextStats.bpeTrain(docs, numMerges = 6).collect()
    val merges = out.filter(_.getAs[String]("kind") == "merge")
      .sortBy(_.getAs[Long]("merge_rank"))
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("l_sym"),
        r.getAs[String]("r_sym"), r.getAs[String]("token"), r.getAs[Long]("freq")))
    assert(merges.toSeq === Seq(
      (1L, "l", "o", "lo", 5L), (2L, "lo", "w", "low", 5L),
      (3L, "e", "r", "er", 2L), (4L, "low", "er", "lower", 2L)))
    val toks = out.filter(_.getAs[String]("kind") == "token")
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("freq")).toMap
    assert(toks === Map("low" -> 3L, "lower" -> 2L))
  }

  test("windowCooc counts unordered pairs within the window, no self-pairs") {
    val docs = Seq(
      (0L, "a b c d"),   // window 3 covers every pair: ab ac ad bc bd cd
      (1L, "b a"),       // canonicalized to (a,b)
      (2L, "z")          // single token: contributes nothing
    ).toDF("doc_id", "text")
    val out = graft.ops.TextStats.windowCooc(docs, window = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("a", "b") -> 2L, ("a", "c") -> 1L, ("a", "d") -> 1L,
      ("b", "c") -> 1L, ("b", "d") -> 1L, ("c", "d") -> 1L))
  }

  test("windowCooc respects the window bound") {
    val docs = Seq((0L, "a b c d")).toDF("doc_id", "text")
    val out = graft.ops.TextStats.windowCooc(docs, window = 1, topK = 0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // window 1: only adjacent pairs
    assert(out === Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("c", "d") -> 1L))
  }

  test("collocations ranks by integer-scaled lift, PMI rank order") {
    val docs = Seq((0L, "a b a b"), (1L, "c d")).toDF("doc_id", "text")
    // window 1: (a,b)=3, (c,d)=1. unigrams a:2 b:2 c:1 d:1, N=6.
    // lift(a,b) = 3*6*1e6 / 4 = 4_500_000; lift(c,d) = 1*6*1e6 / 1 = 6_000_000
    val out = graft.ops.TextStats.collocations(docs, window = 1, minCount = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("c", "d", 1L, 6000000L), ("a", "b", 3L, 4500000L)))
  }

  test("vocabCoverage keeps the exclusive-prefix words below the target") {
    val docs = Seq((0L, "a a a a a b b b c d")).toDF("doc_id", "text")
    // counts a:5 b:3 c:1 d:1, N=10; keep while (cum-c)*100 < pct*N
    val at95 = graft.ops.TextStats.vocabCoverage(docs, coveragePct = 95)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(at95.sortBy(_._1).toSeq === Seq(
      (1L, "a", 5L, 5L), (2L, "b", 3L, 8L), (3L, "c", 1L, 9L), (4L, "d", 1L, 10L)))
    val at80 = graft.ops.TextStats.vocabCoverage(docs, coveragePct = 80)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(at80.toSeq === Seq((1L, "a"), (2L, "b"))) // c's prefix hits exactly 80%
  }

  test("bigramNovelty weights common-bigram mass by occurrence") {
    val docs = Seq(
      (0L, "a b a b"),   // bigrams: "a b"x2, "b a"x1
      (1L, "a b c"),     // "a b", "b c"
      (2L, "x y")        // "x y"
    ).toDF("doc_id", "text")
    // corpus counts: "a b"=3 (common at minCf=3), everything else 1
    val out = graft.ops.TextStats.bigramNovelty(docs, minCf = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out === Map(
      0L -> (3L, 2L, 0.6667), 1L -> (2L, 1L, 0.5), 2L -> (1L, 0L, 0.0)))
  }

  test("ngramLmPerplexity: hand-computed interpolated surprisal, integer-exact") {
    val docs = Seq(
      (1L, "a b a b"), // transitions (a,b)x2, (b,a)x1
      (2L, "a b"),     // (a,b)
      (3L, "c"),       // no transitions
      (4L, "z z")      // (z,z)
    ).toDF("doc_id", "text")
    // Unigrams a=3 b=3 c=1 z=2, T=9; bigram counts (a,b)=3 (b,a)=1 (z,z)=1.
    // p_ppm = (750000·C12) div C1 + (250000·C2) div T:
    //  (a,b): 750000 + 83333 = 833333 → q3 = 60 − floor(log2(p³)) = 1
    //  (b,a): 250000 + 83333 = 333333 → q3 = 5
    //  (z,z): 375000 + 55555 = 430555 → q3 = 4
    // d1: n=3 Σ=2·1+5=7 avg=(700 div 9)=77; d2: n=1 Σ=1 avg=33;
    // d3: 0/0/0; d4: n=1 Σ=4 avg=133.
    val out = graft.ops.TextStats.ngramLmPerplexity(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out === Map(
      1L -> (3L, 7L, 77L, 1L), 2L -> (1L, 1L, 33L, 1L),
      3L -> (0L, 0L, 0L, 1L), 4L -> (1L, 4L, 133L, 1L)))
    // a stricter gate flips only the rare-transition doc; the
    // transition-free doc still passes (length gates own that case)
    val strict = graft.ops.TextStats.ngramLmPerplexity(docs, maxAvgBitsX100 = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(strict === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("gopherRules flags each published gate independently") {
    def words(n: Int, w: String) = Seq.fill(n)(w).mkString(" ")
    val docs = Seq(
      (0L, "the a " + words(43, "data")),            // passes everything
      (1L, "the a " + words(8, "data")),             // too short
      (2L, "the " + words(44, "data")),              // one stopword hit only
      (3L, "the a " + words(33, "data") + " " + words(10, "#tag")), // symbol-heavy
      (4L, "the a " + words(43, "123")),             // numeric: alpha fraction low
      (5L, "the a " + words(43, "abcdefghijklmnop")) // mean word length > 10
    ).toDF("doc_id", "text")
    val out = graft.ops.TextStats.gopherRules(docs, Seq("the", "a"), minWords = 40)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("ok_words"), r.getAs[Long]("ok_word_len"),
          r.getAs[Long]("ok_symbols"), r.getAs[Long]("ok_alpha"),
          r.getAs[Long]("ok_stopwords"), r.getAs[Long]("is_keep"))).toMap
    assert(out(0L) === ((1L, 1L, 1L, 1L, 1L, 1L)))
    assert(out(1L)._1 === 0L); assert(out(1L)._6 === 0L)
    assert(out(2L)._5 === 0L)                        // stop_hits = 1 < 2
    assert(out(3L)._3 === 0L)                        // 10 symbol words of 45
    assert(out(4L)._4 === 0L)                        // 2 alpha words of 45
    assert(out(5L)._2 === 0L)                        // 16-char mean word
  }

  test("corpusDatasheet aggregates per-stratum composition with exact ppm") {
    val docs = Seq(
      (0L, "en", "web", "a b c"),       // 3 tokens, 3 chars
      (1L, "en", "web", "d e"),         // 2 tokens, 2 chars
      (2L, "de", "book", "f g h i j")   // 5 tokens, 5 chars
    ).toDF("doc_id", "lang", "source", "text")
    val out = graft.ops.TextStats.corpusDatasheet(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out === Map(
      ("en", "web") -> (2L, 5L, 5L, 500000L),   // 5/10 tokens -> 500000 ppm
      ("de", "book") -> (1L, 5L, 5L, 500000L)))
  }

  test("bpeEncode tokenizes each doc with the corpus-learned merges") {
    // Corpus word freqs low:3 lower:2 lox:1. Hand-traced rounds: (l,o)=6,
    // (lo,w)=5, (e,r)=2 (tie with (low,e), 'e' asc wins), (low,er)=2 — so at
    // numMerges=4, low->1 token, lower->1 token, and "lox" only partially
    // merges: [lo, x] = 2 tokens (round 5 WOULD merge (lo,x); stop before).
    val docs = Seq(
      (0L, "low low lower"),       // 3 words -> 3 tokens, 11 chars
      (1L, "low lower lox")        // low=1, lower=1, lox=2 -> 4 tokens, 11 chars
    ).toDF("doc_id", "text")
    val out = graft.ops.TextStats.bpeEncode(docs, numMerges = 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars"),
          r.getAs[Double]("chars_per_token"))).toMap
    assert(out(0L) === ((3L, 11L, 3.6667)))
    assert(out(1L) === ((4L, 11L, 2.75)))
  }

  test("bpeTrain merge pass is left-to-right non-overlapping (aaa -> [aa, a])") {
    val docs = Seq((0L, "aaa")).toDF("doc_id", "text")
    val out = graft.ops.TextStats.bpeTrain(docs, numMerges = 1).collect()
    val toks = out.filter(_.getAs[String]("kind") == "token")
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("freq")).toMap
    assert(toks === Map("aa" -> 1L, "a" -> 1L))
  }

  test("qualityModelScore is the sparse dot product, linear and length-invariant") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta alpha beta gamma delta"), // doc 0 doubled
      (2L, "solo")
    ).toDF("doc_id", "text")
    val w = graft.ops.TextStats.qualityModelWeights(64)
    val out = graft.ops.TextStats.qualityModelScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("raw_score"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("quality"), r.getAs[Long]("is_keep"))).toMap
    // ground truth from the feature relation itself: raw = Σ v·w[idx]
    val feats = graft.ops.Dedup.hashedTfFeatures(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r =>
        r.getAs[Long]("v") * w(r.getAs[Int]("idx"))).sum).toMap
    docs.collect().map(_.getLong(0)).foreach { id =>
      assert(out(id)._1 === feats(id), s"raw score mismatch for doc $id")
      assert(out(id)._4 === (if (feats(id) >= 0) 1L else 0L))
    }
    // doubling every token doubles raw and n_tokens: quality invariant
    assert(out(1L)._1 === 2 * out(0L)._1)
    assert(out(1L)._3 === out(0L)._3)
    // zero weights → zero scores, everything kept
    val zero = graft.ops.TextStats.qualityModelScore(docs,
      weights = Some(Array.fill(64)(0L))).collect()
    assert(zero.forall(r => r.getAs[Long]("raw_score") == 0L
      && r.getAs[Long]("is_keep") == 1L))
  }

  test("qualityModelTrain: round-1 update is the exact integer class-difference vector") {
    import org.apache.spark.sql.functions.{col, when}
    // weights start at zero → every doc's margin is 0 ≤ 0 → the first
    // update is Σ y·x over ALL docs with features; verified cell-by-cell
    // against the feature relation itself.
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "epsilon zeta eta theta iota"),
      (2L, "alpha alpha kappa"),
      (3L, "solo")
    ).toDF("doc_id", "text")
    val y = Map(0L -> 1L, 1L -> -1L, 2L -> 1L, 3L -> -1L)
    val labeled = docs.withColumn("y",
      when(col("doc_id") % 2 === 0, 1L).otherwise(-1L))
    val w1 = graft.ops.TextStats.qualityModelTrain(labeled, iters = 1)
      .collect().map(r => r.getAs[Long]("idx") -> r.getAs[Long]("weight")).toMap
    assert(w1.size === 64)
    val expected = graft.ops.Dedup.hashedTfFeatures(docs).collect()
      .groupBy(_.getAs[Int]("idx"))
      .view.mapValues(_.map(r =>
        y(r.getAs[Long]("doc_id")) * r.getAs[Long]("v")).sum).toMap
    (0 until 64).foreach { i =>
      assert(w1(i.toLong) === expected.getOrElse(i, 0L), s"weight at idx $i")
    }
  }

  test("qualityModelTrain recovers a hand-planted linear labeling") {
    import org.apache.spark.sql.functions.{col, when}
    // Labels planted BY a known weight vector (the scoring fixture): the
    // training set is linearly separable in the feature space by
    // construction, so a few batch-perceptron rounds must find weights
    // that reproduce every planted keep/drop verdict.
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "zeta eta theta iota kappa"),
      (2L, "the quick brown fox jumps over lazy dogs"),
      (3L, "spark engines shuffle partitions across executors"),
      (4L, "alpha alpha alpha beta beta solo"),
      (5L, "weather stations report hourly temperature readings"),
      (6L, "lambda mu nu xi omicron pi rho"),
      (7L, "documents deduplicate near duplicates with minhash bands")
    ).toDF("doc_id", "text")
    val planted = graft.ops.TextStats.qualityModelScore(corpus)
      .select(col("doc_id"),
        when(col("raw_score") >= 0, 1L).otherwise(-1L).as("y"))
    assert(planted.select("y").distinct().count() === 2,
      "fixture must plant both classes or the test is vacuous")
    val labeled = corpus.join(planted, "doc_id")
    val trained = graft.ops.TextStats.qualityModelTrain(labeled, iters = 8)
      .collect().map(r => r.getAs[Long]("idx") -> r.getAs[Long]("weight")).toMap
    val wArr = Array.tabulate(64)(i => trained(i.toLong))
    val reproduced = graft.ops.TextStats
      .qualityModelScore(corpus, weights = Some(wArr))
      .select(col("doc_id"),
        when(col("raw_score") >= 0, 1L).otherwise(-1L).as("y_hat"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truth = planted.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reproduced === truth,
      s"trained weights must reproduce the planted labels: $trained")
  }

  test("unigramLmVocab: hand-traced seed, Viterbi segmentation and prune round") {
    // corpus "ab ab b": words ab(2), b(1).
    // seed occurrences: a=2, b=3 (2 from 'ab', 1 from 'b'), ab=2.
    // E-step: 'ab' segments as [ab] (1 piece beats a+b's 2), 'b' as [b]
    // -> usage ab=2, b=1. Prune keep-1 non-char keeps ab; chars always
    // survive. Final segmentation unchanged: freq a=0, b=1, ab=2, total 3
    // -> ppm 0 / 333333 / 666666 (integer div).
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val out = graft.ops.TextStats.unigramLmVocab(docs,
        keepSchedule = Seq(1), maxPieceLen = 2, maxWordLen = 4,
        minSeedFreq = 1L, seedMax = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out === Seq(
      ("a", 1L, 0L, 0L),
      ("ab", 2L, 2L, 666666L),
      ("b", 1L, 1L, 333333L)))
  }

  test("unigramEncode: per-doc Viterbi token counts, char fallback beyond maxWordLen") {
    // Same trained vocab as the hand-traced corpus ('ab' survives keep-1):
    // doc 1 "ab ab b" -> [ab][ab][b] = 3 tokens / 5 chars;
    // doc 2 "abcde ab" -> 'abcde' (len 5 > maxWordLen 4) is outside the
    // trainer contract and encodes at one token per char (5) + [ab]
    // = 6 tokens / 7 chars.
    val docs = Seq((1L, "ab ab b"), (2L, "abcde ab")).toDF("doc_id", "text")
    val out = graft.ops.TextStats.unigramEncode(docs,
        keepSchedule = Seq(1), maxPieceLen = 2, maxWordLen = 4,
        minSeedFreq = 1L, seedMax = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    assert(out === Seq(
      (1L, 3L, 5L, 1.6667),
      (2L, 6L, 7L, 1.1667)))
  }

  test("unigramLmVocab: equal-piece-count segmentations break ties by larger count sum") {
    // corpus "abc ab ab c c": seed counts a=3, b=3, c=3, ab=3, bc=1.
    // 'abc' has two 2-piece segmentations: [ab, c] (sum 3+3=6) and
    // [a, bc] (sum 3+1=4) -> the count tie-break picks [ab, c].
    // usage ab=3 (abc + 2x ab), c=3 (abc + 2x c); bc unused -> pruned by
    // keep-1; chars survive with zero usage. Total 6 -> ppm 500000 each.
    val docs = Seq((1L, "abc ab ab c c")).toDF("doc_id", "text")
    val out = graft.ops.TextStats.unigramLmVocab(docs,
        keepSchedule = Seq(1), maxPieceLen = 2, maxWordLen = 4,
        minSeedFreq = 1L, seedMax = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out === Seq(
      ("a", 1L, 0L, 0L),
      ("ab", 2L, 3L, 500000L),
      ("b", 1L, 0L, 0L),
      ("c", 1L, 3L, 500000L)))
  }

  test("unigramEncodeAgainst under the self-trained model reproduces unigramEncode exactly") {
    val docs = Seq((1L, "ab ab b"), (2L, "abcde ab"), (3L, "b c cab"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    val self = rows(graft.ops.TextStats.unigramEncode(docs,
      keepSchedule = Seq(1), maxPieceLen = 2, maxWordLen = 4,
      minSeedFreq = 1L, seedMax = 10))
    val frozen = rows(graft.ops.TextStats.unigramEncodeAgainst(docs,
      graft.ops.TextStats.unigramVocabModel(docs,
        keepSchedule = Seq(1), maxPieceLen = 2, maxWordLen = 4,
        minSeedFreq = 1L, seedMax = 10),
      maxPieceLen = 2, maxWordLen = 4))
    assert(frozen === self)
  }

  test("unigramEncodeAgainst: unseen characters and over-length words fall back to one token per char") {
    // model trained on "ab"-world: vocabulary = {a, b, ab}
    val model = graft.ops.TextStats.unigramVocabModel(
      Seq((1L, "ab ab b a")).toDF("doc_id", "text"),
      keepSchedule = Seq(1), maxPieceLen = 2, maxWordLen = 4,
      minSeedFreq = 1L, seedMax = 10)
    val out = graft.ops.TextStats.unigramEncodeAgainst(
        Seq((10L, "ab ab"),     // fully in-model: [ab][ab] = 2 toks
          (11L, "xq ab"),       // 'xq' has no segmentable char -> 2 + [ab]
          (12L, "axb"),         // 'x' unseen mid-word -> whole word 3
          (13L, "ababa")        // len 5 > maxWordLen 4 -> 5
        ).toDF("doc_id", "text"), model,
        maxPieceLen = 2, maxWordLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(out === Seq(
      (10L, 2L, 4L),
      (11L, 3L, 4L),
      (12L, 3L, 3L),
      (13L, 5L, 5L)))
  }

  test("bpeEncodeAgainst under the self-trained merges reproduces bpeEncode exactly") {
    val docs = Seq((1L, "low lower lowest"), (2L, "low low newer"),
      (3L, "wide wider widest")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    val self = rows(graft.ops.TextStats.bpeEncode(docs, numMerges = 4))
    val frozen = rows(graft.ops.TextStats.bpeEncodeAgainst(docs,
      graft.ops.TextStats.bpeMergesModel(docs, numMerges = 4), numMerges = 4))
    assert(frozen === self)
  }

  test("bpeEncodeAgainst: frozen merges fire in rank order, skip unseen material, tolerate exhausted ranks") {
    // training corpus "ab ab ab" learns ONE merge (a,b) and exhausts —
    // ranks 2..8 are absent from the model, exercising the left-join
    // missing-rank path (a crossJoin there would erase the batch)
    val model = graft.ops.TextStats.bpeMergesModel(
      Seq((1L, "ab ab ab")).toDF("doc_id", "text"), numMerges = 8)
    assert(model.count() === 1L)
    val out = graft.ops.TextStats.bpeEncodeAgainst(
        Seq((10L, "ab ab"),  // [ab][ab] = 2 tokens
          (11L, "xy"),       // nothing fires: [x][y] = 2 tokens
          (12L, "aab")       // [a][ab] = 2 tokens
        ).toDF("doc_id", "text"), model, numMerges = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(out === Seq((10L, 2L, 4L), (11L, 2L, 2L), (12L, 2L, 3L)))
  }

  test("qualityScoreAgainst: frozen weight relation reproduces the array-weights scorer, featureless docs rejected") {
    import org.apache.spark.sql.functions.{col, when}
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "zeta eta theta iota kappa"),
      (2L, "the quick brown fox jumps over lazy dogs"),
      (3L, "spark engines shuffle partitions across executors"),
      (4L, "alpha alpha alpha beta beta solo"),
      (5L, "weather stations report hourly temperature readings")
    ).toDF("doc_id", "text")
    val labeled = corpus.join(
      graft.ops.TextStats.qualityModelScore(corpus)
        .select(col("doc_id"),
          when(col("raw_score") >= 0, 1L).otherwise(-1L).as("y")), "doc_id")
    val wRel = graft.ops.TextStats.qualityModelTrain(labeled, iters = 4)
    val wArr = Array.tabulate(64)(i =>
      wRel.collect().map(r => r.getAs[Long]("idx") -> r.getAs[Long]("weight"))
        .toMap.apply(i.toLong))
    val batch = corpus.unionByName(Seq((9L, "")).toDF("doc_id", "text"))
    val against = graft.ops.TextStats.qualityScoreAgainst(batch, wRel)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = graft.ops.TextStats
      .qualityModelScore(batch, weights = Some(wArr))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("raw_score")).toMap
    assert(against.keySet === direct.keySet)
    for ((id, (margin, keep)) <- against) {
      assert(margin === direct(id), s"doc $id margin diverged")
      assert(keep === (if (margin > 0) 1L else 0L), s"doc $id keep flag")
    }
    assert(against(9L) === ((0L, 0L)), "featureless doc scores 0 and is rejected")
  }

  test("dsirWeights matches an independent integer reference and ranks target-like docs first") {
    import org.apache.spark.sql.functions.col
    val fixture = Seq(
      (0L, "src0", "alpha beta alpha"),
      (1L, "src0", "alpha beta"),
      (2L, "srcX", "gamma delta gamma delta"),
      (3L, "srcX", "alpha beta alpha beta"),
      (4L, "srcX", "gamma gamma gamma"))
    val docs = fixture.toDF("doc_id", "source", "text")
    val buckets = 16
    val out = TextStats.dsirWeights(docs, col("source") === "src0",
        buckets = buckets, topK = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_feats"),
        r.getAs[Long]("dsir_q3"))).sortBy(_._1)

    // Independent reference: JDK md5 (not Spark's), same integer chain.
    def hk(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    def feats(text: String): Seq[Long] = {
      val w = text.split(" ").toSeq
      (w ++ w.zip(w.drop(1)).map { case (a, b) => s"$a $b" }).map(hk(_) % buckets)
    }
    val all = fixture.map { case (id, src, t) => (id, src == "src0", feats(t)) }
    val ct = all.filter(_._2).flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = all.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (tt, tr) = (ct.values.sum, cr.values.sum)
    def q3(p: Long): Long = { val v = p * p * p; if (v == 0) 0L else 63L - java.lang.Long.numberOfLeadingZeros(v) }
    def d(b: Long): Long =
      q3(1000000L * (ct.getOrElse(b, 0L) + 1) / (tt + buckets)) -
        q3(1000000L * (cr.getOrElse(b, 0L) + 1) / (tr + buckets))
    val scored = all.map { case (id, _, fs) => (id, fs.size.toLong, fs.map(d).sum) }
    val expect = scored.sortBy { case (id, _, w) => (-w, id) }.take(3).sortBy(_._1)
    assert(out.toSeq === expect)
    // the alpha-beta target vocabulary outranks the gamma-delta rest
    assert(out.map(_._1).toSet === Set(0L, 1L, 3L))
  }
}
