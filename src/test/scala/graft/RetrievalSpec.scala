package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Retrieval

class RetrievalSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val docs = Seq(
    (0L, "x y x y"),       // x:2 y:2
    (1L, "x z q q"),       // x:1 z:1 q:2
    (2L, "y z"),           // y:1 z:1
    (3L, "x y")            // x:1 y:1 — ties doc 2's total for query 1? no: matches both
  ).toDF("doc_id", "text")

  private def run(qs: Seq[(Long, Seq[String])], k: Int = 10) =
    Retrieval.booleanRetrieval(docs, qs, k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("AND semantics: only docs containing every term match, ranked by tf") {
    val out = run(Seq((1L, Seq("x", "y"))))
    // docs 0 (tf 4) and 3 (tf 2) contain both; 1 and 2 contain only one
    assert(out === Map((1L, 1L) -> (0L, 4L), (1L, 2L) -> (3L, 2L)))
  }

  test("ties rank by doc_id; k truncates; empty result for impossible query") {
    // "z" alone: docs 1 and 2 each tf 1 -> tie -> doc_id order
    val out = run(Seq((1L, Seq("z")), (2L, Seq("x", "y", "z"))), k = 1)
    assert(out === Map((1L, 1L) -> (1L, 1L)))   // doc 2 cut by k=1
    assert(!out.keys.exists(_._1 == 2L))        // no doc has all three
  }

  test("duplicate terms in a query collapse (AND over the distinct set)") {
    val out = run(Seq((1L, Seq("q", "q"))))
    assert(out === Map((1L, 1L) -> (1L, 2L)))
  }

  private val phraseDocs = Seq(
    (0L, "a b a b a"),
    (1L, "b a b"),
    (2L, "c c c c")
  ).toDF("doc_id", "text")

  private def runPhrase(qs: Seq[(Long, Seq[String])], k: Int = 10) =
    Retrieval.phraseSearch(phraseDocs, qs, k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("phraseSearch counts consecutive runs, ranked by occurrences") {
    val out = runPhrase(Seq((1L, Seq("a", "b"))))
    // doc 0: positions 1 and 3 -> 2; doc 1: position 2 -> 1
    assert(out === Map((1L, 1L) -> (0L, 2L), (1L, 2L) -> (1L, 1L)))
  }

  test("phraseSearch counts overlapping occurrences at every start position") {
    val out = runPhrase(Seq((1L, Seq("c", "c"))))
    assert(out === Map((1L, 1L) -> (2L, 3L)))   // c c c c -> starts 1,2,3
  }

  private val bm25Docs = Seq(
    (0L, "rare common common common"),                       // dl 4
    (1L, "common common common common"),                     // dl 4
    (2L, "rare"),                                            // dl 1
    (3L, "common filler filler filler filler filler filler") // dl 7
  ).toDF("doc_id", "text")
  // N = 4, T = 16, A = 4; idf_ppm(rare) = 1_000_000, idf_ppm(common) = 333_333
  // tf_ppk(tf, dl) = 88000·tf // (40·tf + 12 + 9·dl)

  test("bm25Retrieval: OR semantics, idf beats raw tf, exact integer scores") {
    val out = Retrieval.bm25Retrieval(bm25Docs, Seq((1L, Seq("rare", "common"))))
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    // d2's one rare term outranks d1's four common ones; d2 matches at all
    // (OR); d0 tops by matching both; d3's long dl is penalized
    assert(out === Map(
      1L -> (0L, 1000000L * 1000 + 333333L * 1571),
      2L -> (2L, 1000000L * 1442),
      3L -> (1L, 333333L * 1692),
      4L -> (3L, 333333L * 765)))
  }

  test("bm25Retrieval caps the idf of vanishingly rare terms") {
    // 1 doc in 100 carries the term: uncapped rational idf would be
    // 99_000_000 ppm; the 20_000_000 cap bounds it (and int64 products)
    val many = (0L until 100L).map(i => (i, if (i == 0) "needle" else "hay"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25Retrieval(many, Seq((1L, Seq("needle"))))
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    // dl = 1, A = 1: tf_ppk = 22000·1·1 // (10·1·1 + 3·1 + 9·1) = 1000
    assert(out === Seq((0L, 20000000L * 1000)))
  }

  test("phraseSearch: order matters, misses return nothing, k truncates") {
    val aba = runPhrase(Seq((1L, Seq("a", "b", "a"))))
    assert(aba === Map((1L, 1L) -> (0L, 2L)))   // only doc 0; "b a b" lacks it
    assert(runPhrase(Seq((2L, Seq("z")))).isEmpty)
    val cut = runPhrase(Seq((3L, Seq("a", "b"))), k = 1)
    assert(cut === Map((3L, 1L) -> (0L, 2L)))   // doc 1 cut by k=1
  }

  // hybrid fixtures: anchor = vec 0 along the x axis; doc 1 orthogonal
  // (cos 0), doc 2 diagonal (cos .7071), docs 3/4 colinear (cos 1.0, doc 4
  // at twice the magnitude — same direction, ties by id)
  private def hybridRun(docs: Seq[(Long, String)],
                        embs: Seq[(Long, Seq[Float])],
                        recallN: Int, k: Int = 10) =
    Retrieval.hybridRetrieval(
        docs.toDF("doc_id", "text"),
        embs.map { case (id, v) => (id, v.toArray) }.toDF("vec_id", "embedding"),
        Seq((0L, Seq("x"))), recallN = recallN, k = k)
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(4)))
      .toMap

  test("hybridRetrieval re-ranks BM25 recall by cosine, excludes the anchor, drops unembedded candidates") {
    val out = hybridRun(
      docs = Seq((0L, "x"), (1L, "x x x"), (2L, "x x"), (5L, "x x x x")),
      embs = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)), (2L, Seq(1f, 1f))),
      recallN = 10)
    // BM25 order was 5, 1, 2, 0: anchor 0 excluded, doc 5 has no embedding
    // row, and the dense stage flips 1 and 2
    assert(out === Map(1L -> (2L, 0.7071), 2L -> (1L, 0.0)))
  }

  test("hybridRetrieval: the recall cut is lexical — a cosine-perfect doc outside the BM25 top-N never surfaces") {
    val docs = Seq((0L, "x"), (1L, "x x x"), (2L, "x x"), (3L, "x"), (4L, "x"))
    val embs = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)), (2L, Seq(1f, 1f)),
      (3L, Seq(1f, 0f)), (4L, Seq(2f, 0f)))
    // recallN=3 → BM25 top-3 = {1 (tf 3), 2 (tf 2), 0 (tf-1 tie → lowest
    // id)}; docs 3 and 4 are cosine-perfect but lexically below the cut
    assert(hybridRun(docs, embs, recallN = 3) ===
      Map(1L -> (2L, 0.7071), 2L -> (1L, 0.0)))
    // recallN=5 admits them: equal-cosine 3 and 4 tie by id, then 2, then 1
    assert(hybridRun(docs, embs, recallN = 5) ===
      Map(1L -> (3L, 1.0), 2L -> (4L, 1.0), 3L -> (2L, 0.7071),
        4L -> (1L, 0.0)))
    // k truncates the re-ranked list, not the recall set
    assert(hybridRun(docs, embs, recallN = 5, k = 2) ===
      Map(1L -> (3L, 1.0), 2L -> (4L, 1.0)))
  }

  test("rrfFusion: both-lists docs dominate, one-list docs tie by id, anchor excluded, 0 marks a missed list") {
    // lexical order 1 (tf 3), 2 (tf 2), 0, 3 — doc 9 carries no "x" so the
    // term keeps nonzero idf (df = N would zero every BM25 score); dense
    // order 3 (cos 1.0), 2 (.7071), 1 (0.0). At depth 2: lex = {1, 2},
    // dense = {3, 2}
    val out = Retrieval.rrfFusion(
        Seq((0L, "x"), (1L, "x x x"), (2L, "x x"), (3L, "x"), (9L, "y"))
          .toDF("doc_id", "text"),
        Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(1f, 1f)),
          (3L, Array(1f, 0f))).toDF("vec_id", "embedding"),
        Seq((0L, Seq("x"))), k = 10, lexDepth = 2, denseDepth = 2)
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    // doc 2 on BOTH lists at rank 2: 2·(1000000 div 62) = 32258 beats the
    // single rank-1 score 1000000 div 61 = 16393; docs 1 and 3 tie at
    // 16393 -> id order; the anchor (doc 0, lexical rank 3) never appears
    assert(out === Map(
      1L -> (2L, 32258L, 2L, 2L),
      2L -> (1L, 16393L, 1L, 0L),
      3L -> (3L, 16393L, 0L, 1L)))
  }

  test("rrfFusion's dense list is pluggable: a supplied ANN relation replaces the brute-force scan") {
    // hand-built dense list (the ivfTopK/ivfPqTopK output contract):
    // ranks doc 3 first, doc 1 second — fusion must honor IT, not the
    // embeddings (none are supplied on the dense path)
    val dense = Seq((0L, 3L, 1L), (0L, 1L, 2L))
      .toDF("query_id", "neighbor_id", "rank")
    val out = Retrieval.rrfFusion(
        Seq((0L, "x"), (1L, "x x x"), (2L, "x x"), (3L, "x"), (9L, "y"))
          .toDF("doc_id", "text"),
        Seq((0L, Array(1f, 0f))).toDF("vec_id", "embedding"), // unused
        Seq((0L, Seq("x"))), k = 10, lexDepth = 2, denseDepth = 2,
        denseList = Some(dense))
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    // lex = {1 (r1), 2 (r2)}; dense = {3 (r1), 1 (r2)}: doc 1 on both
    // lists (16393 + 16129 = 32522) dominates; then dense-r1 doc 3
    // (16393) over lex-r2 doc 2 (16129)
    assert(out === Map(
      1L -> (1L, 32522L),
      2L -> (3L, 16393L),
      3L -> (2L, 16129L)))
  }
}
