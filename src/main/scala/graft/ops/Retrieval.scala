package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked boolean retrieval over a distributed inverted index — the
  * "find the documents matching this term set" primitive a curation
  * pipeline uses for targeted corpus audits (all docs mentioning a
  * benchmark name, a PII keyword, a contamination marker…).
  *
  * The reference system has no retrieval surface (its queries are keyed
  * weather lookups); this is a beyond-reference operator in the same
  * family as [[TextStats.topTermsPerGroup]].
  */
object Retrieval {

  /** AND-semantics top-k retrieval: for each (query_id, terms) query,
    * the k documents containing EVERY query term, ranked by total term
    * frequency (ties → doc_id asc). All-integer scoring, so both engines
    * agree exactly.
    *
    * Scale shape (100 TB): the corpus-sized work is one tokenize-explode
    * into per-(doc, term) frequencies — built once for ALL queries — then
    * a broadcast join against the tiny query-term relation prunes it to
    * candidate postings immediately (docs containing ≥ 1 query term).
    * The AND filter is an integer count match per (query, doc), and the
    * per-query rank window partitions by query_id over a relation already
    * bounded by the most selective query's posting union — the standard
    * top-k-pushdown shape. Queries are an API input (a driver-side
    * fixture, like sampling weights), never a corpus-derived relation. */
  def booleanRetrieval(docs: DataFrame, queries: Seq[(Long, Seq[String])],
                       k: Int = 10, textCol: String = "text"): DataFrame = {
    val sess = docs.sparkSession
    import sess.implicits._
    val qt = queries.flatMap { case (q, ts) => ts.distinct.map((q, _)) }
      .toDF("query_id", "term")
    val qs = queries.map { case (q, ts) => (q, ts.distinct.size.toLong) }
      .toDF("query_id", "n_terms")
    val tf = docs
      .select(col("doc_id"), explode(TextStats.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val cand = tf.join(broadcast(qt), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("matched"), sum(col("tf")).as("tf_total"))
      .join(broadcast(qs), "query_id")
      .filter(col("matched") === col("n_terms"))
    cand
      .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("tf_total").desc, col("doc_id").asc))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("tf_total"))
  }

  /** Exact-phrase top-k search: for each (query_id, phrase) the k documents
    * containing the phrase as a CONSECUTIVE token run, ranked by occurrence
    * count (ties → doc_id asc). Zero-match docs emit nothing; an impossible
    * phrase returns no rows.
    *
    * No positional-index self-join: phrases broadcast (they're an API
    * fixture), and per (doc, phrase) the occurrence count is ONE nested
    * codegen'd array expression — count positions i where every phrase
    * term matches tokens[i+j−1]. The corpus is touched in a single narrow
    * pass of corpus × |phrases| rows; the only shuffle is the per-query
    * rank window over the already-match-filtered candidates. The token
    * array is materialized into a column before the lambdas (the
    * [[TextStats.windowCooc]] lambda-CSE lesson: codegen does not CSE an
    * inlined split across lambda boundaries). */
  def phraseSearch(docs: DataFrame, phrases: Seq[(Long, Seq[String])],
                   k: Int = 10, textCol: String = "text"): DataFrame = {
    val sess = docs.sparkSession
    import sess.implicits._
    val q = phrases.toDF("query_id", "terms")
    val t = col("__t")
    val m = size(col("terms"))
    val matches = docs
      .select(col("doc_id"), TextStats.tokens(col(textCol)).as("__t"))
      .crossJoin(broadcast(q))
      .filter(size(t) >= m)
      .select(col("query_id"), col("doc_id"),
        size(filter(sequence(lit(1), size(t) - m + 1),
          i => forall(sequence(lit(1), m),
            j => element_at(t, i + j - 1) === element_at(col("terms"), j))))
          .cast("long").as("n_matches"))
      .filter(col("n_matches") > 0)
    matches
      .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("n_matches").desc, col("doc_id").asc))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_matches"))
  }

  /** BM25-shaped ranked retrieval (OR semantics): per (query, doc) the sum
    * over matched terms of idf × saturated-tf, all-integer so both engines
    * rank identically.
    *
    * The scoring is the BM25 functional form (k₁ = 1.2, b = 0.75) with two
    * deliberate, documented integer substitutions:
    *  - tf saturation tf·(k₁+1)/(tf + k₁·(1 − b + b·dl/avgdl)) is cross-
    *    multiplied exactly: with k₁ = 6/5, b = 3/4 and integer avgdl it is
    *    (22000·tf·A) ∕∕ (10·tf·A + 3·A + 9·dl) at per-mille scale, where
    *    A = ⌊Σdl / N⌋ — no float division anywhere;
    *  - the idf is the RATIONAL (N − df)/df at ppm scale, capped at 20×,
    *    instead of ln((N − df + ½)/(df + ½)): monotone in the classic idf
    *    (so per-term ordering is identical) but steeper for rare terms —
    *    the cap bounds that steepness AND keeps the per-term product inside
    *    int64 at any corpus size (2·10⁷ idf × 2200 tf_ppk × terms/query).
    *    ln() would cost cross-engine last-ulp agreement.
    *
    * Scale shape (100 TB): the corpus pays one tokenize-explode into
    * (doc, term, tf) plus the per-doc length aggregate; the broadcast query-
    * term join prunes postings immediately, df is a |query-terms|-row
    * aggregate (broadcast back), and the (N, Σdl) stats ride a 1-row
    * broadcast — the [[graft.ops.Recent]] anchor pattern, never a collect.
    * The only corpus-keyed shuffle joins postings to doc lengths on doc_id;
    * the rank window partitions by query over posting-bounded candidates. */
  def bm25Retrieval(docs: DataFrame, queries: Seq[(Long, Seq[String])],
                    k: Int = 10, textCol: String = "text"): DataFrame = {
    val sess = docs.sparkSession
    import sess.implicits._
    val qt = queries.flatMap { case (q, ts) => ts.distinct.map((q, _)) }
      .toDF("query_id", "term")
    val tf = docs
      .select(col("doc_id"), explode(TextStats.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("t_tokens"))
      .select(col("n_docs"), expr("t_tokens div n_docs").as("avgdl"))
    val postings = tf.join(broadcast(qt), "term")
    val dft = postings.groupBy(col("query_id"), col("term"))
      .agg(count(lit(1)).as("df"))
    val scored = postings
      .join(broadcast(dft), Seq("query_id", "term"))
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf_ppm",
        least(expr("((n_docs - df) * 1000000) div df"), lit(20000000L)))
      .withColumn("tf_ppk",
        expr("(22000 * tf * avgdl) div (10 * tf * avgdl + 3 * avgdl + 9 * dl)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("idf_ppm") * col("tf_ppk")).as("score"))
    scored
      .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("score").desc, col("doc_id").asc))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Two-stage hybrid retrieval: BM25 lexical recall re-ranked by exact
    * embedding cosine — the production RAG/data-curation shape (recall
    * cheap and wide over the inverted index, precision from the dense
    * space). Each query is (query_id, terms) with query_id doubling as
    * the ANCHOR vector id ("documents like this one, among those matching
    * the terms"); stage 1 takes the BM25 top-`recallN` per query
    * ([[bm25Retrieval]]'s exact integer scoring), stage 2 re-ranks those
    * candidates by [[EmbeddingSim.qcosine]] against the anchor embedding,
    * ties toward the smaller doc id, anchor excluded from its own results.
    * The anchor is excluded AFTER the top-recallN cut (deliberate, oracle-
    * mirrored): an anchor that BM25 ranks inside its own top-recallN
    * consumes one recall slot, so that query re-ranks recallN−1 candidates.
    * Candidates without an embedding row drop out (inner join) — re-rank
    * what the dense space covers, exactly what a production two-tower
    * deployment does with partially-embedded corpora.
    *
    * Scale shape (100 TB): stage 1 is bm25Retrieval's posting-pruned plan;
    * its output is |queries|·recallN rows — broadcast to BOTH stage-2
    * joins, so the embedding corpus is scanned once, semi-join-pruned by
    * the broadcast candidate set, and never shuffled; anchors ride the
    * same broadcast relation. The rank window partitions by query over
    * ≤ recallN rows. The dense side pays NO distance evaluation outside
    * the candidate set — the whole point of recall-then-rerank. */
  def hybridRetrieval(docs: DataFrame, embeddings: DataFrame,
                      queries: Seq[(Long, Seq[String])],
                      recallN: Int = 25, k: Int = 10,
                      textCol: String = "text"): DataFrame = {
    val cand = bm25Retrieval(docs, queries, k = recallN, textCol)
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), col("score").as("bm25_score"))
    val corpus = EmbeddingSim.prepared(embeddings)
    val anchors = corpus
      .filter(col("vec_id").isin(queries.map(_._1): _*))
      .select(col("vec_id").as("query_id"), col("q").as("aq"),
        col("n2").as("an2"))
    val scored = corpus
      .join(broadcast(cand), col("vec_id") === col("doc_id"))
      .join(broadcast(anchors), Seq("query_id"))
      .select(col("query_id"), col("doc_id"), col("bm25_score"),
        EmbeddingSim.qcosine(EmbeddingSim.qdot(col("aq"), col("q")),
          col("an2"), col("n2")).as("cos"))
    scored
      .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("cos").desc, col("doc_id").asc))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("bm25_score"),
        round(col("cos"), 4).as("cosine"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of the
    * lexical and dense rankings — the OTHER production hybrid shape next
    * to [[hybridRetrieval]]'s recall-then-rerank: both retrievers run
    * independently and a rank-only score fuses them, so neither list's
    * score scale matters (BM25 integers and cosine doubles never meet).
    * Score is the exact-integer ppm form Σ 1000000 ∕∕ (rrfK + rank) over
    * the lists that surfaced the doc; a doc on BOTH lists outranks
    * one-list docs at similar depth — the signature RRF property. Ties
    * toward the smaller doc id. `query_id` doubles as anchor vec_id for
    * the dense list (the [[hybridRetrieval]] convention), and each list
    * excludes the anchor itself. The LEXICAL list's exclusion happens
    * AFTER the top-lexDepth cut (deliberate, oracle-mirrored, same as
    * [[hybridRetrieval]]): an anchor inside BM25's own top-lexDepth
    * consumes a slot and leaves a rank GAP in the fused scores (its rank
    * is skipped, not re-packed), deviating from the exclude-before-rank
    * RRF convention by at most one candidate per query. The dense side
    * never ranks the anchor (the retriever filters self-hits pre-rank).
    *
    * The dense list is pluggable (`denseList` — any (query_id,
    * neighbor_id, rank) relation: [[EmbeddingSim.bruteForceTopK]] for
    * oracle-exact fusion, `ivfTopK`/`ivfPqTopK` as the 100 TB path; the
    * fusion is agnostic). Scale shape: both inputs are \|q\|·depth-bounded
    * relations, so the fusion itself — one full-outer equi-join plus a
    * per-query rank window — is candidate-shaped no matter the corpus;
    * all corpus-shaped work lives inside the two retrievers. */
  def rrfFusion(docs: DataFrame, embeddings: DataFrame,
                queries: Seq[(Long, Seq[String])],
                k: Int = 10, lexDepth: Int = 25, denseDepth: Int = 25,
                rrfK: Int = 60, textCol: String = "text",
                denseList: Option[DataFrame] = None): DataFrame = {
    val lex = bm25Retrieval(docs, queries, k = lexDepth, textCol)
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), col("rank").as("rank_lex"))
    val anchorIds = queries.map(_._1)
    val dense = denseList.getOrElse(
        EmbeddingSim.bruteForceTopK(embeddings,
          col("vec_id").isin(anchorIds: _*), denseDepth))
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").cast("long").as("rank_dense"))
    lex.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        (coalesce(expr(s"1000000 div ($rrfK + rank_lex)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($rrfK + rank_dense)"), lit(0L)))
          .as("rrf_ppm"),
        coalesce(col("rank_lex"), lit(0L)).as("rank_lex"),
        coalesce(col("rank_dense"), lit(0L)).as("rank_dense"))
      .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id"))
            .orderBy(col("rrf_ppm").desc, col("doc_id").asc))
        .cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("rrf_ppm"),
        col("rank_lex"), col("rank_dense"))
  }
}
