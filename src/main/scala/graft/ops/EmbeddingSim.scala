package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity: quantized cosine, brute-force top-k (the exactness
  * baseline), random-hyperplane LSH bucketing (the scale path), and
  * embedding-cosine near-dup pairs.
  *
  * Numeric determinism: float32 dot products summed in different orders
  * differ in the low bits, which breaks hash-compared oracles. We therefore
  * quantize each component to floor(x * 1000) (a BIGINT) and compute dot and
  * norms in exact integer arithmetic; the only floating-point ops left are
  * one sqrt and one division — bit-identical in any IEEE-754 engine. The
  * ~1e-3 quantization error is far below any useful similarity threshold.
  *
  * Scale design (100 TB):
  *  - brute-force top-k is O(|queries| × |corpus|): the query side is
  *    broadcast, the corpus side streams — no shuffle of the corpus. Use for
  *    small query sets / ground-truth eval.
  *  - LSH bucketing joins on a `planes`-bit signature key (multi-probe:
  *    own bucket + all hamming-1 buckets), so each query scores
  *    ≈ (planes+1)·corpus/2^planes candidates instead of the corpus;
  *  - IVF swaps the bucketer for a centroid-cell assignment with
  *    nprobe-cell probing — same equi-join plan shape, tunable recall.
  */
object EmbeddingSim {

  /** Quantized vector: array<bigint> of floor(x_double * 1000). */
  def quantize(vec: Column, scale: Int = 1000): Column =
    transform(vec, x => floor(x.cast("double") * scale).cast("long"))

  /** Exact integer dot product of two quantized vectors — a native codegen
    * Expression: the higher-order-function form (`aggregate(zip_with(...))`)
    * is interpreted per element and this runs per candidate pair on the
    * similarity hot path. See [[graft.functions.LongArrayDot]]. */
  def qdot(a: Column, b: Column): Column =
    graft.functions.LongArrayDot.dot(a, b)

  /** Exact integer squared norm. */
  def qnorm2(a: Column): Column = qdot(a, a)

  /** Cosine similarity over quantized vectors (double, deterministic). */
  def qcosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot / (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))

  /** Corpus with quantized vector + its squared norm precomputed once. */
  def prepared(vectors: DataFrame, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    vectors.select(col(idCol), quantize(col(vecCol)).as("q"))
      .withColumn("n2", qnorm2(col("q")))

  /** Deterministic Rademacher random projection (Achlioptas 2003's ±1
    * variant of Johnson–Lindenstrauss) — the dimensionality-reduction
    * pass a pipeline runs BEFORE clustering/ANN when the embedding width
    * dominates memory: d dims → `outDims` exact-integer components, each
    * the dot of the quantized vector with a ±1 sign vector derived from
    * MD5("h:d") (the [[hyperplaneSignature]] weight convention — in fact
    * each sign-LSH bit IS the sign of one of these components, so a
    * projection at outDims = planes subsumes the signature). Weights are
    * compile-time literals — no broadcast, no shuffle, one narrow
    * codegen'd pass over the corpus; output exploded to (id, rdim,
    * rvalue) longs so both engines hash cell-exactly.
    *
    * Scale shape (100 TB): embarrassingly parallel projection; at 10⁹
    * vectors the d·outDims multiply-adds per row are the entire cost and
    * the output is outDims/d of the input width — the memory story for
    * every downstream distance evaluation. */
  def randomProjection(vectors: DataFrame, outDims: Int = 8,
                       dims: Int = 64, idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    def weight(h: Int, d: Int): Long = {
      val hex = digest.digest(s"$h:$d".getBytes("UTF-8"))
      if (((hex(0) >> 4) & 0xf) >= 8) 1L else -1L
    }
    val comps = (0 until outDims).map { h =>
      val w = typedLit((0 until dims).map(weight(h, _)).toArray)
      struct(lit(h.toLong).as("rdim"), qdot(col("q"), w).as("rvalue"))
    }
    vectors.select(col(idCol), quantize(col(vecCol)).as("q"))
      .select(col(idCol), explode(array(comps: _*)).as("r"))
      .select(col(idCol), col("r.rdim").as("rdim"), col("r.rvalue").as("rvalue"))
  }

  /** The projected vector as one array<long> column (id, rq) — the
    * compact artifact [[rpRerankTopK]] scans; same weights as
    * [[randomProjection]] (that form is the exploded, hash-comparable
    * view of this one). */
  def randomProjectionVec(vectors: DataFrame, outDims: Int = 8,
                          dims: Int = 64, idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    def weight(h: Int, d: Int): Long = {
      val hex = digest.digest(s"$h:$d".getBytes("UTF-8"))
      if (((hex(0) >> 4) & 0xf) >= 8) 1L else -1L
    }
    val comps = (0 until outDims).map { h =>
      val w = typedLit((0 until dims).map(weight(h, _)).toArray)
      qdot(col("q"), w)
    }
    vectors.select(col(idCol), quantize(col(vecCol)).as("q"))
      .select(col(idCol), array(comps: _*).as("rq"))
  }

  /** Brute-force ANN with a random-projection prefilter — what
    * [[randomProjection]] is FOR: stage 1 ranks the corpus by exact-
    * integer L2 distance² in the outDims-wide projected space (JL
    * preserves pairwise L2, so the true neighbors land in the top
    * `k·overfetch` with high probability) and keeps k·overfetch
    * candidates per query; stage 2 re-scores ONLY those candidates with
    * the exact original-space cosine, ties toward the smaller id. Same
    * output contract as [[bruteForceTopK]].
    *
    * Scale shape (100 TB): the all-pairs stage touches outDims-long
    * arrays instead of dims-long ones — dims/outDims fewer multiply-adds
    * AND a corpus resident at outDims/dims of the width (the memory
    * story); the original-width vectors are read only for the
    * |queries|·k·overfetch candidate set, via one broadcast-candidate
    * semi-join each side. Queries broadcast; the one corpus-shaped
    * relation (the projected d²) collapses into a bounded per-query
    * top-k hash aggregate ([[graft.functions.BoundedTopKLong]]) — the
    * shuffle carries one ≤ k·overfetch buffer per (partition, query),
    * never a corpus sort-exchange whose parallelism a rank window would
    * cap at the query count. */
  def rpRerankTopK(vectors: DataFrame, queryPred: Column, k: Int,
                   outDims: Int = 8, dims: Int = 64,
                   overfetch: Int = 4): DataFrame = {
    val proj = randomProjectionVec(vectors, outDims, dims)
    val pq = broadcast(proj.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("rq").as("qrq")))
    val d2p = proj.join(pq, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (qdot(col("rq"), col("rq")) + qdot(col("qrq"), col("qrq"))
          - lit(2L) * qdot(col("rq"), col("qrq"))).as("d2p"))
    import org.apache.spark.sql.expressions.Window
    // bounded (d2p asc, vec_id asc) top-k per query — identical candidate
    // set to rank-<=k·overfetch of a (d2p, vec_id) window, but map-side
    // combinable with O(k·overfetch) state per (partition, query)
    val topk = udaf(graft.functions.BoundedTopKLong(k * overfetch))
    val cand = d2p.groupBy(col("query_id"))
      .agg(topk(col("d2p"), col("vec_id")).as("__cands"))
      .select(col("query_id"), explode(col("__cands")).as("vec_id"))
    val corpus = prepared(vectors)
    val anchors = broadcast(prepared(vectors.filter(queryPred))
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("n2").as("qn2")))
    val scored = corpus.join(broadcast(cand), Seq("vec_id"))
      .join(anchors, Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        qcosine(qdot(col("qq"), col("q")), col("qn2"), col("n2")).as("cos"))
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cosine"))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded), deterministic ties by neighbor id. The query
    * side is expected to be small and is broadcast explicitly.
    *
    * The per-query cut is a bounded top-k hash aggregate
    * ([[graft.functions.BoundedTopKDouble]] over (−cosine, id) — exact
    * rank/tie parity with the (cos desc, id asc) window it replaced, see
    * its ordering note), NOT a rank window: the window form
    * sort-exchanges the whole |q|×corpus scored relation with
    * parallelism capped at the query count, the aggregate ships one ≤k
    * buffer per (partition, query) and the mined ids re-join the corpus
    * broadcast-candidate-side for the output cosine (the
    * [[hardNegatives]]/[[rpRerankTopK]] rewrite pattern; 100× probe:
    * the bounded hardNegatives runs 16.0 s where the window-form brute
    * class measured 34–68 s across windows). */
  def bruteForceTopK(vectors: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val corpus = prepared(vectors)
    val queries = broadcast(prepared(vectors.filter(queryPred))
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("n2").as("qn2")))
    val scored = corpus.join(queries, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        qcosine(qdot(col("qq"), col("q")), col("qn2"), col("n2")).as("cos"))
    val topk = udaf(graft.functions.BoundedTopKDouble(k))
    // posexplode preserves the aggregator's rank order: rank = pos + 1
    val cand = scored.groupBy(col("query_id"))
      .agg(topk(-col("cos"), col("vec_id")).as("__nn"))
      .select(col("query_id"), posexplode(col("__nn")).as(Seq("__p", "vec_id")))
    broadcast(cand).join(corpus, Seq("vec_id"))
      .join(queries, Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (col("__p") + lit(1)).as("rank"),
        round(qcosine(qdot(col("qq"), col("q")), col("qn2"), col("n2")), 4)
          .as("cosine"))
  }

  /** Greedy k-center (Gonzalez 1985) coreset selection — the diversity-
    * sampling pass a training-data pipeline runs to pick a maximally
    * spread subset of an embedded corpus (the farthest-point heuristic is
    * a 2-approximation of the optimal k-center cover, and the standard
    * seed for diversity-aware data selection). Deterministic: the first
    * center is the lowest vec_id; each round selects the vector FARTHEST
    * from the chosen set (max min-d² over exact quantized integers), ties
    * toward the smaller id; the selected row leaves the candidate pool.
    *
    * Emits (vec_id, rank, d2): d2 is the selection-time min distance² to
    * the earlier centers (0 for the seed) — the coverage-radius sequence,
    * monotone non-increasing, which reads as the marginal diversity gain
    * of each added center (the practitioner's stopping diagnostic).
    *
    * Scale shape (100 TB): each round is ONE corpus pass — a 1-row
    * broadcast crossJoin folding the new center's distance into the
    * running min — plus a TakeOrdered(1) argmax (never a global sort);
    * the loop-carried (vec_id, q, n2, md) relation is localCheckpointed
    * per round (eager plan cut, partitioning preserved; its carried stats
    * are round-constant, so no estimate compounding). No corpus shuffle
    * anywhere; k passes total, exactly [[kmeansCentroids]]' cost class. */
  def kCenterSelect(vectors: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "at least one center")
    val corpus = prepared(vectors)
    val c0 = Checkpoints.materialized(
      corpus.orderBy(col("vec_id").asc).limit(1)
        .select(col("vec_id").as("cid"), col("q").as("cq"), col("n2").as("cn2")))
    val picks = scala.collection.mutable.Buffer(
      c0.select(col("cid").as("vec_id"), lit(1L).as("rank"), lit(0L).as("d2")))
    var minD = corpus.crossJoin(broadcast(c0))
      .filter(col("vec_id") =!= col("cid"))
      .select(col("vec_id"), col("q"), col("n2"),
        (col("n2") + col("cn2") - lit(2L) * qdot(col("q"), col("cq"))).as("md"))
      .localCheckpoint()
    for (r <- 2 to k) {
      val cr = Checkpoints.materialized(
        minD.orderBy(col("md").desc, col("vec_id").asc).limit(1)
          .select(col("vec_id").as("cid"), col("q").as("cq"),
            col("n2").as("cn2"), col("md").as("cmd")))
      // an empty pool (k > |corpus|) simply stops early — ranks are dense
      if (cr.head(1).isEmpty) {
        return picks.reduce(_ unionByName _)
      }
      picks += cr.select(col("cid").as("vec_id"), lit(r.toLong).as("rank"),
        col("cmd").as("d2"))
      minD = minD.crossJoin(broadcast(cr))
        .filter(col("vec_id") =!= col("cid"))
        .select(col("vec_id"), col("q"), col("n2"),
          least(col("md"),
            col("n2") + col("cn2") - lit(2L) * qdot(col("q"), col("cq")))
            .as("md"))
        .localCheckpoint()
    }
    picks.reduce(_ unionByName _)
  }

  /** Random-hyperplane signature: bit h = sign of Σ_d w(h,d)·x_d where
    * w(h,d) = +1 iff the first hex nibble of md5(h":"d) ≥ 8 (deterministic,
    * engine-portable pseudo-randomness — the oracle recomputes the same md5
    * in SQL). Returns a `planes`-char bitstring.
    *
    * The weights are constants, so they are hashed ONCE at plan-build time
    * into ±1 literal arrays and each bit is a single native integer dot
    * product — not a per-row, per-dimension interpreted md5. */
  def hyperplaneSignature(vec: Column, planes: Int, dims: Int): Column = {
    val q = quantize(vec)
    val digest = java.security.MessageDigest.getInstance("MD5")
    def weight(h: Int, d: Int): Long = {
      val hex = digest.digest(s"$h:$d".getBytes("UTF-8"))
      if (((hex(0) >> 4) & 0xf) >= 8) 1L else -1L
    }
    val bits = (0 until planes).map { h =>
      val w = typedLit((0 until dims).map(weight(h, _)).toArray)
      when(qdot(q, w) > 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** Multi-probe LSH ANN top-k: queries score corpus vectors in their own
    * hyperplane bucket AND every bucket at hamming distance 1 (planes+1
    * probes/query — single-bucket sign-LSH recall collapses because a true
    * neighbor flips ≥1 of the 8 sign bits with high probability; measured
    * recall@10 on the test corpus: 0.04 single-probe → ~0.4 multi-probe).
    * Still an equi-join on the signature — probes explode on the tiny
    * query side only. */
  def lshTopK(vectors: DataFrame, queryPred: Column, k: Int,
              planes: Int = 8, dims: Int = 64): DataFrame = {
    val withSig = vectors
      .select(col("vec_id"), col("embedding"))
      .withColumn("sig", hyperplaneSignature(col("embedding"), planes, dims))
    val corpus = prepared(withSig).join(withSig.select("vec_id", "sig"), "vec_id")
    def flip(i: Int): Column = concat(
      substring(col("qsig"), 1, i),
      when(substring(col("qsig"), i + 1, 1) === "1", "0").otherwise("1"),
      substring(col("qsig"), i + 2, planes - i - 1))
    val probes = array(col("qsig") +: (0 until planes).map(flip): _*)
    val queries = broadcast(corpus.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("n2").as("qn2"), col("sig").as("qsig"))
      .select(col("query_id"), col("qq"), col("qn2"),
        explode(probes).as("psig")))
    val scored = corpus
      .join(queries, col("sig") === col("psig") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        qcosine(qdot(col("qq"), col("q")), col("qn2"), col("n2")).as("cos"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cosine"))
  }

  /** Deterministic distributed k-means (Lloyd) over quantized vectors:
    * `iters` rounds of assign-to-nearest-centroid + per-cell integer mean.
    * Seeded from the `k` lowest vec_ids (a deterministic, engine-portable
    * seed — k-means|| would lower iteration count but costs determinism).
    * Per round: assignment is a broadcast-K nested loop over the corpus
    * (d² = |a|²+|b|²−2a·b in exact longs) folded into a `min_by` hash
    * aggregation — partial aggregation collapses the corpus×K candidate
    * rows map-side, so the assignment shuffle carries ONE row per vector
    * (not K); the update is a per-(cell, dimension) partial-aggregating
    * sum/count whose shuffle is K·dims rows. New centroid components are
    * floor(mean) — exact in double
    * (|sum| ≪ 2⁵³) — so DuckDB reproduces the trained centroids bit-for-bit
    * with the same unrolled rounds. A cell that loses all members drops out
    * (k shrinks), identically in both engines.
    *
    * Returns (cid, cq: array<bigint>, cn2) — the shape [[ivfTopK]] accepts. */
  def kmeansCentroids(vectors: DataFrame, k: Int, iters: Int): DataFrame = {
    val corpus = prepared(vectors).persist()
    // k LOWEST ids via TakeOrdered — NOT `vec_id < k`, which silently
    // under-seeds any input whose ids aren't dense from 0 (e.g. the
    // semanticDedup trainSample subsets). Identical seeds (and thus
    // identical trained centroids) on dense-id corpora, so the unrolled
    // oracles are unaffected.
    var cents = corpus.orderBy(col("vec_id").asc).limit(k)
      .select(col("vec_id").as("cid"), col("q").as("cq"), col("n2").as("cn2"))
    for (_ <- 0 until iters) {
      // argmin via min_by over (d2, cid) — identical tie-break to a
      // row_number window (d2 asc, cid asc), but partial-aggregating:
      // the corpus×K rows collapse to one per vector BEFORE the shuffle
      // (a window would move all corpus×K rows). q is constant across a
      // vector's K candidate rows, so min_by-ing it by the same key is
      // deterministic.
      val assigned = corpus.crossJoin(broadcast(cents))
        .withColumn("d2",
          col("n2") + col("cn2") - lit(2L) * qdot(col("q"), col("cq")))
        .groupBy(col("vec_id"))
        .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"),
          min_by(col("q"), struct(col("d2"), col("cid"))).as("q"))
        .select(col("cid"), col("q"))
      cents = assigned
        .select(col("cid"), posexplode(col("q")).as(Seq("d", "x")))
        .groupBy(col("cid"), col("d"))
        .agg(floor(sum(col("x")) * lit(1.0) / count(lit(1))).cast("long").as("v"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("d"), col("v")))),
          s => s.getField("v")).as("cq"))
        .withColumn("cn2", qnorm2(col("cq")))
    }
    // materialize before handing out: the loop nests one plan level per
    // round, and a downstream broadcast would otherwise re-execute the whole
    // training chain (Checkpoints.materialized also resets the compounded
    // size estimates the rounds accumulate); then release the corpus cache —
    // it must not outlive the call (a bench session would carry it across
    // 60+ queries)
    val out = Checkpoints.materialized(cents)
    corpus.unpersist()
    out
  }

  /** IVF candidate generation — [[ivfTopK]]'s cell/probe stanza as a
    * standalone (query_id, vec_id) relation, self-excluded: THE pluggable
    * candidate seam ([[knnClassify]]'s `neighbors` / [[hardNegatives]]'
    * `candidates` convention) in its 100 TB configuration. Everything
    * corpus-shaped lives here (broadcast-K `min_by` assignment, nprobe
    * probe ranks over the tiny query side, the cid equi-join), so a
    * consumer that scores/filters/votes over candidates inherits the IVF
    * economics without re-deriving the geometry.
    *
    * Plan shape (identical to the stanza it was extracted from — the
    * `ann_ivf_topk` oracle replays it unchanged): corpus-side cell
    * assignment is a min_by hash-aggregate (argmin with the (d2, cid)
    * tie-break — identical to rank-1 of a (d2 asc, cid asc) window), NOT a
    * row_number window: partial aggregation collapses the corpus×K
    * candidate rows map-side, where a window would sort-exchange all n·K
    * rows. Only the queryPred-filtered probe side — tiny — needs
    * top-nprobe ranks, so the window runs there alone. Candidate count is
    * |q|·nprobe·(n/K) on balanced cells.
    *
    * Centroid seeds are the k LOWEST ids via TakeOrdered, not
    * `vec_id < k` — the same dense-id pitfall kmeansCentroids documents;
    * identical seeds on dense-id corpora, so the unrolled oracles are
    * unaffected. */
  def ivfCandidates(vectors: DataFrame, queryPred: Column,
                    numCentroids: Int = 8, nprobe: Int = 2,
                    centroids: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = prepared(vectors)
    val cents = broadcast(centroids.getOrElse(
      corpus.orderBy(col("vec_id").asc).limit(numCentroids)
        .select(col("vec_id").as("cid"), col("q").as("cq"), col("n2").as("cn2"))))
    val dists = corpus.crossJoin(cents)
      .withColumn("d2", col("n2") + col("cn2") - lit(2L) * qdot(col("q"), col("cq")))
      .select(col("vec_id"), col("cid"), col("d2"))
    val cells = dists.groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cid").asc)
    val probes = dists.filter(queryPred)
      .withColumn("__rk", row_number().over(wAssign))
      .filter(col("__rk") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cid"))
    probes.join(cells, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
  }

  /** IVF-style ANN top-k: the corpus is partitioned into cells around K
    * centroid vectors — [[kmeansCentroids]]-trained when `centroids` is
    * given, else deterministically seeded from the lowest vec_ids; each
    * query probes its `nprobe` nearest cells only. All distances are exact
    * integer arithmetic (d² = |a|² + |b|² − 2a·b over quantized longs), so
    * cell assignment is engine-portable. Candidate generation is
    * [[ivfCandidates]] (shared seam); this adds exact-cosine scoring and
    * the per-query rank cut.
    *
    * Scale: assignment is a broadcast (K centroids) nested-loop over the
    * corpus — one pass, no shuffle of the corpus; the probe join is an
    * equi-join on cid. Cell sizes ≈ n/K keep the scored candidate set at
    * nprobe·n/K per query. */
  def ivfTopK(vectors: DataFrame, queryPred: Column, k: Int,
              numCentroids: Int = 8, nprobe: Int = 2,
              centroids: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = prepared(vectors)
    val cand = ivfCandidates(vectors, queryPred, numCentroids, nprobe, centroids)
    val queries = broadcast(corpus.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("n2").as("qn2")))
    val scored = cand
      .join(corpus, "vec_id")
      .join(queries, "query_id")
      .select(col("query_id"), col("vec_id"),
        qcosine(qdot(col("qq"), col("q")), col("qn2"), col("n2")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cosine"))
  }

  /** The STORED IVF index a deployment materializes between
    * [[ivfSearchAgainst]] batches: every corpus vector with its assigned
    * cell, quantized form and squared norm — (vec_id, cid, q, n2),
    * everything a probe-join search needs and nothing else. Takes the
    * trained centroids explicitly so index and search provably share one
    * cell geometry (the [[semanticSurvivors]] convention). Assignment is
    * the broadcast-K `min_by` hash aggregate — one shuffled row per
    * vector, built ONCE and persisted/written by the caller. */
  def ivfIndex(vectors: DataFrame, centroids: DataFrame): DataFrame =
    prepared(vectors).crossJoin(broadcast(centroids))
      .withColumn("d2",
        col("n2") + col("cn2") - lit(2L) * qdot(col("q"), col("cq")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"),
        min_by(col("q"), struct(col("d2"), col("cid"))).as("q"),
        min_by(col("n2"), struct(col("d2"), col("cid"))).as("n2"))

  /** ANN search of a NEW query batch against a STORED index — the ANN
    * member of the incremental/frozen deployment family
    * ([[graft.ops.Dedup.exactAgainst]] / [[semanticDedupAgainst]] /
    * the `*Against` frozen-model scorers): centroids and the
    * [[ivfIndex]] relation are trained/assigned ONCE, then every
    * arriving batch of query vectors searches them without touching the
    * corpus vectors' lineage again. Each query ranks its `nprobe`
    * nearest cells (broadcast centroids + a window over the tiny batch
    * side only) and scores ONLY the index rows in those cells — an
    * equi-join on cid, so the scored candidate set is
    * batch·nprobe·(index cell depth), never batch·index. No
    * self-exclusion applies: the batch is new data, disjoint from the
    * index by contract (a replayed id simply scores like any neighbor).
    * Emits (query_id, neighbor_id, rank, cosine) — [[ivfTopK]]'s exact
    * output shape, so downstream consumers are interchangeable. */
  def ivfSearchAgainst(queryVecs: DataFrame, centroids: DataFrame,
                       index: DataFrame, k: Int,
                       nprobe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = broadcast(centroids)
    val queries = prepared(queryVecs)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("n2").as("qn2"))
    val wq = Window.partitionBy(col("query_id"))
    val probes = queries.crossJoin(cents)
      .withColumn("d2",
        col("qn2") + col("cn2") - lit(2L) * qdot(col("qq"), col("cq")))
      .withColumn("__rk", row_number().over(
        wq.orderBy(col("d2").asc, col("cid").asc)))
      .filter(col("__rk") <= nprobe)
      .select(col("query_id"), col("qq"), col("qn2"), col("cid"))
    val scored = probes.join(index, "cid")
      .select(col("query_id"), col("vec_id"),
        qcosine(qdot(col("qq"), col("q")), col("qn2"), col("n2")).as("cos"))
    scored.withColumn("rank", row_number().over(
        wq.orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cosine"))
  }

  /** The STORED IVF-PQ index — the compressed member of the deployed-
    * artifact family next to [[ivfIndex]]: every corpus vector reduced to
    * its cell id plus m codebook codes, (vec_id, cid, sub, code) — m+1
    * small integers per vector and NO vector bytes, which is the whole
    * 100 TB memory story (the float corpus never ships to the search
    * cluster). Cell assignment is [[ivfIndex]]'s broadcast-K `min_by`;
    * codes are [[pqEncode]] against the trained codebooks. Takes
    * centroids and codebooks explicitly so index and every future search
    * batch provably share one geometry (the `*Against` convention). */
  def ivfPqIndex(vectors: DataFrame, centroids: DataFrame,
                 codebooks: DataFrame, m: Int = 4,
                 dims: Int = 64): DataFrame = {
    val cells = prepared(vectors).crossJoin(broadcast(centroids))
      .withColumn("d2",
        col("n2") + col("cn2") - lit(2L) * qdot(col("q"), col("cq")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
    pqEncode(vectors, codebooks, m, dims).join(cells, "vec_id")
      .select(col("vec_id"), col("cid"), col("sub"), col("code"))
  }

  /** ANN search of a NEW query batch against a STORED compressed index —
    * [[ivfSearchAgainst]]'s ADC twin, completing the frozen-deployment
    * family on the PQ side: centroids, codebooks and the [[ivfPqIndex]]
    * relation are built ONCE; every arriving batch probes its `nprobe`
    * nearest cells (broadcast centroids, window over the batch side
    * only), builds its LUT against the broadcast codebooks, and sums m
    * LUT lookups per candidate — batch·nprobe·(cell depth)·m index rows
    * touched, never the corpus vectors (which the search cluster need
    * not even store). No self-exclusion: disjoint-batch contract as
    * [[ivfSearchAgainst]]. Emits (query_id, neighbor_id, rank, adc_d2)
    * — [[ivfPqTopK]]'s output shape. `lutBroadcast = false` is the same
    * bulk-scoring shuffled-hash escape documented on [[ivfPqTopK]]. */
  def ivfPqSearchAgainst(queryVecs: DataFrame, centroids: DataFrame,
                         codebooks: DataFrame, index: DataFrame, k: Int,
                         nprobe: Int = 2, m: Int = 4, dims: Int = 64,
                         lutBroadcast: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wq = Window.partitionBy(col("query_id"))
    val probes = prepared(queryVecs)
      .select(col("vec_id").as("query_id"), col("q").as("qq"),
        col("n2").as("qn2"))
      .crossJoin(broadcast(centroids))
      .withColumn("d2",
        col("qn2") + col("cn2") - lit(2L) * qdot(col("qq"), col("cq")))
      .withColumn("__rk", row_number().over(
        wq.orderBy(col("d2").asc, col("cid").asc)))
      .filter(col("__rk") <= nprobe)
      .select(col("query_id"), col("cid"))
    val lutRaw = pqSubVectors(queryVecs, m, dims)
      .join(broadcast(codebooks), Seq("sub"))
      .select(col("vec_id").as("query_id"), col("sub"), col("code"),
        (col("sn2") + col("cn2") - lit(2L) * qdot(col("sq"), col("cq")))
          .as("term"))
    val lut = if (lutBroadcast) broadcast(lutRaw) else lutRaw.hint("shuffle_hash")
    val adc = probes.join(index, "cid")
      .join(lut, Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("term")).as("adc_d2"))
    adc.withColumn("rank", row_number().over(
        wq.orderBy(col("adc_d2").asc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        col("adc_d2"))
  }

  /** Hierarchical (coarse-then-fine) IVF top-k — the n·√K assignment path
    * flagged as the scale successor to [[ivfTopK]]'s flat n·K: every
    * vector first picks its nearest of `coarseK` group centroids, then its
    * nearest FINE centroid among only that group's children, so the
    * per-vector candidate count is coarseK + fineK/coarseK (≈ 2√K at
    * coarseK = √fineK) instead of fineK. At SemDeDup-scale cell counts
    * (10⁵ cells on a 10⁹-vector corpus) that is the difference between
    * 10¹⁴ and 2·10¹¹·√10 distance evaluations for the assignment pass.
    *
    * Search mirrors the hierarchy: a query ranks the `pcoarse` nearest
    * groups, then the `nprobe` nearest fine cells among THOSE groups'
    * children, and scores only vectors assigned to the probed cells.
    *
    * The assignment is approximate where flat IVF's is exact — a vector
    * near a group boundary can land in a fine cell that flat assignment
    * would not pick (the recall trade is spec-bounded in AnnRecallSpec) —
    * but every step is exact integer arithmetic with (d², id) tie-breaks,
    * so the DuckDB oracle replays cells, probes and neighbors bit-for-bit.
    *
    * Plan shape: both centroid relations are broadcast (fine carries its
    * precomputed parent gid); the corpus pays two `min_by` hash aggregates
    * (one shuffled row per vector each, partial-combined map-side) and
    * never a corpus-wide window; the probe/candidate joins are equi-joins
    * on cid bounded by nprobe·n/fineK candidates per query. */
  def ivfHierTopK(vectors: DataFrame, queryPred: Column, k: Int,
                  fineK: Int = 16, coarseK: Int = 4,
                  pcoarse: Int = 2, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = prepared(vectors)
    val fine = corpus.filter(col("vec_id") < fineK)
      .select(col("vec_id").as("cid"), col("q").as("cq"), col("n2").as("cn2"))
    val coarse = corpus.filter(col("vec_id") < coarseK)
      .select(col("vec_id").as("gid"), col("q").as("gq"), col("n2").as("gn2"))
    // parent of each fine centroid: nearest coarse — a K×√K driver-tiny join
    val parent = fine.crossJoin(broadcast(coarse))
      .withColumn("pd2",
        col("cn2") + col("gn2") - lit(2L) * qdot(col("cq"), col("gq")))
      .groupBy(col("cid"))
      .agg(min_by(col("gid"), struct(col("pd2"), col("gid"))).as("gid"))
    val fineT = fine.join(parent, "cid") // (cid, cq, cn2, gid): broadcast side
    // corpus → nearest coarse group; q/n2 ride the min_by (constant per vec)
    val cg = corpus.crossJoin(broadcast(coarse))
      .withColumn("d2",
        col("n2") + col("gn2") - lit(2L) * qdot(col("q"), col("gq")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("gid"), struct(col("d2"), col("gid"))).as("gid"),
        min_by(col("q"), struct(col("d2"), col("gid"))).as("q"),
        min_by(col("n2"), struct(col("d2"), col("gid"))).as("n2"))
    // corpus → nearest fine cell among its group's children only
    val cells = cg.join(broadcast(fineT), "gid")
      .withColumn("d2",
        col("n2") + col("cn2") - lit(2L) * qdot(col("q"), col("cq")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
    // query probes: pcoarse nearest groups, then nprobe fine cells of those
    val queries = broadcast(corpus.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("n2").as("qn2")))
    val wq = Window.partitionBy(col("query_id"))
    val qg = queries.crossJoin(broadcast(coarse))
      .withColumn("d2",
        col("qn2") + col("gn2") - lit(2L) * qdot(col("qq"), col("gq")))
      .withColumn("__rk", row_number().over(
        wq.orderBy(col("d2").asc, col("gid").asc)))
      .filter(col("__rk") <= pcoarse)
      .select(col("query_id"), col("qq"), col("qn2"), col("gid"))
    val qf = qg.join(broadcast(fineT), "gid")
      .withColumn("d2",
        col("qn2") + col("cn2") - lit(2L) * qdot(col("qq"), col("cq")))
      .withColumn("__rk", row_number().over(
        wq.orderBy(col("d2").asc, col("cid").asc)))
      .filter(col("__rk") <= nprobe)
      .select(col("query_id"), col("cid"))
    val scored = qf.join(cells, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .join(corpus, "vec_id")
      .join(queries, "query_id")
      .select(col("query_id"), col("vec_id"),
        qcosine(qdot(col("qq"), col("q")), col("qn2"), col("n2")).as("cos"))
    scored
      .withColumn("rank", row_number().over(
        wq.orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cosine"))
  }

  /** Per-subspace product-quantization codebooks: the vector is split into
    * `m` contiguous subspaces of dims/m components, and each subspace gets
    * its own `codebookK`-entry codebook trained with [[kmeansCentroids]]
    * over the sub-sliced corpus (`iters` deterministic Lloyd rounds from
    * the lowest-id seeds — all-integer floor-mean updates, so DuckDB
    * replays the trained books bit-for-bit with the unrolled-rounds
    * convention). Emits (sub, code, cq: array<bigint> of dims/m, cn2);
    * codes are the seed vec_ids (deterministic, not dense — consumers
    * treat them as opaque). m·codebookK rows total — always broadcastable. */
  def pqCodebooks(vectors: DataFrame, m: Int = 4, codebookK: Int = 4,
                  iters: Int = 1, dims: Int = 64): DataFrame = {
    require(dims % m == 0, "m must divide the vector dimensionality")
    val sub = dims / m
    (0 until m).map { j =>
      val sliced = vectors.select(col("vec_id"),
        slice(col("embedding"), j * sub + 1, sub).as("embedding"))
      kmeansCentroids(sliced, codebookK, iters)
        .select(lit(j).as("sub"), col("cid").as("code"), col("cq"), col("cn2"))
    }.reduce(_ unionByName _)
  }

  /** (vec_id, sub, sq, sn2) — every vector exploded into its m quantized
    * subspace slices with the slice norm precomputed. One narrow projection
    * + explode; no shuffle. */
  private def pqSubVectors(vectors: DataFrame, m: Int, dims: Int): DataFrame = {
    val sub = dims / m
    val slices = array((0 until m).map { j =>
      struct(lit(j).as("sub"),
        quantize(slice(col("embedding"), j * sub + 1, sub)).as("sq"))
    }: _*)
    vectors.select(col("vec_id"), explode(slices).as("s"))
      .select(col("vec_id"), col("s.sub").as("sub"), col("s.sq").as("sq"))
      .withColumn("sn2", qnorm2(col("sq")))
  }

  /** PQ-encode the corpus: each (vector, subspace) takes its nearest
    * codebook entry (exact integer d², ties → min code). Emits
    * (vec_id, sub, code) — m small integers per vector, the compressed
    * corpus representation IVF-PQ stores instead of the float vectors.
    * The codebook side is m·codebookK rows, broadcast; the corpus side
    * collapses map-side via min_by before its one shuffle. */
  def pqEncode(vectors: DataFrame, codebooks: DataFrame, m: Int = 4,
               dims: Int = 64): DataFrame =
    pqSubVectors(vectors, m, dims)
      .join(broadcast(codebooks), Seq("sub"))
      .withColumn("d2",
        col("sn2") + col("cn2") - lit(2L) * qdot(col("sq"), col("cq")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min_by(col("code"), struct(col("d2"), col("code"))).as("code"))

  /** IVF-PQ top-k with asymmetric-distance (ADC) scoring — the 100 TB ANN
    * memory story: at 10⁹+ vectors the corpus cannot live as dims floats
    * per row, so candidates are scored against their m-byte PQ codes
    * instead. The IVF stage is [[ivfTopK]]'s cell/probe plan (broadcast-K
    * assignment, nprobe-cell equi-join); the scoring stage never touches
    * a corpus vector: each query precomputes an m·codebookK lookup table
    * of integer subspace distances to every codebook entry (one broadcast
    * join of the tiny query side against the tiny codebook side), and a
    * candidate's distance is the SUM of m LUT lookups — an equi-join on
    * (query_id, sub, code) against the broadcast LUT folded into one
    * map-side-combinable hash aggregate. All arithmetic is exact integer
    * (quantized components), so ranks are engine-portable bit-for-bit.
    *
    * ADC distances are approximations of the true d² (reconstruction
    * error is the PQ trade); `AnnRecallSpec` pins the recall floor
    * against brute force. Emits (query_id, neighbor_id, rank, adc_d2)
    * with deterministic (adc_d2 asc, id asc) ties.
    *
    * Query-cardinality bound: the broadcast LUT is |queries|·m·codebookK
    * rows (and its build join explodes |queries|·m subspace slices), so
    * "tiny query side" is a CONTRACT, not a property of the plan — a
    * query batch in the 10⁵+ range can exceed the broadcast threshold or
    * driver heap. `lutBroadcast = false` is the BULK-SCORING
    * configuration (every-vector-vs-index): the LUT loses its broadcast
    * hint and the (query_id, sub, code) equi-join is pinned shuffled-hash
    * — both sides partition by the key, nothing query-count-sized ever
    * lands on the driver or in a broadcast, and the output is identical
    * row-for-row (`AnnRecallSpec` pins plan shape AND equality; the
    * `ann_ivfpq_bulk` oracle checks the configuration end-to-end). */
  def ivfPqTopK(vectors: DataFrame, queryPred: Column, k: Int,
                numCentroids: Int = 8, nprobe: Int = 2,
                m: Int = 4, codebookK: Int = 4, dims: Int = 64,
                centroids: Option[DataFrame] = None,
                codebooks: Option[DataFrame] = None,
                lutBroadcast: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = prepared(vectors)
    // TakeOrdered seed + min_by cell assignment: same rationale (and same
    // oracle-neutrality) as [[ivfTopK]] — the corpus side never pays a
    // sort-exchange window; only the filtered probe side ranks nprobe cells.
    val cents = broadcast(centroids.getOrElse(
      corpus.orderBy(col("vec_id").asc).limit(numCentroids)
        .select(col("vec_id").as("cid"), col("q").as("cq"), col("n2").as("cn2"))))
    val dists = corpus.crossJoin(cents)
      .withColumn("d2", col("n2") + col("cn2") - lit(2L) * qdot(col("q"), col("cq")))
      .select(col("vec_id"), col("cid"), col("d2"))
    val cells = dists.groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cid").asc)
    val probes = dists.filter(queryPred)
      .withColumn("__rk", row_number().over(wAssign))
      .filter(col("__rk") <= nprobe)
      .select(col("vec_id").as("query_id"), col("cid"))
    val books = broadcast(codebooks.getOrElse(
      pqCodebooks(vectors, m, codebookK, iters = 1, dims = dims)))
    val codes = pqEncode(vectors, books, m, dims)
    val lutRaw = pqSubVectors(vectors.filter(queryPred), m, dims)
      .join(books, Seq("sub"))
      .select(col("vec_id").as("query_id"), col("sub"), col("code"),
        (col("sn2") + col("cn2") - lit(2L) * qdot(col("sq"), col("cq")))
          .as("term"))
    // bulk mode pins shuffled-hash explicitly: with AQE free to choose,
    // a below-threshold LUT would silently re-broadcast and the "bulk"
    // configuration would never exercise its own plan
    val lut = if (lutBroadcast) broadcast(lutRaw) else lutRaw.hint("shuffle_hash")
    val cand = probes.join(cells, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val adc = cand.join(codes, Seq("vec_id"))
      .join(lut, Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("term")).as("adc_d2"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_d2").asc, col("vec_id").asc)
    adc.withColumn("rank", row_number().over(wq))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        col("adc_d2"))
  }

  /** The hierarchical centroid geometry shared by [[ivfPqHierTopK]] and
    * the decomposition probes: (coarse, fineT) where fineT carries each
    * fine centroid's parent gid. TakeOrdered seeds (sparse-id-safe;
    * identical to `vec_id < K` on the dense-id corpora the oracles run,
    * so the unrolled SQL is unaffected). Both centroid relations and the
    * parented fine table are MATERIALIZED once: each is broadcast into
    * multiple joins downstream, and an unpinned lineage would re-run its
    * corpus TakeOrdered chain per broadcast — measured 22.0 s at the 1×
    * probe vs flat ivfPqTopK's 7.6, pure re-execution overhead on K-row
    * relations. `corpus` is a [[prepared]] frame. */
  private[graft] def hierCentroids(corpus: DataFrame, fineK: Int,
                                   coarseK: Int): (DataFrame, DataFrame) = {
    val fine = Checkpoints.materialized(
      corpus.orderBy(col("vec_id").asc).limit(fineK)
        .select(col("vec_id").as("cid"), col("q").as("cq"), col("n2").as("cn2")))
    val coarse = broadcast(Checkpoints.materialized(
      corpus.orderBy(col("vec_id").asc).limit(coarseK)
        .select(col("vec_id").as("gid"), col("q").as("gq"), col("n2").as("gn2"))))
    val parent = fine.crossJoin(coarse)
      .withColumn("pd2",
        col("cn2") + col("gn2") - lit(2L) * qdot(col("cq"), col("gq")))
      .groupBy(col("cid"))
      .agg(min_by(col("gid"), struct(col("pd2"), col("gid"))).as("gid"))
    val fineT = Checkpoints.materialized(fine.join(parent, "cid"))
    (coarse, fineT)
  }

  /** Corpus → nearest coarse group, then nearest fine cell in that group —
    * the n·(coarseK + fineK/coarseK) assignment pass, two `min_by` hash
    * aggregates (one shuffled row per vector each, never a corpus
    * window). Emits (vec_id, cid). */
  private[graft] def hierCellsFrom(corpus: DataFrame, coarse: DataFrame,
                                   fineT: DataFrame): DataFrame = {
    val cg = corpus.crossJoin(coarse)
      .withColumn("d2",
        col("n2") + col("gn2") - lit(2L) * qdot(col("q"), col("gq")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("gid"), struct(col("d2"), col("gid"))).as("gid"),
        min_by(col("q"), struct(col("d2"), col("gid"))).as("q"),
        min_by(col("n2"), struct(col("d2"), col("gid"))).as("n2"))
    cg.join(broadcast(fineT), "gid")
      .withColumn("d2",
        col("n2") + col("cn2") - lit(2L) * qdot(col("q"), col("cq")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
  }

  /** [[hierCellsFrom]] over freshly derived geometry — the standalone
    * hier-assignment relation the `ivfpq_hier_assign` decomposition probe
    * times in isolation (BASELINE.md's r15 attribution-gap item). */
  def hierCells(vectors: DataFrame, fineK: Int = 16,
                coarseK: Int = 4): DataFrame = {
    val corpus = prepared(vectors)
    val (coarse, fineT) = hierCentroids(corpus, fineK, coarseK)
    hierCellsFrom(corpus, coarse, fineT)
  }

  /** [[ivfCandidates]]' HIERARCHICAL twin — the candidate seam at n·2√K
    * assignment cost: corpus cells from [[hierCellsFrom]], query probes
    * ranking `pcoarse` nearest groups then `nprobe` fine cells among
    * those groups' children (windows over the tiny query side only),
    * candidates via the cid equi-join, self-excluded. Same (query_id,
    * vec_id) contract as [[ivfCandidates]], so every seam consumer
    * ([[hardNegatives]], [[knnClassify]], [[ivfPqHierTopK]]'s ADC
    * scoring) swaps retrievers without code changes — this is the
    * configuration that deletes the flat n·K assignment term the flat
    * seam inherits once K grows ∝ corpus (100× probe: flat-fed
    * hardNegatives 32.6 s, hier-fed in the ivf_topk_hier class). */
  def hierCandidates(vectors: DataFrame, queryPred: Column,
                     fineK: Int = 16, coarseK: Int = 4,
                     pcoarse: Int = 2, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = prepared(vectors)
    val (coarse, fineT) = hierCentroids(corpus, fineK, coarseK)
    val cells = hierCellsFrom(corpus, coarse, fineT)
    val queries = broadcast(corpus.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("n2").as("qn2")))
    val wq = Window.partitionBy(col("query_id"))
    val qg = queries.crossJoin(coarse)
      .withColumn("d2",
        col("qn2") + col("gn2") - lit(2L) * qdot(col("qq"), col("gq")))
      .withColumn("__rk", row_number().over(
        wq.orderBy(col("d2").asc, col("gid").asc)))
      .filter(col("__rk") <= pcoarse)
      .select(col("query_id"), col("qq"), col("qn2"), col("gid"))
    val qf = qg.join(broadcast(fineT), "gid")
      .withColumn("d2",
        col("qn2") + col("cn2") - lit(2L) * qdot(col("qq"), col("cq")))
      .withColumn("__rk", row_number().over(
        wq.orderBy(col("d2").asc, col("cid").asc)))
      .filter(col("__rk") <= nprobe)
      .select(col("query_id"), col("cid"))
    qf.join(cells, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
  }


  /** IVF-PQ with HIERARCHICAL cell assignment — [[ivfPqTopK]]'s ADC
    * scoring fed by [[ivfHierTopK]]'s coarse-then-fine cells: the variant
    * a 100 TB corpus actually runs, because it composes BOTH scale
    * stories. PQ removes the corpus vectors from the scoring path (m
    * small codes per vector, LUT-summed); the hierarchy removes the flat
    * n·K assignment term that dominates once K grows ∝ corpus (the
    * SemDeDup constant-cell-population rule): every vector pays
    * coarseK + fineK/coarseK ≈ 2√K distance evaluations instead of fineK.
    * Measured at the 100× probe, flat assignment was 81.7 s of
    * `ivfpq_topk`'s 122.5 s — the single remaining scale-killer-class
    * term this composition deletes.
    *
    * Assignment is approximate at group boundaries exactly as in
    * [[ivfHierTopK]] (recall bounded vs the flat-assignment PQ in
    * `AnnRecallSpec`); every step stays exact integer arithmetic with
    * (d², id) tie-breaks, so the DuckDB oracle replays parents, cells,
    * probes, codebook training, encoding, LUT and the ADC sum
    * bit-for-bit.
    *
    * Plan shape: centroid/codebook relations broadcast; the corpus pays
    * two `min_by` cell-assignment hash aggregates (one shuffled row per
    * vector each) + the m-subspace encode (one shuffled row per
    * (vector, sub)); candidates flow through equi-joins on cid then
    * (query_id, sub, code); the only windows partition by query over
    * probe- and candidate-bounded relations. The LUT broadcast carries
    * the same |queries|·m·codebookK contract documented on
    * [[ivfPqTopK]], with the same `lutBroadcast = false` shuffled-hash
    * bulk-scoring escape. */
  def ivfPqHierTopK(vectors: DataFrame, queryPred: Column, k: Int,
                    fineK: Int = 16, coarseK: Int = 4,
                    pcoarse: Int = 2, nprobe: Int = 2,
                    m: Int = 4, codebookK: Int = 4, dims: Int = 64,
                    codebooks: Option[DataFrame] = None,
                    lutBroadcast: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = hierCandidates(vectors, queryPred, fineK, coarseK,
      pcoarse, nprobe)
    val wq = Window.partitionBy(col("query_id"))
    // PQ side: identical to ivfPqTopK — trained books, corpus codes, LUT
    val books = broadcast(codebooks.getOrElse(
      pqCodebooks(vectors, m, codebookK, iters = 1, dims = dims)))
    val codes = pqEncode(vectors, books, m, dims)
    val lutRaw = pqSubVectors(vectors.filter(queryPred), m, dims)
      .join(books, Seq("sub"))
      .select(col("vec_id").as("query_id"), col("sub"), col("code"),
        (col("sn2") + col("cn2") - lit(2L) * qdot(col("sq"), col("cq")))
          .as("term"))
    val lut = if (lutBroadcast) broadcast(lutRaw) else lutRaw.hint("shuffle_hash")
    val adc = cand.join(codes, Seq("vec_id"))
      .join(lut, Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("term")).as("adc_d2"))
    adc.withColumn("rank", row_number().over(
        wq.orderBy(col("adc_d2").asc, col("vec_id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"),
        col("adc_d2"))
  }

  /** Per-label integer-mean prototypes — the class-centroid artifact an
    * embedding pipeline freezes once and classifies against forever (the
    * nearest-class-mean / Rocchio form): per (label, dimension)
    * floor-mean over quantized components, EXACTLY the
    * [[kmeansCentroids]] update arithmetic, so DuckDB replays the
    * prototypes bit-for-bit. Emits (plabel, pq: array<bigint>, pn2) —
    * |labels| rows, always broadcastable.
    *
    * Scale shape: one posexplode + a per-(label, dim) partial-aggregating
    * sum/count whose shuffle is |labels|·dims rows — the corpus is
    * touched once, map-side combined. */
  def labelPrototypes(vectors: DataFrame,
                      labelCol: String = "label"): DataFrame =
    vectors.select(col(labelCol).cast("long").as("plabel"),
        quantize(col("embedding")).as("q"))
      .select(col("plabel"), posexplode(col("q")).as(Seq("d", "x")))
      .groupBy(col("plabel"), col("d"))
      .agg(floor(sum(col("x")) * lit(1.0) / count(lit(1))).cast("long").as("v"))
      .groupBy(col("plabel"))
      .agg(transform(array_sort(collect_list(struct(col("d"), col("v")))),
        s => s.getField("v")).as("pq"))
      .withColumn("pn2", qnorm2(col("pq")))

  /** Nearest-prototype classification: every vector takes the label of
    * its nearest [[labelPrototypes]] centroid (exact integer d², ties →
    * smaller label). Emits (vec_id, label, pred_label, is_correct) — the
    * embedding-space quality screen a pipeline runs to audit label noise
    * (a vector whose nearest class mean disagrees with its label is a
    * mislabel candidate) and the frozen-deployment twin of the k-means
    * assignment pass.
    *
    * Scale shape: one broadcast-|labels| nested loop folded into a
    * `min_by` hash aggregate — one shuffled row per vector, the
    * [[ivfTopK]] assignment plan against class prototypes. */
  def prototypeClassify(vectors: DataFrame, prototypes: DataFrame,
                        labelCol: String = "label"): DataFrame =
    vectors.select(col("vec_id"), col(labelCol).cast("long").as("label"),
        quantize(col("embedding")).as("q"))
      .withColumn("n2", qnorm2(col("q")))
      .crossJoin(broadcast(prototypes))
      .withColumn("d2",
        col("n2") + col("pn2") - lit(2L) * qdot(col("q"), col("pq")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("label"), struct(col("d2"), col("plabel"))).as("label"),
        min_by(col("plabel"), struct(col("d2"), col("plabel"))).as("pred_label"))
      .select(col("vec_id"), col("label"), col("pred_label"),
        (col("label") === col("pred_label")).cast("long").as("is_correct"))

  /** k-NN majority-vote classification over the embedding space: each
    * query vector takes the modal label of its k nearest neighbors
    * (self excluded), ties → more votes first, then the smaller label —
    * engine-portable determinism. The neighbor list is PLUGGABLE (the
    * [[graft.ops.Retrieval.rrfFusion]] dense-seam convention): any
    * (query_id, neighbor_id) relation — [[bruteForceTopK]] for the
    * oracle-exact default, [[ivfTopK]]/[[ivfSearchAgainst]] as the
    * 100 TB path. Emits (query_id, label, pred_label, votes).
    *
    * Scale shape: all corpus-shaped work lives in the neighbor
    * retriever; the vote itself is two hash aggregates over the
    * |q|·k-bounded neighbor relation plus a broadcast label join. */
  def knnClassify(vectors: DataFrame, queryPred: Column, k: Int,
                  neighbors: Option[DataFrame] = None,
                  labelCol: String = "label"): DataFrame = {
    val labels = vectors.select(col("vec_id"),
      col(labelCol).cast("long").as("n_label"))
    val nn = neighbors.getOrElse(bruteForceTopK(vectors, queryPred, k))
      .select(col("query_id"), col("neighbor_id"))
    val votes = nn
      .join(labels, col("neighbor_id") === labels("vec_id"))
      .groupBy(col("query_id"), col("n_label"))
      .agg(count(lit(1)).as("votes"))
    val pred = votes.groupBy(col("query_id"))
      .agg(
        min_by(col("n_label"), struct(-col("votes"), col("n_label"))).as("pred_label"),
        min_by(col("votes"), struct(-col("votes"), col("n_label"))).as("votes"))
    pred.join(
        vectors.filter(queryPred).select(col("vec_id").as("query_id"),
          col(labelCol).cast("long").as("label")),
        "query_id")
      .select(col("query_id"), col("label"), col("pred_label"), col("votes"))
  }

  /** Hard-negative mining — the contrastive-training data op: for each
    * anchor, the k nearest corpus vectors with a DIFFERENT label (the
    * highest-cosine wrong-class examples, exactly what a contrastive /
    * triplet objective wants as negatives); ties → smaller id. Emits
    * (query_id, neighbor_id, neg_label, rank, cosine).
    *
    * The candidate set is PLUGGABLE ([[knnClassify]]'s neighbor-seam
    * convention): any (query_id, vec_id) relation — [[ivfCandidates]] is
    * the 100 TB configuration (candidates bounded at |q|·nprobe·cell-
    * depth, the `ann_hard_negatives_ivf` oracle replays it end-to-end);
    * `None` is the oracle-exact brute default. The label-inequality and
    * self-exclusion filters apply AFTER the seam, so any retriever works
    * unmodified.
    *
    * Brute scale shape: query side broadcast, corpus streamed once, and
    * the per-query cut is a bounded top-k hash aggregate
    * ([[graft.functions.BoundedTopKDouble]] over (−cosine, id) — exact
    * rank parity with a (cos desc, id asc) window, see its ordering
    * note), NOT a rank window: the window form sort-exchanges the whole
    * |q|×corpus scored relation with parallelism capped at the query
    * count, the aggregate ships one ≤k buffer per (partition, query).
    * Mined ids then re-join the corpus broadcast-candidate-side for
    * (neg_label, cosine) — the [[rpRerankTopK]] rewrite pattern. With a
    * candidate seam the relation is retriever-bounded and the rank
    * window runs there alone. */
  def hardNegatives(vectors: DataFrame, queryPred: Column, k: Int,
                    labelCol: String = "label",
                    candidates: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = vectors.select(col("vec_id"),
        col(labelCol).cast("long").as("n_label"),
        quantize(col("embedding")).as("q"))
      .withColumn("n2", qnorm2(col("q")))
    val queries = broadcast(
      vectors.filter(queryPred).select(col("vec_id").as("query_id"),
          col(labelCol).cast("long").as("q_label"),
          quantize(col("embedding")).as("qq"))
        .withColumn("qn2", qnorm2(col("qq"))))
    candidates match {
      case Some(c) =>
        // retriever-bounded: score + filter + rank over candidates only
        val scored = c.select(col("query_id"), col("vec_id"))
          .join(corpus, Seq("vec_id"))
          .join(queries, Seq("query_id"))
          .filter(col("vec_id") =!= col("query_id") &&
            col("n_label") =!= col("q_label"))
          .select(col("query_id"), col("vec_id"), col("n_label"),
            qcosine(qdot(col("qq"), col("q")), col("qn2"), col("n2")).as("cos"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id").asc)
        scored.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= k)
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("n_label").as("neg_label"), col("rank"),
            round(col("cos"), 4).as("cosine"))
      case None =>
        val scored = corpus.join(queries,
            col("vec_id") =!= col("query_id") && col("n_label") =!= col("q_label"))
          .select(col("query_id"), col("vec_id"),
            qcosine(qdot(col("qq"), col("q")), col("qn2"), col("n2")).as("cos"))
        val topk = udaf(graft.functions.BoundedTopKDouble(k))
        // posexplode preserves the aggregator's rank order: rank = pos + 1
        val mined = scored.groupBy(col("query_id"))
          .agg(topk(-col("cos"), col("vec_id")).as("__nn"))
          .select(col("query_id"), posexplode(col("__nn")).as(Seq("__p", "vec_id")))
        broadcast(mined).join(corpus, Seq("vec_id"))
          .join(queries, Seq("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            col("n_label").as("neg_label"),
            (col("__p") + lit(1)).as("rank"),
            round(qcosine(qdot(col("qq"), col("q")), col("qn2"), col("n2")), 4)
              .as("cosine"))
    }
  }

  /** Blocking width as a function of corpus size: enough hyperplanes that
    * the expected bucket population is ~`targetPerBucket`, so candidate
    * pairs stay ≈ n·targetPerBucket/2 instead of n²/2^planes with a FIXED
    * plane count (which goes quadratic the moment the corpus outgrows it).
    * Clamped to [4, 24]: fewer than 4 planes blocks nothing useful, more
    * than 24 makes buckets so small that hamming-1 probing can't hold
    * recall.
    *
    * Sizing callers typically feed this `Tables.parquetRowCount`, whose
    * (path, directory-modTime) memo goes stale on an in-place file rewrite
    * that adds no top-level directory entry (`Tables.scala` documents the
    * granularity) — a stale count only shifts the plane count by the log2
    * of the size drift, so blocking degrades gradually, never wrongly. */
  def autoPlanes(corpusSize: Long, targetPerBucket: Long = 64): Int = {
    val raw = math.ceil(
      math.log(math.max(1.0, corpusSize.toDouble / targetPerBucket)) / math.log(2.0)).toInt
    math.max(4, math.min(24, raw))
  }

  /** Semantic dedup, SemDeDup-style (Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * embedding-space near-duplicate REMOVAL that catches paraphrases
    * lexical minhash/simhash can never see. Two composed stages, both
    * already load-bearing elsewhere in this file:
    *
    *  1. Partition the corpus into k-means cells ([[kmeansCentroids]]-
    *     trained, deterministic); assignment is the same broadcast-K
    *     `min_by` argmax as training — one shuffled row per vector.
    *  2. Within each cell only, score quantized cosine over the a<b pair
    *     join (an equi-join on cid) and DROP every vector that has a
    *     LOWER-id neighbor at cosine ≥ `threshold` in its cell; the min-id
    *     member of every ≥-threshold group survives as the
    *     representative. The dominance rule is deliberately not a
    *     transitive closure: SemDeDup semantics keep one member per
    *     ε-ball, and id-dominance is deterministic, engine-portable, and
    *     needs no fixpoint.
    *
    * Scale: the pair join is O(Σ|cell|²) = n²/k on balanced cells — k is
    * the knob, grown ∝ corpus so cells stay bounded (SemDeDup runs 100 k
    * cells on web scale; the oracle configuration uses the corpus-probed
    * k=8/2-round setup whose centroids DuckDB replays bit-for-bit). The
    * drop set is an aggregate over qualifying pairs (one row per dropped
    * vector), so nothing corpus-squared survives the join.
    *
    * `trainSample` < 1.0 is the scale knob for the OTHER cost center: each
    * Lloyd round is an n·k·d broadcast nested loop, and with k grown ∝ n
    * (constant cell population) training alone is quadratic in the corpus.
    * The standard remedy — train centroids on a deterministic subsample,
    * assign everything — keeps only the single unavoidable full-corpus
    * assignment pass at n·k·d (SemDeDup itself trains on a GPU for the
    * same reason). The sample is the [[Sampling.hashKey]] md5 filter on
    * vec_id, so a sampled configuration stays engine-portable (an oracle
    * adds the same hash predicate to its training CTEs). The oracle
    * configuration (`dd_semantic`) trains on the full corpus. */
  def semanticDedup(vectors: DataFrame, numCentroids: Int = 8, iters: Int = 2,
                    threshold: Double = 0.45,
                    trainSample: Double = 1.0): DataFrame = {
    val corpus = prepared(vectors)
    val trainSet =
      if (trainSample >= 1.0) vectors
      else vectors.filter(Sampling.hashKey(col("vec_id")) <
        lit((trainSample * 4294967296.0).toLong))
    val cents = broadcast(kmeansCentroids(trainSet, numCentroids, iters))
    val cells = corpus.crossJoin(cents)
      .withColumn("d2",
        col("n2") + col("cn2") - lit(2L) * qdot(col("q"), col("cq")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))
    val mc = corpus.join(cells, "vec_id")
    val drops = mc.as("a")
      .join(mc.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(qcosine(qdot(col("a.q"), col("b.q")),
        col("a.n2"), col("b.n2")) >= threshold)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    cells
      .join(drops.withColumn("__dropped", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        col("__dropped").isNull.cast("long").as("is_kept"))
  }

  /** The STORE a deployment materializes between [[semanticDedupAgainst]]
    * batches: [[semanticDedup]]'s surviving vectors with their cell, the
    * quantized vector, and its squared norm — everything the incremental
    * screen needs, nothing else (the dropped members never dominate
    * anything again, so they are not stored; SemDeDup keeps one member
    * per ε-ball and this IS that member set). Takes the trained centroids
    * explicitly so store and screen provably share one cell geometry.
    * Emits (vec_id, cid, q, n2). */
  def semanticSurvivors(vectors: DataFrame, centroids: DataFrame,
                        threshold: Double = 0.45): DataFrame = {
    val corpus = prepared(vectors)
    val cents = broadcast(centroids)
    val mc = corpus.crossJoin(cents)
      .withColumn("d2",
        col("n2") + col("cn2") - lit(2L) * qdot(col("q"), col("cq")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"),
        min_by(col("q"), struct(col("d2"), col("cid"))).as("q"),
        min_by(col("n2"), struct(col("d2"), col("cid"))).as("n2"))
    val drops = mc.as("a")
      .join(mc.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(qcosine(qdot(col("a.q"), col("b.q")),
        col("a.n2"), col("b.n2")) >= threshold)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    mc.join(drops, Seq("vec_id"), "left_anti")
  }

  /** Incremental semantic dedup — the embedding-space member of the
    * incremental family ([[graft.ops.Dedup.exactAgainst]] /
    * [[graft.ops.Dedup.minhashLshPairsAgainst]] / the CC `*Against` form):
    * screen an arriving batch of vectors against a STORED SemDeDup state
    * (trained centroids + [[semanticSurvivors]]) without touching the
    * corpus again. Each batch vector is assigned to its nearest stored
    * centroid (the same deterministic min_by as [[semanticDedup]]) and is
    * dominated iff some stored SURVIVOR in that cell sits at cosine ≥
    * `threshold` — stored survivors always dominate the batch (they are
    * the ε-ball representatives already chosen), so no id comparison
    * applies across the store boundary. Within-batch duplicates are NOT
    * resolved here — that is one [[semanticDedup]] call over the kept
    * sliver, exactly as the exact/minhash family splits the two concerns.
    *
    * Why it matters at 100 TB: the batch never joins the corpus — only
    * the survivor store, which the ε-ball contraction keeps a fraction of
    * corpus size; the join is an equi-join on cid, so the scored
    * candidate set is batch·(store cell depth), not batch·store. The
    * centroid side is a broadcast (k rows). Emits
    * (vec_id, cid, is_kept) over the batch — [[semanticDedup]]'s exact
    * output shape, so downstream keep/drop consumers are interchangeable. */
  def semanticDedupAgainst(newVectors: DataFrame, centroids: DataFrame,
                           survivors: DataFrame,
                           threshold: Double = 0.45): DataFrame = {
    val batch = prepared(newVectors)
    val cents = broadcast(centroids)
    val bm = batch.crossJoin(cents)
      .withColumn("d2",
        col("n2") + col("cn2") - lit(2L) * qdot(col("q"), col("cq")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"),
        min_by(col("q"), struct(col("d2"), col("cid"))).as("q"),
        min_by(col("n2"), struct(col("d2"), col("cid"))).as("n2"))
    val dominated = bm.as("b")
      .join(survivors.as("s"), col("s.cid") === col("b.cid"))
      .filter(qcosine(qdot(col("s.q"), col("b.q")),
        col("s.n2"), col("b.n2")) >= threshold)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    bm.select(col("vec_id"), col("cid"))
      .join(dominated.withColumn("__dropped", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        col("__dropped").isNull.cast("long").as("is_kept"))
  }

  /** [[semanticDedup]] with HIERARCHICAL cell assignment — the n·√k
    * successor flagged when semantic dedup's assignment pass becomes the
    * bottleneck: with k grown ∝ corpus (the SemDeDup constant-cell-
    * population rule) flat assignment is n·k·d and dominates even the
    * sampled-training configuration (probed 46.7 s at 100×, ratio 8.6).
    * Here each vector pays coarseK + k/coarseK ≈ 2√k distance evals
    * instead of k: nearest of the `coarseK` coarse group centroids first,
    * then nearest fine centroid among that group's children only — the
    * [[ivfHierTopK]] assignment applied to trained centroids.
    *
    * Coarse centroids are the coarseK lowest-cid TRAINED fine centroids
    * (deterministic, oracle-replayable; k-means over the centroids would
    * spread them better but adds another unrollable training loop).
    * Assignment is approximate at group boundaries exactly as in
    * [[ivfHierTopK]] — a vector can land in a different (still nearby)
    * cell than flat assignment picks, so survivors may differ from
    * [[semanticDedup]]'s: both are valid SemDeDup ε-ball samples, and the
    * identical-vector contract (identical vectors share a cell, min-id
    * survives) holds under ANY assignment, spec-pinned for both. */
  def semanticDedupHier(vectors: DataFrame, numCentroids: Int = 8,
                        iters: Int = 2, threshold: Double = 0.45,
                        coarseK: Int = 4,
                        trainSample: Double = 1.0): DataFrame = {
    val corpus = prepared(vectors)
    val trainSet =
      if (trainSample >= 1.0) vectors
      else vectors.filter(Sampling.hashKey(col("vec_id")) <
        lit((trainSample * 4294967296.0).toLong))
    val cents = kmeansCentroids(trainSet, numCentroids, iters)
    val coarse = broadcast(cents.orderBy(col("cid").asc).limit(coarseK)
      .select(col("cid").as("gid"), col("cq").as("gq"), col("cn2").as("gn2")))
    val parent = cents.crossJoin(coarse)
      .withColumn("pd2",
        col("cn2") + col("gn2") - lit(2L) * qdot(col("cq"), col("gq")))
      .groupBy(col("cid"))
      .agg(min_by(col("gid"), struct(col("pd2"), col("gid"))).as("gid"))
    val fineT = broadcast(cents.join(parent, "cid"))
    val cg = corpus.crossJoin(coarse)
      .withColumn("d2",
        col("n2") + col("gn2") - lit(2L) * qdot(col("q"), col("gq")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("gid"), struct(col("d2"), col("gid"))).as("gid"),
        min_by(col("q"), struct(col("d2"), col("gid"))).as("q"),
        min_by(col("n2"), struct(col("d2"), col("gid"))).as("n2"))
    val mc = cg.join(fineT, "gid")
      .withColumn("d2",
        col("n2") + col("cn2") - lit(2L) * qdot(col("q"), col("cq")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"),
        min_by(col("q"), struct(col("d2"), col("cid"))).as("q"),
        min_by(col("n2"), struct(col("d2"), col("cid"))).as("n2"))
    val drops = mc.as("a")
      .join(mc.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .filter(qcosine(qdot(col("a.q"), col("b.q")),
        col("a.n2"), col("b.n2")) >= threshold)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    mc.select(col("vec_id"), col("cid"))
      .join(drops.withColumn("__dropped", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cid"),
        col("__dropped").isNull.cast("long").as("is_kept"))
  }

  /** Embedding-cosine near-duplicate pairs (cos ≥ threshold, a < b), blocked
    * on a coarse LSH signature so the pair join is an equi-join. With
    * `planes = 0` the blocking is disabled (exact all-pairs — test scale
    * only).
    *
    * `probeHamming1 = true` is the scale configuration: side A explodes to
    * its own signature plus all `planes` hamming-1 flips (the multi-probe
    * pattern from [[lshTopK]]), so a pair survives blocking iff the two
    * signatures differ in ≤ 1 bit. That lets `planes` grow with the corpus
    * (see [[autoPlanes]]) without the single-bucket recall collapse — a
    * true near-dup flips ≥ 1 sign bit with probability ≈ planes·angle/π.
    * Each qualifying pair matches on EXACTLY one probe (own sig when
    * hamming 0, the single flip when hamming 1), so no distinct is needed
    * and the join carries no duplicate candidates. */
  def nearDupPairs(vectors: DataFrame, threshold: Double,
                   planes: Int = 0, dims: Int = 64,
                   probeHamming1: Boolean = false): DataFrame = {
    val base = vectors.select(col("vec_id"),
        quantize(col("embedding")).as("q"),
        (if (planes > 0) hyperplaneSignature(col("embedding"), planes, dims)
         else lit("0")).as("sig"))
      .withColumn("n2", qnorm2(col("q")))
    val aSide = if (probeHamming1 && planes > 0) {
      def flip(i: Int): Column = concat(
        substring(col("sig"), 1, i),
        when(substring(col("sig"), i + 1, 1) === "1", "0").otherwise("1"),
        substring(col("sig"), i + 2, planes - i - 1))
      base.select(col("vec_id"), col("q"), col("n2"),
        explode(array(col("sig") +: (0 until planes).map(flip): _*)).as("sig"))
    } else base
    val joinCond = col("a.sig") === col("b.sig") && col("a.vec_id") < col("b.vec_id")
    aSide.as("a").join(base.as("b"), joinCond)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        qcosine(qdot(col("a.q"), col("b.q")), col("a.n2"), col("b.n2")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cosine"))
  }
}
