package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay the corpus out as one deterministic token stream
  * and chunk it into fixed-budget training sequences (the standard
  * concat-and-chunk used to build LLM training batches). Each document gets
  * the pack it STARTS in and its token offset inside that pack; a document
  * longer than the remaining budget simply spans into the next pack.
  *
  * The core is a corpus-wide running token total — a prefix sum. A bare
  * `Window.orderBy` computes it on ONE partition (the classic global-window
  * scale-killer), so this does the textbook distributed prefix sum instead:
  *   1. bucket rows by a DETERMINISTIC, order-preserving split of the
  *      (md5-hash, id) stream order: bucket = ⌊hk·N / 2³²⌋. The hash key is
  *      uniform on [0, 2³²), so buckets are balanced in expectation with no
  *      sampling pass at all — where `repartitionByRange` would run an extra
  *      corpus scan just to sample boundaries, and (because RangePartitioner
  *      seeds from the RDD id) could draw DIFFERENT boundaries when its two
  *      plan branches re-execute, a hazard that previously forced a persist
  *      that library callers then had to remember to release. A pure
  *      function of the row has no such hazard: both branches recompute the
  *      same bucketing (and ReuseExchange dedups the physical shuffle).
  *   2. per-bucket token subtotals (one tiny row per bucket);
  *   3. cumulative offsets over those subtotals — a single-partition window
  *      over N rows, fine because it is O(buckets), not O(corpus);
  *   4. broadcast the offsets back and finish with a per-bucket window.
  * The result is the exact global cumsum in stream order — bucket
  * boundaries cancel out of the arithmetic, so the output is independent of
  * the bucket count and of input partitioning (asserted in PackingSpec).
  *
  * Stream order is (md5-hash, id): deterministic, reproducible, and an
  * implicit corpus shuffle — exactly what training wants, no rand(). */
object Packing {

  /** (idCol, nTokens, pack_id, pack_offset) for every document.
    * `budget` is the tokens-per-sequence target (e.g. 4096). */
  def packSequences(docs: DataFrame, budget: Long,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val nBuckets = Checkpoints.shufflePartitions(docs.sparkSession)
    val sized = docs.select(col(idCol),
      Sampling.hashKey(col(idCol)).as("__hk"),
      size(TextStats.tokens(col(textCol))).cast("long").as("n_tokens"))
    // 1. deterministic order-preserving bucketing: hk ∈ [0, 2³²) uniform
    //    (first 8 md5 hex chars), so ⌊hk·N / 2³²⌋ ∈ [0, N). Integer `div`
    //    keeps the arithmetic exact; hk·N ≤ 2³²·N fits a long. The
    //    repartition colocates each bucket (several buckets may share a
    //    physical partition — the windows below key on __bucket, not on
    //    spark_partition_id, so that is irrelevant to correctness).
    val bucketed = sized
      .withColumn("__bucket", expr(s"(__hk * $nBuckets) div 4294967296"))
      .repartition(nBuckets, col("__bucket"))
    // 2-3. per-bucket subtotals, then exclusive prefix over buckets
    //      (tiny: one row per bucket)
    val offsets = bucketed.groupBy(col("__bucket"))
      .agg(sum(col("n_tokens")).as("__psum"))
      .withColumn("__poff",
        coalesce(sum(col("__psum")).over(
          Window.orderBy(col("__bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__poff"))
    // 4. exclusive cumsum inside each bucket + the bucket's offset
    //    = exact global exclusive cumsum in (hash, id) stream order
    val wIn = Window.partitionBy(col("__bucket"))
      .orderBy(col("__hk").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), "__bucket")
      .withColumn("__start",
        col("__poff") + coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .select(col(idCol), col("n_tokens"),
        floor(col("__start") / budget).cast("long").as("pack_id"),
        (col("__start") % budget).as("pack_offset"))
  }

  /** The full pack→slice span map the training writer consumes:
    * (pack_id, idCol, doc_offset, pack_offset, len) with one row per
    * (document, pack) intersection — a document spanning k packs emits k
    * slices, so concatenating each pack's slices in pack_offset order
    * yields exactly `budget` tokens for every non-terminal pack (asserted
    * as a property in PackingSpec). `doc_offset` is the slice's first token
    * WITHIN the document, `pack_offset` its position within the pack.
    *
    * Pure arithmetic over [[packSequences]]' exclusive cumsum: each doc
    * explodes over the integer pack range
    * [start div budget, (start+n−1) div budget] — integer `div`, never a
    * double divide, so the arithmetic stays exact past 2⁵³ total tokens
    * (a 100 TB corpus is ~10¹³-10¹⁴ tokens). The fan-out is
    * 1 + n_tokens/budget rows per doc (output-bound, no extra shuffle);
    * zero-token documents occupy no span and emit no slice. */
  def packManifest(docs: DataFrame, budget: Long,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    packSequences(docs, budget, idCol, textCol)
      .filter(col("n_tokens") > 0)
      .withColumn("__start", col("pack_id") * budget + col("pack_offset"))
      .withColumn("pack_id",
        explode(sequence(col("pack_id"),
          expr(s"(__start + n_tokens - 1) div $budget"))))
      .select(col("pack_id"), col(idCol),
        greatest(col("pack_id") * budget - col("__start"), lit(0L))
          .as("doc_offset"),
        greatest(col("__start") - col("pack_id") * budget, lit(0L))
          .as("pack_offset"),
        (least((col("pack_id") + 1) * budget, col("__start") + col("n_tokens"))
          - greatest(col("pack_id") * budget, col("__start"))).as("len"))

  /** Deterministic per-epoch global training order: every document gets a
    * dense rank `epoch_pos` ∈ [0, |docs|) in the order of
    * (md5("e<epoch>:" || id), id) — a seeded corpus-wide shuffle that is
    * reproducible across runs and engines, different per epoch, and needs
    * no `rand()`. Training dataloaders consume this instead of an actual
    * shuffle: at 100 TB a global random permutation IS a sort on a uniform
    * key, and the only non-scalable part is the dense RANK, which a bare
    * `Window.orderBy` would compute on one partition. This uses the same
    * distributed two-level pattern as [[packSequences]]'s prefix sum:
    * order-preserving bucketing on the hash's 32-bit prefix (lexicographic
    * order of fixed-width lowercase hex ≡ numeric order of the prefix, so
    * bucket boundaries respect full-key order), per-bucket counts, an
    * O(buckets) offset window, then a per-bucket `row_number` + offset.
    * Ties on the full 128-bit key are broken by id — deterministic even
    * under the (negligible) chance of an md5 collision. */
  def epochOrder(docs: DataFrame, epoch: Int,
                 idCol: String = "doc_id"): DataFrame = {
    val nBuckets = Checkpoints.shufflePartitions(docs.sparkSession)
    val keyed = docs.select(col(idCol),
      md5(concat(lit(s"e$epoch:"), col(idCol).cast("string"))).as("__ek"))
    val bucketed = keyed
      .withColumn("__hk", conv(substring(col("__ek"), 1, 8), 16, 10).cast("long"))
      .withColumn("__bucket", expr(s"(__hk * $nBuckets) div 4294967296"))
      .repartition(nBuckets, col("__bucket"))
    val offsets = bucketed.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__poff",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("__bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bucket"), col("__poff"))
    val wIn = Window.partitionBy(col("__bucket"))
      .orderBy(col("__ek").asc, col(idCol).asc)
    bucketed.join(broadcast(offsets), "__bucket")
      .select(col(idCol),
        (col("__poff") + row_number().over(wIn) - 1).cast("long")
          .as("epoch_pos"))
  }

  /** Deterministic curriculum interleave — the mixing SCHEDULE a training
    * loader consumes: each document gets an integer `priority` ("virtual
    * time" r·10⁶ DIV weight_ppm for its within-stratum position r), so
    * sorting by (priority, stratum, stratum_pos) yields a stream whose
    * every prefix approximates the target stratum mixture (a stratum with
    * 40% weight contributes ~4 of every 10 consecutive docs) — the
    * interleaved analogue of [[graft.ops.Sampling.mixToWeights]], which
    * rebalances COUNTS but says nothing about order. Within-stratum order
    * is the seeded md5 shuffle of [[epochOrder]], so the schedule is
    * reproducible, epoch-varying, and engine-portable; priorities are
    * integer DIV arithmetic throughout. Strata absent from `weights` drop.
    *
    * Scale shape: the within-stratum dense rank runs the same two-level
    * pattern as [[epochOrder]] with the stratum added to every key — the
    * offset relation grows to |strata|·buckets rows (still broadcast-
    * sized), per-(stratum, bucket) windows stay corpus/buckets wide, and
    * no single-partition window exists. The weight lookup is a chained
    * literal CASE (the map is an API input). */
  def curriculumInterleave(docs: DataFrame, weights: Map[String, Double],
                           epoch: Int = 1, stratumCol: String = "lang",
                           idCol: String = "doc_id"): DataFrame = {
    val nBuckets = Checkpoints.shufflePartitions(docs.sparkSession)
    val ppm = weightPpm(weights)
    val wppm = ppm.foldLeft(lit(1L)) { case (acc, (s, p)) =>
      when(col("stratum") === s, lit(p)).otherwise(acc)
    }
    val keyed = docs
      .filter(col(stratumCol).isin(weights.keys.toSeq: _*))
      .select(col(idCol), col(stratumCol).as("stratum"),
        md5(concat(lit(s"e$epoch:"), col(idCol).cast("string"))).as("__ek"))
    val bucketed = keyed
      .withColumn("__hk", conv(substring(col("__ek"), 1, 8), 16, 10).cast("long"))
      .withColumn("__bucket", expr(s"(__hk * $nBuckets) div 4294967296"))
      .repartition(nBuckets, col("stratum"), col("__bucket"))
    val offsets = bucketed.groupBy(col("stratum"), col("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__poff",
        coalesce(sum(col("__cnt")).over(
          Window.partitionBy(col("stratum")).orderBy(col("__bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("stratum"), col("__bucket"), col("__poff"))
    val wIn = Window.partitionBy(col("stratum"), col("__bucket"))
      .orderBy(col("__ek").asc, col(idCol).asc)
    bucketed.join(broadcast(offsets), Seq("stratum", "__bucket"))
      .withColumn("stratum_pos",
        (col("__poff") + row_number().over(wIn) - 1).cast("long"))
      .withColumn("__wppm", wppm)
      .select(col(idCol), col("stratum"), col("stratum_pos"),
        expr("(stratum_pos * CAST(1000000 AS BIGINT)) DIV __wppm").as("priority"))
  }

  /** Padding-efficient length-bucketed batching — the inference/training
    * batcher for UNPACKED variable-length sequences (the complement of
    * [[packSequences]]' concat-and-chunk: embedding inference, reward
    * scoring, and eval loops pad each batch to its longest member, so
    * random batching wastes compute proportional to length variance;
    * batching length-sorted neighbors is the standard fix). Every doc gets
    * a dense global rank in (n_tokens, md5-hash, id) order — length-major,
    * seeded-shuffle within a length — and `batch_id = rank div batchSize`,
    * `batch_pos = rank mod batchSize`: consecutive ranks share a batch, so
    * each batch spans the narrowest possible length band.
    *
    * Scale shape: the global rank is the [[epochOrder]] two-level pattern
    * with `n_tokens` PREPENDED to every key — per-(length, bucket) counts,
    * ONE exclusive-prefix window over the O(lengths·buckets) count
    * relation (broadcast-sized; lengths ≤ max doc tokens), then
    * per-(length, bucket) row_numbers + offsets. No single-partition
    * window over the corpus, and hot lengths (every doc exactly 128
    * tokens) split across hash buckets instead of landing on one task —
    * the skew case a `Window.partitionBy(n_tokens)` rank would die on. */
  def lengthBucketBatches(docs: DataFrame, batchSize: Int,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    require(batchSize >= 1, "batchSize must be positive")
    val nBuckets = Checkpoints.shufflePartitions(docs.sparkSession)
    val keyed = docs.select(col(idCol),
      Sampling.hashKey(col(idCol)).as("__hk"),
      size(TextStats.tokens(col(textCol))).cast("long").as("n_tokens"))
    val bucketed = keyed
      .withColumn("__bucket", expr(s"(__hk * $nBuckets) div 4294967296"))
      .repartition(nBuckets, col("n_tokens"), col("__bucket"))
    val offsets = bucketed.groupBy(col("n_tokens"), col("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__poff",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy(col("n_tokens"), col("__bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("n_tokens"), col("__bucket"), col("__poff"))
    val wIn = Window.partitionBy(col("n_tokens"), col("__bucket"))
      .orderBy(col("__hk").asc, col(idCol).asc)
    bucketed.join(broadcast(offsets), Seq("n_tokens", "__bucket"))
      .withColumn("__rank", col("__poff") + row_number().over(wIn) - 1)
      .select(col(idCol), col("n_tokens"),
        expr(s"__rank div ${batchSize.toLong}").as("batch_id"),
        (col("__rank") % batchSize).as("batch_pos"))
  }

  /** Per-batch padding economics over [[lengthBucketBatches]]: document
    * count, longest member, token sum, and the padding bill
    * `n_docs·max − sum` (each member pads to the batch max). One
    * map-side-combinable aggregate over the assignment — the number a
    * batching strategy is judged by. */
  def lengthBatchStats(docs: DataFrame, batchSize: Int,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    lengthBucketBatches(docs, batchSize, idCol, textCol)
      .groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"))
      .withColumn("pad_tokens",
        col("n_docs") * col("max_tokens") - col("sum_tokens"))

  /** The exact integer ppm rendering of a weight map (shared with oracle
    * generation so the two sides can never drift): floor(w/Σw · 10⁶),
    * clamped ≥ 1. */
  def weightPpm(weights: Map[String, Double]): Map[String, Long] = {
    val total = weights.values.sum
    weights.map { case (s, w) =>
      s -> math.max(1L, (w / total * 1e6).toLong)
    }
  }

  /** Sliding-window chunking: split each document into fixed-size token
    * windows of `chunkTokens` advancing by `stride` — the standard long-doc
    * treatment for context-window training and retrieval indexing (stride <
    * chunkTokens overlaps windows so no span is ever split across a chunk
    * boundary without also appearing whole). Chunk count per doc is
    * 1 for n ≤ chunkTokens, else ⌈(n − chunkTokens)/stride⌉ + 1, so the
    * last window always reaches the end of the document and no start index
    * exceeds n. The whole operator is narrow — per-row `sequence`/`explode`
    * arithmetic, no shuffle, output bounded by n_tokens/stride rows per
    * doc — so it scales with total corpus tokens like any projection.
    * Tokenization is [[TextStats.tokens]] (single-space split; an empty
    * text is one empty token, yielding exactly one empty chunk). */
  def chunkSliding(docs: DataFrame, chunkTokens: Int, stride: Int,
                   idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens must be positive")
    require(stride >= 1 && stride <= chunkTokens,
      "stride must be in [1, chunkTokens] so windows cover every token")
    val toks = TextStats.tokens(col(textCol))
    docs.select(col(idCol), toks.as("__toks"), size(toks).as("__n"))
      .withColumn("__nc", when(col("__n") <= chunkTokens, lit(1))
        .otherwise(expr(s"(__n - $chunkTokens + $stride - 1) div $stride + 1")))
      .withColumn("chunk_id", explode(sequence(lit(0), col("__nc") - 1)))
      .withColumn("__start", col("chunk_id") * stride)
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        col("__start").cast("long").as("start_tok"),
        least(lit(chunkTokens), col("__n") - col("__start")).cast("long")
          .as("n_tokens"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkTokens)),
          " ").as("chunk_text"))
  }
}
