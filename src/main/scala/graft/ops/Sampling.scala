package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation: per-stratum Bernoulli
  * rates, fixed per-stratum quotas, and weighted mixture rebalancing.
  *
  * All selection is keyed on a 32-bit integer derived from md5 of a stable
  * row key (never `rand()`): the sample is reproducible across runs, engines
  * and partitionings, membership is decidable per-row (a pure filter — no
  * shuffle for the Bernoulli form), and adding rows to the corpus never
  * evicts previously-sampled rows from a rate sample. DuckDB reproduces the
  * identical md5 arithmetic, so every operator here is oracle-checkable.
  *
  * Scale design (100 TB):
  *  - [[stratifiedBernoulli]] is a pure narrow filter — no shuffle at all;
  *    rates ride in as a broadcast literal map.
  *  - [[stratifiedQuota]] and [[mixToWeights]] select the quota rows with a
  *    DISTRIBUTED top-by-hash-rank: a naive
  *    `row_number over (partition by stratum order by hk)` caps parallelism
  *    at |strata| — with 5 languages, 5 tasks sort the whole corpus (the
  *    round-7 100× probe measured 44.7 s for 500 k rows; at real scale one
  *    task would sort terabytes). Instead: bucket rows by hash-key range
  *    (order-preserving: every key in bucket b sorts before every key in
  *    b+1), count per (stratum, bucket) — a map-side-combined aggregate
  *    whose output is |strata|·B rows — classify each bucket keep-all /
  *    drop-all / boundary from the tiny cumulative counts, and rank ONLY
  *    the boundary bucket's rows (≈ corpus/B rows per stratum). The
  *    corpus-sized path is a narrow filter + broadcast join; nothing
  *    corpus-sized is ever shuffled or sorted.
  */
object Sampling {

  /** Deterministic 32-bit sample key in [0, 2³²): first 8 hex chars of
    * md5(key) as an integer. Uniform per the md5 avalanche property. */
  def hashKey(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  private val KeySpace = 4294967296.0 // 2^32

  /** Per-stratum Bernoulli sample: keep a row iff its hash key falls below
    * floor(rate · 2³²). Strata missing from `rates` are dropped (rate 0).
    * A pure filter — membership is decided row-locally, no shuffle. */
  def stratifiedBernoulli(df: DataFrame, stratumCol: String,
                          rates: Map[String, Double],
                          keyCol: String = "doc_id"): DataFrame = {
    val threshold = rates.foldLeft(lit(0L)) { case (acc, (stratum, rate)) =>
      when(col(stratumCol) === stratum, lit((rate * KeySpace).toLong))
        .otherwise(acc)
    }
    df.filter(hashKey(col(keyCol)) < threshold)
  }

  /** Fixed quota per stratum: deterministically the `n` rows with the
    * smallest hash keys in each stratum (all rows when the stratum is
    * smaller than `n`). Tie-broken by the key itself, so the sample is a
    * function of the corpus alone.
    *
    * Contract notes: NULL strata form their own stratum with the same
    * quota, exactly like the window-rank form this replaces (the selection
    * join is null-safe on the stratum). [[mixToWeights]] still drops them —
    * NULL is never a key of `weights`, and its contract drops strata absent
    * from the map. The stratum column is expected LOW-cardinality
    * (languages, sources, shards): the per-(stratum, bucket) verdict
    * relation has |strata|·B rows, which is what the selection joins back
    * against the corpus.
    *
    * Config interaction: the bucket count B is
    * `max(spark.sql.shuffle.partitions, 32)` — a 32-bucket selection-
    * granularity FLOOR, so a deliberately low shuffle setting does not
    * collapse the boundary bucket into the whole stratum (which would
    * silently regress to the single-task per-stratum sort this operator
    * eliminates). Output is provably invariant to the bucket count
    * (SamplingSpec's invariance property); only selection parallelism is
    * affected. The same floor applies to [[mixToWeights]], which selects
    * through the same path. */
  def stratifiedQuota(df: DataFrame, stratumCol: String, n: Int,
                      keyCol: String = "doc_id"): DataFrame =
    takeSmallestPerStratum(df, stratumCol, keyCol,
      _.withColumn("__quota", lit(n.toLong)))
      .select(df.columns.map(col).toIndexedSeq: _*)

  /** Priority sampling (Duffield, Lund & Thorup, "Priority sampling for
    * estimation of arbitrary subset sums", JACM 2007): a WEIGHTED
    * fixed-size sample without replacement — each row gets priority
    * q = w / u with u uniform in (0, 1], the n highest priorities win, so
    * inclusion probability grows with the row's weight and a stratum with
    * weight 4 lands ~4× the rows of a weight-1 stratum at equal sizes.
    * Complements [[stratifiedQuota]] (fixed n PER stratum, unweighted):
    * here the strata COMPETE for one global budget in weight proportion.
    *
    * Determinism contract: u = (hashKey + 1) / 2³² from the md5 key (the
    * module's keying convention), priorities compare as the single IEEE
    * division (hk + 1) / w — one float op on integer operands, bit-equal
    * in any engine — ties broken by the sample key. Strata absent from
    * `weights` (including NULL) drop, the [[mixToWeights]] contract.
    *
    * Plan shape (the 100 TB story): a narrow projection + global top-n =
    * `TakeOrderedAndProject` — bounded per-partition heaps merged on one
    * reducer, never a full sort; the only corpus-shaped work is the scan.
    * (Inside another aggregation the same cut would be the
    * [[graft.functions.BoundedTopKDouble]] form; standalone, Spark's own
    * top-n physical operator IS that plan.) */
  def prioritySample(df: DataFrame, stratumCol: String,
                     weights: Map[String, Long], n: Int,
                     keyCol: String = "doc_id"): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(weights.values.forall(_ > 0), "weights must be positive")
    val w = weights.foldLeft(lit(0L)) { case (acc, (s, wt)) =>
      when(col(stratumCol) === s, lit(wt)).otherwise(acc)
    }
    df.withColumn("__w", w)
      .filter(col("__w") > 0)
      .withColumn("__rank_key",
        (hashKey(col(keyCol)) + lit(1L)).cast("double") / col("__w"))
      .orderBy(col("__rank_key"), col(keyCol))
      .limit(n)
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** The `__quota` smallest-(hash, key) rows of each stratum, selected
    * without a per-stratum global sort (see the scale-design scaladoc).
    * `attachQuota` attaches a long `__quota` column to the per-(stratum,
    * bucket) counts frame — a literal for fixed quotas (no extra corpus
    * pass), or an equi-join against a per-stratum quota relation (strata
    * absent from it are dropped, including NULL, which never equi-joins).
    * Output column set = input + none (callers re-project). Exactly
    * equivalent to `row_number over (partition by stratum order by hk,
    * key) <= quota` for non-null strata.
    */
  private def takeSmallestPerStratum(df: DataFrame, stratumCol: String,
                                     keyCol: String,
                                     attachQuota: DataFrame => DataFrame)
      : DataFrame = {
    val spark = df.sparkSession
    // Floored: selection granularity must not degrade with a small shuffle
    // setting — at nBuckets=1 the "boundary bucket" is the whole stratum and
    // the code silently regresses to the single-task per-stratum sort this
    // rewrite eliminates (still correct, no longer parallel).
    val nBuckets =
      math.max(Checkpoints.shufflePartitions(spark), 32)
    // Order-preserving range bucketing of the 32-bit hash key (same exact-
    // arithmetic form as Packing: hk·B ≤ 2³²·B fits a long). (hk, key) ties
    // land in one bucket by construction, so cross-bucket order is total.
    val rows = df
      .withColumn("__hk", hashKey(col(keyCol)))
      .withColumn("__bucket", expr(s"(__hk * $nBuckets) div 4294967296"))
    // Tiny aggregate: per-(stratum, bucket) row counts (map-side combined),
    // then per-stratum running offsets over ≤ B rows per stratum.
    val wCum = Window.partitionBy(col(stratumCol)).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val classified = attachQuota(
      rows.groupBy(col(stratumCol), col("__bucket"))
        .agg(count(lit(1)).as("__cnt"))
        .withColumn("__before", coalesce(sum(col("__cnt")).over(wCum), lit(0L))))
      // keep-all: the whole bucket ranks under the quota. boundary: the
      // quota lands inside this bucket (at most one per stratum, since the
      // running offset is monotone). Everything else drops.
      .filter(col("__before") < col("__quota"))
      .select(col(stratumCol), col("__bucket"),
        (col("__before") + col("__cnt") <= col("__quota")).as("__all"),
        (col("__quota") - col("__before")).as("__rem"))
    // The corpus side stays narrow when the verdict relation broadcasts —
    // no pinned hint: at |strata|·B rows it is small for the low-
    // cardinality strata this targets and AQE broadcasts it at runtime,
    // while a pathological high-cardinality stratum column degrades to a
    // shuffle join instead of a driver-side collect failure. Null-safe on
    // the stratum (<=>), so a NULL stratum is selected as its own group
    // rather than silently dropped by the equi-join.
    val cls = classified
      .withColumnRenamed(stratumCol, "__cstratum")
      .withColumnRenamed("__bucket", "__cbucket")
    val tagged = rows.join(cls,
        col(stratumCol) <=> col("__cstratum") && col("__bucket") === col("__cbucket"))
      .drop("__cstratum", "__cbucket")
    val keepAll = tagged.filter(col("__all"))
    // Only the boundary buckets (≈ corpus/B rows per stratum) are ranked —
    // partitioned by (stratum, bucket), so the sort is small AND parallel.
    val wEdge = Window.partitionBy(col(stratumCol), col("__bucket"))
      .orderBy(col("__hk").asc, col(keyCol).asc)
    val fromEdge = tagged.filter(!col("__all"))
      .withColumn("__rk", row_number().over(wEdge))
      .filter(col("__rk") <= col("__rem"))
      .drop("__rk")
    keepAll.unionByName(fromEdge)
  }

  /** Weighted mixture rebalance: subsample every stratum so the output
    * follows the target weight ratios exactly, keeping as much data as the
    * scarcest stratum allows. The binding stratum is the one minimizing
    * count/weight; every stratum's quota is floor(weight · min(count/weight))
    * (so the binding stratum is kept whole). Rows are then chosen per
    * stratum by smallest hash key — the deterministic analogue of uniform
    * sampling without replacement. Strata absent from `weights` are dropped.
    *
    * The scale factor is computed from a |strata|-row aggregate joined back
    * on the stratum key (auto-broadcast); only the final per-stratum rank
    * shuffles the surviving rows. */
  def mixToWeights(df: DataFrame, stratumCol: String,
                   weights: Map[String, Double],
                   keyCol: String = "doc_id"): DataFrame = {
    val weightCol = weights.foldLeft(lit(null).cast("double")) {
      case (acc, (stratum, wt)) =>
        when(col(stratumCol) === stratum, lit(wt)).otherwise(acc)
    }
    val weighted = df.withColumn("__wt", weightCol).filter(col("__wt").isNotNull)
    // min, not first: __wt is functionally dependent on the stratum, but
    // first() is execution-order-dependent by contract (repo convention:
    // pin any pseudo-constant aggregate with min)
    val quotas = weighted.groupBy(col(stratumCol)).agg(
        count(lit(1)).as("__cnt"), min(col("__wt")).as("__w"))
      .withColumn("__factor",
        min(col("__cnt") / col("__w")).over(Window.partitionBy()))
      .select(col(stratumCol),
        floor(col("__w") * col("__factor")).cast("long").as("__quota"))
    takeSmallestPerStratum(weighted, stratumCol, keyCol,
      _.join(quotas, stratumCol))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Temperature-flattened mixture sampling (the multilingual rebalancing
    * of XLM-style pipelines): subsample every stratum toward target ratios
    * ∝ count^τ, flattening the head of a skewed stratum distribution while
    * keeping the binding (scarcest-per-weight) stratum whole up to the
    * floating floor (floor(w·(cnt/w)) can shave one row) — exactly
    * [[mixToWeights]] with the weights DERIVED from the per-stratum counts
    * instead of supplied. τ = 0.5 (the common choice) computes weights via
    * `sqrt`, which IEEE 754 rounds correctly in every engine — so quota
    * floors are bit-deterministic and oracle-checkable; other τ go through
    * `pow`, deterministic within the JVM but not guaranteed bit-equal
    * across engines (documented: the oracle query pins τ = 0.5).
    *
    * Scale shape: identical to [[mixToWeights]] — a |strata|-row count
    * aggregate drives quotas; selection is the distributed
    * smallest-hash-per-stratum path (no per-stratum global sort). */
  def mixTemperature(df: DataFrame, stratumCol: String, tau: Double = 0.5,
                     keyCol: String = "doc_id"): DataFrame = {
    require(tau > 0 && tau <= 1, "temperature must be in (0, 1]")
    val nonNull = df.filter(col(stratumCol).isNotNull)
    def w(cnt: Column): Column =
      if (tau == 0.5) sqrt(cnt) else pow(cnt, lit(tau))
    val quotas = nonNull.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__factor",
        min(col("__cnt") / w(col("__cnt"))).over(Window.partitionBy()))
      .select(col(stratumCol),
        floor(w(col("__cnt")) * col("__factor")).cast("long").as("__quota"))
    takeSmallestPerStratum(nonNull, stratumCol, keyCol,
      _.join(quotas, stratumCol))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Leakage-safe train/val/test split assignment: every member of a
    * near-dup cluster (a `(doc_id, component)` frame, e.g.
    * [[graft.ops.Dedup.minhashLshComponents]]) receives the SAME split,
    * decided by the seeded hash of the cluster label — never of the member
    * id. Splitting by member hash leaks near-duplicate content across the
    * train/eval boundary, the classic held-out-set contamination; hashing
    * the cluster label makes the boundary respect the dedup graph by
    * construction. Docs outside every cluster are their own singleton
    * cluster (hash of their own id — identical to plain hash splitting).
    *
    * `splits` are (name, weight) in declaration order, weights summing to
    * 1; assignment compares the 32-bit [[hashKey]] against cumulative
    * integer thresholds (floor(cum·2³²) — exact arithmetic, engine-
    * portable, oracle-checkable). Deterministic in (corpus, seed); adding
    * docs never moves an existing cluster between splits.
    *
    * Scale shape: one left equi-join docs⋈components plus a narrow hash +
    * CASE projection — no shuffle beyond the join, no per-split pass.
    * Output: (doc_id, cluster_id, split). */
  def leakageSafeSplit(docs: DataFrame, components: DataFrame,
                       splits: Seq[(String, Double)], seed: String = "42",
                       idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val labeled = docs.select(col(idCol))
      .join(components, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("component"), col(idCol)).as("cluster_id"))
    val h = hashKey(concat(lit(seed), col("cluster_id").cast("string")))
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val caseCol = splits.init.zip(cum.init)
      .foldLeft(Option.empty[Column]) { case (acc, ((name, _), c)) =>
        val cond = h < lit((c * KeySpace).toLong)
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
      }
      .fold(lit(splits.last._1): Column)(_.otherwise(splits.last._1))
    labeled.select(col(idCol), col("cluster_id"), caseCol.as("split"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3): score
    * every document with the corpus-trained interpolated bigram LM
    * ([[graft.ops.TextStats.ngramLmPerplexity]]'s integer centibit
    * score), split each language's score distribution into head / middle
    * / tail TERTILES (lower perplexity first — CCNet's proxy for
    * Wikipedia-like quality), and gate each bucket at a per-bucket ppm
    * keep rate through the [[hashKey]] Bernoulli gate (CCNet ships
    * head+middle and drops tail; `keepPpm` defaults accordingly).
    *
    * Determinism: tertile boundaries are computed from a per-(lang,
    * score) HISTOGRAM, and every document sharing a (lang, score) cell
    * lands in the same bucket — a score value belongs to the earliest
    * tertile its first document (in score order) falls into. Membership
    * is a function of the corpus alone: no doc_id tie-break inside a
    * score cell, no floats, no rand(); DuckDB reproduces the histogram,
    * the cumulative rule and the md5 gate bit-for-bit.
    *
    * Scale design (100 TB): the corpus is scored in one
    * ngramLmPerplexity pass (its model relation is vocabulary-shaped);
    * the tertile derivation runs entirely on the (lang, score) histogram
    * — at a centibit quantization that is ≤ |langs|·~thousands of rows,
    * NOT corpus-shaped — so the only window sorts a histogram, never the
    * corpus (the same histogram-not-window discipline as
    * `stratifiedQuota`'s bucket classifier). Verdicts broadcast-join
    * back on (lang, score); the keep gate is a narrow per-row filter.
    * The scored relation feeds BOTH the histogram and the final join, so
    * it is pinned DISK_ONLY (3 narrow columns per doc) — without it the
    * whole LM chain recomputes under each consumer, which the 100× solo
    * probe priced at ~2× the honest single-pass cost. */
  def ppxBuckets(docs: DataFrame,
                 keepPpm: Seq[Long] = Seq(1000000L, 1000000L, 0L),
                 langCol: String = "lang",
                 textCol: String = "text"): DataFrame = {
    require(keepPpm.length == 3 && keepPpm.forall(p => p >= 0 && p <= 1000000L),
      "keepPpm must be three per-bucket rates in [0, 1e6]")
    val scored = TextStats.ngramLmPerplexity(docs, textCol = textCol)
      .select(col("doc_id"), col("avg_bits_x100"))
      .join(docs.select(col("doc_id"), col(langCol)), Seq("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val hist = scored.groupBy(col(langCol), col("avg_bits_x100"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(langCol)).orderBy(col("avg_bits_x100"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col(langCol))
    val buckets = hist
      .withColumn("__before", sum(col("__c")).over(wCum) - col("__c"))
      .withColumn("__tot", sum(col("__c")).over(wTot))
      .withColumn("bucket",
        when(col("__before") * 3 < col("__tot"), lit(0L))
          .when(col("__before") * 3 < col("__tot") * 2, lit(1L))
          .otherwise(lit(2L)))
      .select(col(langCol), col("avg_bits_x100"), col("bucket"))
    val rate = element_at(
      lit(keepPpm.toArray), col("bucket").cast("int") + 1)
    scored.join(broadcast(buckets), Seq(langCol, "avg_bits_x100"))
      .select(col("doc_id"), col(langCol), col("avg_bits_x100"), col("bucket"),
        (hashKey(col("doc_id")) % 1000000L < rate).cast("long").as("is_keep"))
  }

  /** Token-budget apportionment (Hamilton / largest-remainder) — the
    * mixture PLANNING step that precedes [[mixToWeights]]-style sampling:
    * given integer mixture weights and a total training-token budget,
    * split the budget across the strata present in the corpus with zero
    * floats. Each present stratum gets base = ⌊B·w ∕ W⌋ tokens (W = the
    * FULL weight-map total, so absent strata leave their mass
    * unallocated rather than silently inflating the others); the
    * ⌊Σ remainders ∕ W⌋ leftover units go one each to the largest
    * remainders, ties toward the smaller stratum key — the classic
    * apportionment rule, exactly reproducible in integer arithmetic.
    * Emits per stratum the available token mass, the allocation, the
    * implied ppm sampling rate (capped at 10⁶), and an `underfilled`
    * flag when the corpus cannot fill the quota (alloc > avail) — the
    * signal to re-weight or upsample.
    *
    * Scale shape (100 TB): the ONLY corpus-shaped work is one token-count
    * aggregate per stratum (map-side combinable); everything after runs
    * on the |strata|-row relation — the global remainder window is
    * bounded by the stratum count, never by data. */
  def budgetAllocation(docs: DataFrame, weights: Map[String, Long],
                       totalBudget: Long, stratumCol: String = "lang",
                       textCol: String = "text"): DataFrame = {
    require(weights.values.forall(_ > 0), "weights must be positive")
    val wTot = weights.values.sum
    val weightCol = weights.foldLeft(lit(null).cast("long")) {
      case (acc, (st, w)) =>
        when(col(stratumCol) === st, lit(w)).otherwise(acc)
    }
    val avail = docs
      .select(col(stratumCol),
        size(TextStats.tokens(col(textCol))).cast("long").as("__n"))
      .groupBy(col(stratumCol)).agg(sum(col("__n")).as("avail_tokens"))
      .withColumn("weight", weightCol)
      .filter(col("weight").isNotNull)
      .withColumn("__base", expr(s"($totalBudget * weight) div $wTot"))
      .withColumn("__rem", expr(s"($totalBudget * weight) % $wTot"))
    val extras = avail.agg(expr(s"sum(__rem) div $wTot").as("__extras"))
    avail.crossJoin(broadcast(extras))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc, col(stratumCol).asc)))
      .withColumn("alloc_tokens",
        col("__base") + when(col("__rk") <= col("__extras"), 1L).otherwise(0L))
      .select(col(stratumCol), col("weight"), col("avail_tokens"),
        col("alloc_tokens"),
        least(lit(1000000L),
          expr("alloc_tokens * 1000000 div avail_tokens")).as("sample_rate_ppm"),
        (col("alloc_tokens") > col("avail_tokens")).cast("long")
          .as("underfilled"))
  }
}
