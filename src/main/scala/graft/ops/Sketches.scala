package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches with ORACLE-EXACT arithmetic.
  *
  * The engine's exact distinct counts (`q_distinct_customers`,
  * `q_profile_lineitem`) document approx_count_distinct as the extreme-
  * cardinality swap — but HLL internals are engine-specific, so that swap
  * trades away the DuckDB hash-compare. A bottom-k (KMV) sketch keeps it:
  * every piece is deterministic md5 arithmetic (the [[Sampling.hashKey]]
  * convention), the estimator is ONE integer division, and the sketch is
  * MERGEABLE (bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B))), the
  * property that makes it a per-partition/per-day artifact a 100 TB
  * pipeline can maintain incrementally and union at query time.
  *
  * Reference estimator: Bar-Yossef et al., "Counting distinct elements in
  * a data stream" (RANDOM 2002) — E[distinct] ≈ (k−1)/U_(k) with U_(k)
  * the k-th smallest hash normalized to [0, 1); here in integer form
  * (k−1)·2³² div h_(k) over the 32-bit [[Sampling.hashKey]] space.
  */
object Sketches {

  /** Per-group KMV distinct estimate: groups smaller than k report their
    * EXACT hash-distinct count (the bottom-k list IS the full hash set);
    * larger groups report the integer estimator over the k-th smallest
    * hash. Output: (group, n_kept ≤ k, kth_hash, est_distinct).
    *
    * Plan shape (the 100 TB story): one map-side-combinable DISTINCT on
    * (group, hash) — the only corpus-shaped exchange, carrying 12-byte
    * rows — then a bounded top-k hash aggregate
    * ([[graft.functions.BoundedTopKLong]], ≤ k-pair buffers per
    * (partition, group); the rpRerank cut pattern). No corpus sort, no
    * rank window, no per-group state beyond k longs — and `hashKey`
    * collisions (birthday-bounded in the 2³² space) are part of the
    * sketch's error budget, replayed identically by the oracle. */
  def kmvDistinct(df: DataFrame, groupCol: String, keyCol: String,
                  k: Int): DataFrame =
    withEstimate(kmvSketch(df, groupCol, keyCol, k)
      .withColumnRenamed("sk", "__bottom"), "__bottom", k)
      .drop("__bottom")

  /** The STORE form: per-group bottom-k hash arrays (ascending, ≤ k) —
    * the artifact a 100 TB pipeline persists per (partition, day) and
    * merges at query time ([[kmvMergeAgainst]]). NULL keys are dropped
    * before hashing (a NULL hash would poison the typed aggregator and
    * rank NULLS-LAST in the oracle — ADVICE r16); the estimator treats
    * distinct-of-non-null as the population, the COUNT(DISTINCT col)
    * convention. */
  def kmvSketch(df: DataFrame, groupCol: String, keyCol: String,
                k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2 (k-1 drives the estimator)")
    val hashed = df
      .filter(col(keyCol).isNotNull)
      .select(col(groupCol), Sampling.hashKey(col(keyCol)).as("hk"))
      .distinct()
    val bottomK = udaf(graft.functions.BoundedTopKLong(k))
    hashed.groupBy(col(groupCol))
      .agg(bottomK(col("hk"), col("hk")).as("sk"))
  }

  /** Read estimates from a [[kmvSketch]]-shaped store relation — the
    * query-time half of the store/update split ([[kmvMergeAgainst]]
    * merges; this reads): (group, sk, n_kept, kth_hash, est_distinct).
    * Sketch-sized input, narrow codegen'd arithmetic — no corpus touch. */
  def kmvEstimates(sketches: DataFrame, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2 (k-1 drives the estimator)")
    withEstimate(sketches, "sk", k)
  }

  /** Append the estimator columns for a bottom-k array column `skCol`:
    * (n_kept, kth_hash, est_distinct) — exact count below k, the integer
    * Bar-Yossef estimator at k. */
  private def withEstimate(sketches: DataFrame, skCol: String,
                           k: Int): DataFrame =
    sketches.withColumns(Map(
      "n_kept" -> size(col(skCol)).cast("long"),
      "kth_hash" -> element_at(col(skCol), size(col(skCol))),
      "est_distinct" ->
        when(size(col(skCol)) < k, size(col(skCol)).cast("long"))
          .otherwise(expr(
            s"(CAST(${k - 1} AS BIGINT) * 4294967296L) div " +
              s"element_at($skCol, size($skCol))"))))

  /** Stored-sketch UPDATE — the sketch algebra's deployment form: merge
    * tonight's per-group batch sketches into yesterday's stored sketches
    * (both [[kmvSketch]]-shaped) and read the refreshed estimates. The
    * merge is bottom-k(bottom-k(A) ∪ bottom-k(B)) — by the mergeability
    * identity (SketchesSpec) EXACTLY the sketch of A ∪ B, which is what
    * lets the registry oracle check this against a whole-corpus replay.
    *
    * Plan shape: ONE full-outer equi-join on the group key between two
    * sketch-sized relations (≤ k longs per group each side) and a narrow
    * codegen'd array merge — the corpus is never re-touched; a group
    * seen by only one side passes through via the empty-array coalesce.
    * Output: (group, sk — the NEW store, n_kept, kth_hash, est_distinct). */
  def kmvMergeAgainst(store: DataFrame, batch: DataFrame, groupCol: String,
                      k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2 (k-1 drives the estimator)")
    withEstimate(kmvMergeSketches(store, batch, groupCol, k), "sk", k)
  }

  /** The raw store merge shared by [[kmvMergeAgainst]] and the quantile
    * family: per-group bottom-k(bottom-k ∪ bottom-k) over two
    * [[kmvSketch]]-shaped relations. ONE full-outer equi-join between
    * sketch-sized sides + a narrow array merge; a group seen by only one
    * side passes through via the empty-array coalesce. */
  def kmvMergeSketches(store: DataFrame, batch: DataFrame, groupCol: String,
                       k: Int): DataFrame = {
    val empty = array().cast("array<bigint>")
    store.select(col(groupCol), col("sk").as("__sk_store"))
      .join(batch.select(col(groupCol), col("sk").as("__sk_batch")),
        Seq(groupCol), "full_outer")
      .select(col(groupCol),
        slice(array_sort(array_union(
          coalesce(col("__sk_store"), empty),
          coalesce(col("__sk_batch"), empty))), 1, k).as("sk"))
  }

  /** Mergeable QUANTILE sketch — the second pillar next to mergeable
    * distinct: a deterministic uniform ROW sample (bottom-k by row-key
    * hash) carrying the metric value, from which quantiles read as order
    * statistics. The trick that keeps the WHOLE [[kmvSketch]] algebra
    * (store shape, [[kmvMergeSketches]], the bounded aggregator): the
    * (hash, value) pair is PACKED into one 64-bit word —
    *
    *   pk = (hashKey(key) mod 2³¹) · 2³² + (value_cents + 2³¹)
    *
    * — hash in the high bits, so bottom-k by pk IS bottom-k by hash
    * (value-biased only inside a hash tie), nonneg and ≤ 2⁶³−1 by
    * construction. Sampling is over DISTINCT packed words ((hash, value)
    * collisions fold into the sketch's birthday-bounded error budget,
    * the [[kmvDistinct]] convention — which is also what makes the
    * array_union merge exact). Contract: |value_cents| < 2³¹ (a metric in
    * cents/micros of bounded magnitude) and a unique-per-row key column;
    * NULL keys/values are dropped on both engines.
    *
    * Reference: bottom-k sampling as a uniform sample coordinator —
    * Cohen & Kaplan, "Summarizing data using bottom-k sketches" (PODC
    * 2007); order-statistic quantile error O(1/√k). */
  def kmvQuantileSketch(df: DataFrame, groupCol: String, keyCol: String,
                        valueCents: Column, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val pk = (Sampling.hashKey(col(keyCol)) % lit(2147483648L)) *
      lit(4294967296L) + (valueCents + lit(2147483648L))
    val packed = df
      .filter(col(keyCol).isNotNull && valueCents.isNotNull)
      .select(col(groupCol), pk.as("pk"))
      .distinct()
    val bottomK = udaf(graft.functions.BoundedTopKLong(k))
    packed.groupBy(col(groupCol))
      .agg(bottomK(col("pk"), col("pk")).as("sk"))
  }

  /** Read quantile estimates from a (merged) quantile-sketch relation:
    * for each requested integer percent p, the zero-based order statistic
    * at index (p·(n−1)) div 100 of the sample VALUES (unpacked from the
    * low 32 bits, value-sorted) — exact integer index arithmetic, so both
    * engines pick the same element. Groups smaller than k are EXACT
    * (sample = population). Output: (group, n_kept, p<p>_cents...). */
  def kmvQuantiles(sketches: DataFrame, groupCol: String,
                   percents: Seq[Int]): DataFrame =
    kmvQuantilesBy(sketches, Seq(groupCol), percents)

  /** [[kmvQuantiles]] with a composite row key — the member the DAILY
    * store form needs ((group, day) rows). Per-ROW arithmetic on the
    * `sk` column; every key column passes through. */
  def kmvQuantilesBy(sketches: DataFrame, keyCols: Seq[String],
                     percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 0 && p <= 100))
    val vals = array_sort(transform(col("sk"),
      p => p % lit(4294967296L) - lit(2147483648L)))
    val base = sketches.select(keyCols.map(col) ++ Seq(vals.as("__vals"),
      size(col("sk")).cast("long").as("n_kept")): _*)
    val qCols = percents.map { p =>
      element_at(col("__vals"),
        (expr(s"($p * (n_kept - 1)) div 100") + lit(1)).cast("int"))
        .as(s"p${p}_cents")
    }
    base.select(keyCols.map(col) ++ Seq(col("n_kept")) ++ qCols: _*)
  }

  /** Trailing-window QUANTILES from DAILY quantile sketches — the
    * fourth and last sliding form, completing the matrix (distinct
    * [[kmvSlidingDistinct]], frequency [[cmsSlidingSketch]], heavy
    * hitters [[mgSlidingTopK]], QUANTILES here): "p25/p50/... of the
    * metric per group over the trailing N days, for every day" without
    * re-touching the corpus per window. Because the quantile sketch IS
    * a [[kmvSketch]]-shaped bottom-k over packed (hash, cents) words,
    * the ENTIRE sliding machinery applies verbatim: one (group, day,
    * pk) DISTINCT builds the daily sketches (the only corpus-shaped
    * work), the epoch-day range frame unions ≤ windowDays arrays per
    * output row re-cut to bottom-k — by the mergeability identity
    * EXACTLY the window's direct sketch — and [[kmvQuantilesBy]] reads
    * the order statistics per (group, day). Calendar gaps window by
    * date. Output: (group, day, n_kept, p<p>_cents...). */
  def kmvSlidingQuantiles(df: DataFrame, groupCol: String, tsCol: String,
                          keyCol: String, valueCents: Column, k: Int,
                          windowDays: Int, percents: Seq[Int]): DataFrame = {
    require(k >= 2, "k must be >= 2")
    require(windowDays >= 1, "windowDays must be >= 1")
    val pk = (Sampling.hashKey(col(keyCol)) % lit(2147483648L)) *
      lit(4294967296L) + (valueCents + lit(2147483648L))
    val packed = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        valueCents.isNotNull)
      .select(col(groupCol), to_date(col(tsCol)).as("day"), pk.as("__w"))
      .distinct()
    kmvQuantilesBy(slidingDailySketch(packed, groupCol, k, windowDays),
      Seq(groupCol, "day"), percents)
  }

  /** The shared BUILD half of every sliding-KMV form (review r19 — one
    * copy, not three: [[kmvSlidingDistinct]], [[kmvSlidingQuantiles]] and
    * [[kmvSlidingOverlap]] all window identically, so the epoch-day
    * anchor / re-cut / frame semantics cannot drift between them): from a
    * pre-hashed, pre-DISTINCTed (group, day, __w) word relation, build
    * per-(group, day) bottom-k sketches and re-cut each day's sketch to
    * its trailing `windowDays` union — by the mergeability identity
    * EXACTLY the window's direct sketch. The range frame keys on the
    * EPOCH-DAY number so calendar gaps window by date, not by row.
    * Output: (group, day, sk). */
  private def slidingDailySketch(words: DataFrame, groupCol: String,
                                 k: Int, windowDays: Int): DataFrame = {
    val bottomK = udaf(graft.functions.BoundedTopKLong(k))
    val daily = words.groupBy(col(groupCol), col("day"))
      .agg(bottomK(col("__w"), col("__w")).as("sk"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(datediff(col("day"), lit("1970-01-01").cast("date")))
      .rangeBetween(-(windowDays - 1), 0)
    daily.withColumn("sk",
      slice(array_sort(array_distinct(flatten(
        collect_list(col("sk")).over(w)))), 1, k))
  }

  /** Trailing-window distinct counts from DAILY sketches — the canonical
    * query the per-(partition, day) KMV store exists to answer: "distinct
    * keys per group over the trailing `windowDays` days, for every day",
    * WITHOUT re-touching the corpus per window. One (group, day, hash)
    * DISTINCT builds the daily sketches (the only corpus-shaped work —
    * the same exchange [[kmvDistinct]] pays once); the sliding union is a
    * range-frame window over SKETCH ROWS (≤ windowDays arrays of ≤ k
    * longs per output row — bounded, never corpus-sized), re-cut to
    * bottom-k. By the mergeability identity the re-cut union EQUALS the
    * sketch of the window's raw key set, which is what the oracle checks.
    * The range frame is keyed on the EPOCH-DAY number, so calendar gaps
    * window correctly (a missing day contributes nothing, not a frame
    * shift). Output: (group, day, n_kept, kth_hash, est_distinct). */
  def kmvSlidingDistinct(df: DataFrame, groupCol: String, tsCol: String,
                         keyCol: String, k: Int,
                         windowDays: Int): DataFrame = {
    require(k >= 2, "k must be >= 2 (k-1 drives the estimator)")
    require(windowDays >= 1, "windowDays must be >= 1")
    val hashed = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(groupCol), to_date(col(tsCol)).as("day"),
        Sampling.hashKey(col(keyCol)).as("__w"))
      .distinct()
    withEstimate(slidingDailySketch(hashed, groupCol, k, windowDays),
      "sk", k)
  }

  /** Mergeable COUNT-MIN frequency sketch — the THIRD sketch pillar next
    * to mergeable distinct ([[kmvSketch]]) and quantiles
    * ([[kmvQuantileSketch]]): per-group ROW-FREQUENCY estimation in
    * d·w integer cells. Deterministic by construction — the d hash rows
    * are seeded md5 arithmetic (the [[Sampling.hashKey]] convention with
    * a per-depth seed prefix), every cell a plain BIGINT count — so both
    * engines replay the sketch bit-for-bit: oracle-exact like the rest
    * of the family, unlike engine-internal frequency sketches.
    *
    * Store shape: (group, d, bucket, cnt), ≤ depth·width rows per group
    * (sparse — untouched cells are absent ≡ 0). Plan: ONE map-side-
    * combinable hash aggregate over the depth-exploded corpus (the only
    * corpus-shaped work, combining down to d·w cells per group before
    * the exchange); no sort, no window, no per-row state.
    *
    * MERGE = elementwise cell sum ([[cmsMerge]]) — counts commute, so
    * merged-per-partition sketches EQUAL the whole-corpus sketch exactly
    * (not just distributionally): the same keep-one-sketch-per-
    * (partition, day) shape as the KMV store, with the stronger identity.
    *
    * Reference: Cormode & Muthukrishnan, "An improved data stream
    * summary: the count-min sketch and its applications" (J. Algorithms
    * 2005) — point estimate min over d cells, overestimate-only, error
    * ≤ N·e/w with probability 1−e^−d. */
  def cmsSketch(df: DataFrame, groupCol: String, keyCol: String,
                depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "depth >= 1 and width >= 2")
    df.filter(col(keyCol).isNotNull)
      .select(col(groupCol), explode(array((0 until depth).map(i =>
        struct(lit(i).as("d"), cmsBucket(col(keyCol), i, width).as("bucket"))
      ): _*)).as("__cell"))
      .groupBy(col(groupCol), col("__cell.d").as("d"),
        col("__cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Seeded CMS hash for depth `i`: the [[Sampling.hashKey]] md5
    * arithmetic over "cms<i>|<key>" mod width — replayed verbatim by the
    * DuckDB oracle. */
  private def cmsBucket(key: Column, i: Int, width: Int): Column =
    Sampling.hashKey(concat(lit(s"cms$i|"), key.cast("string"))) % width

  /** Merge two CMS stores: elementwise cell sum — EXACTLY the sketch of
    * the concatenated inputs (counts commute), so per-partition sketches
    * fold into the global one with no error term. Sketch-sized work:
    * union of ≤ depth·width-row relations + one combine. */
  def cmsMerge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.select(col(groupCol), col("d"), col("bucket"), col("cnt"))
      .unionByName(b.select(col(groupCol), col("d"), col("bucket"), col("cnt")))
      .groupBy(col(groupCol), col("d"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates from a CMS store: for each (group, key)
    * probe row, min over the d cells the key hashes to — the classic
    * overestimate-only read. The probe relation is expected tiny
    * (broadcast side); the store is d·w-sized — neither is corpus-shaped,
    * the whole point of querying the sketch instead of the corpus. */
  def cmsEstimate(store: DataFrame, probes: DataFrame, groupCol: String,
                  keyCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "depth >= 1 and width >= 2")
    val cells = probes.filter(col(keyCol).isNotNull)
      .select(col(groupCol), col(keyCol),
        explode(array((0 until depth).map(i =>
          struct(lit(i).as("d"), cmsBucket(col(keyCol), i, width).as("bucket"))
        ): _*)).as("__cell"))
      .select(col(groupCol), col(keyCol),
        col("__cell.d").as("d"), col("__cell.bucket").as("bucket"))
    // inner join: a key absent from the corpus may miss cells entirely
    // (true count 0); coalesce via the left join + 0-fill keeps those at
    // the overestimate-only floor instead of dropping them
    cells.join(store, Seq(groupCol, "d", "bucket"), "left")
      .groupBy(col(groupCol), col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Trailing-window FREQUENCY cells from DAILY Count-Min sketches — the
    * frequency twin of [[kmvSlidingDistinct]]: "how often did key X occur
    * per group over the trailing `windowDays` days, for every day",
    * WITHOUT re-touching the corpus per window. Because CMS cells are
    * plain counts, the windowed cell SUM **is** the window's sketch —
    * EXACT (counts commute; the same identity behind [[cmsMerge]]), not
    * just error-bounded — so the per-(group, day) stored cells union
    * into any trailing window by addition alone.
    *
    * Plan shape: ONE corpus-shaped aggregate builds the daily cells
    * ((group, day, d, bucket) partial-combined map-side); the sliding
    * union joins the group's ACTIVE-DAY relation (sketch-sized, derived
    * from the daily cells) back to the cells group-keyed with the day
    * range as a join residual — per output row ≤ windowDays·depth·width
    * cells, never corpus-shaped. Day arithmetic is calendar-true: a gap
    * day contributes nothing (it has no cell rows), and windows anchor
    * on each active day's own date. Output: (group, day, d, bucket,
    * cnt) — the windowed store [[cmsSlidingEstimate]] reads. */
  def cmsSlidingSketch(df: DataFrame, groupCol: String, tsCol: String,
                       keyCol: String, depth: Int, width: Int,
                       windowDays: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "depth >= 1 and width >= 2")
    require(windowDays >= 1, "windowDays must be >= 1")
    val daily = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(groupCol), to_date(col(tsCol)).as("day"),
        explode(array((0 until depth).map(i =>
          struct(lit(i).as("d"), cmsBucket(col(keyCol), i, width).as("bucket"))
        ): _*)).as("__cell"))
      .groupBy(col(groupCol), col("day"), col("__cell.d").as("d"),
        col("__cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val days = daily.select(col(groupCol), col("day")).distinct()
    val cells = daily.withColumnRenamed("day", "__cell_day")
    // group-keyed equi-join with the trailing-day range as a residual:
    // the window side is the group's active days (sketch-sized), never
    // a corpus relation
    days.alias("w").join(cells.alias("c"),
        col(s"w.`$groupCol`") === col(s"c.`$groupCol`") &&
          col("c.__cell_day")
            .between(date_sub(col("w.day"), windowDays - 1), col("w.day")))
      .groupBy(col(s"w.`$groupCol`"), col("w.day"), col("c.d"),
        col("c.bucket"))
      .agg(sum(col("c.cnt")).as("cnt"))
  }

  /** Point-frequency estimates over a [[cmsSlidingSketch]] windowed
    * store: for every probe key and every ACTIVE day of its group, min
    * over the d windowed cells — the [[cmsEstimate]] read extended with
    * the day axis. The probe×day grid is built first (days from the
    * store, ≤ |probes|·|days|·depth rows — sketch-shaped) so a cell
    * untouched in a window reads as 0 (the overestimate-only floor),
    * exactly like the single-store read. Output: (group, day, key,
    * est_cnt). */
  def cmsSlidingEstimate(store: DataFrame, probes: DataFrame,
                         groupCol: String, keyCol: String, depth: Int,
                         width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, "depth >= 1 and width >= 2")
    val days = store.select(col(groupCol), col("day")).distinct()
    val probeCells = probes.filter(col(keyCol).isNotNull)
      .select(col(groupCol), col(keyCol),
        explode(array((0 until depth).map(i =>
          struct(lit(i).as("d"), cmsBucket(col(keyCol), i, width).as("bucket"))
        ): _*)).as("__cell"))
      .select(col(groupCol), col(keyCol),
        col("__cell.d").as("d"), col("__cell.bucket").as("bucket"))
    days.join(probeCells, Seq(groupCol))
      .join(store, Seq(groupCol, "day", "d", "bucket"), "left")
      .groupBy(col(groupCol), col("day"), col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Mergeable HEAVY-HITTERS summary (Misra-Gries) — the FOURTH sketch
    * pillar (distinct / quantiles / frequency / top-k frequent): the one
    * canonical store question CMS cannot answer, "WHICH keys are
    * frequent", needs a candidate-tracking summary ([[cmsEstimate]]'s
    * probe relation is an input). This is the ORDER-FREE batch form of
    * Misra-Gries with k counters: exact per-(group, key) counts, then
    * the canonical prune — subtract the (k+1)-th largest count d (of the
    * count MULTISET; 0 when the group has ≤ k distinct keys) and keep
    * the strictly-positive remainders. At most k keys survive (at most k
    * counts can strictly exceed the (k+1)-th largest), the summary is a
    * pure function of the multiset (no stream-order dependence — what
    * makes it oracle-replayable), and the classic MG contract holds with
    * err = d: for every key, est ≤ true ≤ est + err (absent keys have
    * true ≤ err), and err ≤ n/(k+1).
    *
    * Store shape: ONE row per group — (group, err, counters
    * map<key, est>) — so a group whose candidates all pruned away still
    * carries its error budget into the merge (a rows-only shape would
    * silently drop err with the last candidate).
    *
    * Plan shape (ONE corpus scan, no join-back): the per-(group, key)
    * count is the only corpus-shaped work (one map-side-combinable hash
    * aggregate); a bounded top-(k+1) (cnt, key) aggregator
    * ([[graft.functions.BoundedTopCounts]], ≤ (k+1)-pair buffers — no
    * rank window over the counts relation) reduces each group to the
    * pairs that FULLY determine the prune: the (k+1)-th pair's count is
    * d, and every key with count > d sorts strictly before any
    * tied-at-d key, so the candidate set is exact whichever tied keys
    * the buffer holds. The map + err then fall out of narrow array
    * expressions (filter / transform / map_from_entries).
    *
    * Reference: Misra & Gries, "Finding repeated elements" (Sci. Comput.
    * Program. 1982); mergeability per Agarwal et al., "Mergeable
    * summaries" (PODS 2012). */
  def mgSummary(df: DataFrame, groupCol: String, keyCol: String,
                k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val counts = df.filter(col(keyCol).isNotNull)
      .groupBy(col(groupCol), col(keyCol).cast("string").as("__key"))
      .agg(count(lit(1)).as("__cnt"))
    mgFromCounts(counts, Seq(groupCol), k)
  }

  /** The shared MG prune over a pre-counted (groupCols..., __key, __cnt)
    * relation: bounded top-(k+1) pair cut per group, then the canonical
    * subtract-the-(k+1)-th-largest prune read off the pairs —
    * (groupCols..., err, counters). Also the seam the WINDOWED form
    * re-enters with summed daily estimates as the "counts". */
  private def mgFromCounts(counts: DataFrame, groupCols: Seq[String],
                           k: Int): DataFrame = {
    val topPairs = udaf(graft.functions.BoundedTopCounts(k + 1))
    counts.groupBy(groupCols.map(col): _*)
      .agg(topPairs(col("__cnt"), col("__key")).as("__top"))
      .withColumn("err",
        when(size(col("__top")) <= k, lit(0L))
          .otherwise(element_at(col("__top"), k + 1).getField("cnt")))
      .select(groupCols.map(col) ++ Seq(col("err"),
        map_from_entries(transform(
          filter(col("__top"), p => p.getField("cnt") > col("err")),
          p => struct(p.getField("key"),
            p.getField("cnt") - col("err")))).as("counters")): _*)
  }

  private def emptyCounters: Column =
    map_from_arrays(array().cast("array<string>"),
      array().cast("array<bigint>"))

  /** Merge two [[mgSummary]]-shaped stores (Agarwal et al.'s MG merge):
    * sum matching counters, then re-prune with the same (k+1)-th-largest
    * rule; the merged error budget is err_a + err_b + the new prune
    * depth, preserving est ≤ true ≤ est + err — so every key with
    * true count > err survives the merge (the heavy-hitter guarantee;
    * spec-pinned). Sketch-sized work end-to-end: ONE full-outer
    * group-keyed join between ≤ (k-entry map)-per-group relations and
    * narrow map expressions (map_zip_with / map_filter /
    * transform_values) — the corpus is never re-touched. */
  def mgMerge(a: DataFrame, b: DataFrame, groupCol: String,
              k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val joined = a.select(col(groupCol), col("err").as("__err_a"),
        col("counters").as("__m_a"))
      .join(b.select(col(groupCol), col("err").as("__err_b"),
        col("counters").as("__m_b")), Seq(groupCol), "full_outer")
      .withColumn("__sum", map_zip_with(
        coalesce(col("__m_a"), emptyCounters),
        coalesce(col("__m_b"), emptyCounters),
        (_, va, vb) => coalesce(va, lit(0L)) + coalesce(vb, lit(0L))))
      .withColumn("__vals", array_sort(map_values(col("__sum"))))
      .withColumn("__d",
        when(size(col("__vals")) <= k, lit(0L))
          .otherwise(element_at(col("__vals"), size(col("__vals")) - k)))
    joined.select(col(groupCol),
      (coalesce(col("__err_a"), lit(0L)) + coalesce(col("__err_b"), lit(0L))
        + col("__d")).as("err"),
      transform_values(
        map_filter(col("__sum"), (_, v) => v > col("__d")),
        (_, v) => v - col("__d")).as("counters"))
  }

  /** TRENDING KEYS — trailing-window top-k frequent keys per (group,
    * day) from DAILY [[mgSummary]]-shaped summaries: the windowed
    * composition of the heavy-hitters pillar, pairing with
    * [[cmsSlidingSketch]] the way [[kmvSlidingDistinct]] pairs with the
    * KMV store. The N-way MG merge is ORDER-FREE (sum all stored
    * estimates, prune ONCE by the (k+1)-th largest — associativity
    * holds because the prune happens once over the summed relation),
    * so each output day merges its ≤ `windowDays` daily summaries by
    * plain aggregation: est ≤ true_window ≤ est + err with err = the
    * window's summed daily errs + the merge prune depth — every key
    * whose true windowed count exceeds err survives.
    *
    * Plan shape: the per-(group, day, key) count is the only
    * corpus-shaped work; daily summaries are ≤ k entries + one err per
    * (group, day); the window is a group-keyed equi-join with the
    * trailing-day range as a residual over those summary rows (≤
    * windowDays·k per output day — never corpus-shaped, the
    * [[cmsSlidingSketch]] join discipline), and the merge prune rides
    * the same bounded pair aggregator. Date-anchored: calendar gaps
    * contribute nothing. Output: (group, day, rank, key, est_cnt,
    * ub_cnt) ranked (est desc, key asc), rank ≤ kOut. */
  def mgSlidingTopK(df: DataFrame, groupCol: String, tsCol: String,
                    keyCol: String, k: Int, windowDays: Int,
                    kOut: Int): DataFrame = {
    require(k >= 1 && kOut >= 1, "k and kOut must be >= 1")
    require(windowDays >= 1, "windowDays must be >= 1")
    val counts = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(groupCol), to_date(col(tsCol)).as("day"),
        col(keyCol).cast("string").as("__key"))
      .agg(count(lit(1)).as("__cnt"))
    val daily = mgFromCounts(counts, Seq(groupCol, "day"), k)
    val candRows = daily
      .select(col(groupCol), col("day").as("__cday"),
        explode(col("counters")))
      .withColumnRenamed("value", "__est")
    val days = daily.select(col(groupCol), col("day"))
    def trailing(rows: DataFrame): DataFrame =
      days.alias("w").join(rows.alias("c"),
        col(s"w.`$groupCol`") === col(s"c.`$groupCol`") &&
          col("c.__cday")
            .between(date_sub(col("w.day"), windowDays - 1), col("w.day")))
    val winKeys = trailing(candRows)
      .groupBy(col(s"w.`$groupCol`"), col("w.day"), col("c.key"))
      .agg(sum(col("c.__est")).as("__cnt"))
      .withColumnRenamed("key", "__key")
    val winErrs = trailing(
        daily.select(col(groupCol), col("day").as("__cday"),
          col("err").as("__derr")))
      .groupBy(col(s"w.`$groupCol`"), col("w.day"))
      .agg(sum(col("c.__derr")).as("__errs"))
    val merged = mgFromCounts(winKeys, Seq(groupCol, "day"), k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), col("day"))
      .orderBy(col("est_cnt").desc, col("key"))
    // winErrs covers every (group, day) with ≥ 1 daily summary row, i.e.
    // every output day — inner group-keyed join, broadcast-sized
    merged.join(winErrs, Seq(groupCol, "day"))
      .select(col(groupCol), col("day"),
        (col("err") + col("__errs")).as("err"), col("counters"))
      .select(col(groupCol), col("day"), col("err"),
        explode(col("counters")))
      .withColumnRenamed("value", "est_cnt")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kOut)
      .select(col(groupCol), col("day"), col("rank"), col("key"),
        col("est_cnt"), (col("est_cnt") + col("err")).as("ub_cnt"))
  }

  /** Ranked top-k read over a (merged) [[mgSummary]] store: candidates
    * ordered (est desc, key asc — deterministic), each with its
    * lower-bound estimate and the upper bound est + err. Summary-sized
    * input (≤ k entries per group), so the rank window is bounded. */
  def mgTopK(summary: DataFrame, groupCol: String, kOut: Int): DataFrame = {
    require(kOut >= 1, "kOut must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("est_cnt").desc, col("key"))
    summary.select(col(groupCol), col("err"), explode(col("counters")))
      .withColumnRenamed("value", "est_cnt")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kOut)
      .select(col(groupCol), col("rank"), col("key"), col("est_cnt"),
        (col("est_cnt") + col("err")).as("ub_cnt"))
  }

  /** Pairwise set-overlap estimates from MERGED sketches — the KMV set
    * algebra (Beyer et al., "On synopses for distinct-value estimation
    * under multiset operations", SIGMOD 2007): for parts a < b, merge
    * their bottom-k lists, re-cut to the union's bottom-k K, and read
    *
    *   est_union        = the [[kmvDistinct]] estimator over K,
    *   est_jaccard_ppm  = 10⁶ · |K ∩ L_a ∩ L_b| div |K|   (exact-integer
    *                      MinHash-style fraction — K is a uniform sample
    *                      of the union),
    *   est_intersection = est_jaccard_ppm · est_union div 10⁶.
    *
    * Everything after the per-part sketches is sketch-sized: the pair
    * relation is |parts|² rows of ≤ k-long arrays, the merge is
    * array_union + one ≤ 2k-row window per pair — this is exactly the
    * union-at-query-time shape that lets a 100 TB pipeline keep one
    * sketch per (partition, day) and answer any pairwise audience /
    * vocabulary overlap without re-touching the corpus. Integer ppm
    * throughout — no cross-engine float arithmetic. */
  def kmvOverlap(df: DataFrame, partCol: String, keyCol: String,
                 k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2 (k-1 drives the estimator)")
    // NULL keys dropped before hashing (the kmvSketch contract): a NULL
    // hash would feed NULL into the typed aggregator while the oracle
    // ranks it NULLS-LAST — divergent on any corpus with NULL keys.
    val hashed = df
      .filter(col(keyCol).isNotNull)
      .select(col(partCol).as("part"), Sampling.hashKey(col(keyCol)).as("hk"))
      .distinct()
    val bottomK = udaf(graft.functions.BoundedTopKLong(k))
    val sk = hashed.groupBy(col("part"))
      .agg(bottomK(col("hk"), col("hk")).as("sk"))
    val pairs = sk.select(col("part").as("part_a"), col("sk").as("ska"))
      .join(sk.select(col("part").as("part_b"), col("sk").as("skb")),
        col("part_a") < col("part_b"))
    overlapFromSketchPairs(pairs, Seq.empty, k)
  }

  /** The shared overlap READ over a paired-sketch relation (part_a,
    * part_b, extraKeys..., ska, skb): merge each pair's bottom-k lists,
    * re-cut to the union's bottom-k, and read the Beyer set algebra —
    * [[kmvOverlap]]'s batch form and [[kmvSlidingOverlap]]'s windowed form
    * both end here. Everything is sketch-sized: the explode is ≤ 2k rows
    * per pair and the rank window is keyed per pair — never corpus-sized. */
  private def overlapFromSketchPairs(pairs: DataFrame,
                                     extraKeys: Seq[String],
                                     k: Int): DataFrame = {
    val keys = Seq("part_a", "part_b") ++ extraKeys
    val merged = pairs.select(keys.map(col) ++ Seq(
        explode(array_union(col("ska"), col("skb"))).as("hk"),
        col("ska"), col("skb")): _*)
      .select(keys.map(col) ++ Seq(col("hk"),
        array_contains(col("ska"), col("hk")).as("in_a"),
        array_contains(col("skb"), col("hk")).as("in_b")): _*)
    // ≤ 2k rows per pair — the window is sketch-sized, never corpus-sized
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("hk"))
    merged.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_kept"),
        max(col("hk")).as("kth_hash"),
        sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L))
          .as("n_common"),
        sum(when(col("in_a") && !col("in_b"), 1L).otherwise(0L))
          .as("n_only_a"),
        sum(when(col("in_b") && !col("in_a"), 1L).otherwise(0L))
          .as("n_only_b"))
      .select(keys.map(col) ++ Seq(col("n_kept"), col("n_common"),
        col("n_only_a"), col("n_only_b"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"(CAST(${k - 1} AS BIGINT) * 4294967296L) div kth_hash"))
          .as("est_union"),
        expr("(1000000L * n_common) div n_kept").as("est_jaccard_ppm")): _*)
      // the full set algebra from one merged sample: ∩ and both
      // differences as union-sample fractions of the union estimate
      .withColumn("est_intersection",
        expr("(est_jaccard_ppm * est_union) div 1000000L"))
      .withColumn("est_only_a", expr("(n_only_a * est_union) div n_kept"))
      .withColumn("est_only_b", expr("(n_only_b * est_union) div n_kept"))
  }

  /** TRAILING-WINDOW set algebra (r18 verdict Next #6 — the one sliding
    * form the matrix lacked): pairwise audience/vocabulary ∪ / ∩ /
    * Jaccard between parts over the trailing `windowDays` days, for
    * every day BOTH parts were active — from DAILY KMV sketches alone,
    * pure composition of [[kmvSlidingDistinct]]'s range frame with
    * [[kmvOverlap]]'s estimator. One (part, day, hash) DISTINCT builds
    * the daily sketches (the only corpus-shaped work — the same exchange
    * the sliding-distinct store already pays); each part's trailing
    * window re-cuts to bottom-k by the mergeability identity (≡ the
    * window's direct sketch); the pair relation is an equi-join on DAY
    * between windowed sketch rows (part_a < part_b), ≤ |parts|²·|days|
    * rows of ≤ k-long arrays — sketch-sized, never corpus-shaped. Days
    * are calendar-true via the epoch-day range frame (a gap day
    * contributes nothing); a day where only one part is active emits no
    * pair row for it (overlap against a part with no window is
    * undefined, not zero). Output: (part_a, part_b, day, n_kept,
    * n_common, n_only_a, n_only_b, est_union, est_jaccard_ppm,
    * est_intersection, est_only_a, est_only_b). */
  def kmvSlidingOverlap(df: DataFrame, partCol: String, tsCol: String,
                        keyCol: String, k: Int,
                        windowDays: Int): DataFrame = {
    require(k >= 2, "k must be >= 2 (k-1 drives the estimator)")
    require(windowDays >= 1, "windowDays must be >= 1")
    val hashed = df
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(partCol).as("part"), to_date(col(tsCol)).as("day"),
        Sampling.hashKey(col(keyCol)).as("__w"))
      .distinct()
    val windowed = slidingDailySketch(hashed, "part", k, windowDays)
    val pairs = windowed
      .select(col("part").as("part_a"), col("day"), col("sk").as("ska"))
      .join(windowed
          .select(col("part").as("part_b"), col("day"), col("sk").as("skb")),
        Seq("day"))
      .filter(col("part_a") < col("part_b"))
    overlapFromSketchPairs(pairs, Seq("day"), k)
      .select(col("part_a"), col("part_b"), col("day"), col("n_kept"),
        col("n_common"), col("n_only_a"), col("n_only_b"), col("est_union"),
        col("est_jaccard_ppm"), col("est_intersection"), col("est_only_a"),
        col("est_only_b"))
  }
}
