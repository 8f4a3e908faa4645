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
  *  - [[stratifiedQuota]] ranks within strata: one shuffle on the stratum
  *    key. For a hot stratum (≫ quota), pre-thin with a Bernoulli filter at
  *    a few × quota/|stratum| before ranking so the sort never sees the full
  *    stratum — the rank-by-hash order is preserved under any hash prefilter
  *    because both order by the same key.
  *  - [[mixToWeights]] needs per-stratum counts first (one partial-agg pass,
  *    output = |strata| rows, broadcast back) — two passes total, no
  *    corpus-sized shuffle.
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
    * function of the corpus alone. */
  def stratifiedQuota(df: DataFrame, stratumCol: String, n: Int,
                      keyCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashKey(col(keyCol)).asc, col(keyCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
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
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashKey(col(keyCol)).asc, col(keyCol).asc)
    weighted.join(quotas, stratumCol)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= col("__quota"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }
}
