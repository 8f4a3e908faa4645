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
  *   1. range-repartition by the (hash, id) stream order — a scalable
  *      sampled shuffle, the only corpus-wide movement;
  *   2. per-partition token subtotals (one tiny row per partition);
  *   3. cumulative offsets over those subtotals — a single-partition window
  *      over |partitions| rows, which is fine because it is O(partitions),
  *      not O(corpus);
  *   4. broadcast the offsets back and finish with a per-partition window.
  * The result is the exact global cumsum in stream order — partition
  * boundaries cancel out of the arithmetic, so the output is independent of
  * the partition count (asserted in PackingSpec).
  *
  * Stream order is (md5-hash, id): deterministic, reproducible, and an
  * implicit corpus shuffle — exactly what training wants, no rand(). */
object Packing {

  /** (idCol, nTokens, pack_id, pack_offset) for every document.
    * `budget` is the tokens-per-sequence target (e.g. 4096). */
  def packSequences(docs: DataFrame, budget: Long,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val sized = docs.select(col(idCol),
      Sampling.hashKey(col(idCol)).as("__hk"),
      size(TextStats.tokens(col(textCol))).cast("long").as("n_tokens"))
    // 1. the only corpus-wide shuffle: range partition in stream order.
    //    PERSISTED: `parted` feeds two plan branches (the offsets aggregate
    //    and the final join), and RangePartitioner samples its boundaries
    //    with an RDD-id-derived seed — re-executions can draw DIFFERENT
    //    boundaries. Correctness must not hinge on ReuseExchange happening
    //    to dedup the two scans; the persist pins one materialization that
    //    both branches read.
    val parted = sized.repartitionByRange(col("__hk"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 2-3. per-partition subtotals, then exclusive prefix over partitions
    //      (tiny: one row per partition)
    val offsets = parted.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("__psum"))
      .withColumn("__poff",
        coalesce(sum(col("__psum")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__poff"))
    // 4. exclusive cumsum inside each partition + the partition's offset
    //    = exact global exclusive cumsum in (hash, id) stream order
    val wIn = Window.partitionBy(col("__pid"))
      .orderBy(col("__hk").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted.join(broadcast(offsets), "__pid")
      .withColumn("__start",
        col("__poff") + coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .select(col(idCol), col("n_tokens"),
        floor(col("__start") / budget).cast("long").as("pack_id"),
        (col("__start") % budget).as("pack_offset"))
  }
}
