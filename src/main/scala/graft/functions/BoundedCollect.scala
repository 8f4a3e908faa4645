package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Df-capped posting-list collect: gathers a group's member ids into one
  * SORTED array, or NULL when the group exceeds `limit` members — the
  * one-pass form of the "count df → filter ≤ maxDf → collect survivors"
  * two-pass pattern the df-capped pair generators (`Dedup.winnowPairs`,
  * `Dedup.ngramJaccardPairs(maxDf)`) previously ran as a count aggregate +
  * anti-join + persisted self-join.
  *
  * Why a custom Aggregator is justified here (the §2.11 policy bar):
  * built-in `collect_list` buffers EVERY member before any filter can run,
  * so a boilerplate shingle shared by millions of documents holds a
  * multi-megabyte aggregation buffer per hot key — the unbounded-state
  * failure the df cap exists to prevent. This buffer stops appending at
  * `limit + 1` elements (just enough to distinguish "exactly limit" from
  * "over"), while `n` keeps the true count, so per-group state is O(limit)
  * regardless of how hot the key is, map-side partial aggregation included.
  *
  * Plan shape, chosen consciously: typed Aggregators run on
  * ObjectHashAggregateExec, which falls back to sort-based aggregation
  * beyond ~128 distinct keys per partition — for a vocabulary-sized key
  * space that is the ALWAYS case, i.e. this plans like the SortAggregate
  * every `max_by(struct)` operator in `Dedup` already uses. The sort spills
  * gracefully under memory pressure, unlike the MEMORY_AND_DISK persist +
  * double-shuffled self-join it replaces (the round-11 driver bench showed
  * exactly those persists degrading 2.1–2.5× under ambient load).
  *
  * The output array is sorted ascending so the downstream pair explode
  * (`i < j` over the array) emits each unordered pair once with
  * `a < b` — no per-pair least/greatest needed. */
final case class BoundedCollectLong(limit: Int)
    extends Aggregator[Long, BoundedPostings, Array[Long]] {
  require(limit >= 1, "limit must be >= 1")

  override def zero: BoundedPostings = BoundedPostings(0L, Vector.empty)

  override def reduce(b: BoundedPostings, id: Long): BoundedPostings = {
    val ids = if (b.ids.length <= limit) b.ids :+ id else b.ids
    BoundedPostings(b.n + 1L, ids)
  }

  override def merge(a: BoundedPostings, b: BoundedPostings): BoundedPostings = {
    val ids =
      if (a.ids.length > limit) a.ids
      else if (b.ids.length > limit) b.ids
      else (a.ids ++ b.ids).take(limit + 1)
    BoundedPostings(a.n + b.n, ids)
  }

  override def finish(b: BoundedPostings): Array[Long] =
    if (b.n > limit) null else b.ids.toArray.sorted

  override def bufferEncoder: Encoder[BoundedPostings] =
    Encoders.product[BoundedPostings]
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/** `n` is the TRUE group count; `ids` is capped at limit + 1 elements —
  * when n ≤ limit, ids holds all n members. */
case class BoundedPostings(n: Long, ids: Seq[Long])
