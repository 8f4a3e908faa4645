package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k: keeps the k smallest (key, id) pairs of a
  * group — (key asc, id asc), the engine-wide deterministic tie-break —
  * and emits the ids in that order. The one-pass, map-side-combinable
  * form of `row_number() OVER (PARTITION BY g ORDER BY key, id) <= k`.
  *
  * Why a custom Aggregator is justified here (the §2.11 policy bar, the
  * [[BoundedCollectLong]] argument in rank form): a rank window
  * sort-exchanges EVERY input row to its group's single partition — for
  * a per-query candidate cut over a corpus×|queries| relation that is a
  * corpus-shaped sort whose parallelism is capped at the query count.
  * This buffer never holds more than k pairs per group (map-side partial
  * aggregation included), so the shuffle carries one ≤ k-pair buffer per
  * (input partition, group) instead of every candidate row, and the
  * reducer merges sorted buffers. Insertion keeps the buffer sorted:
  * O(k) per row with an O(1) reject of rows below a full buffer's floor.
  *
  * Like every typed Aggregator this plans on ObjectHashAggregateExec.
  * CAVEAT (measured r16): ObjectHashAggregate falls back to SORT-BASED
  * aggregation past `spark.sql.objectHashAggregate.sortBased.
  * fallbackThreshold` (default 128) distinct keys per partition — for a
  * corpus×|queries| input that fallback re-introduces the corpus-wide
  * sort this aggregator exists to avoid (brute hardNegatives at 2 k
  * queries: 44.4 s fallen-back vs 13.8 s hash at the 100× probe). The
  * graft session builders raise the threshold to 65536: safe here
  * because every buffer is ≤ k pairs, so even 64 k in-flight groups are
  * MBs, not the unbounded collect_list-style state the default
  * protects against. */
final case class BoundedTopKLong(k: Int)
    extends Aggregator[(Long, Long), TopKPairs, Array[Long]] {
  require(k >= 1, "k must be >= 1")

  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: TopKPairs = TopKPairs(Vector.empty)

  override def reduce(b: TopKPairs, x: (Long, Long)): TopKPairs = {
    val items = b.items
    if (items.length >= k && !lt(x, items.last)) b
    else {
      val (lo, hi) = items.span(lt(_, x))
      TopKPairs(((lo :+ x) ++ hi).take(k))
    }
  }

  override def merge(a: TopKPairs, b: TopKPairs): TopKPairs = {
    // both sides sorted: linear merge, cut at k
    val out = Vector.newBuilder[(Long, Long)]
    var i = 0; var j = 0; var n = 0
    val (x, y) = (a.items, b.items)
    while (n < k && (i < x.length || j < y.length)) {
      if (j >= y.length || (i < x.length && lt(x(i), y(j)))) {
        out += x(i); i += 1
      } else { out += y(j); j += 1 }
      n += 1
    }
    TopKPairs(out.result())
  }

  override def finish(b: TopKPairs): Array[Long] = b.items.map(_._2).toArray

  override def bufferEncoder: Encoder[TopKPairs] = Encoders.product[TopKPairs]
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/** Sorted ((key, id) asc) buffer, never more than k pairs. */
case class TopKPairs(items: Seq[(Long, Long)])

/** [[BoundedTopKLong]] with a DOUBLE sort key — the member needed when the
  * per-group order is a computed score (cosine, probability) rather than an
  * integer distance: keeps the k smallest (key, id) pairs of a group under
  * primitive-double comparison and emits the ids in that order, so a
  * descending-score top-k passes the NEGATED score (exact for every finite
  * double).
  *
  * Ordering parity with the rank window it replaces: primitive `<` treats
  * -0.0 == 0.0 (ties fall to id asc), exactly Spark SQL's double ordering
  * (SQLOrderingUtil) and DuckDB's — so a window `ORDER BY score DESC, id
  * ASC` and this aggregator over (-score, id) agree on every rank,
  * including the ±0.0 edge. NaN keys never arise on the call sites
  * (cosines of nonzero-norm vectors); under primitive comparison a NaN
  * would tie with everything and fall to id order rather than poison the
  * sort. Same ObjectHashAggregateExec planning note as the Long form. */
final case class BoundedTopKDouble(k: Int)
    extends Aggregator[(Double, Long), TopKPairsD, Array[Long]] {
  require(k >= 1, "k must be >= 1")

  private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: TopKPairsD = TopKPairsD(Vector.empty)

  override def reduce(b: TopKPairsD, x: (Double, Long)): TopKPairsD = {
    val items = b.items
    if (items.length >= k && !lt(x, items.last)) b
    else {
      val (lo, hi) = items.span(lt(_, x))
      TopKPairsD(((lo :+ x) ++ hi).take(k))
    }
  }

  override def merge(a: TopKPairsD, b: TopKPairsD): TopKPairsD = {
    val out = Vector.newBuilder[(Double, Long)]
    var i = 0; var j = 0; var n = 0
    val (x, y) = (a.items, b.items)
    while (n < k && (i < x.length || j < y.length)) {
      if (j >= y.length || (i < x.length && lt(x(i), y(j)))) {
        out += x(i); i += 1
      } else { out += y(j); j += 1 }
      n += 1
    }
    TopKPairsD(out.result())
  }

  override def finish(b: TopKPairsD): Array[Long] = b.items.map(_._2).toArray

  override def bufferEncoder: Encoder[TopKPairsD] = Encoders.product[TopKPairsD]
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

/** Sorted ((key, id) asc) buffer, never more than k pairs — double keys. */
case class TopKPairsD(items: Seq[(Double, Long)])

/** Bounded per-group top-k COUNT pairs: keeps the k largest
  * (cnt, key) pairs under (cnt desc, key asc) and emits them as
  * (cnt, key) structs in that order — the member the Misra-Gries
  * summary needs, where the sort key is a count and the carried id is
  * the STRING key itself (the Long-id members can't surface it). The
  * top-(k+1) count pairs fully determine the canonical MG prune: the
  * (k+1)-th pair's count IS the prune depth d, and every key with
  * count > d sorts strictly before any tied-at-d key, so all true
  * candidates are in the buffer regardless of how ties at the boundary
  * resolve (they resolve key-asc anyway — determinism hygiene).
  *
  * PRECONDITION (ADVICE r18): each (cnt, key) input row must be UNIQUE
  * per group — i.e. the input is a pre-aggregated counts relation
  * (`GROUP BY group, key`), never raw rows. A duplicated (cnt, key) row
  * would be inserted twice and could displace a true candidate from the
  * top-(k+1) buffer, corrupting the MG prune depth. Every current call
  * site feeds `mgFromCounts`-shaped aggregates; keep it that way.
  *
  * Same buffer discipline, merge shape, and ObjectHashAggregateExec
  * planning caveat as [[BoundedTopKLong]]. */
final case class BoundedTopCounts(k: Int)
    extends Aggregator[(Long, String), TopCntPairs, Array[CntKey]] {
  require(k >= 1, "k must be >= 1")

  // "a before b" = larger count first, then key ascending
  private def lt(a: (Long, String), b: (Long, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: TopCntPairs = TopCntPairs(Vector.empty)

  override def reduce(b: TopCntPairs, x: (Long, String)): TopCntPairs = {
    val items = b.items
    if (items.length >= k && !lt(x, items.last)) b
    else {
      val (lo, hi) = items.span(lt(_, x))
      TopCntPairs(((lo :+ x) ++ hi).take(k))
    }
  }

  override def merge(a: TopCntPairs, b: TopCntPairs): TopCntPairs = {
    val out = Vector.newBuilder[(Long, String)]
    var i = 0; var j = 0; var n = 0
    val (x, y) = (a.items, b.items)
    while (n < k && (i < x.length || j < y.length)) {
      if (j >= y.length || (i < x.length && lt(x(i), y(j)))) {
        out += x(i); i += 1
      } else { out += y(j); j += 1 }
      n += 1
    }
    TopCntPairs(out.result())
  }

  override def finish(b: TopCntPairs): Array[CntKey] =
    b.items.map { case (c, kk) => CntKey(c, kk) }.toArray

  override def bufferEncoder: Encoder[TopCntPairs] =
    Encoders.product[TopCntPairs]
  override def outputEncoder: Encoder[Array[CntKey]] =
    ExpressionEncoder[Array[CntKey]]()
}

/** Sorted ((cnt desc, key asc)) buffer, never more than k pairs. */
case class TopCntPairs(items: Seq[(Long, String)])

/** One emitted (count, key) pair of [[BoundedTopCounts]]. */
case class CntKey(cnt: Long, key: String)
