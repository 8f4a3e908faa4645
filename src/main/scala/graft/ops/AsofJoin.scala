package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — an operator Spark lacks natively.
  *
  * Implemented with the union + last-non-null trick rather than a range
  * join: tag both sides, union them, and per key take the running "last
  * right-side row at or before the current event time" with one ordered
  * window. This is a single shuffle on the key plus a per-partition sort —
  * no range explosion, no broadcast requirement on either side; it scales
  * like any per-key window (parallelism = key cardinality, which for
  * user-keyed event data is the maximal partitioning).
  *
  * Tie semantics (fully deterministic, matching DuckDB ASOF JOIN over a
  * right side deduplicated per (key, ts)):
  *  - a right row with ts equal to the left ts matches (`<=`): right rows
  *    sort before left rows at equal timestamps;
  *  - among right rows with equal ts, the largest id wins.
  */
object AsofJoin {

  /** Left as-of join: for each `left` row, the most recent `right` row with
    * `right.ts <= left.ts` and the same `key`. Returns
    * (key, leftId, ts, <prefix>id, <prefix>ts); unmatched rows keep the
    * match columns null. */
  def leftAsof(left: DataFrame, right: DataFrame, key: String, ts: String,
               leftId: String, rightId: String,
               prefix: String = "matched_"): DataFrame = {
    val rt = right.select(
      col(key).as("__key"), col(ts).as("__ts"), lit(0).as("__side"),
      lit(null).cast(left.schema(leftId).dataType).as("__lid"),
      col(rightId).as("__rid"), col(ts).as("__rts"))
    val lt = left.select(
      col(key).as("__key"), col(ts).as("__ts"), lit(1).as("__side"),
      col(leftId).as("__lid"),
      lit(null).cast(right.schema(rightId).dataType).as("__rid"),
      lit(null).cast(right.schema(ts).dataType).as("__rts"))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts").asc, col("__side").asc, col("__rid").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rt.unionByName(lt)
      .withColumn(s"${prefix}id", last(col("__rid"), ignoreNulls = true).over(w))
      .withColumn(s"${prefix}ts", last(col("__rts"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__key").as(key), col("__lid").as(leftId), col("__ts").as(ts),
        col(s"${prefix}id"), col(s"${prefix}ts"))
  }
}
