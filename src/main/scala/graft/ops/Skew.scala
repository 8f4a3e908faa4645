package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md §7.4.7; the 100 TB design notes
  * in the builder contract).
  *
  * At scale a handful of keys (a viral location, an empty-string document
  * bucket) can dominate a shuffle partition. Two standard remedies, both
  * pure plan rewrites:
  *
  *  - [[saltedAggregate]]: two-stage aggregation — first group on
  *    (key, salt) so a hot key's rows spread over `salt` reducers and
  *    partial-aggregate map-side, then merge the partials per key. Works
  *    for any algebraic aggregate (sum/count/min/max — supply the merge
  *    forms).
  *  - AQE's `spark.sql.adaptive.skewJoin.enabled` (default on) re-splits
  *    skewed join partitions at runtime; prefer it for joins and reserve
  *    manual salting for aggregations, where AQE does not re-split.
  */
object Skew {

  /** Two-stage salted aggregation: `aggs` are (partial, merge) pairs keyed
    * by output column name, e.g.
    * {{{
    * saltedAggregate(df, Seq("k"), 16,
    *   "n"     -> (count(lit(1)),   sum(col("n"))),
    *   "total" -> (sum(col("v")),   sum(col("total"))),
    *   "mx"    -> (max(col("v")),   max(col("mx"))))
    * }}}
    * The salt column is deterministic (hash of all columns mod `salts`),
    * so results are reproducible. */
  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
                      aggs: (String, (Column, Column))*): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Salt from the hashable columns only — Spark prohibits hash() on MAP
    // types (map equality is order-insensitive but hashcodes are not).
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val saltCols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(saltCols.nonEmpty, "no hashable columns to derive a salt from")
    val salted = df.withColumn("__salt", pmod(hash(saltCols: _*), lit(salts)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head._2._1.as(aggs.head._1),
        aggs.tail.map { case (n, (p, _)) => p.as(n) }: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._2._2.as(aggs.head._1),
        aggs.tail.map { case (n, (_, m)) => m.as(n) }: _*)
  }
}
