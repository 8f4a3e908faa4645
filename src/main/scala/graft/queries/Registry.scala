package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry of every driver-checkable query. Each module contributes
  * a Seq[QuerySpec]; SparkEntry flattens this into the driver contract.
  * Names must be unique — asserted at object init so a collision fails fast
  * in tests rather than silently shadowing a query in the Map. */
object Registry {
  def all: Seq[QuerySpec] = Weather.all ++ TpchLike.all ++ TrainingData.all ++ Pipeline.all

  require(all.map(_.name).distinct.size == all.size,
    s"duplicate query names: ${all.map(_.name).diff(all.map(_.name).distinct)}")

  /** The flagship smoke query: latest-per-key over events (D1). */
  def flagship(spark: SparkSession, dir: String): DataFrame =
    all.head.fn(spark, dir)
}
